"""Loss library tests, cross-checked against torch transcriptions of the
reference formulas where it matters (SSIM window, event log-diff)."""

import numpy as np
import jax.numpy as jnp
import pytest

from event3dgs_tpu.losses import (
    deblur_mix,
    dice_loss,
    event_log_diff,
    event_mixture_loss,
    gray_total_loss,
    l1_loss,
    l1_loss_gray,
    psnr,
    rgb_to_grayscale,
    rgb_to_luv_l,
    rgb_total_loss,
    ssim,
    ssim_gray,
    thresholded_event_l1,
)


def rand_img(shape=(24, 32, 3), seed=0):
    return jnp.asarray(np.random.default_rng(seed).uniform(0, 1, shape), jnp.float32)


class TestBasic:
    def test_l1_zero_for_identical(self):
        a = rand_img()
        assert float(l1_loss(a, a)) == 0.0

    def test_grayscale_weights(self):
        img = jnp.ones((2, 2, 3)) * jnp.array([1.0, 0.0, 0.0])
        assert float(rgb_to_grayscale(img)[0, 0, 0]) == pytest.approx(0.299)
        img = jnp.ones((2, 2, 3)) * jnp.array([0.0, 1.0, 0.0])
        assert float(rgb_to_grayscale(img)[0, 0, 0]) == pytest.approx(0.587)

    def test_luv_weights(self):
        img = jnp.ones((2, 2, 3)) * jnp.array([1.0, 1.0, 1.0])
        expect = 0.4124 + 0.35758 + 0.1804
        assert float(rgb_to_luv_l(img)[0, 0, 0]) == pytest.approx(expect, rel=1e-5)

    def test_psnr_known_value(self):
        a = jnp.zeros((4, 4, 3))
        b = jnp.full((4, 4, 3), 0.1)
        assert float(psnr(a, b)) == pytest.approx(20.0, abs=0.01)

    def test_ssim_identical_is_one(self):
        a = rand_img()
        assert float(ssim(a, a)) == pytest.approx(1.0, abs=1e-4)

    def test_ssim_decreases_with_noise(self):
        a = rand_img()
        b = jnp.clip(a + 0.3 * rand_img(seed=1), 0, 1)
        assert float(ssim(a, b)) < float(ssim(a, a))

    def test_ssim_matches_torch_reference(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as F
        from math import exp

        # torch transcription of loss_utils.py:359-418
        def t_ssim(img1, img2, window_size=11):
            channel = img1.size(-3)
            g = torch.tensor(
                [exp(-((x - window_size // 2) ** 2) / (2 * 1.5**2))
                 for x in range(window_size)]
            )
            g = (g / g.sum()).unsqueeze(1)
            win = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
            win = win.expand(channel, 1, window_size, window_size).contiguous()
            mu1 = F.conv2d(img1, win, padding=window_size // 2, groups=channel)
            mu2 = F.conv2d(img2, win, padding=window_size // 2, groups=channel)
            mu1_sq, mu2_sq, mu12 = mu1**2, mu2**2, mu1 * mu2
            s1 = F.conv2d(img1 * img1, win, padding=window_size // 2, groups=channel) - mu1_sq
            s2 = F.conv2d(img2 * img2, win, padding=window_size // 2, groups=channel) - mu2_sq
            s12 = F.conv2d(img1 * img2, win, padding=window_size // 2, groups=channel) - mu12
            C1, C2 = 0.01**2, 0.03**2
            m = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
            return m.mean().item()

        a = np.random.default_rng(0).uniform(0, 1, (20, 28, 3)).astype(np.float32)
        b = np.random.default_rng(1).uniform(0, 1, (20, 28, 3)).astype(np.float32)
        ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
        ref = t_ssim(
            torch.tensor(a).permute(2, 0, 1).unsqueeze(0),
            torch.tensor(b).permute(2, 0, 1).unsqueeze(0),
        )
        assert ours == pytest.approx(ref, abs=2e-4)

    def test_gray_variants(self):
        a, b = rand_img(), rand_img(seed=2)
        assert float(l1_loss_gray(a, b)) > 0
        assert float(ssim_gray(a, a)) == pytest.approx(1.0, abs=1e-4)


class TestEvent:
    def test_log_diff_zero_for_static(self):
        a = rand_img()
        d = event_log_diff(a, a, 0.17)
        np.testing.assert_allclose(np.array(d), 0.0, atol=1e-6)

    def test_log_diff_sign_and_scale(self):
        dark = jnp.full((4, 4, 3), 0.1)
        bright = jnp.full((4, 4, 3), 0.4)
        d = event_log_diff(dark, bright, 0.17)
        assert float(d[0, 0, 0]) > 0  # brightening → positive events
        d2 = event_log_diff(dark, bright, 0.34)
        np.testing.assert_allclose(np.array(d), 2 * np.array(d2), rtol=1e-5)

    def test_log_diff_matches_reference_formula(self):
        a, b = rand_img(seed=3), rand_img(seed=4)
        d = np.array(event_log_diff(a, b, 0.2))[..., 0]
        la = 0.4124 * np.array(a)[..., 0] + 0.35758 * np.array(a)[..., 1] + 0.1804 * np.array(a)[..., 2]
        lb = 0.4124 * np.array(b)[..., 0] + 0.35758 * np.array(b)[..., 1] + 0.1804 * np.array(b)[..., 2]
        expect = (np.log(lb + 1e-8) - np.log(la + 1e-8)) / 0.2
        np.testing.assert_allclose(d, expect, rtol=1e-4, atol=1e-5)

    def test_mixture_loss_coverage_weighting(self):
        # identical pairs → gt_diff == 0 everywhere → coverage 0 →
        # loss = 0.1 * intensity_l1 * 1.0
        frame = rand_img(seed=5)
        main = rand_img(seed=6)
        gt_main = rand_img(seed=7)
        loss, aux = event_mixture_loss(
            frame, frame, main, frame, frame, gt_main, 0.17
        )
        assert float(aux["coverage"]) == 0.0
        assert float(loss) == pytest.approx(0.1 * float(aux["intensity_l1"]), rel=1e-5)

    def test_mixture_loss_full_coverage(self):
        a, b = rand_img(seed=8) + 0.1, rand_img(seed=9) + 0.2
        main, gt_main = rand_img(seed=10), rand_img(seed=11)
        loss, aux = event_mixture_loss(a, b, main, a, b, gt_main, 0.17)
        assert float(aux["coverage"]) == pytest.approx(1.0)
        assert float(loss) == pytest.approx(0.9 * float(aux["event_l1"]), rel=1e-5)

    def test_contrast_gradient(self):
        import jax

        a, b = rand_img(seed=12) + 0.1, rand_img(seed=13) + 0.2
        main, gt_main = rand_img(seed=14), rand_img(seed=15)

        def f(c):
            loss, _ = event_mixture_loss(a, b, main, a, b, gt_main, c)
            return loss

        g = float(jax.grad(f)(jnp.asarray(0.17)))
        assert np.isfinite(g) and g != 0.0

    def test_deblur_mix(self):
        main, blurry = rand_img(seed=16), rand_img(seed=17)
        mixed, aux = deblur_mix(jnp.asarray(1.0), main, blurry, 0.5)
        assert float(mixed) == pytest.approx(0.5 + 0.5 * float(aux["blur_l1"]), rel=1e-6)

    def test_experimental_losses_finite(self):
        a, b = rand_img(seed=18) - 0.5, rand_img(seed=19) - 0.5
        assert np.isfinite(float(thresholded_event_l1(a, b)))
        assert np.isfinite(float(dice_loss(a + 0.5, b + 0.5)))


class TestModeLosses:
    def test_rgb_total(self):
        a, b = rand_img(), rand_img(seed=2)
        loss, aux = rgb_total_loss(a, b, 0.2)
        assert float(loss) > 0 and "l1" in aux

    def test_gray_total_lambda_zero(self):
        a, b = rand_img(), rand_img(seed=2)
        loss, aux = gray_total_loss(a, b, 0.0)
        assert float(loss) == pytest.approx(float(aux["l1"]))


class TestExperimentalLossTail:
    def test_filtered_event_l1_tolerates_one_pixel_shift(self):
        from event3dgs_tpu.losses.event import filtered_event_l1

        a = jnp.zeros((8, 8, 1)).at[4, 4, 0].set(1.0)
        b_same = a
        b_shift = jnp.zeros((8, 8, 1)).at[4, 5, 0].set(1.0)
        exact = float(filtered_event_l1(a, b_same))
        shifted = float(filtered_event_l1(a, b_shift))
        plain_l1 = float(jnp.mean(jnp.abs(a - b_shift)))
        assert exact == 0.0
        # the 1x2 box filter halves the penalty of a one-pixel shift
        assert shifted < 2 * plain_l1

    def test_soft_threshold_gates_small_values(self):
        from event3dgs_tpu.losses.event import soft_threshold

        out = soft_threshold(jnp.asarray([0.0, 0.1, 0.5, -0.5]), 0.3, 10.0)
        assert abs(float(out[1])) < 0.15    # below threshold -> suppressed
        assert float(out[2]) > 0.85         # above -> passes with sign
        assert float(out[3]) < -0.85

    def test_qe_scale_and_normalize(self):
        from event3dgs_tpu.losses.basic import rgb_to_qe_scale
        from event3dgs_tpu.losses.event import normalize_image

        img = jnp.ones((4, 4, 3)) * jnp.asarray([1.0, 0.5, 0.25])
        qe = rgb_to_qe_scale(img)
        assert qe.shape == (4, 4, 1)
        expected = 0.4124 + 0.35758 * 0.5 + 0.1804 * 0.25
        assert float(qe[0, 0, 0]) == pytest.approx(expected)
        n = normalize_image(jnp.asarray([2.0, 4.0, 6.0]))
        np.testing.assert_allclose(np.asarray(n), [0.0, 0.5, 1.0])
