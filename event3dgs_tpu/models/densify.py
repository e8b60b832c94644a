"""Adaptive density control as jit-compatible masked scatters.

Reimplements the reference's densify/clone/split/prune policy
(`scene/gaussian_model.py:258-407`, driven from `train.py:316-327`) for
fixed-capacity buffers:

- **stats**: accumulate the norm of each Gaussian's screen-space (2D mean)
  gradient and a visit count; track max on-screen radius
  (`add_densification_stats`, `gaussian_model.py:405-407`).
- **clone**: small Gaussians (max scale ≤ percent_dense·extent) with mean
  grad ≥ threshold are duplicated in place (`densify_and_clone`).
- **split**: large ones are replaced by N=2 children sampled from the
  Gaussian itself with scales divided by 1.6 (`densify_and_split`).
- **prune**: opacity < min_opacity, or (past the first opacity reset)
  screen radius > 20 px or world scale > 0.1·extent (`densify_and_prune`).

Instead of reallocating arrays, new Gaussians claim **dead slots** via a
rank-matching scatter (k-th new item → k-th free slot).  If there are more
candidates than free slots the lowest-priority candidates are dropped and the
overflow is reported so the host can grow capacity (a rare recompile event).
Adam moments of every newly-claimed slot are zeroed, mirroring the
reference's optimizer-state surgery (`cat_tensors_to_optimizer` /
`_prune_optimizer`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from event3dgs_tpu.core.transforms import inverse_sigmoid, quat_to_rotmat
from event3dgs_tpu.models.gaussians import GaussianParams, TRAINABLE_FIELDS
from event3dgs_tpu.models.optimizer import AdamState


@struct.dataclass
class DensifyStats:
    grad_accum: jnp.ndarray  # [C] accumulated ‖∂L/∂mean2d‖
    denom: jnp.ndarray  # [C] visit counts
    max_radii2d: jnp.ndarray  # [C] max on-screen radius seen


def init_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyStats(grad_accum=z, denom=z, max_radii2d=z)


def update_stats(
    stats: DensifyStats,
    mean2d_grad: jnp.ndarray,  # [C, 2] gradient from the render tap (PIXEL units)
    radii: jnp.ndarray,  # [C]
    visibility: jnp.ndarray,  # [C] bool
    grad_scale: tuple[float, float] = (1.0, 1.0),
) -> DensifyStats:
    """Per-iteration stats accumulation (`train.py:317-320`).

    ``grad_scale`` must be ``(0.5*W, 0.5*H)`` of the render: the reference
    CUDA backward emits mean2D gradients PRE-SCALED by the NDC→pixel
    Jacobian halves (`backward.cu: ddelx_dx = 0.5*W, ddely_dy = 0.5*H`),
    which is what makes its 2e-4 densify threshold resolution-independent.
    Our tap gradient is w.r.t. raw pixel coordinates, so it must be scaled
    here — without it the threshold is effectively (W/2)× stricter and
    densification silently never fires (the round-4 "densify never adds
    quality" mystery: at 400×400 the raw-pixel norms are ~200× below the
    reference's scale).
    """
    vis = visibility.astype(jnp.float32)
    scaled = mean2d_grad * jnp.asarray(grad_scale, mean2d_grad.dtype)
    gnorm = jnp.linalg.norm(scaled, axis=-1)
    return DensifyStats(
        grad_accum=stats.grad_accum + gnorm * vis,
        denom=stats.denom + vis,
        max_radii2d=jnp.maximum(stats.max_radii2d, radii * vis),
    )


class DensifyResult(NamedTuple):
    params: GaussianParams
    opt_state: AdamState
    stats: DensifyStats
    overflow: jnp.ndarray  # number of candidates dropped for lack of capacity


def _rank_match_scatter(dest, dest_free, src, src_mask):
    """Scatter the k-th True item of src into the k-th free slot of dest.

    Args:
        dest: [C, ...] destination array.
        dest_free: [C] bool — slots available for writing.
        src: [M, ...] candidate values (M may differ from C).
        src_mask: [M] bool — which candidates are real.

    Returns:
        (new_dest, claimed_mask [C] bool, dropped count)
    """
    c = dest.shape[0]
    # free slot ids in order: argsort puts free (0 after negation) first
    free_order = jnp.argsort(~dest_free)  # stable: free slots first, by index
    n_free = jnp.sum(dest_free)
    cand_rank = jnp.cumsum(src_mask) - 1  # rank of each true candidate
    ok = src_mask & (cand_rank < n_free)
    # target slot for each candidate (garbage for ~ok, dropped via mode)
    target = jnp.where(ok, free_order[jnp.clip(cand_rank, 0, c - 1)], c)
    new_dest = dest.at[target].set(src, mode="drop")
    claimed = jnp.zeros((c,), bool).at[target].set(ok, mode="drop")
    dropped = jnp.sum(src_mask) - jnp.sum(ok)
    return new_dest, claimed, dropped


def densify_and_prune(
    params: GaussianParams,
    opt_state: AdamState,
    stats: DensifyStats,
    rng: jax.Array,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    max_screen_size: float,  # 0 disables the screen/world-size prune
    percent_dense: float = 0.01,
) -> DensifyResult:
    """One densification step (reference `densify_and_prune` +
    `densify_and_clone` + `densify_and_split`, N=2)."""
    c = params.capacity
    alive = params.alive

    grads = stats.grad_accum / jnp.maximum(stats.denom, 1.0)
    grads = jnp.where(jnp.isnan(grads), 0.0, grads) * alive

    scales = jnp.exp(params.scaling)
    max_scale = jnp.max(scales, axis=-1)
    dense_limit = percent_dense * extent

    hot = grads >= grad_threshold
    clone_sel = alive & hot & (max_scale <= dense_limit)
    split_sel = alive & hot & (max_scale > dense_limit)

    # ---- prune mask on existing slots ------------------------------------
    opacity_act = jax.nn.sigmoid(params.opacity[:, 0])
    prune = opacity_act < min_opacity
    use_size_prune = max_screen_size > 0
    if use_size_prune:
        prune = prune | (stats.max_radii2d > max_screen_size) | (
            max_scale > 0.1 * extent
        )
    # split originals die; pruned slots die
    keep = alive & ~split_sel & ~prune
    new_alive = keep

    # ---- build candidate children ----------------------------------------
    # 3 candidate banks, each [C]: one clone copy + two split samples.
    # Interleave priority: clones first (reference order: clone then split).
    eps_samples = jax.random.normal(rng, (2, c, 3))
    rot = quat_to_rotmat(params.rotation)  # [C,3,3]

    def split_child(eps):
        offset = jnp.einsum("cij,cj->ci", rot, eps * scales)
        xyz = params.xyz + offset
        scaling = jnp.log(scales / (0.8 * 2.0))
        return xyz, scaling

    sp_xyz = [None, None]
    sp_scaling = [None, None]
    for i in range(2):
        sp_xyz[i], sp_scaling[i] = split_child(eps_samples[i])

    # Candidate trainable trees: bank 0 = clones, banks 1,2 = split children.
    def bank(field):
        base = getattr(params, field)
        if field == "xyz":
            return jnp.concatenate([base, sp_xyz[0], sp_xyz[1]], axis=0)
        if field == "scaling":
            return jnp.concatenate([base, sp_scaling[0], sp_scaling[1]], axis=0)
        return jnp.concatenate([base, base, base], axis=0)

    cand_mask = jnp.concatenate([clone_sel, split_sel, split_sel], axis=0)

    # Don't resurrect children whose source would itself be pruned by the
    # post-densify prune (clones share the parent's opacity/scale so the
    # reference's subsequent prune would delete them immediately; split
    # children whose *reduced* scale still violates the world-size bound are
    # likewise dead on arrival).
    child_scale_ok = jnp.max(jnp.exp(sp_scaling[0]), axis=-1) <= 0.1 * extent
    child_opacity_ok = opacity_act >= min_opacity
    if use_size_prune:
        cand_ok = jnp.concatenate(
            [
                child_opacity_ok & (max_scale <= 0.1 * extent),
                child_opacity_ok & child_scale_ok,
                child_opacity_ok & child_scale_ok,
            ],
            axis=0,
        )
    else:
        cand_ok = jnp.concatenate([child_opacity_ok] * 3, axis=0)
    cand_mask = cand_mask & cand_ok

    # ---- scatter candidates into free slots ------------------------------
    free = ~new_alive
    claimed = None
    dropped = None
    new_fields = {}
    for field in TRAINABLE_FIELDS:
        dest = getattr(params, field)
        out, claimed, dropped = _rank_match_scatter(dest, free, bank(field), cand_mask)
        new_fields[field] = out
    new_alive = new_alive | claimed

    new_params = params.replace(alive=new_alive, **new_fields)

    # ---- optimizer surgery: zero moments of claimed slots ----------------
    def zero_claimed(tree):
        def z(leaf):
            mask = claimed.reshape((c,) + (1,) * (leaf.ndim - 1))
            return jnp.where(mask, 0.0, leaf)

        return jax.tree.map(z, tree)

    new_opt = AdamState(
        mu=zero_claimed(opt_state.mu),
        nu=zero_claimed(opt_state.nu),
        count=opt_state.count,
    )

    # stats reset for everyone (reference `densification_postfix`:345-347 and
    # prune path both rebuild the stat buffers)
    zeros = jnp.zeros((c,), jnp.float32)
    new_stats = DensifyStats(grad_accum=zeros, denom=zeros, max_radii2d=zeros)

    return DensifyResult(
        params=new_params, opt_state=new_opt, stats=new_stats, overflow=dropped
    )


def reset_opacity(
    params: GaussianParams, opt_state: AdamState, ceiling: float = 0.01
) -> tuple[GaussianParams, AdamState]:
    """Clamp every opacity to ≤ ``ceiling`` and zero its Adam moments.

    Reference `reset_opacity` (`gaussian_model.py:210-213`) +
    `replace_tensor_to_optimizer` (`:258-271`).  The event-training recipe
    relies on this firing every 10k iters to prevent scene collapse
    (`train.py:119`, Readme.md:94-98).
    """
    act = jax.nn.sigmoid(params.opacity)
    new_opacity = inverse_sigmoid(jnp.minimum(act, ceiling))
    new_params = params.replace(opacity=new_opacity)

    def zero_op(tree):
        return {
            k: (jnp.zeros_like(v) if k == "opacity" else v) for k, v in tree.items()
        }

    new_opt = AdamState(
        mu=zero_op(opt_state.mu), nu=zero_op(opt_state.nu), count=opt_state.count
    )
    return new_params, new_opt
