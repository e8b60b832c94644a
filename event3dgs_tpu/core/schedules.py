"""Learning-rate schedules, traceable inside jitted train steps.

The reference uses a host-side Python closure (Plenoxels-style exponential
decay with an optional sine warm-up, `utils/general_utils.py:29-62`) that is
re-evaluated every iteration.  Here the schedule is a pure jnp function of the
step so it lives inside the compiled train step.
"""

from __future__ import annotations

import jax.numpy as jnp


def exponential_lr(
    step,
    lr_init: float,
    lr_final: float,
    lr_delay_steps: int = 0,
    lr_delay_mult: float = 1.0,
    max_steps: int = 1_000_000,
):
    """Log-linear interpolation from lr_init to lr_final with optional delay.

    Matches reference `general_utils.py:47-62`: returns 0 for negative steps
    or an all-zero schedule; when ``lr_delay_steps > 0`` the rate is scaled by
    a reverse-cosine ease-in starting at ``lr_delay_mult``.
    """
    step = jnp.asarray(step, jnp.float32)
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1.0 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1.0 - t) + jnp.log(lr_final) * t)
    return jnp.where(step < 0, 0.0, delay_rate * log_lerp)
