"""Hand-rolled Adam with per-leaf learning rates and moment surgery.

The reference uses torch Adam with six parameter groups at different LRs and
``eps=1e-15`` (`scene/gaussian_model.py:154-163`), and performs *optimizer
state surgery* during densification: moments of grown/replaced slots are
zeroed while kept slots retain theirs (`gaussian_model.py:258-327`).

A hand-rolled Adam (rather than optax) keeps that surgery a trivial masked
``where`` on the moment pytrees.  Semantics match torch Adam:

    m ← β1·m + (1-β1)·g        v ← β2·v + (1-β2)·g²
    p ← p - lr · (m/(1-β1ᵗ)) / (√(v/(1-β2ᵗ)) + eps)

with a single shared step count t (torch keeps one per tensor; they advance
identically here because every group steps every iteration).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class AdamState:
    mu: object  # pytree like params
    nu: object  # pytree like params
    count: jnp.ndarray  # scalar int32


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(
        mu=zeros, nu=jax.tree.map(jnp.zeros_like, params), count=jnp.zeros((), jnp.int32)
    )


def adam_update(
    params,
    grads,
    state: AdamState,
    lr_tree,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam step.

    Args:
        params, grads: matching pytrees.
        lr_tree: pytree of scalar learning rates matching `params`' structure
            (leaves may be traced — e.g. the xyz LR follows a schedule).
    Returns:
        (new_params, new_state)
    """
    count = state.count + 1
    c1 = 1.0 - b1 ** count.astype(jnp.float32)
    c2 = 1.0 - b2 ** count.astype(jnp.float32)

    new_mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
    new_nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, grads)

    def step(p, m, v, lr):
        m_hat = m / c1
        v_hat = v / c2
        return p - lr * m_hat / (jnp.sqrt(v_hat) + eps)

    new_params = jax.tree.map(step, params, new_mu, new_nu, lr_tree)
    return new_params, AdamState(mu=new_mu, nu=new_nu, count=count)
