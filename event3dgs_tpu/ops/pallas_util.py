"""Shared helpers for Pallas kernel call sites.

``out_struct`` builds ``jax.ShapeDtypeStruct`` outputs that carry the
varying-mesh-axes (vma) annotation of a reference operand.  Inside a
``shard_map`` with ``check_vma=True`` (the default — and required for
correct AD of the cross-shard compositing collectives, see
``parallel/sharded_train.py``), every ``pallas_call`` output must declare
which mesh axes it varies over; a kernel's outputs vary exactly over the
axes its operands do.  Outside shard_map the vma set is empty and the
annotation is a no-op.
"""

from __future__ import annotations

import jax


def vma_of(x) -> frozenset:
    """The mesh axes operand ``x`` varies over (empty outside shard_map)."""
    return frozenset(getattr(jax.typeof(x), "vma", ()) or ())


def strip_vma(*arrays):
    """Drop vma annotations via an identity host callback.

    Interpret-mode escape hatch: the Pallas HLO interpreter replays traced
    kernel/index-map jaxprs primitive-by-primitive, skipping the user-level
    automatic ``pvary`` insertion — any primitive mixing vma-annotated
    operands with kernel-internal iota/constants then fails JAX's
    ``standard_vma_rule``.  Stripping the annotations before the (already
    non-differentiated, custom_vjp-interior) interpret region and
    re-varying the outputs (:func:`revary`) sidesteps the replay entirely.
    Host round-trip cost — use ONLY on interpret (CPU test) paths.
    """
    if not any(vma_of(a) for a in arrays):
        return arrays
    shapes = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in arrays)
    return tuple(jax.pure_callback(lambda *xs: xs, shapes, *arrays))


def _pvary(x, axes):
    pcast = getattr(jax.lax, "pcast", None)
    if pcast is not None:
        return pcast(x, axes, to="varying")
    return jax.lax.pvary(x, axes)


def revary(x, vma: frozenset):
    """Re-attach varying axes dropped by :func:`strip_vma` (free cast)."""
    missing = vma - vma_of(x)
    return _pvary(x, tuple(missing)) if missing else x


def out_struct(shape, dtype, vma: frozenset = frozenset()) -> jax.ShapeDtypeStruct:
    """A ShapeDtypeStruct carrying an explicit vma annotation.

    The annotation is always attached (an empty frozenset is a valid,
    explicit "invariant" declaration — shard_map's check_vma rejects a
    missing one, and it is ignored outside shard_map).
    """
    return jax.ShapeDtypeStruct(shape, dtype, vma=vma)


def vma_index_map(fn):
    """Wrap a Pallas BlockSpec index map for shard_map compatibility.

    Inside shard_map (check_vma=True) the scalar-prefetch operands carry a
    varying-axes set while the grid loop indices don't; primitives like
    dynamic_slice require the sets to match.  The wrapper promotes inputs
    and outputs to the union vma with ``pvary`` (a free type-level cast).
    Identity outside shard_map — the single-device path is untouched.
    """
    import functools

    @functools.wraps(fn)
    def wrapped(*args):
        vma: frozenset = frozenset().union(*(vma_of(a) for a in args))
        if not vma:
            return fn(*args)
        args = tuple(
            _pvary(a, tuple(vma - vma_of(a)))
            if vma - vma_of(a) else a
            for a in args
        )
        out = fn(*args)
        if not isinstance(out, tuple):
            out = (out,)
        import jax.numpy as jnp

        def promote(c):
            c = jnp.asarray(c)
            missing = vma - vma_of(c)
            return _pvary(c, tuple(missing)) if missing else c

        return tuple(promote(c) for c in out)

    return wrapped


def unify_vma(*arrays):
    """Promote every array to the union of the group's varying axes.

    custom_vjp under shard_map requires the bwd cotangents' vma to equal
    the primal inputs' — but a cotangent varies over every axis the *loss*
    varies over.  Promoting all primal inputs to the common vma up front
    (``pvary`` is free — it's a type-level annotation) keeps the pairing
    consistent.  No-op outside shard_map.
    """
    union: frozenset = frozenset().union(*(vma_of(a) for a in arrays))
    if not union:
        return arrays
    out = []
    for a in arrays:
        missing = union - vma_of(a)
        out.append(_pvary(a, tuple(missing)) if missing else a)
    return tuple(out)
