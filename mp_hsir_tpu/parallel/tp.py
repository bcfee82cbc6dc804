"""Tensor-parallel helpers for the spectral mesh axis.

Design: parameters stay REPLICATED in the pytree (single checkpoint layout,
no resharding on save/restore); each member of the ``spectral`` axis
computes only its block of head-parallel work by slicing the replicated
weight with :func:`tp_slice`. The slice's custom VJP scatters the local
weight-gradient back into a full-size zero tensor (no collective).

Gradient accounting (why a plain ``pmean`` over the spectral axis is exact):
every tp_slice'd computation MUST feed the forward ``psum`` over the axis.
With the usual replicated-per-member loss, the psum's transpose multiplies
the incoming cotangent by n (sum of the identical per-member cotangents),
so member i's scattered gradient is n * G|slice_i — and the trainer's pmean
over the axis yields sum_i G|slice_i = G exactly, the same reduction that is
simultaneously correct for genuinely replicated parameters (identical grads
on every member). Slicing a weight whose consumer does NOT end in the axis
psum would under-count by n — don't.

This is the Megatron-TP analogue for the reference's C x C transposed
spectral attention (SURVEY.md section 2.6; reference net/MP_HSIR.py:85-114
has no parallel dimension at all — single-GPU).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def tp_slice(w: jax.Array, start: jax.Array, size: int, axis: int, axis_name: str) -> jax.Array:
    """dynamic_slice_in_dim whose backward scatters the local gradient into
    a full-size zero tensor, making replicated-weight gradients exact under
    the trainer's pmean over ``axis_name`` (see module docstring for the
    accounting). ``axis_name`` is unused at runtime but documents/keys the
    mesh axis this slice belongs to."""
    return jax.lax.dynamic_slice_in_dim(w, start, size, axis)


def _tp_slice_fwd(w, start, size, axis, axis_name):
    # residuals must be jax types: carry the (already-live) weight for its
    # shape/dtype instead of static metadata
    return jax.lax.dynamic_slice_in_dim(w, start, size, axis), (w, start)


def _tp_slice_bwd(size, axis, axis_name, res, g):
    w, start = res
    full = jnp.zeros(w.shape, g.dtype)
    full = jax.lax.dynamic_update_slice_in_dim(full, g, start, axis)
    return (full.astype(w.dtype), None)


tp_slice.defvjp(_tp_slice_fwd, _tp_slice_bwd)
