"""Permutation gathers with gather-based gradients.

`jnp.take(x, perm)` differentiates to a scatter-add, which serializes on TPU.
When `perm` is a bijection with known inverse (serialization orders), the
cotangent is just a gather by the inverse permutation — both directions stream
at full bandwidth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.custom_vjp
def permute_rows(x: jnp.ndarray, perm: jnp.ndarray, inv: jnp.ndarray) -> jnp.ndarray:
    """y[i] = x[perm[i]] with d/dx expressed as a gather by `inv`.

    `perm` MUST be a permutation of range(len(x)) and `inv` its inverse
    (inv[perm[i]] = i); rows routed to/from out-of-range ids would silently
    break gradients.
    """
    return jnp.take(x, perm, axis=0)


def _permute_fwd(x, perm, inv):
    return jnp.take(x, perm, axis=0), (perm.shape, inv)


def _permute_bwd(res, g):
    perm_shape, inv = res
    zero_i = np.zeros(perm_shape, jax.dtypes.float0)
    return (jnp.take(g, inv, axis=0), zero_i, zero_i)


permute_rows.defvjp(_permute_fwd, _permute_bwd)


def _pack_cols(arrays):
    """Bitcast 4-byte arrays to int32 columns and concat; returns (packed, meta)."""
    cols = []
    meta = []
    for a in arrays:
        a2 = a[:, None] if a.ndim == 1 else a
        assert a2.ndim == 2 and a2.dtype.itemsize == 4, (a2.shape, a2.dtype)
        c = a2 if a2.dtype == jnp.int32 else jax.lax.bitcast_convert_type(a2, jnp.int32)
        cols.append(c)
        meta.append((a.ndim, a2.shape[1], a2.dtype))
    packed = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
    return packed, meta


def _unpack_cols(g, meta):
    outs = []
    o = 0
    for ndim, k, dt in meta:
        sl = g[:, o : o + k]
        o += k
        if dt != jnp.int32:
            sl = jax.lax.bitcast_convert_type(sl, dt)
        outs.append(sl[:, 0] if ndim == 1 else sl)
    return tuple(outs)


def _gather_packed_impl(arrays, perm):
    packed, meta = _pack_cols(arrays)
    d = packed.shape[1]
    # pad rows to a 128-byte multiple: sub-64-lane row gathers run ~2.5x
    # slower per row on TPU (profiled), and rows are what a gather pays for
    dpad = ((d + 31) // 32) * 32
    if dpad != d:
        packed = jnp.pad(packed, ((0, 0), (0, dpad - d)))
    g = jnp.take(packed, perm, axis=0)
    return _unpack_cols(g, meta)


@jax.custom_vjp
def gather_rows_packed(arrays, perm, inv):
    """ONE wide row gather for many same-length arrays: y_k[i] = x_k[perm[i]].

    All arrays must have 4-byte dtypes and leading dim N; they are bitcast to
    int32 columns, concatenated, padded to a 128-byte row and gathered once —
    replacing k row-rate-bound narrow gathers with a single full-rate one.
    `perm` must be a permutation with inverse `inv` (gradient = gather by inv,
    no scatters; integer arrays get zero tangents).
    """
    return _gather_packed_impl(arrays, perm)


def _gather_packed_fwd(arrays, perm, inv):
    # residuals must be pure JAX types (dtype/shape meta is NOT allowed as a
    # pytree leaf — it breaks the whole grad path); everything the backward
    # needs is derivable from the cotangents, whose shapes/dtypes mirror the
    # inputs one-to-one
    return _gather_packed_impl(arrays, perm), inv


def _gather_packed_bwd(inv, cts):
    # pack cotangents (zeros for integer leaves), gather by the inverse
    ct_arrays = []
    is_zero = []
    for ct in cts:
        f0 = isinstance(ct, np.ndarray) and ct.dtype == jax.dtypes.float0
        is_zero.append(f0)
        ct_arrays.append(jnp.zeros(ct.shape, jnp.float32) if f0 else ct)
    grads = _gather_packed_impl(tuple(ct_arrays), inv)
    out = [
        np.zeros(g.shape, jax.dtypes.float0) if f0 else g
        for g, f0 in zip(grads, is_zero)
    ]
    zi = np.zeros(inv.shape, jax.dtypes.float0)
    return (tuple(out), zi, zi)


gather_rows_packed.defvjp(_gather_packed_fwd, _gather_packed_bwd)
