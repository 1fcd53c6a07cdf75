"""Fused patch attention (Pallas/TPU) with recompute backward.

The PTv3 hot op: dense softmax attention within fixed-size curve patches
(replaces `flash_attn_varlen_qkvpacked_func`, reference
`point_transformer_v3m1_base.py:208`). Patches are independent [K, D] problems
(K = patch size, typically 1024; D = head dim 16-32), so unlike long-sequence
flash attention no online softmax is needed: per (patch, head) grid cell the
whole K x K score matrix lives in VMEM (K=1024 -> 4 MB f32), is consumed
immediately, and never touches HBM. The custom VJP recomputes scores in the
backward kernel instead of saving softmax weights — O(N·D) memory instead of
O(N·K) — which is what makes 100k-point scenes fit HBM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0]  # [K, D]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [K, K]
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom  # [K, K] f32
    # dV = P^T dO
    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    # dP = dO V^T
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dS = P * (dP - rowsum(dP * P))
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row) * scale  # [K, K]
    dq = jnp.dot(ds, k.astype(jnp.float32), preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _run_fwd(q, k, v, scale):
    g, kk, d = q.shape
    spec = pl.BlockSpec((1, kk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((g, kk, d), q.dtype),
        grid=(g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * kk * kk * d, bytes_accessed=4 * g * kk * d * 4, transcendentals=g * kk * kk
        ),
    )(q, k, v)


def _run_bwd(q, k, v, do, scale):
    g, kk, d = q.shape
    spec = pl.BlockSpec((1, kk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((g, kk, d), q.dtype),
            jax.ShapeDtypeStruct((g, kk, d), q.dtype),
            jax.ShapeDtypeStruct((g, kk, d), q.dtype),
        ),
        grid=(g,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=11 * g * kk * kk * d, bytes_accessed=7 * g * kk * d * 4, transcendentals=g * kk * kk
        ),
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash_flat(q, k, v, scale):
    return _run_fwd(q, k, v, scale)


def _flash_flat_fwd(q, k, v, scale):
    return _run_fwd(q, k, v, scale), (q, k, v)


def _flash_flat_bwd(scale, res, do):
    q, k, v = res
    dq, dk, dv = _run_bwd(q, k, v, do, scale)
    return dq, dk, dv


_flash_flat.defvjp(_flash_flat_fwd, _flash_flat_bwd)


def flash_patch_attention(q, k, v, scale: Optional[float] = None):
    """q,k,v: [nP, H, K, D] (any float dtype). Returns [nP, H, K, D].

    Each (patch, head) is one grid cell; softmax in f32; inputs cast to bf16 for
    the MXU (matching the reference's bf16 flash attention).
    """
    np_, h, kk, d = q.shape
    if scale is None:
        scale = d**-0.5
    dtype = jnp.bfloat16 if q.dtype in (jnp.float32, jnp.bfloat16) else q.dtype
    qf = q.reshape(np_ * h, kk, d).astype(dtype)
    kf = k.reshape(np_ * h, kk, d).astype(dtype)
    vf = v.reshape(np_ * h, kk, d).astype(dtype)
    out = _flash_flat(qf, kf, vf, float(scale))
    return out.reshape(np_, h, kk, d).astype(q.dtype)
