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


def _fwd_kernel_kmajor(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[0, :, 0, 0]  # [K, D]
    k = k_ref[0, :, 0, 0]
    v = v_ref[0, :, 0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o = jnp.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[0, :, 0] = o.astype(o_ref.dtype)


def _bwd_kernel_kmajor(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale):
    q = q_ref[0, :, 0, 0]
    k = k_ref[0, :, 0, 0]
    v = v_ref[0, :, 0, 0]
    do = do_ref[0, :, 0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    p = e / denom
    dv = jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(
        do, v.astype(jnp.float32), (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - row) * scale
    dq = jnp.dot(ds, k.astype(jnp.float32), preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0, :, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, :, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, :, 0] = dv.astype(dv_ref.dtype)


def _kmajor_specs(kk, h, d):
    def qkv_spec(which):
        return pl.BlockSpec((1, kk, 1, 1, d), lambda p, hh: (p, 0, which, hh, 0), memory_space=pltpu.VMEM)

    o_spec = pl.BlockSpec((1, kk, 1, d), lambda p, hh: (p, 0, hh, 0), memory_space=pltpu.VMEM)
    return qkv_spec, o_spec


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _flash_kmajor(qkv5, scale):
    return _run_fwd_kmajor(qkv5, scale)


def _run_fwd_kmajor(qkv5, scale):
    np_, kk, _, h, d = qkv5.shape
    qkv_spec, o_spec = _kmajor_specs(kk, h, d)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_kmajor, scale=scale),
        out_shape=jax.ShapeDtypeStruct((np_, kk, h, d), qkv5.dtype),
        grid=(np_, h),
        in_specs=[qkv_spec(0), qkv_spec(1), qkv_spec(2)],
        out_specs=o_spec,
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=4 * np_ * h * kk * kk * d,
            bytes_accessed=4 * np_ * h * kk * d * 2,
            transcendentals=np_ * h * kk * kk,
        ),
    )(qkv5, qkv5, qkv5)


def _flash_kmajor_fwd(qkv5, scale):
    return _run_fwd_kmajor(qkv5, scale), (qkv5,)


def _flash_kmajor_bwd(scale, res, do):
    (qkv5,) = res
    np_, kk, _, h, d = qkv5.shape
    qkv_spec, o_spec = _kmajor_specs(kk, h, d)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_kmajor, scale=scale),
        out_shape=(
            jax.ShapeDtypeStruct((np_, kk, h, d), qkv5.dtype),
            jax.ShapeDtypeStruct((np_, kk, h, d), qkv5.dtype),
            jax.ShapeDtypeStruct((np_, kk, h, d), qkv5.dtype),
        ),
        grid=(np_, h),
        in_specs=[qkv_spec(0), qkv_spec(1), qkv_spec(2), o_spec],
        out_specs=(o_spec, o_spec, o_spec),
        interpret=_use_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=11 * np_ * h * kk * kk * d,
            bytes_accessed=7 * np_ * h * kk * d * 2,
            transcendentals=np_ * h * kk * kk,
        ),
    )(qkv5, qkv5, qkv5, do)
    return (jnp.stack([dq, dk, dv], axis=2),)


_flash_kmajor.defvjp(_flash_kmajor_fwd, _flash_kmajor_bwd)


def flash_patch_attention_kmajor(qkv5: jnp.ndarray, scale: Optional[float] = None):
    """qkv5: [nP, K, 3, H, D] (K-major packed layout — a free reshape of the
    slot-gathered [P, 3C]). Returns [nP, K, H, D] (reshapes freely to [P, C]).

    Avoids all [nP,H,K,D] transposes of the split layout; each (patch, head)
    grid cell reads its strided [K, D] slices directly.
    """
    np_, kk, three, h, d = qkv5.shape
    assert three == 3
    if scale is None:
        scale = d**-0.5
    dtype = jnp.bfloat16 if qkv5.dtype in (jnp.float32, jnp.bfloat16) else qkv5.dtype
    return _flash_kmajor(qkv5.astype(dtype), float(scale))


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
