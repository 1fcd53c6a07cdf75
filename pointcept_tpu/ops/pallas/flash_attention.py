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


# above this patch size the whole-K backward's [K, K] temporaries risk VMEM
# overflow; use the chunked recurrence instead
_BWD_CHUNK_THRESHOLD = 512
_BWD_CHUNK = 256


def _bwd_compiler_params():
    # the chunked backward's unrolled per-head temporaries exceed the
    # conservative 16 MB default scoped-vmem limit at C=128 (measured 23.8 MB
    # on v5e, which has far more physical VMEM); raise the cap for bwd only
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _fwd_compiler_params():
    # the head-PACKED forward holds full-C q/k/v tiles + a [K, C] f32 output
    # accumulator besides the [K, K] score block: 29.5 MB scoped at C=128
    # (v5e has 128 MB physical VMEM)
    return pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)




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
    # 1/denom folded into the [K, D] output rows: one fewer [K, K] VPU pass
    o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32) / denom
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
        compiler_params=_fwd_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=4 * g * kk * kk * d, bytes_accessed=4 * g * kk * d * 4, transcendentals=g * kk * kk
        ),
    )(q, k, v)


def _bwd_kernel_chunked(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, chunk):
    """K-chunked recompute backward for the split layout (see the kmajor
    chunked kernel for the recurrence); [K, chunk] temporaries instead of
    five [K, K] blocks."""
    q = q_ref[0]
    do = do_ref[0].astype(jnp.float32)
    kk, d = q.shape
    nchunks = kk // chunk

    def score(j):
        kj = k_ref[0][j * chunk : (j + 1) * chunk, :]
        return (
            jax.lax.dot_general(q, kj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            * scale
        )

    m = jnp.full((kk, 1), -jnp.inf, jnp.float32)
    denom = jnp.zeros((kk, 1), jnp.float32)
    for j in range(nchunks):
        s = score(j)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        denom = denom * jnp.exp(m - m_new) + jnp.sum(jnp.exp(s - m_new), axis=-1, keepdims=True)
        m = m_new

    o = jnp.zeros((kk, d), jnp.float32)
    for j in range(nchunks):
        p = jnp.exp(score(j) - m) / denom
        o = o + jnp.dot(p.astype(q.dtype), v_ref[0][j * chunk : (j + 1) * chunk, :], preferred_element_type=jnp.float32)
    row = jnp.sum(do * o, axis=-1, keepdims=True)

    dq = jnp.zeros((kk, d), jnp.float32)
    for j in range(nchunks):
        sl = slice(j * chunk, (j + 1) * chunk)
        p = jnp.exp(score(j) - m) / denom
        vj = v_ref[0][sl, :].astype(jnp.float32)
        dp = jax.lax.dot_general(do, vj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - row) * scale
        kj = k_ref[0][sl, :].astype(jnp.float32)
        dq = dq + jnp.dot(ds, kj, preferred_element_type=jnp.float32)
        dk_ref[0, sl, :] = jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dk_ref.dtype)
        dv_ref[0, sl, :] = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _run_bwd(q, k, v, do, scale):
    g, kk, d = q.shape
    spec = pl.BlockSpec((1, kk, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    if kk > _BWD_CHUNK_THRESHOLD and kk % _BWD_CHUNK == 0:
        kernel = functools.partial(_bwd_kernel_chunked, scale=scale, chunk=_BWD_CHUNK)
        flops = 17 * g * kk * kk * d
    else:
        kernel = functools.partial(_bwd_kernel, scale=scale)
        flops = 11 * g * kk * kk * d
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((g, kk, d), q.dtype),
            jax.ShapeDtypeStruct((g, kk, d), q.dtype),
            jax.ShapeDtypeStruct((g, kk, d), q.dtype),
        ),
        grid=(g,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        interpret=_use_interpret(),
        compiler_params=_bwd_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=7 * g * kk * d * 4, transcendentals=2 * g * kk * kk
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


def _fwd_kernel_kmajor(qkv_ref, o_ref, *, scale, h, d):
    """Head-PACKED score/AV matmuls: a [K, D=16] per-head contraction uses
    1/8 of the MXU's 128-deep systolic array (and a [K, K] @ [K, 16] AV only
    16 of 128 output lanes). Instead every matmul runs at the full C = H*D
    width: scores contract a lane-MASKED q against the full k (zero lanes
    add exact zeros -> S_h bit-identical), AV multiplies the full v and
    slices head h's block. Executed FLOPs grow H-fold but utilization grows
    128/D-fold: net 4x at C=32, 2x at C=64, break-even at C=128."""
    c = h * d
    qkv = qkv_ref[0]
    qf = qkv[:, :c]
    kf = qkv[:, c : 2 * c]
    vf = qkv[:, 2 * c : 3 * c]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    for hh in range(h):
        if h == 1:
            qm = qf
        else:
            qm = jnp.where((lane >= hh * d) & (lane < (hh + 1) * d), qf, jnp.zeros_like(qf))
        s = jax.lax.dot_general(
            qm, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        # fold 1/denom into the [K, C] output rows instead of normalizing the
        # [K, K] matrix: one fewer full-matrix VPU pass (softmax passes, not
        # the packed MXU matmuls, bound this kernel)
        o = jnp.dot(p.astype(vf.dtype), vf, preferred_element_type=jnp.float32) / denom
        o_ref[0, :, hh * d : (hh + 1) * d] = o[:, hh * d : (hh + 1) * d].astype(o_ref.dtype)


def _bwd_kernel_kmajor(qkv_ref, do_ref, dqkv_ref, *, scale, h, d):
    """Head-packed like the forward: every matmul contracts/produces the full
    C = H*D lanes (masked q / masked dO make the extra lanes exact zeros; the
    head's block is sliced out of each [K, C] product). See _fwd_kernel_kmajor."""
    c = h * d
    qkv = qkv_ref[0]
    qf = qkv[:, :c].astype(jnp.float32)
    kf = qkv[:, c : 2 * c].astype(jnp.float32)
    vf = qkv[:, 2 * c : 3 * c].astype(jnp.float32)
    dof = do_ref[0].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    for hh in range(h):
        if h == 1:
            qm, dom = qf, dof
        else:
            sel = (lane >= hh * d) & (lane < (hh + 1) * d)
            qm = jnp.where(sel, qf, 0.0)
            dom = jnp.where(sel, dof, 0.0)
        blk = slice(hh * d, (hh + 1) * d)
        s = jax.lax.dot_general(
            qm, kf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        denom = jnp.sum(e, axis=-1, keepdims=True)
        p = e / denom
        # dV_h = P_h^T dO_h -> (P^T dOm)[:, h-block]
        dv = jax.lax.dot_general(p, dom, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        # dP_h = dO_h V_h^T -> dOm vf^T (zero lanes add zeros)
        dp = jax.lax.dot_general(
            dof if h == 1 else dom, vf, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        row = jnp.sum(dp * p, axis=-1, keepdims=True)
        ds = p * (dp - row) * scale
        dq = jnp.dot(ds, kf, preferred_element_type=jnp.float32)
        dk = jax.lax.dot_general(
            ds, qf, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dqkv_ref[0, :, hh * d : (hh + 1) * d] = dq[:, blk].astype(dqkv_ref.dtype)
        dqkv_ref[0, :, c + hh * d : c + (hh + 1) * d] = dk[:, blk].astype(dqkv_ref.dtype)
        dqkv_ref[0, :, 2 * c + hh * d : 2 * c + (hh + 1) * d] = dv[:, blk].astype(dqkv_ref.dtype)


def _bwd_kernel_kmajor_chunked(qkv_ref, do_ref, dqkv_ref, *, scale, h, d, chunk):
    """K-chunked recompute backward: the whole-K kernel holds five [K, K] f32
    temporaries per head (~20 MB at K=1024) and can overflow VMEM; this
    variant streams key/value chunks so temporaries are [K, chunk].

    Three passes per head over the chunks (classic flash recurrence):
      A. online-softmax stats (running max m, denominator);
      B. recompute p to accumulate o (row term = do·o);
      C. recompute p for dq/dk/dv.

    Head-packed like the whole-K kernels: matmuls run at the full C lanes
    with masked q/dO (exact-zero extra lanes), head blocks sliced out."""
    c = h * d
    kk = qkv_ref.shape[1]
    nchunks = kk // chunk
    qkv = qkv_ref[0]
    qf = qkv[:, :c].astype(jnp.float32)
    dof_all = do_ref[0].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, c), 1)
    for hh in range(h):
        if h == 1:
            qm, dom = qf, dof_all
        else:
            sel = (lane >= hh * d) & (lane < (hh + 1) * d)
            qm = jnp.where(sel, qf, 0.0)
            dom = jnp.where(sel, dof_all, 0.0)
        blk = slice(hh * d, (hh + 1) * d)

        def score(j):
            kj = qkv[j * chunk : (j + 1) * chunk, c : 2 * c].astype(jnp.float32)
            return (
                jax.lax.dot_general(
                    qm, kj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
                )
                * scale
            )  # [K, chunk]

        def vchunk(j):
            return qkv[j * chunk : (j + 1) * chunk, 2 * c : 3 * c]

        # pass A: running softmax stats
        m = jnp.full((kk, 1), -jnp.inf, jnp.float32)
        denom = jnp.zeros((kk, 1), jnp.float32)
        for j in range(nchunks):
            s = score(j)
            mj = jnp.max(s, axis=-1, keepdims=True)
            m_new = jnp.maximum(m, mj)
            denom = denom * jnp.exp(m - m_new) + jnp.sum(
                jnp.exp(s - m_new), axis=-1, keepdims=True
            )
            m = m_new

        # pass B: o accumulation -> row = sum_k p*dp = do . o (masked dO zeros
        # the garbage lanes of the packed o product)
        o = jnp.zeros((kk, c), jnp.float32)
        for j in range(nchunks):
            p = jnp.exp(score(j) - m) / denom
            o = o + jnp.dot(
                p.astype(qkv_ref.dtype), vchunk(j), preferred_element_type=jnp.float32
            )
        row = jnp.sum(dom * o, axis=-1, keepdims=True)

        # pass C: gradients
        dq = jnp.zeros((kk, c), jnp.float32)
        for j in range(nchunks):
            p = jnp.exp(score(j) - m) / denom  # [K, chunk]
            vj = vchunk(j).astype(jnp.float32)
            dp = jax.lax.dot_general(
                dom, vj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [K, chunk]
            ds = p * (dp - row) * scale
            kj = qkv[j * chunk : (j + 1) * chunk, c : 2 * c].astype(jnp.float32)
            dq = dq + jnp.dot(ds, kj, preferred_element_type=jnp.float32)
            dk = jax.lax.dot_general(
                ds, qf, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [chunk, C]
            dv = jax.lax.dot_general(
                p, dom, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # [chunk, C]
            sl = slice(j * chunk, (j + 1) * chunk)
            dqkv_ref[0, sl, c + hh * d : c + (hh + 1) * d] = dk[:, blk].astype(dqkv_ref.dtype)
            dqkv_ref[0, sl, 2 * c + hh * d : 2 * c + (hh + 1) * d] = dv[:, blk].astype(dqkv_ref.dtype)
        dqkv_ref[0, :, hh * d : (hh + 1) * d] = dq[:, blk].astype(dqkv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _flash_kmajor(qkv3, scale, h, d):
    return _run_fwd_kmajor(qkv3, scale, h, d)


def _run_fwd_kmajor(qkv3, scale, h, d):
    np_, kk, c3 = qkv3.shape
    c = c3 // 3
    spec_in = pl.BlockSpec((1, kk, c3), lambda p: (p, 0, 0), memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((1, kk, c), lambda p: (p, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_kmajor, scale=scale, h=h, d=d),
        out_shape=jax.ShapeDtypeStruct((np_, kk, c), qkv3.dtype),
        grid=(np_,),
        in_specs=[spec_in],
        out_specs=spec_out,
        interpret=_use_interpret(),
        compiler_params=_fwd_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=4 * np_ * h * kk * kk * d,
            bytes_accessed=4 * np_ * kk * c * 2,
            transcendentals=np_ * h * kk * kk,
        ),
    )(qkv3)


def _flash_kmajor_fwd(qkv3, scale, h, d):
    return _run_fwd_kmajor(qkv3, scale, h, d), (qkv3,)


def _flash_kmajor_bwd(scale, h, d, res, do):
    (qkv3,) = res
    np_, kk, c3 = qkv3.shape
    c = c3 // 3
    spec_in = pl.BlockSpec((1, kk, c3), lambda p: (p, 0, 0), memory_space=pltpu.VMEM)
    spec_do = pl.BlockSpec((1, kk, c), lambda p: (p, 0, 0), memory_space=pltpu.VMEM)
    if kk > _BWD_CHUNK_THRESHOLD and kk % _BWD_CHUNK == 0:
        kernel = functools.partial(
            _bwd_kernel_kmajor_chunked, scale=scale, h=h, d=d, chunk=_BWD_CHUNK
        )
        flops = 17 * np_ * h * kk * kk * d  # ~1.5x recompute of the one-pass bwd
    else:
        kernel = functools.partial(_bwd_kernel_kmajor, scale=scale, h=h, d=d)
        flops = 11 * np_ * h * kk * kk * d
    dqkv = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((np_, kk, c3), qkv3.dtype),
        grid=(np_,),
        in_specs=[spec_in, spec_do],
        out_specs=spec_in,
        interpret=_use_interpret(),
        compiler_params=_bwd_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=7 * np_ * kk * c * 2,
            transcendentals=2 * np_ * h * kk * kk,
        ),
    )(qkv3, do)
    return (dqkv,)


_flash_kmajor.defvjp(_flash_kmajor_fwd, _flash_kmajor_bwd)


def flash_patch_attention_kmajor(qkv5: jnp.ndarray, scale: Optional[float] = None):
    """qkv5: [nP, K, 3, H, D] (K-major packed layout — a free reshape of the
    slot-gathered [P, 3C]). Returns [nP, K, H, D] (reshapes freely to [P, C]).

    Avoids all [nP,H,K,D] transposes of the split layout; one grid cell per
    patch loops heads over lane slices of the packed [K, 3C] tile.
    """
    np_, kk, three, h, d = qkv5.shape
    assert three == 3
    if scale is None:
        scale = d**-0.5
    dtype = jnp.bfloat16 if qkv5.dtype in (jnp.float32, jnp.bfloat16) else qkv5.dtype
    qkv3 = qkv5.reshape(np_, kk, 3 * h * d).astype(dtype)
    out = _flash_kmajor(qkv3, float(scale), h, d)  # [nP, K, C]
    return out.reshape(np_, kk, h, d)


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
