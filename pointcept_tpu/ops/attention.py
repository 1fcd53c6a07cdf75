"""Serialized patch attention — the PTv3 hot path, TPU-native.

Reference counterpart: `SerializedAttention`
(`pointcept/models/point_transformer_v3/point_transformer_v3m1_base.py:51-222`),
which gathers qkv along the curve order, pads each scene to a multiple of the
patch size, and runs `flash_attn_varlen_qkvpacked_func` (bf16). Here the padded
layout is fully static (see `PointBatch.patch_partition`), so attention is a
dense batched [num_patches, K, K] softmax-attention — exactly the shape the MXU
wants. Softmax runs in f32 (matching flash-attn's internal accumulation); an
optional additive bias supports the RPE variant (`RPE`, same file `:29-48`).

A fused Pallas flash kernel (`pointcept_tpu/ops/pallas/flash_attention.py`) is
used for large K when available; this module is the always-correct XLA path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def patch_attention(
    qkv: jnp.ndarray,  # [N, 3*C]
    slot_to_point: jnp.ndarray,  # [P]
    point_to_slot: jnp.ndarray,  # [N]
    num_heads: int,
    patch_size: int,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,  # [num_patches, H, K, K]
    compute_dtype=jnp.bfloat16,
    use_pallas: bool = True,
    identity_layout: bool = False,
    valid_n: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Returns [N, C] attention output per point.

    `identity_layout=True` (sorted-persistent layout, single scene, order 0):
    the patch slots are point indices themselves with the reference's
    tail-duplication rule — the padded stream is built with a static roll +
    select instead of per-slot gathers, and the output is a plain slice.
    `valid_n` is the dynamic valid-point count (scenes smaller than one patch
    fall back to the gather path via lax.cond)."""
    n, c3 = qkv.shape
    c = c3 // 3
    h = num_heads
    d = c // h
    k = patch_size
    p = slot_to_point.shape[0]
    assert p % k == 0
    np_ = p // k
    if scale is None:
        scale = d**-0.5

    # the packed K-major kernel holds [K, 3C] tiles + a [K, K] score block in
    # VMEM; beyond C=128 it overflows the 16 MB scoped limit -> wide stages use
    # the split per-(patch, head) kernel
    kmajor_ok = c <= 128
    if (
        identity_layout
        and valid_n is not None
        and use_pallas
        and bias is None
        and _pallas_available()
        and k >= 128
        and d <= 128
        and kmajor_ok
    ):
        from pointcept_tpu.ops.pallas.flash_attention import flash_patch_attention_kmajor

        qb = qkv.astype(compute_dtype)

        # tail-duplication (reference get_padding_and_inverse semantics): rows
        # [valid_n, valid_n + k) read a[row - k]. One dynamic window copy —
        # profiled ~1.5 ms/block cheaper than building a rolled copy and
        # selecting the full stream. Rows beyond valid_n + k are garbage either
        # way (their patches are discarded downstream); p >= n + k guarantees
        # the update window stays in bounds.
        a = jnp.concatenate([qb, jnp.zeros((p - n, c3), qb.dtype)])
        window = jax.lax.dynamic_slice(a, (jnp.maximum(valid_n - k, 0), 0), (k, c3))
        qkv_p = jax.lax.dynamic_update_slice(a, window, (valid_n, 0))
        # valid_n < k (scene smaller than one patch): only patch 0 carries real
        # points and the window trick above would leak garbage rows into it.
        # Correct it with a k-row gather + select instead of a lax.cond over
        # the whole stream — the conditional's operand/result buffer plumbing
        # cost ~1.7 ms/block at full resolution (profiled), the k-row fix ~30 us.
        patch0 = jnp.where(
            valid_n >= k,
            qkv_p[:k],
            jnp.take(qb, jnp.clip(slot_to_point[:k], 0, n - 1), axis=0),
        )
        qkv_p = jax.lax.dynamic_update_slice(qkv_p, patch0, (0, 0))
        out5 = flash_patch_attention_kmajor(qkv_p.reshape(np_, k, 3, h, d), scale=scale)
        return out5.reshape(p, c)[:n].astype(qkv.dtype)

    if use_pallas and bias is None and _pallas_available() and k >= 128 and d <= 128 and kmajor_ok:
        # K-major fused path: one bf16 gather, zero transposes — the packed
        # [P, 3C] layout reshapes freely to [nP, K, 3, H, D] and back
        from pointcept_tpu.ops.pallas.flash_attention import flash_patch_attention_kmajor

        qkv_p = jnp.take(qkv.astype(compute_dtype), slot_to_point, axis=0)  # [P, 3C]
        out5 = flash_patch_attention_kmajor(qkv_p.reshape(np_, k, 3, h, d), scale=scale)
        out = out5.reshape(p, c)
        return jnp.take(out, point_to_slot, axis=0).astype(qkv.dtype)

    if use_pallas and bias is None and _pallas_available() and k >= 128 and d <= 128:
        # wide channels: split per-(patch, head) flash kernel
        from pointcept_tpu.ops.pallas.flash_attention import flash_patch_attention

        qkv_p = jnp.take(qkv.astype(compute_dtype), slot_to_point, axis=0).reshape(np_, k, 3, h, d)
        q = qkv_p[:, :, 0].transpose(0, 2, 1, 3)
        kk_ = qkv_p[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv_p[:, :, 2].transpose(0, 2, 1, 3)
        out = flash_patch_attention(q, kk_, v, scale=scale)  # [nP, H, K, D]
        out = out.transpose(0, 2, 1, 3).reshape(p, c)
        return jnp.take(out, point_to_slot, axis=0).astype(qkv.dtype)

    # dense XLA path (RPE bias / small patches / non-TPU)
    qkv_p = jnp.take(qkv, slot_to_point, axis=0)  # [P, 3C]
    qkv_p = qkv_p.reshape(np_, k, 3, h, d)
    q = qkv_p[:, :, 0].transpose(0, 2, 1, 3).astype(compute_dtype)  # [nP, H, K, D]
    kk = qkv_p[:, :, 1].transpose(0, 2, 1, 3).astype(compute_dtype)
    v = qkv_p[:, :, 2].transpose(0, 2, 1, 3).astype(compute_dtype)
    # full f32 when requested (TPU default matmul precision is bf16-ish)
    prec = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    attn = jnp.einsum(
        "phkd,phmd->phkm", q * scale, kk, preferred_element_type=jnp.float32, precision=prec
    )
    if bias is not None:
        attn = attn + bias
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(compute_dtype)
    out = jnp.einsum("phkm,phmd->phkd", attn, v, preferred_element_type=jnp.float32, precision=prec)

    out = out.transpose(0, 2, 1, 3).reshape(p, c)  # [P, C]
    return jnp.take(out, point_to_slot, axis=0).astype(qkv.dtype)  # [N, C]


def window_attention(
    qkv: jnp.ndarray,  # [N, 3*C] in the layout of the attended order
    scene_counts: jnp.ndarray,  # [S] valid points per scene
    scene_capacity: int,
    num_heads: int,
    patch_size: int,
    scale: Optional[float] = None,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Patch attention over the scene-blocked layout (PointBatch.scene_capacity).

    Scene s occupies rows [s*scene_capacity, (s+1)*scene_capacity); its first
    n_s rows are valid, the rest padding. scene_capacity % patch_size == 0, so
    patches are FIXED windows — no slot gathers, no partition index arrays.
    The reference's tail-duplication rule (`get_padding_and_inverse`,
    point_transformer_v3m1_base.py:141-158) is reproduced by one K-row dynamic
    window splice per scene: rows [n_s, ceil(n_s/K)*K) read row-K-earlier, so
    the scene's last partial patch sees exactly the duplicate keys the
    reference pads with. Scenes smaller than one patch wrap cyclically.
    Outputs at padding rows are garbage (discarded by masked consumers).
    """
    n, c3 = qkv.shape
    c = c3 // 3
    h = num_heads
    d = c // h
    K = patch_size
    S = scene_counts.shape[0]
    assert n == S * scene_capacity and scene_capacity % K == 0
    if scale is None:
        scale = d**-0.5
    qb = qkv.astype(compute_dtype)
    for s in range(S):
        base = s * scene_capacity
        n_s = scene_counts[s]
        # splice the dup window at dest = min(n_s, cap-K): rows [dest, n_s)
        # keep their own values, rows [n_s, dest+K) read row-K-earlier. The
        # min() keeps the static-size window inside the scene region even for
        # full / nearly-full scenes.
        dest = jnp.minimum(n_s, scene_capacity - K)
        w_cur = jax.lax.dynamic_slice(qb, (base + dest, 0), (K, c3))
        w_prev = jax.lax.dynamic_slice(qb, (base + jnp.maximum(dest - K, 0), 0), (K, c3))
        ii = jnp.arange(K, dtype=jnp.int32)[:, None]
        content = jnp.where(ii < n_s - dest, w_cur, w_prev)
        # n_s < K: the scene's only live patch wraps cyclically (reference
        # pads o % n_s); fix patch 0 of the scene with a K-row clip-gather
        wrap = jnp.take(
            qb,
            base + (jnp.arange(K, dtype=jnp.int32) % jnp.maximum(n_s, 1)),
            axis=0,
        )
        small = n_s < K
        content = jnp.where(small, wrap, content)
        dest = jnp.where(small, 0, dest)
        qb = jax.lax.dynamic_update_slice(qb, content, (base + dest, 0))
    np_ = n // K
    if _pallas_available() and K >= 128 and d <= 128 and c <= 128:
        from pointcept_tpu.ops.pallas.flash_attention import flash_patch_attention_kmajor

        out5 = flash_patch_attention_kmajor(qb.reshape(np_, K, 3, h, d), scale=scale)
        return out5.reshape(n, c).astype(qkv.dtype)
    if _pallas_available() and K >= 128 and d <= 128:
        # wide channels (C > 128): split per-(patch, head) flash kernel
        from pointcept_tpu.ops.pallas.flash_attention import flash_patch_attention

        qkv_p = qb.reshape(np_, K, 3, h, d)
        out = flash_patch_attention(
            qkv_p[:, :, 0].transpose(0, 2, 1, 3),
            qkv_p[:, :, 1].transpose(0, 2, 1, 3),
            qkv_p[:, :, 2].transpose(0, 2, 1, 3),
            scale=scale,
        )  # [nP, H, K, D]
        return out.transpose(0, 2, 1, 3).reshape(n, c).astype(qkv.dtype)
    qkv_p = qb.reshape(np_, K, 3, h, d)
    q = qkv_p[:, :, 0].transpose(0, 2, 1, 3)
    kk = qkv_p[:, :, 1].transpose(0, 2, 1, 3)
    v = qkv_p[:, :, 2].transpose(0, 2, 1, 3)
    prec = jax.lax.Precision.HIGHEST if compute_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    attn = jnp.einsum(
        "phkd,phmd->phkm", q * scale, kk, preferred_element_type=jnp.float32, precision=prec
    )
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(compute_dtype)
    out = jnp.einsum("phkm,phmd->phkd", attn, v, preferred_element_type=jnp.float32, precision=prec)
    return out.transpose(0, 2, 1, 3).reshape(n, c).astype(qkv.dtype)


def _pallas_available() -> bool:
    import jax

    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
