"""Fused Pallas tap-GEMM block conv vs the legacy lax.conv block path.

The two engines must be numerically equivalent (same fill, same neighbor
tables, same weights) in forward AND backward — the fused path's custom VJP
re-derives d_dense via the flipped-weight correlation on the same neighbor
table (ops/block_conv.py `_fused_conv_bwd`), which this test checks against
the XLA autodiff of the lax.conv path.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcept_tpu.ops import serialization as ser
from pointcept_tpu.ops.block_conv import block_subm_conv, build_block_tables


def _scene(rng, n=900, span=30, depth=6, capacity=1024):
    grid = rng.randint(0, span, size=(n, 3)).astype(np.int32)
    grid = np.unique(grid, axis=0)
    n = grid.shape[0]
    pad = capacity - n
    gfull = np.concatenate([grid, np.zeros((pad, 3), np.int32)])
    batch = np.concatenate([np.zeros(n, np.int32), np.full(pad, -1, np.int32)])
    mask = batch >= 0
    keys = ser.encode(jnp.asarray(gfull), jnp.asarray(batch), depth, "z")
    order = ser.argsort_keys(keys, depth)
    return jnp.asarray(gfull), jnp.asarray(batch), jnp.asarray(mask), keys, order, n


@pytest.mark.parametrize(
    "ksz,cin,cout",
    [
        (3, 8, 16),  # banded regime (packed weight tiny)
        (5, 8, 16),  # banded, k=5 (stem)
        (3, 128, 64),  # sliced regime, single weight chunk (f32 banded > 2.5 MB)
    ],
)
def test_fused_matches_lax(rng, ksz, cin, cout):
    cap = 1024
    grid, batch, mask, keys, order, n = _scene(rng, capacity=cap)
    tables = build_block_tables(keys, order, grid, mask, depth=6, block_capacity=256, block_bits=2)
    feat = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(ksz**3, cin, cout).astype(np.float32) * 0.1)
    b = jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)

    def run(fused):
        os.environ["BLOCK_CONV_FUSED" if fused else "BLOCK_CONV_LAX"] = "1"
        try:
            return block_subm_conv(
                feat, tables, w, b, kernel_size=ksz, compute_dtype=jnp.float32
            )
        finally:
            os.environ.pop("BLOCK_CONV_FUSED", None); os.environ.pop("BLOCK_CONV_LAX", None)

    out_lax = np.asarray(run(False))
    out_fused = np.asarray(run(True))
    np.testing.assert_allclose(out_fused[:n], out_lax[:n], rtol=1e-4, atol=1e-4)


def test_fused_chunked_matches_lax(rng, monkeypatch):
    """Force the multi-chunk sliced path (tap-chunked weight + f32 VMEM
    accumulator across the inner grid axis) at test-scale channels."""
    from pointcept_tpu.ops.pallas import tap_conv as tc

    monkeypatch.setattr(tc, "_BANDED_MAX_W", 0)
    monkeypatch.setattr(tc, "_SINGLE_MAX_W", 0)
    monkeypatch.setattr(tc, "_CHUNK_MAX_W", 3 * 16 * 16 * 4)  # -> T = k^2 = 9
    cap = 512
    grid, batch, mask, keys, order, n = _scene(rng, n=300, span=16, capacity=cap)
    tables = build_block_tables(keys, order, grid, mask, depth=6, block_capacity=128, block_bits=2)
    cin, cout = 16, 16
    feat = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)

    def run(fused):
        os.environ["BLOCK_CONV_FUSED" if fused else "BLOCK_CONV_LAX"] = "1"
        try:
            return block_subm_conv(feat, tables, w, None, kernel_size=3, compute_dtype=jnp.float32)
        finally:
            os.environ.pop("BLOCK_CONV_FUSED", None); os.environ.pop("BLOCK_CONV_LAX", None)

    assert tc._plan(4, 3, cin, cout, 4) == ("sliced", 9)
    np.testing.assert_allclose(
        np.asarray(run(True))[:n], np.asarray(run(False))[:n], rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("cin,cout", [(8, 8), (128, 64)])
def test_fused_grads_match_lax(rng, cin, cout):
    cap = 512
    grid, batch, mask, keys, order, n = _scene(rng, n=300, span=16, capacity=cap)
    tables = build_block_tables(keys, order, grid, mask, depth=6, block_capacity=128, block_bits=2)
    feat = jnp.asarray(rng.randn(cap, cin).astype(np.float32))
    w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32) * 0.1)
    tgt = jnp.asarray(rng.randn(cap, cout).astype(np.float32))
    msk = jnp.asarray(mask)

    def loss(feat, w, fused):
        os.environ["BLOCK_CONV_FUSED" if fused else "BLOCK_CONV_LAX"] = "1"
        try:
            out = block_subm_conv(feat, tables, w, None, kernel_size=3, compute_dtype=jnp.float32)
            return jnp.sum(jnp.where(msk[:, None], (out - tgt) ** 2, 0.0))
        finally:
            os.environ.pop("BLOCK_CONV_FUSED", None); os.environ.pop("BLOCK_CONV_LAX", None)

    gf_lax, gw_lax = jax.grad(lambda f, w: loss(f, w, False), argnums=(0, 1))(feat, w)
    gf_fused, gw_fused = jax.grad(lambda f, w: loss(f, w, True), argnums=(0, 1))(feat, w)
    np.testing.assert_allclose(np.asarray(gf_fused), np.asarray(gf_lax), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gw_fused), np.asarray(gw_lax), rtol=1e-3, atol=1e-3)
