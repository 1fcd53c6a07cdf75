import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.ops.pallas.flash_attention import flash_patch_attention


def reference_attention(q, k, v, scale):
    s = np.einsum("phkd,phmd->phkm", q, k) * scale
    s = s - s.max(-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("phkm,phmd->phkd", p, v)


def test_flash_forward_matches_reference():
    rng = np.random.RandomState(0)
    np_, h, k, d = 3, 2, 128, 16
    q = rng.randn(np_, h, k, d).astype(np.float32)
    kk = rng.randn(np_, h, k, d).astype(np.float32)
    v = rng.randn(np_, h, k, d).astype(np.float32)
    scale = d**-0.5
    out = np.asarray(flash_patch_attention(jnp.asarray(q), jnp.asarray(kk), jnp.asarray(v), scale))
    expect = reference_attention(q, kk, v, scale)
    # bf16 compute tolerance
    np.testing.assert_allclose(out, expect, atol=2e-2, rtol=2e-2)


def test_flash_backward_matches_autodiff():
    rng = np.random.RandomState(1)
    np_, h, k, d = 2, 2, 128, 16
    q = jnp.asarray(rng.randn(np_, h, k, d).astype(np.float32) * 0.5)
    kk = jnp.asarray(rng.randn(np_, h, k, d).astype(np.float32) * 0.5)
    v = jnp.asarray(rng.randn(np_, h, k, d).astype(np.float32) * 0.5)
    scale = d**-0.5

    def loss_flash(q, kk, v):
        return jnp.sum(flash_patch_attention(q, kk, v, scale) ** 2)

    def loss_ref(q, kk, v):
        s = jnp.einsum("phkd,phmd->phkm", q, kk) * scale
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("phkm,phmd->phkd", p, v)
        return jnp.sum(o**2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, kk, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kk, v)
    for a, b in zip(g1, g2):
        na = np.asarray(a)
        nb = np.asarray(b)
        denom = np.abs(nb).max() + 1e-6
        assert np.abs(na - nb).max() / denom < 5e-2
