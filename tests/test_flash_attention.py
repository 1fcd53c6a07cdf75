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


def test_chunked_backward_matches_dense():
    """K > 512 routes through the chunked flash recurrence (VMEM-safe at
    K=1024); grads must match the dense-math reference."""
    import jax
    import jax.numpy as jnp

    from pointcept_tpu.ops.pallas import flash_attention as fa

    assert fa._BWD_CHUNK_THRESHOLD < 768
    rng = np.random.RandomState(0)
    npatch, h, k, d = 1, 2, 768, 8
    qkv = rng.randn(npatch, k, 3, h, d).astype(np.float32) * 0.5

    def loss_pallas(x):
        out = fa.flash_patch_attention_kmajor(x)
        return jnp.sum(jnp.sin(out.astype(jnp.float32)))

    def loss_dense(x):
        q, kk_, v = [x[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        s = jnp.einsum("phkd,phmd->phkm", q * (d**-0.5), kk_)
        p = jax.nn.softmax(s, axis=-1)
        out = jnp.einsum("phkm,phmd->phkd", p, v).transpose(0, 2, 1, 3)
        return jnp.sum(jnp.sin(out))

    g_pallas = jax.grad(loss_pallas)(jnp.asarray(qkv))
    g_dense = jax.grad(loss_dense)(jnp.asarray(qkv))
    # bf16 compute in the kernel
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_dense), atol=3e-2, rtol=3e-2)


def test_chunked_flat_backward_matches_dense():
    import jax
    import jax.numpy as jnp

    from pointcept_tpu.ops.pallas import flash_attention as fa

    rng = np.random.RandomState(1)
    g, k, d = 2, 768, 8
    q = rng.randn(g, k, d).astype(np.float32) * 0.5
    kk_ = rng.randn(g, k, d).astype(np.float32) * 0.5
    v = rng.randn(g, k, d).astype(np.float32) * 0.5

    def loss_pallas(q, kk_, v):
        return jnp.sum(jnp.sin(fa._flash_flat(q, kk_, v, d**-0.5).astype(jnp.float32)))

    def loss_dense(q, kk_, v):
        s = jnp.einsum("gkd,gmd->gkm", q * (d**-0.5), kk_)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.sum(jnp.sin(jnp.einsum("gkm,gmd->gkd", p, v)))

    gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(*map(jnp.asarray, (q, kk_, v)))
    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(*map(jnp.asarray, (q, kk_, v)))
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-2, rtol=3e-2)
