"""gather_rows_packed: packed wide-row gather, forward + custom VJP.

The VJP must survive jax.grad (residuals may hold only JAX types — a dtype
leaf in the residual pytree broke every grad through PointBatch.sort_by) and
must equal the autodiff of plain per-array takes: gradient of a permutation
gather is the inverse-permutation gather.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcept_tpu.ops.permute import gather_rows_packed


@pytest.mark.quick
def test_forward_matches_plain_takes(rng):
    n = 64
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    inv = jnp.zeros(n, jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    arrays = (
        jnp.asarray(rng.randn(n, 5).astype(np.float32)),
        jnp.asarray(rng.randint(0, 100, (n, 3)).astype(np.int32)),
        jnp.asarray(rng.randn(n).astype(np.float32)),
        jnp.asarray(rng.randint(0, 9, n).astype(np.uint32)),
    )
    outs = gather_rows_packed(arrays, perm, inv)
    for a, o in zip(arrays, outs):
        assert o.dtype == a.dtype and o.shape == a.shape
        np.testing.assert_array_equal(np.asarray(o), np.asarray(a)[np.asarray(perm)])


@pytest.mark.quick
def test_grad_is_inverse_gather(rng):
    n = 32
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    inv = jnp.zeros(n, jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    f = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    g = jnp.asarray(rng.randn(n).astype(np.float32))
    ints = jnp.asarray(rng.randint(0, 7, (n, 2)).astype(np.int32))
    w_f = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    w_g = jnp.asarray(rng.randn(n).astype(np.float32))

    def loss_packed(f, g):
        of, oi, og = gather_rows_packed((f, ints, g), perm, inv)
        return jnp.sum(of * w_f) + jnp.sum(og * w_g)

    def loss_plain(f, g):
        return jnp.sum(jnp.take(f, perm, axis=0) * w_f) + jnp.sum(
            jnp.take(g, perm, axis=0) * w_g
        )

    gf, gg = jax.grad(loss_packed, argnums=(0, 1))(f, g)
    gf_ref, gg_ref = jax.grad(loss_plain, argnums=(0, 1))(f, g)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gg), np.asarray(gg_ref), rtol=1e-6)
