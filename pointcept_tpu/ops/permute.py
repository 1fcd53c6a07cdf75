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
