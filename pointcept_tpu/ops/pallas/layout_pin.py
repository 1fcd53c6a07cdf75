"""Row-major layout pin: a trivial Pallas identity copy.

XLA layout assignment propagates consumer-preferred layouts backwards through
gathers. For the block-conv take-back (`ops/block_conv.py`) a norm consumer
that reduces over rows can flip the whole gather chain to a row-minor {0,1}
layout, turning a 0.8-3.8 ms streaming row gather into a 13.7 ms lane-crossing
one plus a pre-transpose copy of the dense conv output (profiled on the
ScanNet bench, see docs/PERFORMANCE.md). Pallas custom calls have fixed
row-major operand/result layouts, so inserting this identity right after the
gather blocks the backward propagation: the gather keeps {1,0} on both sides
and any consumer that truly wants a different layout pays one cheap compact-
array copy instead.

The copy itself moves [N, C] once through VMEM (~0.07 ms at [409600, 32]).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def pin_rowmajor(x: jnp.ndarray) -> jnp.ndarray:
    """Identity with fixed row-major layout on both sides (2D arrays)."""
    return _pin_impl(x)


def _pin_impl(x: jnp.ndarray) -> jnp.ndarray:
    if x.ndim != 2:
        return x
    n, c = x.shape
    rows = 4096
    grid = (n + rows - 1) // rows
    return pl.pallas_call(
        _copy_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, c), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows, c), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c), x.dtype),
        interpret=_use_interpret(),
    )(x)


def _pin_fwd(x):
    return _pin_impl(x), None


def _pin_bwd(_, g):
    # gradient of identity; pin the cotangent too (the backward gather chain
    # has the same layout hazard)
    return (_pin_impl(g),)


pin_rowmajor.defvjp(_pin_fwd, _pin_bwd)
