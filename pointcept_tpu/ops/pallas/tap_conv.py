"""Fused block-dense conv kernels: in-VMEM xy-im2col + deep MXU matmuls.

The block-dense sparse conv (ops/block_conv.py) previously ran
`lax.conv_general_dilated` over [R, H, H, H, C] halo tiles. XLA's conv wants
exotic NDHWC tilings, so every conv was bracketed by 5-D layout copies
(~1.8 ms each at full resolution, several per conv — the round-2b profile's
20.5% layout/copy bucket) and ran at shallow contraction depth (K = Cin).

Mosaic vectors are 2-D-tiled (sublanes x lanes); a naive in-kernel
[G, H^3*C] -> [G, H, H, H, C] reshape is an unsupported shape cast. So the
kernels never leave 2-D: the halo tile arrives as [G, H^2, H*C] — rows are
(x, y) raster pairs, lanes are (z, c) — a bit-identical (free) XLA reshape of
the flat [R, H^3*C] output of `_halo_expand_flat` in ops/block_conv.py. The
xy im2col is b static sublane slices per (dx, dy) tap, concatenated to
[b^2, *]; the z taps need one of two tricks (VMEM is ~16 MB/core, so the
choice is channel-size dependent):

* BANDED (small channels, packed weight <= ~2.5 MB): `pack_w2` zero-pads
  w[dx,dy,dz] into a block-banded [k^2*H*Cin, b*Cout] matrix (band
  z_in = oz + dz), so ONE dot_general applies all k^3 taps at contraction
  depth k^2*H*Cin (1728 at C=32) — the MXU runs near peak instead of at
  depth Cin. The zero band costs H/k extra FLOPs (2.0x at b=4, k=3), far
  cheaper than the layout copies it removes.

* SLICED (large channels): for each output plane oz, the needed z window
  z_in in [oz, oz+k) is the CONTIGUOUS lane slice [oz*Cin : (oz+k)*Cin] of
  the halo row — multiples of Cin, i.e. 128-aligned exactly when this
  regime activates (Cin >= 128). The im2col per (dx, dy) tap and oz is
  [b^2, k*Cin], all k^2 taps concat to [b^2, k^3*Cin], multiplied by the
  ORIGINAL flat weight [k^3*Cin, Cout]: exact FLOPs, no band inflation, no
  packed-weight materialization. When even the flat weight exceeds ~4 MB
  (512x512: 14 MB bf16), it is chunked over the k^2 (dx, dy) taps with an
  f32 VMEM accumulator across an inner grid axis.

The output [G*b^2, b*Cout] has rows (g, ox, oy) and lanes (oz, co): flattening
outside the kernel is again a free reshape to the engine's [R*b^3, Cout]
raster layout. No NDHWC tensor exists anywhere, so XLA emits zero 5-D layout
copies. The VJP (wired in ops/block_conv.py) reuses the same kernels: d_dense
is the halo expansion of the output cotangent convolved with the
flipped-transposed weight (correlation/conv duality on the same neighbor
table — no scatters), and dW accumulates im2col^T @ g tile-by-tile.

Reference counterpart: spconv SubMConv3d (used by PTv3 stem/xCPE,
`point_transformer_v3m1_base.py:277-287,498`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM sizing knobs (bytes). ~16 MB/core total; inputs are double-buffered.
_BANDED_MAX_W = int(2.5 * 2**20)  # banded packed weight, resident whole
_SINGLE_MAX_W = 4 * 2**20  # sliced flat weight, resident whole (T=1)
_CHUNK_MAX_W = 2 * 2**20  # sliced per-tap-chunk weight block (T>1)
_HALO_MAX = 2 * 2**20  # halo tile block per grid step


def _use_interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def pack_w2(weight: jnp.ndarray, b: int, k: int, dtype) -> jnp.ndarray:
    """[k^3, Cin, Cout] -> block-banded [k^2*H*Cin, b*Cout], H = b + k - 1.

    Row index (dx, dy, z_in, ci), column index (oz, co);
    entry = w[dx, dy, z_in - oz, ci, co] when 0 <= z_in - oz < k, else 0.
    """
    cin, cout = weight.shape[1], weight.shape[2]
    hsz = b + k - 1
    w5 = weight.reshape(k, k, k, cin, cout)
    cols = []
    for oz in range(b):
        # place the k z-taps at z_in = oz + dz
        cols.append(jnp.pad(w5, ((0, 0), (0, 0), (oz, hsz - oz - k), (0, 0), (0, 0))))
    w6 = jnp.stack(cols, axis=4)  # [k, k, hsz, cin, b, cout]
    return w6.reshape(k * k * hsz * cin, b * cout).astype(dtype)


def unpack_dw2(dw2: jnp.ndarray, b: int, k: int, cin: int, cout: int) -> jnp.ndarray:
    """Band-sum the [k^2*H*Cin, b*Cout] weight cotangent back to [k^3, Cin, Cout].

    Each w[dx,dy,dz] element appears once per oz at z_in = oz + dz; its grad
    is the sum over that band (adjoint of `pack_w2`'s zero-padding)."""
    hsz = b + k - 1
    w6 = dw2.reshape(k, k, hsz, cin, b, cout)
    taps = []
    for dz in range(k):
        # sum over oz of w6[:, :, oz + dz, :, oz, :]
        band = jnp.stack([w6[:, :, oz + dz, :, oz, :] for oz in range(b)], axis=0)
        taps.append(jnp.sum(band, axis=0))  # [k, k, cin, cout]
    return jnp.stack(taps, axis=2).reshape(k * k * k, cin, cout)


def _plan(b: int, k: int, cin: int, cout: int, itemsize: int):
    """-> (regime, n_chunks). regime 'banded' | 'sliced'."""
    hsz = b + k - 1
    banded = k * k * hsz * cin * b * cout * itemsize
    if banded <= _BANDED_MAX_W:
        return "banded", 1
    flat = k * k * k * cin * cout * itemsize
    if flat <= _SINGLE_MAX_W:
        return "sliced", 1
    # chunk the k^2 (dx, dy) taps; T must divide k^2 to keep blocks uniform
    for t in (k, k * k):  # T=k -> per-dx slabs, T=k^2 -> per-tap
        if flat // t <= _CHUNK_MAX_W:
            return "sliced", t
    return "sliced", k * k


def _pick_group(r: int, b: int, k: int, cin: int, itemsize: int) -> int:
    """Blocks per grid step: >=128 im2col rows when possible, halo tile
    bounded, and divides r (grouped fills pad R to a multiple of 8)."""
    hsz = b + k - 1
    row_bytes = hsz * hsz * hsz * cin * itemsize
    group = max(1, 128 // (b * b))
    while group > 1 and (r % group or group * row_bytes > _HALO_MAX):
        group //= 2
    return group


def _tap_rows(h2, dx: int, dy: int, b: int, hsz: int, lanes):
    """The b^2 output rows of tap (dx, dy): sublane slices of [H^2, H*C]."""
    return jnp.concatenate(
        [h2[(ox + dx) * hsz + dy : (ox + dx) * hsz + dy + b, lanes] for ox in range(b)],
        axis=0,
    )  # [b^2, width(lanes)]


def _im2col_banded(halo_ref, b: int, k: int, g: int):
    """[G, H^2, H*C] ref -> [G*b^2, k^2*H*C] im2col (full z lanes per tap)."""
    hsz = b + k - 1
    full = slice(None)
    ims = []
    for gi in range(g):
        h2 = halo_ref[gi]
        taps = [_tap_rows(h2, dx, dy, b, hsz, full) for dx in range(k) for dy in range(k)]
        ims.append(jnp.concatenate(taps, axis=1))  # [b^2, k^2*H*C]
    return jnp.concatenate(ims, axis=0) if len(ims) > 1 else ims[0]


def _im2col_sliced(halo_ref, b: int, k: int, g: int, cin: int, taps, oz: int):
    """[G, H^2, H*C] ref -> [G*b^2, len(taps)*k*C] for output plane oz.

    Lane slice [oz*C : (oz+k)*C] is the z window z_in in [oz, oz+k) — the
    lanes of each tap column are (dz, ci), matching the flat weight's
    (dx, dy, dz, ci) row order when taps are C-ordered."""
    hsz = b + k - 1
    lanes = slice(oz * cin, (oz + k) * cin)
    ims = []
    for gi in range(g):
        h2 = halo_ref[gi]
        cols = [_tap_rows(h2, dx, dy, b, hsz, lanes) for (dx, dy) in taps]
        ims.append(jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0])
    return jnp.concatenate(ims, axis=0) if len(ims) > 1 else ims[0]


def _tap_chunks(k: int, n_chunks: int):
    taps = [(dx, dy) for dx in range(k) for dy in range(k)]
    per = (k * k) // n_chunks
    return [tuple(taps[j * per : (j + 1) * per]) for j in range(n_chunks)]


def _conv_kernel_banded(halo_ref, w_ref, out_ref, *, b, k, g):
    im = _im2col_banded(halo_ref, b, k, g)
    out_ref[...] = jax.lax.dot_general(
        im, w_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _conv_kernel_sliced(halo_ref, w_ref, out_ref, acc, *, b, k, g, cin, chunks):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for j, taps in enumerate(chunks):

        @pl.when(t == j)
        def _(taps=taps):
            cols = []
            for oz in range(b):
                im = _im2col_sliced(halo_ref, b, k, g, cin, taps, oz)
                cols.append(
                    jax.lax.dot_general(
                        im,
                        w_ref[...],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )  # [G*b^2, Cout]
            acc[...] += jnp.concatenate(cols, axis=1)  # lanes (oz, co)

    @pl.when(t == len(chunks) - 1)
    def _():
        out_ref[...] = acc[...].astype(out_ref.dtype)


def tap_conv(
    halo_flat: jnp.ndarray,  # [R, H^3*Cin] bf16/f32, H = b + k - 1, raster x-major
    weight: jnp.ndarray,  # [k^3, Cin, Cout]
    b: int,
    k: int,
    cin: int,
    group: int = 0,
) -> jnp.ndarray:
    """Dense block conv: returns [R*b^3, Cout] in halo_flat's dtype."""
    r = halo_flat.shape[0]
    hsz = b + k - 1
    b3 = b**3
    cout = weight.shape[2]
    dt = halo_flat.dtype
    it = dt.itemsize
    regime, n_chunks = _plan(b, k, cin, cout, it)
    halo3 = halo_flat.reshape(r, hsz * hsz, hsz * cin)
    group = group or _pick_group(r, b, k, cin, it)
    grid_r = r // group
    cost = pl.CostEstimate(
        flops=2 * r * b3 * (k**3) * cin * cout,
        bytes_accessed=r * halo_flat.shape[1] * it + r * b3 * cout * it,
        transcendentals=0,
    )
    halo_spec = pl.BlockSpec(
        (group, hsz * hsz, hsz * cin), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM
    )
    if regime == "banded":
        w2 = pack_w2(weight, b, k, dt)
        out = pl.pallas_call(
            functools.partial(_conv_kernel_banded, b=b, k=k, g=group),
            grid=(grid_r,),
            in_specs=[
                halo_spec,
                pl.BlockSpec(w2.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group * b * b, b * cout), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((r * b * b, b * cout), dt),
            interpret=_use_interpret(),
            cost_estimate=cost,
        )(halo3, w2)
    else:
        chunks = _tap_chunks(k, n_chunks)
        w2 = weight.reshape(k**3 * cin, cout).astype(dt)
        wrows = w2.shape[0] // n_chunks  # = len(chunk)*k*cin
        out = pl.pallas_call(
            functools.partial(
                _conv_kernel_sliced, b=b, k=k, g=group, cin=cin, chunks=chunks
            ),
            grid=(grid_r, n_chunks),
            in_specs=[
                halo_spec,
                pl.BlockSpec((wrows, cout), lambda i, t: (t, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((group * b * b, b * cout), lambda i, t: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((r * b * b, b * cout), dt),
            scratch_shapes=[pltpu.VMEM((group * b * b, b * cout), jnp.float32)],
            interpret=_use_interpret(),
            cost_estimate=cost,
        )(halo3, w2)
    # rows (g, ox, oy) x lanes (oz, co) -> raster rows: bit-identical reshape
    return out.reshape(r * b3, cout)


def _dw_kernel_banded(halo_ref, g_ref, dw_ref, acc, *, b, k, g):
    cell = pl.program_id(0)
    im = _im2col_banded(halo_ref, b, k, g)
    contrib = jax.lax.dot_general(
        im, g_ref[...], (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [k^2*H*cin, b*cout]

    @pl.when(cell == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    acc[...] += contrib

    @pl.when(cell == pl.num_programs(0) - 1)
    def _():
        dw_ref[...] = acc[...]


def _dw_kernel_sliced(halo_ref, g_ref, dw_ref, acc, *, b, k, g, cin, cout, chunks):
    t = pl.program_id(0)
    cell = pl.program_id(1)

    @pl.when(cell == 0)
    def _():
        acc[...] = jnp.zeros_like(acc)

    for j, taps in enumerate(chunks):

        @pl.when(t == j)
        def _(taps=taps):
            for oz in range(b):
                im = _im2col_sliced(halo_ref, b, k, g, cin, taps, oz)
                gz = g_ref[:, oz * cout : (oz + 1) * cout]  # [G*b^2, Cout]
                acc[...] += jax.lax.dot_general(
                    im, gz, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
                )

    @pl.when(cell == pl.num_programs(1) - 1)
    def _():
        dw_ref[...] = acc[...]


def tap_conv_dw(
    halo_flat: jnp.ndarray,  # [R, H^3*Cin]
    gout: jnp.ndarray,  # [R*b^3, Cout] cotangent
    b: int,
    k: int,
    cin: int,
    group: int = 0,
) -> jnp.ndarray:
    """dW = sum_r im2col(halo_r)^T @ g_r, f32 accumulation. [k^3, Cin, Cout]."""
    r = halo_flat.shape[0]
    hsz = b + k - 1
    b3 = b**3
    cout = gout.shape[1] if gout.ndim == 2 else gout.shape[-1]
    it = halo_flat.dtype.itemsize
    regime, n_chunks = _plan(b, k, cin, cout, it)
    halo3 = halo_flat.reshape(r, hsz * hsz, hsz * cin)
    g3 = gout.reshape(r * b * b, b * cout)
    group = group or _pick_group(r, b, k, cin, it)
    grid_r = r // group
    cost = pl.CostEstimate(
        flops=2 * r * b3 * (k**3) * cin * cout,
        bytes_accessed=r * halo_flat.shape[1] * it + r * b3 * cout * gout.dtype.itemsize,
        transcendentals=0,
    )
    if regime == "banded":
        dw2 = pl.pallas_call(
            functools.partial(_dw_kernel_banded, b=b, k=k, g=group),
            grid=(grid_r,),
            in_specs=[
                pl.BlockSpec(
                    (group, hsz * hsz, hsz * cin), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                pl.BlockSpec((group * b * b, b * cout), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((k * k * hsz * cin, b * cout), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((k * k * hsz * cin, b * cout), jnp.float32),
            scratch_shapes=[pltpu.VMEM((k * k * hsz * cin, b * cout), jnp.float32)],
            interpret=_use_interpret(),
            cost_estimate=cost,
        )(halo3, g3)
        return unpack_dw2(dw2, b, k, cin, cout)
    chunks = _tap_chunks(k, n_chunks)
    wrows = (k**3 * cin) // n_chunks
    dwf = pl.pallas_call(
        functools.partial(
            _dw_kernel_sliced, b=b, k=k, g=group, cin=cin, cout=cout, chunks=chunks
        ),
        grid=(n_chunks, grid_r),
        in_specs=[
            pl.BlockSpec(
                (group, hsz * hsz, hsz * cin), lambda t, i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((group * b * b, b * cout), lambda t, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wrows, cout), lambda t, i: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((k**3 * cin, cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((wrows, cout), jnp.float32)],
        interpret=_use_interpret(),
        cost_estimate=cost,
    )(halo3, g3)
    return dwf.reshape(k**3, cin, cout)
