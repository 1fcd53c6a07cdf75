"""Pure-torch CPU stand-ins for the reference's native deps.

Implements exactly the API surface /root/reference/pointcept models touch:

- ``addict.Dict``            — attribute-access dict
- ``timm.layers``            — DropPath, trunc_normal_
- ``torch_scatter``          — segment_csr
- ``spconv.pytorch``         — SparseConvTensor, SubMConv3d, SparseConv3d,
  SparseInverseConv3d, SparseSequential, Identity, SparseModule,
  spconv.modules.is_spconv_module

Conv semantics follow spconv 2.x:
- SubM: output sites = input sites; kernel centered (offset = k - K//2);
  ``padding`` ignored (reference stem passes padding=1 with k5 — spconv SubM
  disregards it).
- SparseConv3d k2 s2 p0 (the only strided use): out = in >> 1, tap = in & 1
  per axis; rule map stored under ``indice_key`` on the tensor.
- SparseInverseConv3d: transposed rule of the stored key — output sites are
  the stored conv's INPUT sites.

Weight layout is spconv's "native" [k, k, k, in, out] so state dicts feed the
repo converter (`pointcept_tpu/models/utils/convert.py:33`) unchanged.

All matching is exact integer hashing (dict of linearized coords) — slow but
oracle-grade for a few thousand points on CPU.
"""

from __future__ import annotations

import math
import sys
import types

import torch
import torch.nn as nn


# ---------------------------------------------------------------------------
# addict
# ---------------------------------------------------------------------------


class AddictDict(dict):
    def __init__(self, *args, **kwargs):
        super().__init__()
        for a in args:
            if a:
                for k, v in dict(a).items():
                    self[k] = v
        for k, v in kwargs.items():
            self[k] = v

    def __getattr__(self, item):
        try:
            return self[item]
        except KeyError:
            raise AttributeError(item)

    def __setattr__(self, key, value):
        self[key] = value

    def __delattr__(self, item):
        del self[item]


# ---------------------------------------------------------------------------
# timm.layers
# ---------------------------------------------------------------------------


class DropPath(nn.Module):
    def __init__(self, drop_prob: float = 0.0, scale_by_keep: bool = True):
        super().__init__()
        self.drop_prob = drop_prob
        self.scale_by_keep = scale_by_keep

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1)).bernoulli_(keep)
        if self.scale_by_keep:
            mask = mask / keep
        return x * mask


def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return torch.nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


# ---------------------------------------------------------------------------
# torch_scatter
# ---------------------------------------------------------------------------


def segment_csr(src: torch.Tensor, indptr: torch.Tensor, reduce: str = "sum"):
    indptr = indptr.long()
    counts = indptr[1:] - indptr[:-1]
    nseg = counts.numel()
    ids = torch.repeat_interleave(torch.arange(nseg), counts)
    out_shape = (nseg,) + tuple(src.shape[1:])
    red = {"sum": "sum", "add": "sum", "mean": "mean", "max": "amax", "min": "amin"}[reduce]
    out = torch.zeros(out_shape, dtype=src.dtype)
    idx = ids.view(-1, *([1] * (src.ndim - 1))).expand_as(src)
    out.scatter_reduce_(0, idx, src, reduce=red, include_self=False)
    return out


# ---------------------------------------------------------------------------
# pointops (reference libs/pointops/functions: query/grouping/interpolation)
# ---------------------------------------------------------------------------


def _offsets_to_segments(offset: torch.Tensor):
    ends = offset.long().tolist()
    starts = [0] + ends[:-1]
    return list(zip(starts, ends))


def knn_query(k, xyz, offset, new_xyz=None, new_offset=None):
    """Per-batch kNN: idx (n, k) int, dist (n, k) euclidean, ascending.
    Mirrors reference `libs/pointops/functions/query.py::knn_query` (CUDA)."""
    if new_xyz is None:
        new_xyz, new_offset = xyz, offset
    idx = torch.empty((new_xyz.shape[0], k), dtype=torch.long)
    dist = torch.empty((new_xyz.shape[0], k), dtype=torch.float32)
    for (s0, e0), (s1, e1) in zip(
        _offsets_to_segments(offset), _offsets_to_segments(new_offset)
    ):
        d = torch.cdist(new_xyz[s1:e1], xyz[s0:e0])  # [nq, ns]
        vals, loc = torch.topk(d, min(k, e0 - s0), dim=1, largest=False)
        if vals.shape[1] < k:  # pad by repeating the last neighbor (CUDA pads 0)
            pad = k - vals.shape[1]
            vals = torch.cat([vals, vals[:, -1:].expand(-1, pad)], dim=1)
            loc = torch.cat([loc, loc[:, -1:].expand(-1, pad)], dim=1)
        idx[s1:e1] = loc + s0
        dist[s1:e1] = vals
    return idx.int(), dist


def grouping(idx, feat, xyz, new_xyz=None, with_xyz=False):
    """Reference `libs/pointops/functions/grouping.py::grouping` semantics:
    gather feat rows (idx -1 -> zeros via a sentinel row), optionally prepend
    masked relative xyz."""
    if new_xyz is None:
        new_xyz = xyz
    m, nsample, c = idx.shape[0], idx.shape[1], feat.shape[1]
    xyz_p = torch.cat([xyz, torch.zeros(1, 3)], dim=0)
    feat_p = torch.cat([feat, torch.zeros(1, c)], dim=0)
    gf = feat_p[idx.view(-1).long()].view(m, nsample, c)
    if not with_xyz:
        return gf
    mask = torch.sign(idx + 1).to(gf.dtype)
    gx = xyz_p[idx.view(-1).long()].view(m, nsample, 3) - new_xyz.unsqueeze(1)
    return torch.cat((gx * mask.unsqueeze(-1), gf), dim=-1)


def interpolation(xyz, new_xyz, feat, offset, new_offset, k=3):
    """Inverse-distance-weighted kNN interpolation (reference
    `libs/pointops/functions/interpolation.py::interpolation`)."""
    idx, dist = knn_query(k, xyz, offset, new_xyz, new_offset)
    dist_recip = 1.0 / (dist + 1e-8)
    weight = dist_recip / dist_recip.sum(dim=1, keepdim=True)
    out = torch.zeros((new_xyz.shape[0], feat.shape[1]), dtype=feat.dtype)
    for i in range(k):
        out += feat[idx[:, i].long()] * weight[:, i : i + 1]
    return out


# ---------------------------------------------------------------------------
# torch_geometric.nn.pool.voxel_grid
# ---------------------------------------------------------------------------


def voxel_grid(pos, size, batch=None, start=None, end=None):
    """Injective voxel cluster ids (consumers only run torch.unique over them,
    `point_transformer_v2m2_base.py:257-262`)."""
    if not torch.is_tensor(size):
        size = torch.tensor(size, dtype=pos.dtype)
    size = size.expand(pos.shape[1]) if size.ndim == 0 else size
    if start is None:
        start = pos.min(dim=0).values
    elif not torch.is_tensor(start):
        start = torch.tensor(start, dtype=pos.dtype).expand(pos.shape[1])
    c = torch.div(pos - start, size, rounding_mode="floor").long()
    c = c - c.min(dim=0).values
    dims = c.max(dim=0).values + 1
    lin = c[:, 0]
    for d in range(1, pos.shape[1]):
        lin = lin * dims[d] + c[:, d]
    if batch is not None:
        lin = batch.long() * int(dims.prod()) + lin
    return lin


# ---------------------------------------------------------------------------
# spconv.pytorch
# ---------------------------------------------------------------------------


class SparseConvTensor:
    def __init__(self, features, indices, spatial_shape, batch_size, indice_dict=None):
        self.features = features
        self.indices = indices  # [N, 4] int (batch, x, y, z)
        self.spatial_shape = list(spatial_shape)
        self.batch_size = batch_size
        self.indice_dict = indice_dict if indice_dict is not None else {}

    def replace_feature(self, feature):
        t = SparseConvTensor(
            feature, self.indices, self.spatial_shape, self.batch_size, self.indice_dict
        )
        return t


def _coord_key(indices: torch.Tensor, spatial_shape):
    """[N, 4] (b, x, y, z) -> int64 linear key."""
    b, x, y, z = indices.long().unbind(1)
    sx, sy, sz = (int(s) + 4 for s in spatial_shape)  # slack for halo probes
    return ((b * sx + x) * sy + y) * sz + z


class SparseModule(nn.Module):
    pass


class Identity(SparseModule):
    def forward(self, x):
        return x


def is_spconv_module(m):
    return isinstance(m, SparseModule)


class _ConvBase(SparseModule):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1, padding=0,
                 bias=True, indice_key=None, **_):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        k = kernel_size if isinstance(kernel_size, int) else kernel_size[0]
        self.kernel_size = k
        self.stride = stride if isinstance(stride, int) else stride[0]
        self.padding = padding if isinstance(padding, int) else padding[0]
        self.indice_key = indice_key
        self.weight = nn.Parameter(torch.empty(k, k, k, in_channels, out_channels))
        fan_in = in_channels * k**3
        nn.init.uniform_(self.weight, -1 / math.sqrt(fan_in), 1 / math.sqrt(fan_in))
        if bias:
            self.bias = nn.Parameter(torch.zeros(out_channels))
        else:
            self.register_parameter("bias", None)


class SubMConv3d(_ConvBase):
    """Submanifold conv: output sites == input sites, centered kernel."""

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        k = self.kernel_size
        h = k // 2
        idx = x.indices
        key = _coord_key(idx, x.spatial_shape)
        lut = {int(v): i for i, v in enumerate(key.tolist())}
        n = idx.shape[0]
        out = torch.zeros(n, self.out_channels, dtype=x.features.dtype)
        sx, sy, sz = (int(s) + 4 for s in x.spatial_shape)
        for k0 in range(k):
            for k1 in range(k):
                for k2 in range(k):
                    off = (k0 - h, k1 - h, k2 - h)
                    # neighbor site feeding this tap: in = out + (k - h)
                    qk = key + ((off[0] * sy + off[1]) * sz + off[2])
                    rows = [lut.get(int(v), -1) for v in qk.tolist()]
                    rows_t = torch.tensor(rows)
                    valid = rows_t >= 0
                    if not bool(valid.any()):
                        continue
                    src = x.features[rows_t[valid]]
                    out[valid] += src @ self.weight[k0, k1, k2]
        if self.bias is not None:
            out = out + self.bias
        return x.replace_feature(out)


class SparseConv3d(_ConvBase):
    """Strided sparse conv (only k2 s2 p0 is exercised by the reference)."""

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        k, s, p = self.kernel_size, self.stride, self.padding
        idx = x.indices.long()
        b = idx[:, 0]
        pos = idx[:, 1:]
        out_shape = [(int(d) + 2 * p - k) // s + 1 for d in x.spatial_shape]
        # per input site: o = (i + p - tap) / s for the unique tap with exact
        # division per axis (k <= s case: exactly one tap per input)
        assert k <= s and p == 0, "shim covers the reference's k2 s2 p0 use"
        opos = pos // s
        tap = pos - opos * s  # [N, 3] in [0, k)
        okey = ((b * (out_shape[0] + 4) + opos[:, 0]) * (out_shape[1] + 4) + opos[:, 1]) * (
            out_shape[2] + 4
        ) + opos[:, 2]
        uniq, inv = torch.unique(okey, sorted=True, return_inverse=True)
        m = uniq.numel()
        out_feat = torch.zeros(m, self.out_channels, dtype=x.features.dtype)
        tap_flat = (tap[:, 0] * k + tap[:, 1]) * k + tap[:, 2]
        for t in range(k**3):
            sel = tap_flat == t
            if not bool(sel.any()):
                continue
            k0, k1, k2 = t // (k * k), (t // k) % k, t % k
            contrib = x.features[sel] @ self.weight[k0, k1, k2]
            out_feat.index_add_(0, inv[sel], contrib)
        # reconstruct out indices from one representative per unique site
        first = torch.full((m,), -1, dtype=torch.long)
        order = torch.arange(idx.shape[0])
        first.scatter_reduce_(0, inv, order, reduce="amin", include_self=False)
        out_idx = torch.cat([b[first][:, None], opos[first]], dim=1).int()
        if self.bias is not None:
            out_feat = out_feat + self.bias
        indice_dict = dict(x.indice_dict)
        if self.indice_key is not None:
            indice_dict[self.indice_key] = {
                "in_indices": x.indices,
                "in_spatial_shape": x.spatial_shape,
                "out_inverse": inv,  # input row -> output row
                "tap": tap_flat,  # input row -> kernel tap
            }
        return SparseConvTensor(out_feat, out_idx, out_shape, x.batch_size, indice_dict)


class SparseInverseConv3d(_ConvBase):
    """Transposed rule of the SparseConv3d stored under indice_key: output
    sites are that conv's input sites; out[i] += W[tap_i] y[conv_out(i)]."""

    def __init__(self, in_channels, out_channels, kernel_size, indice_key, bias=True, **kw):
        super().__init__(in_channels, out_channels, kernel_size, bias=bias,
                         indice_key=indice_key, **kw)

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        entry = x.indice_dict[self.indice_key]
        inv = entry["out_inverse"]
        tap = entry["tap"]
        k = self.kernel_size
        n = entry["in_indices"].shape[0]
        out = torch.zeros(n, self.out_channels, dtype=x.features.dtype)
        for t in range(k**3):
            sel = tap == t
            if not bool(sel.any()):
                continue
            k0, k1, k2 = t // (k * k), (t // k) % k, t % k
            out[sel] = x.features[inv[sel]] @ self.weight[k0, k1, k2]
        if self.bias is not None:
            out = out + self.bias
        return SparseConvTensor(
            out, entry["in_indices"], entry["in_spatial_shape"], x.batch_size,
            dict(x.indice_dict),
        )


class SparseSequential(SparseModule):
    def __init__(self, *mods, **kwmods):
        super().__init__()
        if len(mods) == 1 and isinstance(mods[0], dict):
            for name, m in mods[0].items():
                self.add_module(name, m)
        else:
            for i, m in enumerate(mods):
                self.add_module(str(i), m)
        for name, m in kwmods.items():  # reference stem: SparseSequential(conv=...)
            self.add_module(name, m)

    def forward(self, x):
        for m in self._modules.values():
            if is_spconv_module(m):
                x = m(x)
            elif isinstance(x, SparseConvTensor):
                x = x.replace_feature(m(x.features))
            else:
                x = m(x)
        return x


# ---------------------------------------------------------------------------
# installation
# ---------------------------------------------------------------------------


def install() -> None:
    if "spconv" in sys.modules and getattr(sys.modules["spconv"], "__fake__", False):
        return

    addict = types.ModuleType("addict")
    addict.Dict = AddictDict
    sys.modules.setdefault("addict", addict)

    timm = types.ModuleType("timm")
    timm_layers = types.ModuleType("timm.layers")
    timm_layers.DropPath = DropPath
    timm_layers.trunc_normal_ = trunc_normal_
    timm.layers = timm_layers
    timm.__fake__ = True
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.layers", timm_layers)
    # older reference imports use timm.models.layers
    timm_models = types.ModuleType("timm.models")
    timm_models.layers = timm_layers
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)

    tsc = types.ModuleType("torch_scatter")
    tsc.segment_csr = segment_csr
    tsc.__fake__ = True
    sys.modules.setdefault("torch_scatter", tsc)

    def tg_scatter(src, index, dim=0, dim_size=None, reduce="sum"):
        n = int(dim_size) if dim_size is not None else int(index.max()) + 1
        red = {"sum": "sum", "add": "sum", "mean": "mean", "max": "amax", "min": "amin"}[reduce]
        out_shape = list(src.shape)
        out_shape[dim] = n
        out = torch.zeros(out_shape, dtype=src.dtype)
        idx = index.view(-1, *([1] * (src.ndim - 1))).expand_as(src) if dim == 0 else index
        out.scatter_reduce_(dim, idx, src, reduce=red, include_self=False)
        return out

    tg = types.ModuleType("torch_geometric")
    tg_utils = types.ModuleType("torch_geometric.utils")
    tg_utils.scatter = tg_scatter
    tg.utils = tg_utils
    tg.__fake__ = True
    tg_nn = types.ModuleType("torch_geometric.nn")
    tg_pool = types.ModuleType("torch_geometric.nn.pool")
    tg_pool.voxel_grid = voxel_grid
    tg_nn.pool = tg_pool
    tg.nn = tg_nn
    sys.modules.setdefault("torch_geometric", tg)
    sys.modules.setdefault("torch_geometric.utils", tg_utils)
    sys.modules.setdefault("torch_geometric.nn", tg_nn)
    sys.modules.setdefault("torch_geometric.nn.pool", tg_pool)

    po = types.ModuleType("pointops")
    po.knn_query = knn_query
    po.grouping = grouping
    po.interpolation = interpolation
    po.__fake__ = True
    sys.modules.setdefault("pointops", po)

    spconv = types.ModuleType("spconv")
    spconv.__fake__ = True
    sp = types.ModuleType("spconv.pytorch")
    for name in (
        "SparseConvTensor", "SubMConv3d", "SparseConv3d", "SparseInverseConv3d",
        "SparseSequential", "SparseModule", "Identity",
    ):
        setattr(sp, name, globals()[name])
    spmod = types.ModuleType("spconv.pytorch.modules")
    spmod.SparseModule = SparseModule
    spmod.is_spconv_module = is_spconv_module
    sp.modules = spmod
    spconv.pytorch = sp
    sys.modules["spconv"] = spconv
    sys.modules["spconv.pytorch"] = sp
    sys.modules["spconv.pytorch.modules"] = spmod
