"""PointBatch: the static-shape batched point-cloud structure (TPU-native `Point`).

Reference counterpart: `pointcept/models/utils/structure.py:20` (`Point`, an
addict dict with ragged offset-concatenated tensors). XLA wants static shapes,
so the central design change is: a batch is a **fixed-capacity** concatenation of
scenes, padded to ``capacity`` points; ``batch[i]`` is the scene id (-1 for
padding), ``mask`` marks valid points, and per-scene counts replace the ragged
``offset`` vector. ``num_scenes`` (max scenes) and ``capacity`` are static.

`serialize()` mirrors `Point.serialization()` (`structure.py:53-110`): encodes
each requested curve order into int32 key triples, sorts (padding last via a
batch sentinel), and records order/inverse permutations.

`patch_partition()` replaces `SerializedAttention.get_padding_and_inverse()`
(`point_transformer_v3m1_base.py:115-170`): every scene is padded to a multiple
of the patch size K by re-using the points one patch earlier (the reference's
tail-duplication rule), yielding a **static** [num_patches, K] slot layout.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from pointcept_tpu.ops import serialization as ser


def offset2batch(offset: jnp.ndarray) -> jnp.ndarray:
    """Cumulative offsets -> per-point scene ids (reference `models/utils/misc.py:12`)."""
    counts = jnp.diff(jnp.concatenate([jnp.zeros(1, offset.dtype), offset]))
    return jnp.repeat(jnp.arange(len(offset)), counts, total_repeat_length=int(offset[-1]))


def batch2offset(batch: jnp.ndarray) -> jnp.ndarray:
    """Per-point scene ids -> cumulative offsets."""
    counts = jnp.bincount(batch)
    return jnp.cumsum(counts)


@struct.dataclass
class PointBatch:
    """A fixed-capacity batch of point clouds (pytree).

    Array fields all have leading dim = capacity; `batch == -1` marks padding.
    """

    coord: jnp.ndarray  # [N, 3] float32 (meters)
    feat: jnp.ndarray  # [N, C] float32
    grid_coord: jnp.ndarray  # [N, 3] int32 voxel coords (>= 0)
    batch: jnp.ndarray  # [N] int32 scene id, -1 = padding
    origin_coord: Optional[jnp.ndarray] = None  # [N, 3] pre-augmentation coords (SSL)
    # optional per-point labels (may be None)
    segment: Optional[jnp.ndarray] = None  # [N] int32, -1 = ignore
    instance: Optional[jnp.ndarray] = None  # [N] int32
    instance_centroid: Optional[jnp.ndarray] = None  # [N, 3] per-point instance centroid
    # optional conditioning (PPT multi-dataset)
    condition: Optional[str] = struct.field(pytree_node=False, default=None)
    context: Optional[jnp.ndarray] = None
    # serialization state (filled by serialize())
    serialized_keys: Optional[jnp.ndarray] = None  # [S, N, 3] int32 key triples
    serialized_order: Optional[jnp.ndarray] = None  # [S, N] int32
    serialized_inverse: Optional[jnp.ndarray] = None  # [S, N] int32
    serialized_depth: int = struct.field(pytree_node=False, default=0)
    # host-precomputed geometry (ops/host_geometry.py): neighbor maps, patch
    # partitions, pooling clusters. None = build the same structures in-graph.
    geometry: Optional[dict] = None
    # static batch geometry
    num_scenes: int = struct.field(pytree_node=False, default=1)
    # scene-blocked layout: when set, capacity == num_scenes * scene_capacity
    # and `serialize()` keys padding rows to a per-scene sentinel so that after
    # every sort scene s occupies EXACTLY rows [s*scene_capacity, (s+1)*...).
    # Static scene regions make patch attention a reshape (see
    # ops/attention.window_attention) instead of a slot gather, at any batch
    # size — the multi-scene generalization of the sorted-persistent layout.
    scene_capacity: Optional[int] = struct.field(pytree_node=False, default=None)

    # ------------------------------------------------------------------ helpers
    @property
    def capacity(self) -> int:
        return self.coord.shape[0]

    @property
    def mask(self) -> jnp.ndarray:
        return self.batch >= 0

    @property
    def num_points(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32))

    def scene_counts(self) -> jnp.ndarray:
        """[num_scenes] int32 valid-point count per scene.

        One-hot compare + reduce: num_scenes is small and static, and this
        avoids a TPU scatter-add (segment_sum) over the full point dim."""
        return jnp.sum(
            self.batch[None, :] == jnp.arange(self.num_scenes, dtype=self.batch.dtype)[:, None],
            axis=1,
            dtype=jnp.int32,
        )

    def with_grid_coord(self, grid_size: float) -> "PointBatch":
        """Derive voxel grid coords from metric coords when absent (reference
        `Point.serialization`, `structure.py:56-63`): per-scene min-shifted
        floor(coord / grid_size)."""
        if self.grid_coord is not None:
            return self
        b = jnp.clip(self.batch, 0, self.num_scenes - 1)
        big = jnp.float32(1e9)
        coord = jnp.where(self.mask[:, None], self.coord, big)
        mins = jax.ops.segment_min(coord, b, num_segments=self.num_scenes)
        mins = jnp.where(jnp.isfinite(mins), mins, 0.0)
        grid = jnp.floor((self.coord - mins[b]) / grid_size).astype(jnp.int32)
        return self.replace(grid_coord=jnp.maximum(grid, 0))

    def key_batch(self) -> jnp.ndarray:
        """Batch ids with padding mapped to the sort sentinel (sorts last)."""
        return jnp.where(self.batch >= 0, self.batch, ser.BATCH_SENTINEL).astype(jnp.int32)

    # -------------------------------------------------------------- serialization
    def serialize(
        self,
        orders: Sequence[str] = ("z", "z-trans", "hilbert", "hilbert-trans"),
        depth: int = 12,
        shuffle_key: Optional[jax.Array] = None,
        sort_indices: Optional[Sequence[int]] = None,
        key_orders: Optional[Sequence[int]] = None,
    ) -> "PointBatch":
        """Compute per-order curve codes, orders and inverses.

        Parity: reference `Point.serialization` (`structure.py:53-110`). `depth`
        is static (the reference adapts it to the data; a fixed per-dataset depth
        keeps shapes/jit static — grid coords are clipped into range).

        `sort_indices` (static) restricts which orders actually get sorted —
        orders no attention block reads keep identity permutations (keys are
        always computed; pooled stages may still sort them later). Incompatible
        with `shuffle_key`.

        `key_orders` (static) restricts which orders' keys are actually encoded
        — curve codes are hierarchical (code >> 3 == code of the parent cell,
        for z AND hilbert), so deeper stages re-encode any extra order they
        need from the pooled grid instead of carrying full-resolution keys
        through reorders/poolings. Unencoded slots alias keys[0] and must not
        be read. Incompatible with `shuffle_key` (shuffling erases the static
        order-name <-> index mapping).
        """
        assert depth <= 16
        gc = jnp.clip(self.grid_coord, 0, (1 << depth) - 1)
        kb = self.key_batch()
        pad_key_row = None
        if self.scene_capacity is not None:
            # scene-blocked: each padding row is keyed (scene, MAX, MAX) so it
            # sorts to the TAIL OF ITS SCENE instead of the batch tail. Scenes
            # must individually fit their region (n_s <= scene_capacity); the
            # deficit cumsum assigns exactly (scene_capacity - n_s) padding
            # rows to scene s, making every region exactly scene_capacity rows.
            S = self.num_scenes
            cs = self.scene_capacity
            assert cs * S == self.capacity, (cs, S, self.capacity)
            deficit = cs - self.scene_counts()  # [S] (>=0 when scenes fit)
            dc = jnp.cumsum(deficit)
            pad_idx = jnp.cumsum((~self.mask).astype(jnp.int32)) - 1
            pad_scene = jnp.clip(
                jnp.searchsorted(dc, pad_idx, side="right").astype(jnp.int32), 0, S - 1
            )
            kb = jnp.where(self.mask, kb, pad_scene)
            imax = jnp.int32(2**31 - 1)
            pad_key_row = jnp.stack(
                [kb, jnp.full_like(kb, imax), jnp.full_like(kb, imax)], axis=-1
            )  # [N, 3]
        if key_orders is not None:
            assert shuffle_key is None, "key_orders requires unshuffled orders"
            assert 0 in key_orders, "order 0 drives pooling/block tables"
            k0 = ser.encode(gc, kb, depth, orders[0])
            keys = jnp.stack(
                [
                    ser.encode(gc, kb, depth, orders[i]) if (i in key_orders and i != 0) else k0
                    for i in range(len(orders))
                ]
            )  # [S, N, 3]
        else:
            keys = ser.encode_all(gc, kb, depth, orders)  # [S, N, 3]
        if pad_key_row is not None:
            keys = jnp.where(self.mask[None, :, None], keys, pad_key_row[None])
        iota = jnp.arange(self.capacity, dtype=jnp.int32)
        if sort_indices is not None:
            assert shuffle_key is None, "sort_indices requires unshuffled orders"
            order = jnp.stack(
                [
                    ser.argsort_keys(keys[i], depth) if i in sort_indices else iota
                    for i in range(len(orders))
                ]
            )
        else:
            order = jnp.stack([ser.argsort_keys(keys[i], depth) for i in range(len(orders))])
        inverse = jnp.stack(
            [
                ser.invert_order(order[i])
                if sort_indices is None or i in sort_indices
                else iota
                for i in range(len(orders))
            ]
        )
        if shuffle_key is not None:
            perm = jax.random.permutation(shuffle_key, len(orders))
            keys, order, inverse = keys[perm], order[perm], inverse[perm]
        return self.replace(
            serialized_keys=keys,
            serialized_order=order,
            serialized_inverse=inverse,
            serialized_depth=depth,
        )

    def reorder(self, perm: jnp.ndarray, inv: jnp.ndarray, rebase_orders=None,
                rebase_keys: bool = True) -> "PointBatch":
        """Physically permute all per-point arrays (new[i] = old[perm[i]]).

        Used to pin the batch to z-order after serialization ("sorted-persistent
        layout"): order 0 becomes the identity, so dense fills read contiguous
        windows and patch attention needs no slot gathers. The serialized
        orders/inverses are rebased (order'_i = inv[order_i],
        inverse'_i = inverse_i[perm]) — only for the static `rebase_orders`
        index set (order 0 is the identity by construction; unlisted orders get
        identity placeholders and must not be read until re-sorted).

        All perm-indexed gathers (point attributes + rebased keys/inverses) are
        FUSED into one packed wide row gather (ops/permute.gather_rows_packed):
        row gathers are row-rate-bound on TPU, so one 128-byte-row gather beats
        ~8 narrow ones ~5x (profiled on the ScanNet bench)."""
        from pointcept_tpu.ops.permute import gather_rows_packed

        s = self.serialized_order.shape[0] if self.serialized_order is not None else 0
        iota = jnp.arange(self.capacity, dtype=jnp.int32)
        rebase = rebase_orders if rebase_orders is not None else range(s)
        kset = ()
        if s and rebase_keys:
            kset = tuple(set(range(s) if rebase_keys is True else rebase_keys) | {0})

        # collect every perm-indexed gather into one packed gather
        point_fields = [
            ("coord", self.coord), ("feat", self.feat), ("grid_coord", self.grid_coord),
            ("batch", self.batch), ("origin_coord", self.origin_coord),
            ("segment", self.segment), ("instance", self.instance),
            ("instance_centroid", self.instance_centroid),
        ]
        packed_in = []
        packed_tag = []
        plain = {}
        for name, a in point_fields:
            if a is None:
                continue
            if a.dtype.itemsize == 4 and a.ndim <= 2:
                packed_in.append(a)
                packed_tag.append(("field", name))
            else:
                plain[name] = jnp.take(a, perm, axis=0)
        inv_rebase = [i for i in range(s) if i in rebase and i != 0]
        for i in inv_rebase:
            packed_in.append(self.serialized_inverse[i])
            packed_tag.append(("inverse", i))
        for i in kset:
            packed_in.append(self.serialized_keys[i])
            packed_tag.append(("keys", i))
        gathered = gather_rows_packed(tuple(packed_in), perm, inv)
        fields = dict(plain)
        inv_g = {}
        key_g = {}
        for (kind, key), g in zip(packed_tag, gathered):
            if kind == "field":
                fields[key] = g
            elif kind == "inverse":
                inv_g[key] = g
            else:
                key_g[key] = g

        new_order = None
        new_inverse = None
        new_keys = None
        if s:
            new_order = jnp.stack(
                [
                    jnp.take(inv, self.serialized_order[i], axis=0) if i in rebase and i != 0 else iota
                    for i in range(s)
                ]
            )
            new_inverse = jnp.stack(
                [inv_g.get(i, iota) for i in range(s)]
            )
            if rebase_keys:
                # rebase_keys may be a static index set: only those orders'
                # keys are gathered (others alias the gathered keys[0] — they
                # were never encoded, see serialize(key_orders=...))
                new_keys = jnp.stack([key_g.get(i, key_g[0]) for i in range(s)])
        return self.replace(
            coord=fields.get("coord"),
            feat=fields.get("feat"),
            grid_coord=fields.get("grid_coord"),
            batch=fields.get("batch"),
            origin_coord=fields.get("origin_coord"),
            segment=fields.get("segment"),
            instance=fields.get("instance"),
            instance_centroid=fields.get("instance_centroid"),
            context=self.context,
            serialized_keys=new_keys,
            serialized_order=new_order,
            serialized_inverse=new_inverse,
        )

    def shuffle_orders_(self, key: jax.Array) -> "PointBatch":
        perm = jax.random.permutation(key, self.serialized_order.shape[0])
        return self.replace(
            serialized_keys=self.serialized_keys[perm],
            serialized_order=self.serialized_order[perm],
            serialized_inverse=self.serialized_inverse[perm],
        )

    # ---------------------------------------------------------- patch partition
    def patch_partition(self, order_index: int, patch_size: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Static patch layout for serialized attention.

        Returns:
          slot_to_point: [P] int32 — point index feeding each attention slot
            (P = patch-aligned capacity; dead slots point at point 0).
          point_to_slot: [N] int32 — the slot holding each point's own output.

        Scene tails are filled by re-reading the points one patch earlier
        (reference `get_padding_and_inverse`, `point_transformer_v3m1_base.py:141-158`);
        scenes smaller than one patch wrap cyclically (the reference leaves them
        ragged, which a static layout cannot).
        """
        assert self.serialized_order is not None, "call serialize() first"
        K = patch_size
        B = self.num_scenes
        order = self.serialized_order[order_index]
        inverse = self.serialized_inverse[order_index]
        n = self.scene_counts()  # [B]
        p = ((n + K - 1) // K) * K  # padded per-scene counts
        s_excl = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(n)[:-1].astype(jnp.int32)])
        q_incl = jnp.cumsum(p).astype(jnp.int32)
        q_excl = jnp.concatenate([jnp.zeros(1, jnp.int32), q_incl[:-1]])

        P = self.padded_capacity(K)
        t = jnp.arange(P, dtype=jnp.int32)
        scene = jnp.searchsorted(q_incl, t, side="right").astype(jnp.int32)
        live = scene < B
        scene_c = jnp.clip(scene, 0, B - 1)
        o = t - q_excl[scene_c]
        n_s = n[scene_c]
        idx = jnp.where(
            o < n_s,
            o,
            jnp.where(o >= K, o - K, o % jnp.maximum(n_s, 1)),
        )
        idx = jnp.minimum(idx, jnp.maximum(n_s - 1, 0))
        g = s_excl[scene_c] + idx
        slot_to_point = jnp.where(live & (n_s > 0), order[jnp.clip(g, 0, self.capacity - 1)], 0)

        # point -> its first-occurrence slot
        gpos = inverse  # sorted position of each point
        pscene = jnp.clip(self.batch, 0, B - 1)
        slot = q_excl[pscene] + (gpos - s_excl[pscene])
        point_to_slot = jnp.clip(jnp.where(self.mask, slot, 0), 0, P - 1)
        return slot_to_point, point_to_slot

    def padded_capacity(self, patch_size: int) -> int:
        """Static upper bound on the patch-aligned slot count."""
        K = patch_size
        return ((self.capacity + K - 1) // K + self.num_scenes) * K
