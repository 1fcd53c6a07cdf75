import numpy as np
import jax
import jax.numpy as jnp

from pointcept_tpu.models import build_model
from pointcept_tpu.ops.clustering import bfs_cluster, segment_graph, segment_mesh
from pointcept_tpu.utils.instance_eval import aggregate_ap, evaluate_scene
from tests.test_structure import make_batch


def test_bfs_cluster_separates_blobs():
    rng = np.random.RandomState(0)
    blob1 = rng.randn(80, 3) * 0.05
    blob2 = rng.randn(70, 3) * 0.05 + np.array([5.0, 0, 0])
    blob3 = rng.randn(60, 3) * 0.05 + np.array([0, 5.0, 0])
    coords = np.concatenate([blob1, blob2, blob3]).astype(np.float32)
    batch = np.zeros(210, np.int32)
    labels = np.concatenate([np.zeros(80), np.zeros(70), np.ones(60)]).astype(np.int32)
    cluster, num = bfs_cluster(coords, batch, labels, radius=0.5, min_points=20)
    assert num == 3
    assert len(np.unique(cluster[:80])) == 1
    assert cluster[0] != cluster[100]
    # small clusters rejected
    cluster2, num2 = bfs_cluster(coords, batch, labels, radius=0.5, min_points=100)
    assert num2 == 0 and (cluster2 == -1).all()


def test_segment_mesh_superpoints():
    # two flat plates at an angle -> 2+ superpoints
    xs, ys = np.meshgrid(np.linspace(0, 1, 12), np.linspace(0, 1, 12))
    plate1 = np.stack([xs.ravel(), ys.ravel(), np.zeros(144)], 1)
    plate2 = np.stack([xs.ravel() + 1.0, ys.ravel(), xs.ravel() * 1.0], 1)
    verts = np.concatenate([plate1, plate2]).astype(np.float32)
    def grid_faces(offset):
        f = []
        for i in range(11):
            for j in range(11):
                a = offset + i * 12 + j
                f += [[a, a + 1, a + 12], [a + 1, a + 13, a + 12]]
        return f
    faces = np.asarray(grid_faces(0) + grid_faces(144), np.int64)
    seg = segment_mesh(verts, faces, k_thresh=0.05, seg_min=10)
    assert len(np.unique(seg)) >= 2
    # each plate is internally one segment
    assert len(np.unique(seg[:144])) == 1
    assert len(np.unique(seg[144:])) == 1


def test_pointgroup_forward_and_losses():
    pb = make_batch([120, 80], capacity=256, num_classes=13)
    # give every labeled point an instance + centroid
    inst = np.asarray(pb.segment).copy()
    centroid = np.asarray(pb.coord).copy()
    pb = pb.replace(instance=jnp.asarray(inst), instance_centroid=jnp.asarray(centroid))
    cfg = dict(
        type="PG-v1m1",
        backbone=dict(
            type="SpUNet-v1m1", in_channels=6, num_classes=0, base_channels=8,
            channels=(8, 16, 32, 64, 64, 32, 24, 24), layers=(1,) * 8,
            serialize_depth=8, pool_capacity_factor=0.75,
        ),
        backbone_out_channels=24,
        semantic_num_classes=13,
        segment_ignore_index=(-1, 0, 1),
        cluster_thresh=3.0,
        cluster_min_points=5,
        cluster_propose_points=5,
        voxel_size=0.05,
    )
    model = build_model(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)}, pb, train=False)
    out = model.apply(variables, pb, train=False)
    for k in ("loss", "seg_loss", "bias_l1_loss", "bias_cosine_loss"):
        assert np.isfinite(float(out[k])), k
    assert out["seg_logits"].shape == (256, 13)
    assert out["bias_pred"].shape == (256, 3)
    # host-side proposals run end to end
    masks, classes, scores = model.propose_instances(
        np.asarray(pb.coord), np.asarray(out["bias_pred"]),
        np.asarray(jax.nn.softmax(out["seg_logits"], -1)),
        np.asarray(pb.batch), np.asarray(pb.mask),
    )
    assert masks.shape[1] == 256


def test_instance_ap_protocol():
    n = 100
    gt_instance = np.full(n, -1)
    gt_segment = np.full(n, -1)
    gt_instance[:30] = 0; gt_segment[:30] = 2
    gt_instance[30:60] = 1; gt_segment[30:60] = 3
    # perfect predictions
    masks = np.zeros((2, n), bool)
    masks[0, :30] = True
    masks[1, 30:60] = True
    classes = np.array([0, 1])  # after vacancy shift (ignore 0,1 -> class 2 -> 0)
    scores = np.array([0.9, 0.8], np.float32)
    recs, counts = evaluate_scene(masks, classes, scores, gt_instance, gt_segment, 11, (-1, 0, 1))
    all_records = {c: [(s, i, 0) for s, i in recs.get(c, [])] for c in range(11)}
    result = aggregate_ap(all_records, counts, 11)
    assert result["mAP"] == 1.0 and result["AP50"] == 1.0
    # a bad prediction lowers AP
    masks2 = masks.copy(); masks2[1] = False; masks2[1, 60:90] = True
    recs, counts = evaluate_scene(masks2, classes, scores, gt_instance, gt_segment, 11, (-1, 0, 1))
    all_records = {c: [(s, i, 0) for s, i in recs.get(c, [])] for c in range(11)}
    result2 = aggregate_ap(all_records, counts, 11)
    assert result2["mAP"] < 1.0


def test_pg_v1m2_custom_criteria():
    import jax
    import jax.numpy as jnp
    from pointcept_tpu.models import build_model

    pb = insseg_batch() if "insseg_batch" in globals() else None
    if pb is None:
        from pointcept_tpu.engines.train import make_point_batch
        rng = np.random.RandomState(0)
        cap, n = 256, 180
        coord = np.zeros((cap, 3), np.float32); coord[:n] = rng.rand(n, 3) * 2
        grid = (coord / 0.05).astype(np.int32)
        feat = np.zeros((cap, 6), np.float32); feat[:n] = rng.randn(n, 6)
        batch = np.full(cap, -1, np.int32); batch[:n] = 0
        seg = np.full(cap, -1, np.int32); seg[:n] = rng.randint(0, 5, n)
        inst = np.full(cap, -1, np.int32); inst[:n] = rng.randint(0, 4, n)
        cent = np.zeros((cap, 3), np.float32)
        for i in range(4):
            m = inst == i
            if m.sum():
                cent[m] = coord[m].mean(0)
        pb = make_point_batch(dict(coord=jnp.asarray(coord), grid_coord=jnp.asarray(grid),
                                   feat=jnp.asarray(feat), batch=jnp.asarray(batch),
                                   segment=jnp.asarray(seg), instance=jnp.asarray(inst),
                                   instance_centroid=jnp.asarray(cent)), 1)
    model = build_model(dict(
        type="PG-v1m2",
        backbone=dict(type="SpUNet-v1m1", in_channels=6, num_classes=0,
                      channels=(8, 8, 8, 8, 8, 8, 8, 8), layers=(1, 1, 1, 1, 1, 1, 1, 1),
                      serialize_depth=8),
        backbone_out_channels=8,
        semantic_num_classes=5,
        segment_ignore_index=(-1,),
        criteria=[dict(type="CrossEntropyLoss", ignore_index=-1),
                  dict(type="LovaszLoss", mode="multiclass", ignore_index=-1)],
    ))
    params = model.init(jax.random.PRNGKey(0), pb, train=False)
    out, _ = model.apply(params, pb, train=True, mutable=["batch_stats"])
    assert np.isfinite(float(out["loss"]))
    assert out["seg_logits"].shape[-1] == 5
