import numpy as np
import pytest

from pointcept_tpu.datasets import (
    Compose,
    DataLoader,
    build_dataset,
    collate_fn,
    point_collate_fn,
)
from pointcept_tpu.datasets.transform import GridSample, TRANSFORMS

pytestmark = pytest.mark.quick


def scene(n=1000, seed=0):
    rng = np.random.RandomState(seed)
    return dict(
        coord=rng.rand(n, 3).astype(np.float32) * 5,
        color=rng.rand(n, 3).astype(np.float32) * 255,
        normal=rng.randn(n, 3).astype(np.float32),
        segment=rng.randint(0, 13, n).astype(np.int32),
    )


def test_grid_sample_train_unique_voxels():
    data = scene(5000)
    gs = GridSample(grid_size=0.1, mode="train", return_grid_coord=True)
    out = gs(dict(data))
    grid = out["grid_coord"]
    keys = grid[:, 0] * 10**6 + grid[:, 1] * 10**3 + grid[:, 2]
    assert len(np.unique(keys)) == len(keys)  # one point per voxel
    assert out["coord"].shape[0] == out["segment"].shape[0]
    assert grid.min() >= 0


def test_grid_sample_test_covers_all_points():
    data = scene(3000)
    gs = GridSample(grid_size=0.2, mode="test", return_grid_coord=True)
    parts = gs(dict(data))
    assert len(parts) > 1
    covered = np.concatenate([p["index"] for p in parts])
    assert set(covered.tolist()) == set(range(3000))


def test_transform_pipeline_runs():
    pipeline = Compose(
        [
            dict(type="CenterShift", apply_z=True),
            dict(type="RandomDropout", dropout_ratio=0.2, dropout_application_ratio=1.0),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=1.0),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomFlip", p=0.5),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="ElasticDistortion", distortion_params=[[0.2, 0.4], [0.8, 1.6]]),
            dict(type="ChromaticAutoContrast", p=1.0, blend_factor=None),
            dict(type="ChromaticTranslation", p=1.0, ratio=0.05),
            dict(type="ChromaticJitter", p=1.0, std=0.05),
            dict(type="GridSample", grid_size=0.02, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="SphereCrop", point_max=500, mode="random"),
            dict(type="CenterShift", apply_z=False),
            dict(type="NormalizeColor"),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal")),
        ]
    )
    out = pipeline(scene(4000))
    n = out["coord"].shape[0]
    assert n <= 500
    assert out["feat"].shape == (n, 6)
    assert out["grid_coord"].shape == (n, 3)
    assert out["offset"][0] == n


def test_collate_and_padding():
    samples = []
    for i in range(3):
        d = scene(100 + 50 * i, seed=i)
        d["offset"] = np.array([d["coord"].shape[0]])
        d["feat"] = np.concatenate([d["color"], d["normal"]], axis=1)
        d.pop("color"), d.pop("normal")
        samples.append(d)
    batch = point_collate_fn(samples, mix_prob=0.0, capacity=512)
    assert batch["coord"].shape == (512, 3)
    assert batch["feat"].shape == (512, 6)
    assert (batch["batch"] >= 0).sum() == 100 + 150 + 200
    np.testing.assert_array_equal(np.unique(batch["batch"]), [-1, 0, 1, 2])
    # padding labels are ignore
    assert (batch["segment"][batch["batch"] < 0] == -1).all()


def test_mix3d_merges_pairs():
    samples = []
    for i in range(4):
        d = scene(100, seed=i)
        d["offset"] = np.array([100])
        samples.append(d)
    batch = point_collate_fn(samples, mix_prob=1.0, capacity=512)
    valid = batch["batch"][batch["batch"] >= 0]
    assert set(np.unique(valid).tolist()) == {0, 1}  # 4 scenes -> 2 merged
    assert (valid >= 0).sum() == 400


def test_synthetic_dataset_and_loader():
    ds = build_dataset(
        dict(
            type="SyntheticSemSegDataset",
            split="train",
            num_scenes=4,
            num_points=2000,
            num_classes=13,
            transform=[
                dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
                dict(type="NormalizeColor"),
                dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "normal")),
            ],
        )
    )
    assert len(ds) == 4
    loader = DataLoader(
        ds,
        batch_size=2,
        shuffle=True,
        num_workers=0,
        collate_fn=lambda b: point_collate_fn(b, capacity=8192),
        seed=0,
    )
    batches = list(loader)
    assert len(batches) == 2
    for b in batches:
        assert b["coord"].shape == (8192, 3)
        assert (b["batch"] >= 0).sum() > 0


def test_loader_multiworker_deterministic_order():
    ds = build_dataset(
        dict(
            type="SyntheticSemSegDataset",
            split="train",
            num_scenes=8,
            num_points=500,
            num_classes=5,
            transform=[dict(type="Collect", keys=("coord", "segment"), feat_keys=("color",))],
        )
    )
    def make(nw):
        loader = DataLoader(
            ds, batch_size=2, shuffle=True, num_workers=nw,
            collate_fn=lambda b: point_collate_fn(b, capacity=2048), seed=3,
        )
        loader.set_epoch(1)
        return [b["coord"].sum() for b in loader]

    a = make(0)
    b = make(2)
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_loader_per_host_sharding_disjoint():
    """Multi-host striding: two mocked hosts see disjoint, covering batches
    (reference DistributedSampler semantics, `engines/train.py:284-315`)."""
    ds = list(range(10))

    def host(pi):
        loader = DataLoader(
            ds, batch_size=2, shuffle=True, num_workers=0,
            collate_fn=lambda b: b, seed=7, drop_last=True,
            process_index=pi, process_count=2,
        )
        loader.set_epoch(0)
        return [tuple(b) for b in loader]

    b0, b1 = host(0), host(1)
    assert len(b0) == len(b1) == 2  # equal per-host step counts
    seen0 = {i for b in b0 for i in b}
    seen1 = {i for b in b1 for i in b}
    assert seen0.isdisjoint(seen1)
    # together the hosts cover 8 distinct samples (2 dropped by drop_last)
    assert len(seen0 | seen1) == 8


def test_modelnet_style_cls_collate():
    ds = build_dataset(
        dict(
            type="SyntheticClsDataset",
            split="train",
            num_clouds=8,
            num_points=256,
            num_classes=4,
            transform=[
                dict(type="NormalizeCoord"),
                dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
                dict(type="Collect", keys=("coord", "grid_coord", "segment", "category"), feat_keys=("coord", "normal")),
            ],
        )
    )
    batch = point_collate_fn([ds[0], ds[1]], capacity=1024)
    assert batch["category"].shape == (2,)
    assert batch["category"][0] == 0 and batch["category"][1] == 1
    assert batch["feat"].shape[1] == 6


def test_ply_roundtrip_and_reader():
    import tempfile, os
    from pointcept_tpu.utils.visualization import save_point_cloud
    from pointcept_tpu.datasets.preprocessing.ply import read_scene_ply

    rng = np.random.RandomState(0)
    coord = rng.rand(50, 3).astype(np.float32)
    color = (rng.rand(50, 3) * 255).astype(np.uint8)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.ply")
        save_point_cloud(coord, color, p)
        c2, col2, extras, faces = read_scene_ply(p)
        np.testing.assert_allclose(c2, coord, atol=1e-6)
        np.testing.assert_array_equal(col2, color)
        assert faces is None


def test_partnete_dataset_layout():
    import json as _json
    import tempfile, os
    from pointcept_tpu.datasets import build_dataset

    with tempfile.TemporaryDirectory() as d:
        meta = {"Bottle": ["lid"], "Chair": ["arm", "seat"]}
        meta_path = os.path.join(d, "meta.json")
        _json.dump(meta, open(meta_path, "w"))
        rng = np.random.RandomState(0)
        for cat, oid, nparts in [("Bottle", "o1", 2), ("Chair", "o2", 3)]:
            p = os.path.join(d, "val", cat, oid)
            os.makedirs(p)
            n = 50
            np.save(os.path.join(p, "coord.npy"), rng.rand(n, 3).astype(np.float32))
            np.save(os.path.join(p, "segment.npy"), rng.randint(0, nparts - 1, n))
        ds = build_dataset(dict(
            type="PartNetEDataset",
            class_names=["Bottle", "Chair"],
            num_parts=[2, 3],
            data_root=d,
            meta_path=meta_path,
            split="val",
            transform=[dict(type="Collect", keys=("coord", "segment", "cls_token"), feat_keys=("coord",))],
            test_mode=False,
        ))
        assert len(ds) == 2
        assert ds.category2part["Chair"] == [2, 3, 4]
        assert ds.parts == ["Bottle_other", "Bottle_lid", "Chair_other", "Chair_arm", "Chair_seat"]
        s0 = ds[0]  # Bottle: raw labels 0 -> global 1 (offset 0 + 1)
        segs = np.unique(s0["segment"])
        assert segs.min() >= 1 and segs.max() <= 2
        s1 = ds[1]  # Chair: raw 0..1 -> global 3..4
        segs = np.unique(s1["segment"])
        assert segs.min() >= 3 and segs.max() <= 5


def test_image_transforms():
    from pointcept_tpu.datasets.transform import TRANSFORMS

    rng = np.random.RandomState(0)
    raw = (rng.rand(2, 32, 32, 3) * 255).astype(np.uint8)
    t = TRANSFORMS.build(dict(type="ImgToTensor"))
    img = t(raw)
    assert img.shape == (2, 3, 32, 32) and img.max() <= 1.0

    for cfg in [
        dict(type="ImgGaussianBlur", p=1.0),
        dict(type="ImgChromaticJitter", p=1.0, std=0.01),
        dict(type="ImgPixelContrast", threshold=0.1, p=1.0),
        dict(type="Imgnormalize"),
        dict(type="ImgRandomHorizontalFlip", p=1.0),
        dict(type="ImgRandomColorJitter", p=1.0),
        dict(type="ImgRandomGrayscale", p=1.0),
        dict(type="ImgRandomSolarize", threshold=0.5, p=1.0),
    ]:
        out = TRANSFORMS.build(cfg)(img.copy())
        assert out.shape == img.shape, cfg
        assert np.isfinite(out).all(), cfg

    crop = TRANSFORMS.build(dict(type="ImgRandomResizedCrop", size=16, scale=(0.5, 1.0)))
    out = crop(img)
    assert out.shape == (2, 3, 16, 16)

    aug = TRANSFORMS.build(dict(
        type="ImgAugmentation",
        imgtransforms=[dict(type="Imgnormalize")],
        crop_h=24, crop_w=24, patch_h=8, patch_w=8, patch_size=4, to_patch=True,
    ))
    corr = np.array([[[0, 0], [30, 30], [10, 12]]], np.int32).reshape(1, 3, 2)
    point = dict(images=img, correspondence=corr.copy())
    out = aug(point)
    assert out["images"].shape[-2:] == (24, 24)
    c = out["correspondence"].reshape(-1, 2)
    # in-crop pixels became patch indices within [0, crop/patch)
    valid = c[(c >= 0).all(1)]
    assert (valid < 24 // 4 + 1).all()


def test_image_point_dataset():
    import json as _json
    import tempfile, os
    from PIL import Image
    from pointcept_tpu.datasets import build_dataset

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as d:
        pc_dir = os.path.join(d, "scene0", "pc")
        os.makedirs(pc_dir)
        n = 60
        np.save(os.path.join(pc_dir, "coord.npy"), rng.rand(n, 3).astype(np.float32))
        np.save(os.path.join(pc_dir, "color.npy"), (rng.rand(n, 3) * 255).astype(np.float32))
        img_path = os.path.join(d, "scene0", "img0.png")
        Image.fromarray((rng.rand(64, 112, 3) * 255).astype(np.uint8)).save(img_path)
        # correspondence rows: (x_pixel, y_pixel, point_idx)
        corr = np.stack([
            rng.randint(0, 112, 20), rng.randint(0, 64, 20), rng.choice(n, 20, replace=False),
        ], axis=1).astype(np.float32)
        corr_path = os.path.join(d, "scene0", "corr0.npy")
        np.save(corr_path, corr)
        os.makedirs(os.path.join(d, "splits"))
        _json.dump(
            {"scene0": {"pointclouds": pc_dir, "images": [img_path], "correspondences": [corr_path]}},
            open(os.path.join(d, "splits", "train.json"), "w"),
        )
        ds = build_dataset(dict(
            type="DefaultImagePointDataset",
            split="train",
            data_root=d,
            crop_h=56, crop_w=56, patch_size=14,
            transform=[],
        ))
        assert len(ds) == 1
        s = ds[0]
        assert s["images"].shape == (1, 3, 56, 56)
        assert s["img_num"][0] == 1
        assert s["correspondence"].shape == (n, 1, 2)
        valid = s["correspondence"][:, 0, 0] >= 0
        assert valid.sum() > 0
        # patch units: within [0, patch_h)
        assert (s["correspondence"][valid] < 56 / 14).all()


def test_multiview_image_point_backprojection():
    import json as _json
    import tempfile, os
    from PIL import Image
    from pointcept_tpu.datasets import build_dataset

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as d:
        h, w = 28, 28
        rgb_p = os.path.join(d, "rgb.png")
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(rgb_p)
        depth = np.full((h, w), 500, np.uint16)  # 0.5 m everywhere
        depth_p = os.path.join(d, "depth.png")
        Image.fromarray(depth, mode="I;16").save(depth_p)
        K = np.array([[30.0, 0, w / 2], [0, 30.0, h / 2], [0, 0, 1]])
        T = np.eye(4)
        k_p, t_p = os.path.join(d, "K.npy"), os.path.join(d, "T.npy")
        np.save(k_p, K), np.save(t_p, T)
        os.makedirs(os.path.join(d, "splits"))
        _json.dump(
            {"s0": {"images": [rgb_p], "depths": [depth_p], "Ts": [t_p], "Ks": [k_p]}},
            open(os.path.join(d, "splits", "train.json"), "w"),
        )
        ds = build_dataset(dict(
            type="DefaultMultiViewImagePointDataset",
            split="train", data_root=d,
            crop_h=28, crop_w=28, patch_size=14,
            transform=[],
        ))
        s = ds[0]
        n = s["coord"].shape[0]
        assert n == h * w  # every depth pixel valid
        # back-projection: z flipped to -0.5
        np.testing.assert_allclose(s["coord"][:, 2], -0.5, atol=1e-5)
        assert s["images"].shape == (1, 3, 28, 28)
        assert s["correspondence"].shape == (n, 1, 2)
        valid = s["correspondence"][:, 0, 0] >= 0
        assert valid.sum() > 0


def test_scannetpp_preprocessing_scene():
    import json as _json
    import tempfile, os
    from pointcept_tpu.utils.visualization import save_point_cloud
    from pointcept_tpu.datasets.preprocessing.scannetpp import parse_scene

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as d:
        scene = os.path.join(d, "scene", "scans")
        os.makedirs(scene)
        n = 40
        coord = rng.rand(n, 3).astype(np.float32)
        color = (rng.rand(n, 3) * 255).astype(np.uint8)
        save_point_cloud(coord, color, os.path.join(scene, "mesh_aligned_0.05.ply"))
        _json.dump({"segIndices": list(range(n))}, open(os.path.join(scene, "segments.json"), "w"))
        _json.dump(
            {"segGroups": [
                {"label": "chair", "segments": list(range(0, 10))},
                {"label": "table", "segments": list(range(10, 25))},
                {"label": "unknownthing", "segments": list(range(25, 30))},
            ]},
            open(os.path.join(scene, "segments_anno.json"), "w"),
        )
        out = os.path.join(d, "out")
        parse_scene(scene, out, {"chair": 3, "table": 7}, with_superpoint=False)
        seg = np.load(os.path.join(out, "segment.npy"))
        inst = np.load(os.path.join(out, "instance.npy"))
        assert (seg[:10] == 3).all() and (inst[:10] == 0).all()
        assert (seg[10:25] == 7).all() and (inst[10:25] == 1).all()
        assert (seg[25:] == -1).all()  # unmapped label + unlabeled tail
        assert os.path.isfile(os.path.join(out, "coord.npy"))
        assert os.path.isfile(os.path.join(out, "normal.npy"))


def test_structured3d_panorama_backprojection():
    import tempfile, os
    from PIL import Image
    from pointcept_tpu.datasets.preprocessing.structured3d import parse_panorama_view

    with tempfile.TemporaryDirectory() as d:
        full = os.path.join(d, "panorama", "full")
        os.makedirs(full)
        h, w = 16, 32
        depth = np.full((h, w), 2000, np.uint16)  # 2 m everywhere -> sphere
        Image.fromarray(depth, mode="I;16").save(os.path.join(full, "depth.png"))
        rng = np.random.RandomState(0)
        Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
            os.path.join(full, "rgb_rawlight.png"))
        Image.fromarray(np.full((h, w), 5, np.uint8)).save(os.path.join(full, "semantic.png"))
        np.savetxt(os.path.join(d, "panorama", "camera_xyz.txt"), np.array([1000.0, 2000.0, 500.0]))
        pts, color, normal, seg = parse_panorama_view(d)
        assert pts.shape == (h * w, 3)
        # all points on a 2 m sphere around (1, 2, 0.5)
        r = np.linalg.norm(pts - np.array([1.0, 2.0, 0.5]), axis=1)
        np.testing.assert_allclose(r, 2.0, atol=1e-6)
        assert (seg == 5).all()
        # normals are unit (or zero at the seam rows)
        nn = np.linalg.norm(normal, axis=1)
        assert ((np.abs(nn - 1) < 1e-3) | (nn < 1e-6)).mean() > 0.8


def test_matterport_mixed_ply_and_mapping():
    import tempfile, os, struct
    from pointcept_tpu.datasets.preprocessing.matterport3d import parse_region

    rng = np.random.RandomState(0)
    with tempfile.TemporaryDirectory() as d:
        n, f = 6, 2
        ply = os.path.join(d, "region0.ply")
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {n}\n"
            "property float x\nproperty float y\nproperty float z\n"
            f"element face {f}\n"
            "property list uchar int vertex_indices\n"
            "property int category_id\n"
            "end_header\n"
        ).encode()
        with open(ply, "wb") as fh:
            fh.write(header)
            for i in range(n):
                fh.write(struct.pack("<3f", *rng.rand(3)))
            fh.write(struct.pack("<B3ii", 3, 0, 1, 2, 1))  # face 0: cat 1
            fh.write(struct.pack("<B3ii", 3, 3, 4, 5, 2))  # face 1: cat 2
        out = os.path.join(d, "out")
        mapping = np.array([0, 5, 0])  # cat 1 -> nyu 5; cat 2 unmapped
        parse_region(ply, out, mapping)
        seg = np.load(os.path.join(out, "segment.npy"))
        np.testing.assert_array_equal(seg[:3], 4)  # nyu 5 -> class 4 (0-based)
        np.testing.assert_array_equal(seg[3:], -1)


def test_arkitscenes_vertex_normals():
    from pointcept_tpu.datasets.preprocessing.arkitscenes import vertex_normals

    # flat square in z=0 plane -> all normals +-z
    coord = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    n = vertex_normals(coord, faces)
    np.testing.assert_allclose(np.abs(n[:, 2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(n[:, :2], 0.0, atol=1e-6)


def test_kitti_image_point_dataset(tmp_path):
    """SemanticKITTIImagePointDataset: projection correspondences from a
    synthesized sequence (velodyne bin + calib + stereo images)."""
    from PIL import Image

    seq = tmp_path / "dataset" / "sequences" / "08"
    (seq / "velodyne").mkdir(parents=True)
    (seq / "image_2").mkdir()
    rng = np.random.RandomState(0)
    # points in front of the camera (KITTI: x forward, cam z = x)
    pts = np.concatenate(
        [rng.rand(200, 1) * 20 + 2, rng.randn(200, 1) * 2, rng.randn(200, 1) * 0.5,
         rng.rand(200, 1)], axis=1,
    ).astype(np.float32)
    pts.tofile(seq / "velodyne" / "000000.bin")
    Image.fromarray(np.zeros((370, 1226, 3), np.uint8)).save(seq / "image_2" / "000000.png")
    fx = 700.0
    p2 = np.array([[fx, 0, 613, 0], [0, fx, 185, 0], [0, 0, 1, 0]])
    tr = np.array([[0, -1, 0, 0], [0, 0, -1, 0], [1, 0, 0, 0]], float)  # velo->cam
    with open(seq / "calib.txt", "w") as f:
        f.write("P2: " + " ".join(str(x) for x in p2.reshape(-1)) + "\n")
        f.write("Tr: " + " ".join(str(x) for x in tr.reshape(-1)) + "\n")

    ds = build_dataset(dict(
        type="SemanticKITTIImagePointDataset",
        split="val",
        data_root=str(tmp_path),
        crop_h=70, crop_w=126, patch_size=14,
        transform=[dict(type="Collect", keys=("coord", "segment", "correspondence"), feat_keys=("coord", "strength"))],
    ))
    assert len(ds) == 1
    out = ds[0]
    corr = out["correspondence"]
    assert corr.shape[0] == 200 and corr.shape[2] == 2
    visible = (corr[:, 0, 0] >= 0).sum()
    assert visible > 50  # forward points project into image 2


def test_scanobjectnn_raw_dataset(tmp_path):
    root = tmp_path / "train" / "chair"
    root.mkdir(parents=True)
    rng = np.random.RandomState(1)
    n = 128
    body = np.concatenate([
        rng.randn(n, 3), rng.randn(n, 3), rng.rand(n, 3) * 255,
        rng.randint(0, 4, (n, 1)), rng.randint(0, 10, (n, 1)),
    ], axis=1).astype(np.float32)
    np.concatenate([[np.float32(n)], body.reshape(-1)]).astype(np.float32).tofile(
        root / "005_00001.bin"
    )
    # auxiliary files must be skipped
    np.zeros(3, np.float32).tofile(root / "005_00001_part.bin")
    ds = build_dataset(dict(
        type="ScanObjectNNRawDataset", split="train", data_root=str(tmp_path),
        transform=[dict(type="Collect", keys=("coord", "segment"), feat_keys=("color", "normal"))],
    ))
    assert len(ds) == 1
    out = ds[0]
    assert out["coord"].shape == (n, 3)
    assert out["feat"].shape == (n, 6)


def _write_sens(path, num_frames=3, w=32, h=24):
    """Synthesize a minimal ScanNet SensorData v4 stream."""
    import io as _io
    import struct
    import zlib

    from PIL import Image

    rng = np.random.RandomState(0)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 20.0
    intr[0, 2], intr[1, 2] = w / 2, h / 2
    buf = open(path, "wb")
    buf.write(struct.pack("I", 4))
    name = b"synthetic"
    buf.write(struct.pack("Q", len(name)) + name)
    for m in (intr, np.eye(4, dtype=np.float32), intr, np.eye(4, dtype=np.float32)):
        buf.write(m.astype(np.float32).tobytes())
    buf.write(struct.pack("ii", 2, 1))  # jpeg color, zlib_ushort depth
    buf.write(struct.pack("IIII", w, h, w, h))
    buf.write(struct.pack("f", 1000.0))
    buf.write(struct.pack("Q", num_frames))
    for i in range(num_frames):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.05 * i  # small shift -> high overlap
        buf.write(pose.tobytes())
        buf.write(struct.pack("QQ", 0, 0))
        img = Image.fromarray(rng.randint(0, 255, (h, w, 3), dtype=np.uint8))
        jpg = _io.BytesIO()
        img.save(jpg, format="JPEG")
        color = jpg.getvalue()
        depth = (rng.rand(h, w) * 2000 + 500).astype(np.uint16)
        dz = zlib.compress(depth.tobytes())
        buf.write(struct.pack("QQ", len(color), len(dz)))
        buf.write(color)
        buf.write(dz)
    buf.close()


def test_scannet_pair_extraction(tmp_path):
    """End-to-end .sens -> pcd npz + overlap.txt -> ScanNetPairDataset."""
    from pointcept_tpu.datasets.preprocessing.scannet.scannet_pair import process_scene

    scene = tmp_path / "raw" / "scene0000_00"
    scene.mkdir(parents=True)
    _write_sens(str(scene / "scene0000_00.sens"), num_frames=3)
    out = tmp_path / "pairs"
    n = process_scene(str(scene / "scene0000_00.sens"), str(out), frame_skip=1)
    assert n == 3
    overlap = (out / "scene0000_00" / "pcd" / "overlap.txt").read_text().strip().split("\n")
    assert len(overlap) == 3  # 3 choose 2
    ratios = [float(l.split()[2]) for l in overlap]
    assert max(ratios) > 0.3  # nearly-identical frames overlap heavily

    ds = build_dataset(dict(
        type="ScanNetPairDataset",
        split="train",
        data_root=str(out),
        overlap_threshold=0.3,
        view1_transform=[],
        view2_transform=[],
        transform=[],
    ))
    assert len(ds) >= 1
    sample = ds[0]
    assert "view1_coord" in sample and "view2_coord" in sample


def test_concerto_export_manifest(tmp_path):
    """Scene tree -> correspondences + manifest -> DefaultImagePointDataset."""
    from PIL import Image

    from pointcept_tpu.datasets.preprocessing.concerto_export import export

    rng = np.random.RandomState(0)
    scene = tmp_path / "raw" / "sceneA"
    (scene / "images").mkdir(parents=True)
    (scene / "poses").mkdir()
    n = 300
    coord = rng.rand(n, 3).astype(np.float32) * 2 - 1
    coord[:, 2] += 3.0  # in front of the camera
    np.save(scene / "coord.npy", coord)
    np.save(scene / "color.npy", (rng.rand(n, 3) * 255).astype(np.float32))
    intr = np.array([[30.0, 0, 32], [0, 30.0, 24], [0, 0, 1]])
    np.savetxt(scene / "intrinsic.txt", intr)
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(scene / "images" / "0.jpg")
    np.savetxt(scene / "poses" / "0.txt", np.eye(4))

    out = tmp_path / "image_ds"
    manifest = export(str(tmp_path / "raw"), str(out), split="train")
    assert "sceneA" in manifest
    corr = np.load(manifest["sceneA"]["correspondences"][0])
    assert corr.shape[1] == 3 and corr.shape[0] > 50

    ds = build_dataset(dict(
        type="DefaultImagePointDataset",
        split="train",
        data_root=str(out),
        crop_h=42, crop_w=56, patch_size=14,
        transform=[dict(type="Collect", keys=("coord", "segment", "correspondence"), feat_keys=("color",))],
    ))
    sample = ds[0]
    assert sample["correspondence"].shape[0] == n
    assert (sample["correspondence"][:, 0, 0] >= 0).sum() > 10


def test_extra_transform_splices_before_collect():
    """`extra_transform` (used by the nocolor/nonormal probe configs) must run
    before the terminal Collect so it still sees the per-key arrays."""
    base = dict(
        type="SyntheticSemSegDataset",
        split="train",
        num_scenes=2,
        num_points=2000,
        transform=[
            dict(type="GridSample", grid_size=0.05, mode="train", return_grid_coord=True),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("color", "coord")),
        ],
    )
    feat = np.asarray(build_dataset(dict(base))[0]["feat"])
    assert np.abs(feat[:, :3]).sum() > 0  # colors present by default
    feat_no = np.asarray(
        build_dataset(
            dict(
                base,
                extra_transform=[
                    dict(type="RandomDropColor", drop_ratio=1.0, drop_application_ratio=1.0)
                ],
            )
        )[0]["feat"]
    )
    assert np.allclose(feat_no[:, :3], 0)  # color channels zeroed
    assert np.abs(feat_no[:, 3:]).sum() > 0  # coord features untouched


def test_hue_saturation_hsv_roundtrip_matches_colorsys():
    """rgb<->hsv helpers match stdlib colorsys on the 0-255 color scale
    (hue normalized to [0,1), s as chroma/value, v as max channel)."""
    import colorsys

    from pointcept_tpu.datasets.transform import HueSaturationTranslation as HST

    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 256, (512, 3)).astype(np.float64)
    # include degenerate pixels: grays (chroma 0) and black (value 0)
    rgb[:8] = rgb[:8, :1]
    rgb[8:12] = 0.0
    hsv = HST.rgb_to_hsv(rgb)
    for px, hx in zip(rgb, hsv):
        h, s, v = colorsys.rgb_to_hsv(*(px / 255.0))
        assert abs(hx[0] - h) < 1e-9 or abs(abs(hx[0] - h) - 1.0) < 1e-9
        assert abs(hx[1] - s) < 1e-9
        assert abs(hx[2] - v * 255.0) < 1e-6
    # hsv -> rgb (uint8-truncated like the transform uses it)
    back = HST.hsv_to_rgb(hsv)
    for px, hx, bx in zip(rgb, hsv, back):
        r, g, b = colorsys.hsv_to_rgb(hx[0], hx[1], hx[2] / 255.0)
        want = np.array([r, g, b]) * 255.0
        assert np.all(np.abs(bx.astype(np.float64) - want) <= 1.0)
    # exact roundtrip on integer-valued pixels
    assert np.array_equal(back.astype(np.float64), rgb)


def test_hue_saturation_transform_jitters_in_range():
    from pointcept_tpu.datasets.transform import HueSaturationTranslation

    rng = np.random.default_rng(1)
    color = rng.integers(0, 256, (300, 3)).astype(np.float64)
    np.random.seed(3)
    out = HueSaturationTranslation(hue_max=0.5, saturation_max=0.2)(
        {"color": color.copy()}
    )["color"]
    assert out.shape == color.shape
    assert out.min() >= 0 and out.max() <= 255
    # value (max channel) is invariant under hue/saturation jitter
    assert np.all(np.abs(out.max(1) - color.max(1)) <= 1.0)


def test_modelnet_uniform_sampling_fps(tmp_path):
    """`uniform_sampling=True` must run real FPS at load (reference
    `datasets/modelnet.py:100`), not silently head-truncate, and be
    deterministic across loads."""
    from pointcept_tpu.datasets.builder import build_dataset

    root = tmp_path / "modelnet40_normal_resampled"
    (root / "airplane").mkdir(parents=True)
    rng = np.random.default_rng(0)
    # a cloud whose head is spatially clustered so head-truncation and FPS
    # provably differ: first half in a tiny ball, second half spread out
    n = 400
    pts = np.concatenate(
        [rng.normal(0, 0.01, (n // 2, 3)), rng.uniform(-1, 1, (n // 2, 3))]
    )
    normals = rng.normal(size=(n, 3))
    np.savetxt(root / "airplane" / "airplane_0001.txt", np.hstack([pts, normals]), delimiter=",")
    (root / "modelnet40_train.txt").write_text("airplane_0001\n")
    (root / "modelnet40_shape_names.txt").write_text("airplane\n")

    def build(uniform):
        return build_dataset(
            dict(
                type="ModelNetDataset",
                split="train",
                data_root=str(root),
                num_points=64,
                uniform_sampling=uniform,
                transform=[],
            )
        )

    head = build(False).get_data(0)
    fps = build(True).get_data(0)
    fps2 = build(True).get_data(0)
    assert head["coord"].shape == fps["coord"].shape == (64, 3)
    # head-truncation stays inside the clustered half; FPS must escape it
    assert np.abs(head["coord"]).max() < 0.1
    assert np.abs(fps["coord"]).max() > 0.5
    assert not np.allclose(head["coord"], fps["coord"])
    # deterministic: same selection on every load
    assert np.array_equal(fps["coord"], fps2["coord"])
    # FPS keeps normals aligned with their points
    assert fps["normal"].shape == (64, 3)
