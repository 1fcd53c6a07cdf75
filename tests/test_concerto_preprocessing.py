"""Concerto preprocessing exporters on tiny synthetic raw samples.

Covers (VERDICT r3 missing #3): the shared correspondence/alignment machinery,
the ScanNet .sens stream parser + image-tree export, the RE10K chunk pipeline
(with an analytic pointmap predictor standing in for VGGT), the Structured3D
room fusion with exact pixel->point tables, and the table-driven splits
manifests. Reference behaviors matched per-module (see docstrings in
`pointcept_tpu/datasets/preprocessing/concerto/`).
"""

import io
import json
import os
import struct
import zlib

import numpy as np
import pytest

from pointcept_tpu.datasets.preprocessing.concerto.common import (
    depth_to_points,
    ground_plane_align,
    normal_from_grid,
    project_points,
    select_context_views,
    write_splits,
    zbuffer_correspondence,
)


def _intrinsic(w, h, f=20.0):
    k = np.eye(3)
    k[0, 0] = k[1, 1] = f
    k[0, 2], k[1, 2] = w / 2.0, h / 2.0
    return k


# ---------------------------------------------------------------------------
# common machinery
# ---------------------------------------------------------------------------


def test_depth_to_points_project_roundtrip():
    w, h = 16, 12
    k = _intrinsic(w, h)
    rng = np.random.default_rng(0)
    depth = rng.uniform(1.0, 3.0, (h, w))
    pose = np.eye(4)
    pose[:3, 3] = [0.3, -0.2, 0.1]
    pts, valid = depth_to_points(depth, k, pose)
    assert valid.all()
    uv, z, inside = project_points(pts.reshape(-1, 3), k, np.linalg.inv(pose), (h, w))
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    np.testing.assert_allclose(uv[:, 0], xs.ravel(), atol=1e-4)
    np.testing.assert_allclose(uv[:, 1], ys.ravel(), atol=1e-4)
    np.testing.assert_allclose(z, depth.ravel(), atol=1e-5)
    assert inside.all()


def test_normal_from_grid_plane():
    xs, ys = np.meshgrid(np.arange(8, dtype=float), np.arange(6, dtype=float))
    pts = np.stack([xs, ys, np.zeros_like(xs)], -1)  # z=0 plane
    n = normal_from_grid(pts)
    np.testing.assert_allclose(np.abs(n[..., 2]), 1.0, atol=1e-6)


def test_zbuffer_correspondence_occlusion():
    w, h = 16, 12
    k = _intrinsic(w, h)
    # two points on the same ray: z=1 (kept) and z=2 (occluded)
    coord = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0], [0.1, 0.05, 1.5]], np.float32)
    corr = zbuffer_correspondence(coord, k, np.eye(4), (h, w), z_tolerance=0.05)
    kept = set(corr[:, 2].astype(int))
    assert 0 in kept and 2 in kept and 1 not in kept
    # pixel coords of point 0 are the principal point
    row0 = corr[corr[:, 2] == 0][0]
    assert abs(row0[0] - w / 2) < 1e-4 and abs(row0[1] - h / 2) < 1e-4
    # non-finite pose or nothing visible -> -ones sentinel
    bad = zbuffer_correspondence(coord, k, np.full((4, 4), np.nan), (h, w))
    np.testing.assert_array_equal(bad, -np.ones((1, 3), np.float32))
    behind = zbuffer_correspondence(np.array([[0, 0, -1.0]]), k, np.eye(4), (h, w))
    np.testing.assert_array_equal(behind, -np.ones((1, 3), np.float32))


def test_ground_plane_align_recovers_tilt():
    rng = np.random.default_rng(1)
    # ground plane tilted 20 deg about x, plus an off-plane blob above it
    n_g = 400
    plane = np.stack(
        [rng.uniform(-2, 2, n_g), rng.uniform(-2, 2, n_g), np.full(n_g, 0.5)], 1
    )
    t = np.deg2rad(20)
    Rx = np.array([[1, 0, 0], [0, np.cos(t), -np.sin(t)], [0, np.sin(t), np.cos(t)]])
    blob = rng.normal([0, 0, 2.0], 0.2, (150, 3))
    pts = np.concatenate([plane, blob]) @ Rx.T
    R, offset, inliers = ground_plane_align(pts, distance_threshold=0.02, seed=0)
    aligned = pts @ R.T
    aligned[:, 2] -= offset
    # the plane points land at z ~= 0
    assert np.abs(aligned[:n_g, 2]).max() < 0.05
    # inliers come from the lowest `height_percentile`% only (reference
    # preprocess_re10k.py:47-50): 20% of 550 = 110 candidates, all on-plane
    assert inliers.size > 100


def test_ground_plane_align_rejects_steep():
    rng = np.random.default_rng(2)
    # a single vertical wall: no acceptable ground within max_angle
    wall = np.stack(
        [np.zeros(300), rng.uniform(-2, 2, 300), rng.uniform(0, 2, 300)], 1
    )
    with pytest.raises(ValueError):
        ground_plane_align(wall, max_trials=2, iterations=200, seed=0)


def test_select_context_views_gap_and_overlap():
    # a camera panning 1 deg per frame: view_delta(i, j) = |i - j| degrees
    v = 120
    ex = np.tile(np.eye(4), (v, 1, 1))
    for i in range(v):
        t = np.deg2rad(i * 1.0)
        ex[i, :3, :3] = np.array(
            [[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]]
        )
    chosen = select_context_views(
        ex, num_context_views=3, frame_gap=(5, 60), overlap_range=(5, 30), seed=7
    )
    assert chosen is not None and len(chosen) == 3
    gaps = np.diff(sorted(chosen))
    assert (gaps >= 5).all() and (gaps <= 60).all()
    # an impossible overlap window yields None
    assert (
        select_context_views(
            ex, num_context_views=3, frame_gap=(5, 60), overlap_range=(500, 600), seed=7
        )
        is None
    )


# ---------------------------------------------------------------------------
# scannet .sens
# ---------------------------------------------------------------------------


def _png_bytes(arr):
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _make_sens(path, poses, colors, depths, intrinsic):
    """Serialize a v4 .sens stream (png color + zlib_ushort depth)."""
    h, w = depths[0].shape
    ch, cw = colors[0].shape[:2]
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 4))
        name = b"synthetic"
        f.write(struct.pack("<Q", len(name)) + name)
        intr4 = np.eye(4, dtype=np.float32)
        intr4[:3, :3] = intrinsic
        for mat in (intr4, np.eye(4, dtype=np.float32), intr4, np.eye(4, dtype=np.float32)):
            f.write(mat.astype("<f4").tobytes())
        f.write(struct.pack("<i", 1))  # color: png
        f.write(struct.pack("<i", 1))  # depth: zlib_ushort
        f.write(struct.pack("<2I", cw, ch))
        f.write(struct.pack("<2I", w, h))
        f.write(struct.pack("<f", 1000.0))
        f.write(struct.pack("<Q", len(poses)))
        for pose, color, depth in zip(poses, colors, depths):
            f.write(np.asarray(pose, "<f4").tobytes())
            f.write(struct.pack("<2Q", 0, 0))
            cbytes = _png_bytes(color)
            dbytes = zlib.compress(depth.astype("<u2").tobytes())
            f.write(struct.pack("<2Q", len(cbytes), len(dbytes)))
            f.write(cbytes)
            f.write(dbytes)


def test_sens_parse_and_export(tmp_path):
    from pointcept_tpu.datasets.preprocessing.concerto.scannet import (
        SensStream,
        export_scene,
    )

    w, h = 16, 12
    k = _intrinsic(w, h)
    rng = np.random.default_rng(3)
    poses, colors, depths = [], [], []
    for i in range(4):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.1 * i
        poses.append(pose)
        colors.append(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
        depths.append(rng.integers(500, 3000, (h, w), dtype=np.uint16))
    sens_path = tmp_path / "scene.sens"
    _make_sens(sens_path, poses, colors, depths, k)

    sens = SensStream(str(sens_path))
    assert len(sens) == 4
    np.testing.assert_allclose(sens.intrinsic_color[:3, :3], k, atol=1e-6)
    np.testing.assert_allclose(sens.pose(2), poses[2], atol=1e-6)
    np.testing.assert_array_equal(sens.color(1), colors[1])
    np.testing.assert_array_equal(sens.depth(3), depths[3])

    # preprocessed cloud: points 2 m in front of the identity camera
    pc_dir = tmp_path / "pc"
    pc_dir.mkdir()
    pts = np.array([[0.0, 0.0, 2.0], [0.2, 0.1, 2.0]], np.float32)
    np.save(pc_dir / "coord.npy", pts)
    im_dir = tmp_path / "images" / "train" / "scene"
    n = export_scene(str(sens_path), str(pc_dir), str(im_dir), frame_gap=2)
    assert n == 2  # frames 0 and 2
    for sub in ("color", "pose", "intrinsic", "depth", "correspondence"):
        assert (im_dir / sub).is_dir()
    corr = np.load(im_dir / "correspondence" / "0.npy")
    # frame 0 is the identity camera: both points project inside
    assert set(corr[:, 2].astype(int)) == {0, 1}
    uv, _, _ = project_points(pts, k, np.eye(4), (h, w))
    got = {int(r[2]): (r[0], r[1]) for r in corr}
    for i in range(2):
        np.testing.assert_allclose(got[i], uv[i], atol=1e-4)


# ---------------------------------------------------------------------------
# re10k
# ---------------------------------------------------------------------------


def _room_predictor(images_u8):
    """Analytic stand-in for VGGT: a floor-plane pointmap per view (y-down
    network frame, so the floor is at y = +1 below the camera)."""
    v, h, w = images_u8.shape[:3]
    k = _intrinsic(w, h, f=10.0)
    wp = np.zeros((v, h, w, 3))
    c2w = np.tile(np.eye(4), (v, 1, 1))
    for i in range(v):
        c2w[i, 0, 3] = 0.05 * i
        xs, ys = np.meshgrid(np.arange(w), np.arange(h))
        rays = np.stack([xs, ys, np.ones_like(xs)], -1) @ np.linalg.inv(k).T
        # intersect each ray with the y=+1 plane (y-down: floor below camera);
        # upper-half rays (y<=0) get a far wall at z=4 instead
        ry = rays[..., 1]
        t_floor = np.where(ry > 1e-3, 1.0 / np.maximum(ry, 1e-3), np.inf)
        t_wall = 4.0 / rays[..., 2]
        t = np.where(np.isfinite(t_floor), np.minimum(t_floor, t_wall), t_wall)
        cam_pts = rays * t[..., None]
        wp[i] = cam_pts @ c2w[i, :3, :3].T + c2w[i, :3, 3]
    return dict(
        world_points=wp,
        conf=np.ones((v, h, w)),
        cam_to_world=c2w,
        intrinsics=np.tile(k, (v, 1, 1)),
    )


def test_re10k_export_scene(tmp_path):
    from pointcept_tpu.datasets.preprocessing.concerto.re10k import export_scene

    rng = np.random.default_rng(4)
    images = rng.integers(0, 255, (3, 12, 16, 3), dtype=np.uint8)
    pc_dir = tmp_path / "train" / "scene0"
    im_dir = tmp_path / "images" / "train" / "scene0"
    n = export_scene(images, _room_predictor, str(pc_dir), str(im_dir), seed=0)
    assert n > 100
    coord = np.load(pc_dir / "coord.npy")
    color = np.load(pc_dir / "color.npy")
    normal = np.load(pc_dir / "normal.npy")
    assert coord.shape == color.shape == normal.shape == (n, 3)
    # ground-aligned: a fat quantile of points sits near z=0, nothing far below
    assert np.quantile(coord[:, 2], 0.3) < 0.2
    assert coord[:, 2].min() > -0.5
    np.testing.assert_allclose(np.linalg.norm(normal, axis=1), 1.0, atol=1e-3)
    for i in range(3):
        corr = np.load(im_dir / "correspondence" / f"{i}.npy")
        assert corr.shape[1] == 3
        idx = corr[:, 2].astype(int)
        assert (idx >= 0).all() and (idx < n).all()
        # correspondence colors match the fused cloud exactly (pixel-exact)
        x, y = corr[:, 0].astype(int), corr[:, 1].astype(int)
        np.testing.assert_array_equal(color[idx], images[i][y, x])
        assert (im_dir / "pose" / f"{i}.npy").is_file()
        assert (im_dir / "intrinsic" / f"{i}.npy").is_file()


def test_re10k_decode_poses_and_chunk(tmp_path):
    torch = pytest.importorskip("torch")
    from pointcept_tpu.datasets.preprocessing.concerto.re10k import (
        decode_poses,
        load_chunk,
        process_chunk,
    )

    v = 40
    cams = np.zeros((v, 18), np.float32)
    cams[:, 0], cams[:, 1] = 0.8, 0.9  # fx, fy (normalized)
    cams[:, 2], cams[:, 3] = 0.5, 0.5
    for i in range(v):
        t = np.deg2rad(i * 1.0)
        R = np.array(
            [[np.cos(t), -np.sin(t), 0], [np.sin(t), np.cos(t), 0], [0, 0, 1]]
        )
        w2c = np.eye(4)
        w2c[:3, :3] = R
        cams[i, 6:18] = w2c[:3].reshape(-1)
    w2c, K = decode_poses(cams)
    assert w2c.shape == (v, 4, 4) and K.shape == (v, 3, 3)
    assert abs(K[0, 0, 0] - 0.8) < 1e-6

    img = np.zeros((12, 16, 3), np.uint8)
    jpg = torch.frombuffer(bytearray(_png_bytes(img)), dtype=torch.uint8)
    chunk = [dict(key="scene_a", cameras=torch.tensor(cams), images=[jpg] * v)]
    chunk_dir = tmp_path / "raw" / "train"
    chunk_dir.mkdir(parents=True)
    torch.save(chunk, chunk_dir / "000000.torch")
    loaded = load_chunk(chunk_dir / "000000.torch")
    assert loaded[0]["key"] == "scene_a"

    out = tmp_path / "out"
    n = process_chunk(
        str(chunk_dir / "000000.torch"),
        str(out),
        _room_predictor,
        num_context_views=3,
        frame_gap=(5, 60),
        overlap_range=(5, 30),
    )
    assert n == 1
    assert (out / "train" / "scene_a" / "coord.npy").is_file()
    manifest = write_splits(str(out), splits=("train",))["train"]
    assert "scene_a" in manifest
    assert len(manifest["scene_a"]["images"]) == 3


# ---------------------------------------------------------------------------
# structured3d
# ---------------------------------------------------------------------------


def _make_structured3d_room(room_dir):
    """One perspective view of a synthetic box room + a matching panorama."""
    from PIL import Image

    h, w = 12, 16
    view = room_dir / "perspective" / "full" / "0"
    view.mkdir(parents=True)
    rng = np.random.default_rng(5)
    depth = rng.integers(1500, 2500, (h, w), dtype=np.uint16)  # mm
    color = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    segment = np.full((h, w), 4, np.uint8)  # NYU id 4 = bed -> class 3
    Image.fromarray(depth).save(view / "depth.png")
    Image.fromarray(color).save(view / "rgb_rawlight.png")
    Image.fromarray(segment).save(view / "semantic.png")
    # camera at origin looking +y, up +z, fovs in the reference's layout
    cam = np.array([0, 0, 1600, 0, 1, 0, 0, 0, 1, 0.5, 0.4, 1], float)
    np.savetxt(view / "camera_pose.txt", cam[None])
    pano = room_dir / "panorama"
    (pano / "full").mkdir(parents=True)
    pdepth = rng.integers(1500, 2500, (8, 24), dtype=np.uint16)
    pcolor = rng.integers(0, 255, (8, 24, 3), dtype=np.uint8)
    pseg = np.full((8, 24), 4, np.uint8)
    Image.fromarray(pdepth).save(pano / "full" / "depth.png")
    Image.fromarray(pcolor).save(pano / "full" / "rgb_rawlight.png")
    Image.fromarray(pseg).save(pano / "full" / "semantic.png")
    np.savetxt(pano / "camera_xyz.txt", np.array([0.0, 0.0, 1600.0])[None])


def test_structured3d_room_export(tmp_path):
    from pointcept_tpu.datasets.preprocessing.concerto.structured3d import parse_room

    room = tmp_path / "scene_00001" / "2D_rendering" / "0"
    _make_structured3d_room(room)
    pc_dir = tmp_path / "out" / "train" / "scene_00001" / "room_0"
    im_dir = tmp_path / "out" / "images" / "train" / "scene_00001" / "room_0"
    n = parse_room(str(room), str(pc_dir), str(im_dir), parse_depths=True)
    assert n > 0
    coord = np.load(pc_dir / "coord.npy")
    segment = np.load(pc_dir / "segment.npy")
    assert coord.shape[0] == n
    assert (segment == 3).all()  # NYU 4 (bed) -> 25-class index 3
    corr = np.load(im_dir / "correspondence" / "prsp_correspondence" / "0.npy")
    assert corr.dtype == np.int32
    idx = corr[:, 2]
    assert (idx >= 0).all() and (idx < n).all()
    # exact correspondence: fused colors equal the source pixels
    color = np.load(pc_dir / "color.npy")
    from PIL import Image

    src = np.asarray(Image.open(im_dir / "color" / "prsp" / "0.png"))
    np.testing.assert_array_equal(color[idx], src[corr[:, 1], corr[:, 0]])
    pano_corr = np.load(im_dir / "correspondence" / "pano_correspondence" / "0.npy")
    assert pano_corr.shape[0] + corr.shape[0] == n
    assert (im_dir / "pose" / "0.npy").is_file()
    assert (im_dir / "intrinsic" / "0.npy").is_file()
    assert (im_dir / "depth" / "prsp" / "0.png").is_file()


# ---------------------------------------------------------------------------
# splits
# ---------------------------------------------------------------------------


def test_write_splits_nested_and_flat(tmp_path):
    from PIL import Image

    img = Image.fromarray(np.zeros((4, 4, 3), np.uint8))
    # flat scene + one nested (scene/room) scene
    for scene in ("sceneA", "sceneB/room_0"):
        d = tmp_path / "images" / "train" / scene
        (d / "color").mkdir(parents=True)
        (d / "correspondence").mkdir()
        for i in range(2):
            img.save(d / "color" / f"{i}.png")
            np.save(d / "correspondence" / f"{i}.npy", -np.ones((1, 3), np.float32))
    out = write_splits(str(tmp_path), splits=("train",), rel_root="data/x")["train"]
    assert set(out) == {"sceneA", "sceneB/room_0"}
    entry = out["sceneA"]
    assert entry["pointclouds"] == "data/x/train/sceneA"
    assert len(entry["images"]) == 2 and len(entry["correspondences"]) == 2
    assert entry["images"][0].startswith("data/x/images/train/sceneA/color/")
    # written JSON parses and matches
    with open(tmp_path / "splits" / "train.json") as f:
        assert json.load(f) == out
