"""Per-dataset Concerto exporters on tiny synthetic raw trees.

Covers the modules added for reference-parity with
`/root/reference/pointcept/datasets/preprocessing/concerto/`:
graspnet (pose splitting), hk (OBJ surface sampling), cap3d (depth-view
correspondences), arkitscenes (traj/pincam image tree + z-buffer
correspondences), s3dis (2D-3D-S camera export), scannetpp (COLMAP text
model), waymo (pinhole projection + kNN-PCA normals), nuscenes_info
(quaternion/sensor-chain math).
"""

import json
import os

import numpy as np
import pytest


def test_graspnet_pose_split(tmp_path):
    from pointcept_tpu.datasets.preprocessing.concerto.graspnet import split_poses

    kinect = tmp_path / "scenes" / "scene_0000" / "kinect"
    kinect.mkdir(parents=True)
    poses = np.stack([np.eye(4) + i for i in range(5)])
    np.save(kinect / "camera_poses.npy", poses)
    out = split_poses(str(tmp_path))
    assert out == {"scene_0000": 5}
    got = np.load(kinect / "pose" / "0003.npy")
    np.testing.assert_array_equal(got, poses[3])


def _write_obj(path, with_colors=True):
    # unit square in z=0 plane: two triangles
    lines = []
    verts = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    cols = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (1, 1, 0)]
    for v, c in zip(verts, cols):
        if with_colors:
            lines.append(f"v {v[0]} {v[1]} {v[2]} {c[0]} {c[1]} {c[2]}")
        else:
            lines.append(f"v {v[0]} {v[1]} {v[2]}")
    lines += ["f 1 2 3", "f 1 3 4"]
    path.write_text("\n".join(lines) + "\n")


def test_hk_obj_sampling(tmp_path):
    from pointcept_tpu.datasets.preprocessing.concerto.hk import process_mesh, sample_obj

    mesh_dir = tmp_path / "raw" / "mesh_001"
    mesh_dir.mkdir(parents=True)
    _write_obj(mesh_dir / "model.obj")
    coord, color, normal = sample_obj(str(mesh_dir / "model.obj"), 500, seed=0)
    assert coord.shape == (500, 3) and color.shape == (500, 3) and normal.shape == (500, 3)
    # samples stay on the unit square at z=0 with +-z normals
    assert np.abs(coord[:, 2]).max() < 1e-6
    assert (coord[:, :2] >= -1e-6).all() and (coord[:, :2] <= 1 + 1e-6).all()
    np.testing.assert_allclose(np.abs(normal[:, 2]), 1.0, atol=1e-6)
    assert color.min() >= 0 and color.max() <= 255 and color.max() > 0

    out = tmp_path / "out"
    name = process_mesh(str(mesh_dir / "model.obj"), str(out), 200)
    assert name == "mesh_001"
    assert np.load(out / "mesh_001" / "coord.npy").shape == (200, 3)


def test_cap3d_view_correspondence(tmp_path):
    from PIL import Image

    from pointcept_tpu.datasets.preprocessing.concerto.cap3d import (
        MAX_DEPTH,
        process_object,
    )

    w, h, f = 16, 12, 10.0
    # camera at origin looking down +z (axis vectors = identity)
    cam = dict(x=[1, 0, 0], y=[0, 1, 0], z=[0, 0, 1], origin=[0, 0, 0],
               x_fov=2 * np.arctan((w / 2) / f), y_fov=2 * np.arctan((h / 2) / f))
    depth_m = np.full((h, w), 2.0)
    d16 = np.round(depth_m / MAX_DEPTH * 65535).astype(np.uint16)
    d16[0, 0] = 65535  # invalid pixel
    cam_dir = tmp_path / "cams" / "obj1"
    cam_dir.mkdir(parents=True)
    Image.fromarray(d16).save(cam_dir / "view0_depth.png")
    (cam_dir / "view0.json").write_text(json.dumps(cam))
    # GT cloud = unprojections of pixels (3,4) and (10,7) at depth 2
    k = np.array([[f, 0, w / 2.0], [0, f, h / 2.0], [0, 0, 1]])
    pix = np.array([[3, 4, 1.0], [10, 7, 1.0]])
    gt = 2.0 * (np.linalg.inv(k) @ pix.T).T
    pc_dir = tmp_path / "pc"
    pc_dir.mkdir()
    np.save(pc_dir / "obj1.npy", np.concatenate([gt.T, np.zeros((3, 2))]))  # [6, N]
    out = tmp_path / "out"
    n = process_object(str(pc_dir / "obj1.npy"), str(tmp_path / "cams"), str(out))
    assert n == 1
    corr = np.load(out / "obj1" / "view0.npy")
    got = {int(r[2]): (r[0], r[1]) for r in corr}
    # depth quantization (16-bit over 5 m) keeps unprojections well under tol
    assert set(got) == {0, 1}
    np.testing.assert_allclose(got[0], (3, 4), atol=0.1)
    np.testing.assert_allclose(got[1], (10, 7), atol=0.1)


def _write_mesh_ply(path, coords, colors, faces):
    with open(path, "w") as fh:
        fh.write(
            "ply\nformat ascii 1.0\n"
            f"element vertex {len(coords)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            f"element face {len(faces)}\n"
            "property list uchar int vertex_indices\nend_header\n"
        )
        for c, col in zip(coords, colors):
            fh.write(f"{c[0]} {c[1]} {c[2]} {col[0]} {col[1]} {col[2]}\n")
        for f3 in faces:
            fh.write(f"3 {f3[0]} {f3[1]} {f3[2]}\n")


def test_arkitscenes_scene_export(tmp_path):
    from PIL import Image

    from pointcept_tpu.datasets.preprocessing.concerto.arkitscenes import (
        angle_axis_to_matrix,
        process_scene,
    )

    # rotation helper sanity vs scipy
    from scipy.spatial.transform import Rotation

    v = np.array([0.3, -0.2, 0.5])
    np.testing.assert_allclose(
        angle_axis_to_matrix(v), Rotation.from_rotvec(v).as_matrix(), atol=1e-9
    )

    scene = tmp_path / "3dod" / "Training" / "42"
    frames = scene / "42_frames"
    (frames / "lowres_wide").mkdir(parents=True)
    (frames / "lowres_wide_intrinsics").mkdir()
    w, h, f = 16, 12, 10.0
    rng = np.random.default_rng(0)
    traj_lines = []
    for i, ts in enumerate(["1.000", "2.000"]):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        Image.fromarray(img).save(frames / "lowres_wide" / f"42_{ts}.png")
        np.savetxt(
            frames / "lowres_wide_intrinsics" / f"42_{ts}.pincam",
            [[w, h, f, f, w / 2, h / 2]],
        )
        traj_lines.append(f"{ts} 0 0 0 0.1 {0.2 * i} 0.3")
    (frames / "lowres_wide.traj").write_text("\n".join(traj_lines) + "\n")
    coords = np.array([[0.1, 0.2, 2.3], [0.5, 0.1, 2.0], [0.2, 0.4, 1.5]], np.float32)
    colors = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    _write_mesh_ply(scene / "42_3dod_mesh.ply", coords, colors, [[0, 1, 2]])

    out = tmp_path / "out"
    n = process_scene(str(scene), str(out), frame_gap=1)
    assert n == 2
    assert np.load(out / "Training" / "42" / "coord.npy").shape == (3, 3)
    nrm = np.load(out / "Training" / "42" / "normal.npy")
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-5)
    img_dir = out / "images" / "Training" / "42"
    assert len(os.listdir(img_dir / "color")) == 2
    assert len(os.listdir(img_dir / "pose")) == 2
    corr0 = np.load(img_dir / "correspondence" / "1.000.npy")
    assert corr0.shape[1] == 3


def test_s3dis_room_export(tmp_path):
    from PIL import Image

    from pointcept_tpu.datasets.preprocessing.concerto.s3dis import process_room_full

    # Stanford annotation tree
    room = tmp_path / "stanford" / "Area_1" / "office_1"
    (room / "Annotations").mkdir(parents=True)
    rng = np.random.default_rng(1)
    pts = np.concatenate(
        [rng.uniform(0, 2, (40, 3)), rng.uniform(0, 255, (40, 3))], axis=1
    )
    np.savetxt(room / "Annotations" / "chair_1.txt", pts)
    # 2D-3D-S raw tree
    raw = tmp_path / "raw" / "area_1" / "data"
    for sub in ("rgb", "pose", "depth"):
        (raw / sub).mkdir(parents=True)
    w, h, f = 16, 12, 10.0
    k = [[f, 0, w / 2], [0, f, h / 2], [0, 0, 1]]
    rt = np.eye(4)[:3]  # world-to-cam identity
    name = "camera_abc123_office_1_frame_0_domain_rgb"
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
        raw / "rgb" / (name + ".png")
    )
    (raw / "pose" / "camera_abc123_office_1_frame_0_domain_pose.json").write_text(
        json.dumps(dict(camera_k_matrix=k, camera_rt_matrix=rt.tolist()))
    )
    out = tmp_path / "out"
    n = process_room_full(
        str(room), str(tmp_path / "raw"), str(out), rgb_gap=1, align_angle=False
    )
    assert n == 1
    assert np.load(out / "Area_1" / "office_1" / "coord.npy").shape == (40, 3)
    cam_dir = out / "images" / "Area_1" / "office_1" / "abc123"
    pose = np.load(cam_dir / "pose" / "0.npy")
    np.testing.assert_allclose(pose, np.eye(4))
    assert (cam_dir / "correspondence" / "0.npy").exists()


def test_scannetpp_sfm_parsing(tmp_path):
    from pointcept_tpu.datasets.preprocessing.concerto.scannetpp import (
        export_scene_images,
        load_sfm,
    )

    colmap = tmp_path / "scene" / "dslr" / "colmap"
    colmap.mkdir(parents=True)
    w, h, f = 16, 12, 10.0
    (colmap / "cameras.txt").write_text(
        "# cameras\n# ...\n# ...\n"
        f"1 PINHOLE {w} {h} {f} {f} {w/2} {h/2}\n"
    )
    # identity orientation, camera at (0.1, 0.2, -1) => w2c t = -(R t_c2w)
    (colmap / "images.txt").write_text(
        "# images\n"
        "7 1 0 0 0 -0.1 -0.2 1.0 1 DSC00001.JPG\n"
        "1 2\n"
    )
    idx, infos = load_sfm(str(colmap))
    assert idx == {"DSC00001.JPG": "7"}
    info = infos["7"]
    np.testing.assert_allclose(info["cam_to_world"][:3, 3], [0.1, 0.2, -1.0], atol=1e-6)
    assert info["width"] == w and info["height"] == h

    from PIL import Image

    und = tmp_path / "scene" / "dslr" / "undistorted_images"
    und.mkdir()
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(und / "DSC00001.JPG")
    coords = np.array([[0.1, 0.2, 1.0], [0.4, 0.1, 1.5]], np.float32)
    n = export_scene_images(
        str(tmp_path / "scene"), "scene", coords, str(tmp_path / "img"), frame_gap=1
    )
    assert n == 1
    corr = np.load(tmp_path / "img" / "scene" / "correspondence" / "0.npy")
    # point 0 sits on the camera axis -> principal point
    row0 = corr[corr[:, 2] == 0][0]
    np.testing.assert_allclose(row0[:2], [w / 2, h / 2], atol=1e-4)


def test_waymo_projection_and_normals():
    from pointcept_tpu.datasets.preprocessing.concerto.waymo import (
        camera_correspondence,
        estimate_normals,
        project_points_pinhole,
    )

    # camera at ego origin facing +x (identity extrinsic), f=10, 16x12
    w, h, f = 16, 12, 10.0
    k = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    # a point straight ahead: waymo cam +x forward -> principal point
    pts = np.array([[5.0, 0.0, 0.0], [5.0, 1.0, 0.0], [-3.0, 0.0, 0.0]])
    uv, z, inside = project_points_pinhole(pts, np.eye(4), k, (h, w))
    np.testing.assert_allclose(uv[0], [w / 2, h / 2], atol=1e-6)
    assert z[0] == pytest.approx(5.0)
    assert uv[1][0] < w / 2  # +y (left) maps to smaller image x
    assert inside[0] and not inside[2]  # behind the camera is excluded
    corr = camera_correspondence(pts, np.eye(4), k, (h, w))
    assert 2 not in set(corr[:, 2].astype(int))

    rng = np.random.default_rng(0)
    plane = np.stack(
        [rng.uniform(0, 2, 200), rng.uniform(0, 2, 200), np.full(200, 3.0)], 1
    )
    nrm = estimate_normals(plane, cam_center=np.zeros(3))
    # plane normals +-z, flipped toward the origin (below the plane) => -z... the
    # view dir is +z so normals must satisfy n . view <= 0 => n_z = -1
    np.testing.assert_allclose(nrm[:, 2], -1.0, atol=1e-3)


def test_nuscenes_quat_and_sensor_chain():
    from scipy.spatial.transform import Rotation

    from pointcept_tpu.datasets.preprocessing.nuscenes_info import quat_to_mat

    q_xyzw = Rotation.from_euler("xyz", [0.3, -0.2, 0.7]).as_quat()
    q_wxyz = [q_xyzw[3], q_xyzw[0], q_xyzw[1], q_xyzw[2]]
    np.testing.assert_allclose(
        quat_to_mat(q_wxyz), Rotation.from_quat(q_xyzw).as_matrix(), atol=1e-9
    )
