"""Habitat-Matterport 3D (HM3D) semantic preprocessing.

Parity: reference `pointcept/datasets/preprocessing/hm3d/{preprocess_hm3d,
filter_hm3d}.py` — samples each scene's textured GLB meshes at a surface
density, groups geometry into rooms by the HM3D chunk naming convention,
paints labels from the paired `*.semantic.glb` texture colors via the scene's
`*.semantic.txt` hex mapping and the official `hm3dsem_category_mappings.tsv`
(raw category -> mpcat40 index), and writes per-room npy folders split
train (scene id < 800) / val. `filter_scenes` keeps the top-N rooms by point
count (reference `filter_hm3d.py`).

The reference samples meshes with trimesh; this rebuild carries its own
minimal binary-glTF (GLB) reader + area-weighted surface sampler (numpy) and
decodes textures with PIL — no trimesh/open3d dependency.

Usage:
  python -m pointcept_tpu.datasets.preprocessing.hm3d \
      --dataset_root <hm3d>/ --output_root data/hm3d \
      --mapping_tsv <hm3dsem_category_mappings.tsv> [--density 0.02]
  python -m pointcept_tpu.datasets.preprocessing.hm3d \
      --filter --dataset_root data/hm3d --num_keep 10000
"""

from __future__ import annotations

import argparse
import glob
import io
import json
import os
import shutil
import struct
from pathlib import Path

import numpy as np

# mpcat40 taxonomy (official Matterport category set, index = training label)
MPCAT40 = (
    "wall", "floor", "chair", "door", "table", "picture", "cabinet", "cushion",
    "window", "sofa", "bed", "curtain", "chest_of_drawers", "plant", "sink",
    "stairs", "ceiling", "toilet", "stool", "towel", "mirror", "tv_monitor",
    "shower", "column", "bathtub", "counter", "fireplace", "lighting", "beam",
    "railing", "shelving", "blinds", "gym_equipment", "seating", "board_panel",
    "furniture", "appliances", "clothes", "objects", "misc",
)

_COMPONENT_DTYPE = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_WIDTH = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


# ---------------------------------------------------------------------------
# minimal GLB (binary glTF 2.0) reader
# ---------------------------------------------------------------------------


class Glb:
    """Parsed GLB: `primitives()` yields dicts with name/pos/normal/uv/faces/
    material texture (PIL image or None) + baseColorFactor, with node
    transforms applied."""

    def __init__(self, path):
        with open(path, "rb") as f:
            raw = f.read()
        magic, _ver, _length = struct.unpack_from("<III", raw, 0)
        assert magic == 0x46546C67, f"not a GLB file: {path}"
        off = 12
        self.gltf, self.bin = None, b""
        while off < len(raw):
            clen, ctype = struct.unpack_from("<II", raw, off)
            data = raw[off + 8 : off + 8 + clen]
            if ctype == 0x4E4F534A:  # 'JSON'
                self.gltf = json.loads(data)
            elif ctype == 0x004E4942:  # 'BIN\0'
                self.bin = data
            off += 8 + clen
        assert self.gltf is not None, f"GLB without JSON chunk: {path}"

    def _view_bytes(self, view_idx):
        v = self.gltf["bufferViews"][view_idx]
        o = v.get("byteOffset", 0)
        return self.bin[o : o + v["byteLength"]], v.get("byteStride")

    def accessor(self, idx):
        a = self.gltf["accessors"][idx]
        dtype = _COMPONENT_DTYPE[a["componentType"]]
        width = _TYPE_WIDTH[a["type"]]
        data, stride = self._view_bytes(a["bufferView"])
        itemsize = np.dtype(dtype).itemsize * width
        o = a.get("byteOffset", 0)
        n = a["count"]
        if stride and stride != itemsize:
            rows = [
                np.frombuffer(data, dtype, count=width, offset=o + i * stride)
                for i in range(n)
            ]
            arr = np.stack(rows)
        else:
            arr = np.frombuffer(data, dtype, count=n * width, offset=o).reshape(n, width)
        return arr.squeeze(axis=1) if width == 1 else arr

    def image(self, tex_idx):
        from PIL import Image

        tex = self.gltf["textures"][tex_idx]
        img = self.gltf["images"][tex["source"]]
        if "bufferView" not in img:
            return None
        data, _ = self._view_bytes(img["bufferView"])
        return Image.open(io.BytesIO(data)).convert("RGB")

    @staticmethod
    def _node_matrix(node):
        if "matrix" in node:
            return np.asarray(node["matrix"], np.float64).reshape(4, 4).T
        m = np.eye(4)
        if "scale" in node:
            m[:3, :3] = np.diag(node["scale"])
        if "rotation" in node:  # xyzw quaternion
            x, y, z, w = node["rotation"]
            r = np.array(
                [
                    [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
                    [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
                    [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
                ]
            )
            m[:3, :3] = r @ m[:3, :3]
        if "translation" in node:
            m[:3, 3] = node["translation"]
        return m

    def primitives(self):
        g = self.gltf
        out = []

        def walk(node_idx, parent):
            node = g["nodes"][node_idx]
            mat = parent @ self._node_matrix(node)
            if "mesh" in node:
                mesh = g["meshes"][node["mesh"]]
                name = node.get("name") or mesh.get("name") or f"mesh{node['mesh']}"
                for prim in mesh.get("primitives", []):
                    if prim.get("mode", 4) != 4:  # triangles only
                        continue
                    att = prim["attributes"]
                    pos = self.accessor(att["POSITION"]).astype(np.float64)
                    pos = pos @ mat[:3, :3].T + mat[:3, 3]
                    faces = (
                        self.accessor(prim["indices"]).astype(np.int64).reshape(-1, 3)
                        if "indices" in prim
                        else np.arange(len(pos), dtype=np.int64).reshape(-1, 3)
                    )
                    normal = None
                    if "NORMAL" in att:
                        nrm = self.accessor(att["NORMAL"]).astype(np.float64)
                        normal = nrm @ np.linalg.inv(mat[:3, :3])  # (R^-1)^T^T rows
                    uv = self.accessor(att["TEXCOORD_0"]) if "TEXCOORD_0" in att else None
                    texture, factor = None, (1.0, 1.0, 1.0, 1.0)
                    if "material" in prim:
                        pbr = g["materials"][prim["material"]].get(
                            "pbrMetallicRoughness", {}
                        )
                        factor = tuple(pbr.get("baseColorFactor", (1, 1, 1, 1)))
                        if "baseColorTexture" in pbr:
                            texture = self.image(pbr["baseColorTexture"]["index"])
                    out.append(
                        dict(
                            name=name, pos=pos, faces=faces, normal=normal,
                            uv=uv, texture=texture, factor=factor,
                        )
                    )
            for c in node.get("children", []):
                walk(c, mat)

        scenes = g.get("scenes", [])
        roots = scenes[g.get("scene", 0)]["nodes"] if scenes else range(len(g.get("nodes", [])))
        for r in roots:
            walk(r, np.eye(4))
        return out


# ---------------------------------------------------------------------------
# surface sampling
# ---------------------------------------------------------------------------


def sample_surface(pos, faces, n, rng):
    """Area-weighted triangle sampling -> (points [n,3], face_idx [n], bary [n,3])."""
    tri = pos[faces]  # [F, 3, 3]
    cross = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    area = 0.5 * np.linalg.norm(cross, axis=1)
    total = area.sum()
    if total <= 0 or n <= 0:
        return np.zeros((0, 3)), np.zeros(0, np.int64), np.zeros((0, 3))
    fidx = rng.choice(len(faces), size=n, p=area / total)
    r1, r2 = rng.random(n), rng.random(n)
    u = 1.0 - np.sqrt(r1)
    v = np.sqrt(r1) * r2
    bary = np.stack([u, v, 1.0 - u - v], axis=1)
    pts = np.einsum("nij,ni->nj", tri[fidx], bary)
    return pts, fidx, bary


def texture_lookup(uv, image):
    """UV (y-flipped) -> RGB; out-of-bounds pixels read (0, 0, 0)."""
    w, h = image.size
    tex = np.asarray(image, np.uint8)[..., :3]
    u = (uv[:, 0] * w).astype(np.int64)
    v = ((1.0 - uv[:, 1]) * h).astype(np.int64)
    ok = (u >= 0) & (u < w) & (v >= 0) & (v < h)
    out = np.zeros((len(uv), 3), np.uint8)
    out[ok] = tex[v[ok], u[ok]]
    return out


def _vertex_normals(pos, faces):
    cross = np.cross(pos[faces[:, 1]] - pos[faces[:, 0]], pos[faces[:, 2]] - pos[faces[:, 0]])
    vn = np.zeros_like(pos)
    for k in range(3):
        np.add.at(vn, faces[:, k], cross)
    norm = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(norm, 1e-12)


# ---------------------------------------------------------------------------
# label mappings
# ---------------------------------------------------------------------------


def load_category_index(mapping_tsv):
    """category name -> mpcat40 index (-1 unlabeled), from the official tsv
    (columns raw_category / category / mpcat40)."""
    cat2idx = {"unknown": -1}
    mp = {name: i for i, name in enumerate(MPCAT40)}
    mp["unlabeled"] = -1
    with open(mapping_tsv) as f:
        f.readline()
        for line in f:
            parts = line.rstrip("\n").split("\t")
            if len(parts) == 2:  # lines with an empty raw_category column
                parts.insert(0, "")
            if len(parts) < 3:
                continue
            cat2idx[parts[1]] = mp.get(parts[2], -1)
    return cat2idx


def load_hex_mapping(semantic_txt, cat2idx):
    """semantic.txt lines `instance,HEXCOLOR,"category",region` -> hex -> labels."""
    hex2label = {}
    with open(semantic_txt) as f:
        f.readline()  # header 'HM3D Semantic Annotations'
        for line in f:
            parts = line.strip().split(",")
            if len(parts) < 3:
                continue
            cat = parts[2].strip('"')
            # normalize the two known alias spellings (reference behavior)
            cat = {"trashcan": "trash can", "fridge": "refrigerator"}.get(cat, cat)
            hex2label[parts[1].upper()] = dict(
                instance=parts[0], segment=cat2idx.get(cat, -1)
            )
    return hex2label


# ---------------------------------------------------------------------------
# scene conversion
# ---------------------------------------------------------------------------


def _room_id(name):
    """HM3D chunk naming `<chunk>_group<G>_sub<S>...` -> room id `G_S`."""
    parts = name.split("_")[1:3]
    return "_".join(parts).replace("group", "").replace("sub", "")


def process_scene(scene_glb, output_root, mapping_tsv=None, density=0.02,
                  parse_images=False):
    scene_path = Path(scene_glb)
    label_path = scene_path.with_suffix("").with_suffix(".semantic.glb")
    txt_path = scene_path.with_suffix("").with_suffix(".semantic.txt")
    scene_name = scene_path.parent.name.replace("-", "_")
    scene_id = scene_name.split("_")[0]
    split = "train" if 0 <= int(scene_id) < 800 else "val"
    labeled = label_path.is_file() and txt_path.is_file() and mapping_tsv

    scene = Glb(scene_path)
    label_prims = {}
    hex2label = {}
    if labeled:
        for p in Glb(label_path).primitives():
            label_prims[p["name"].split("_")[0]] = p
        hex2label = load_hex_mapping(txt_path, load_category_index(mapping_tsv))

    rooms = {}
    for prim in scene.primitives():
        rooms.setdefault(_room_id(prim["name"]), []).append(prim)

    written = []
    for room_id, prims in rooms.items():
        seed = int(scene_id + room_id.replace("_", "") or "0")
        rng = np.random.default_rng(seed)
        coord, color, normal, label_color = [], [], [], []
        for prim in prims:
            tri_area = prim["pos"][prim["faces"]]
            cross = np.cross(
                tri_area[:, 1] - tri_area[:, 0], tri_area[:, 2] - tri_area[:, 0]
            )
            num = int(0.5 * np.linalg.norm(cross, axis=1).sum() / density**2)
            if num == 0 or prim["uv"] is None or prim["texture"] is None:
                continue
            pts, fidx, bary = sample_surface(prim["pos"], prim["faces"], num, rng)
            uvs = np.einsum("nij,ni->nj", prim["uv"][prim["faces"][fidx]], bary)
            color.append(texture_lookup(uvs, prim["texture"]))
            vn = prim["normal"]
            if vn is None:
                vn = _vertex_normals(prim["pos"], prim["faces"])
            normal.append(np.einsum("nij,ni->nj", vn[prim["faces"][fidx]], bary))
            coord.append(pts)
            if labeled:
                lp = label_prims.get(prim["name"].split("_")[0])
                if lp is not None and lp["texture"] is not None:
                    label_color.append(texture_lookup(uvs, lp["texture"]))
                else:
                    label_color.append(np.zeros((num, 3), np.uint8))
        if not coord:
            continue
        data = dict(
            coord=np.concatenate(coord).astype(np.float32),
            color=np.concatenate(color).astype(np.uint8),
            normal=np.concatenate(normal).astype(np.float32),
        )
        if labeled:
            lc = np.concatenate(label_color)
            segment = np.full(len(lc), -1, np.int16)
            instance = np.full(len(lc), -1, np.int16)
            uniq, inv = np.unique(lc, axis=0, return_inverse=True)
            for i, c in enumerate(uniq):
                hexc = "{:02X}{:02X}{:02X}".format(*c)
                m = inv == i
                instance[m] = i
                if hexc in hex2label:
                    segment[m] = hex2label[hexc]["segment"]
            data["segment"] = segment
            data["instance"] = instance
        out = Path(output_root) / split / f"{scene_name}_{room_id}"
        out.mkdir(parents=True, exist_ok=True)
        for k, v in data.items():
            np.save(out / f"{k}.npy", v)
        if parse_images:
            im_dir = Path(output_root) / "images" / split / f"{scene_name}_{room_id}"
            export_room_images(str(im_dir), data["coord"], data["color"], rng)
        written.append(str(out))
    return written


# posed-image export (reference concerto/hm3d/preprocessed_hm3d.py:265-520):
# HFOV-90 720^2 pinhole, NUM_ROTATIONS yaw views per room from a jittered
# room-center eye position, per-frame pose + depth + correspondence tables.
# The reference renders through habitat-sim; here the room's own sampled
# surface cloud is splatted through a z-buffer (no simulator dependency) —
# same tree layout, pose convention (cam-to-world), mm-uint16 depth and
# (pixel_x, pixel_y, point_index) correspondence rows.
HFOV = 90.0
RESOLUTION = (720, 720)
NUM_ROTATIONS = 4


def camera_intrinsic(resolution=RESOLUTION, hfov=HFOV):
    f = resolution[1] / (2.0 * np.tan(np.deg2rad(hfov) / 2.0))
    return np.array(
        [[f, 0, resolution[1] / 2.0], [0, f, resolution[0] / 2.0], [0, 0, 1]],
        np.float64,
    )


def yaw_pose(position, heading_deg):
    """cam-to-world [4,4] for a y-up world: OpenCV camera (x right, y down,
    z forward) looking horizontally along `heading_deg` about +y."""
    a = np.deg2rad(heading_deg)
    z_c = np.array([np.sin(a), 0.0, -np.cos(a)])  # forward
    y_c = np.array([0.0, -1.0, 0.0])  # down
    x_c = np.cross(y_c, z_c)
    pose = np.eye(4)
    pose[:3, 0], pose[:3, 1], pose[:3, 2] = x_c, y_c, z_c
    pose[:3, 3] = position
    return pose


def render_rgbd(coord, color, intrinsic, pose, hw, splat=2):
    """Point-splat z-buffer render: (uint8 [H,W,3] rgb, uint16 [H,W] depth mm).

    Each visible point covers a (2*splat+1)^2 pixel footprint; the nearest
    point per pixel wins (single lexsort, no python loop)."""
    from pointcept_tpu.datasets.preprocessing.concerto.common import project_points

    h, w = hw
    uv, z, inside = project_points(coord, intrinsic, np.linalg.inv(pose), hw)
    idx = np.flatnonzero(inside)
    rgb = np.zeros((h, w, 3), np.uint8)
    depth = np.zeros((h, w), np.uint16)
    if idx.size == 0:
        return rgb, depth
    ui = np.round(uv[idx]).astype(np.int64)
    zz = z[idx]
    cc = np.asarray(color)[idx]
    offs = np.arange(-splat, splat + 1)
    ox, oy = np.meshgrid(offs, offs, indexing="ij")
    px = (ui[:, 0][:, None] + ox.ravel()[None]).ravel()
    py = (ui[:, 1][:, None] + oy.ravel()[None]).ravel()
    k = offs.size * offs.size
    zs = np.repeat(zz, k)
    cs = np.repeat(cc, k, axis=0)
    ok = (px >= 0) & (px < w) & (py >= 0) & (py < h)
    px, py, zs, cs = px[ok], py[ok], zs[ok], cs[ok]
    flat = py * w + px
    order = np.lexsort((zs, flat))
    head = np.concatenate([[True], flat[order][1:] != flat[order][:-1]])
    win = order[head]
    rgb.reshape(-1, 3)[flat[win]] = cs[win]
    depth.reshape(-1)[flat[win]] = np.clip(zs[win] * 1000.0, 0, 65535).astype(np.uint16)
    return rgb, depth


def export_room_images(
    im_dir,
    coord,
    color,
    rng,
    num_rotations=NUM_ROTATIONS,
    resolution=RESOLUTION,
    eye_height=1.5,
    parse_depths=True,
):
    """Render + write one room's posed-image tree (color/pose/intrinsic/
    depth/correspondence). Camera: room centroid jittered +-0.25 m (reference
    navmesh-vertex mean + uniform jitter), eye at floor + `eye_height`,
    `num_rotations` evenly spaced yaws from a random initial heading."""
    from pointcept_tpu.datasets.preprocessing.concerto.common import export_image_scene

    k = camera_intrinsic(resolution)
    center = coord.mean(axis=0) + rng.uniform(-0.25, 0.25, 3)
    floor = np.percentile(coord[:, 1], 5.0)
    pos = np.array([center[0], floor + eye_height, center[2]])
    init = rng.uniform(0.0, 90.0)
    poses, colors, depths = [], [], []
    for heading in np.linspace(init, init + 360.0, num_rotations + 1)[:-1]:
        pose = yaw_pose(pos, heading)
        rgb, depth = render_rgbd(coord, color, k, pose, resolution)
        poses.append(pose)
        colors.append(rgb)
        depths.append(depth)
    export_image_scene(
        im_dir, colors, poses, k,
        coord=coord, depths=depths if parse_depths else None,
    )
    return len(poses)


def filter_scenes(dataset_root, num_keep=10000):
    """Move all but the largest `num_keep` rooms to `<split>_rm` (reference
    `filter_hm3d.py` semantics: rank by color.npy point count)."""
    rooms = [
        p
        for p in glob.glob(os.path.join(dataset_root, "*", "*"))
        if os.path.isfile(os.path.join(p, "color.npy"))
    ]
    if len(rooms) <= num_keep:
        return []
    sizes = np.array([np.load(os.path.join(p, "color.npy"), mmap_mode="r").shape[0] for p in rooms])
    moved = []
    for i in np.argsort(sizes)[: len(rooms) - num_keep]:
        src = rooms[i]
        dst_dir = os.path.dirname(src) + "_rm"
        os.makedirs(dst_dir, exist_ok=True)
        shutil.move(src, dst_dir)
        moved.append(src)
    return moved


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_root", required=True)
    parser.add_argument("--output_root")
    parser.add_argument("--mapping_tsv", help="hm3dsem_category_mappings.tsv path")
    parser.add_argument("--density", type=float, default=0.02)
    parser.add_argument("--filter", action="store_true")
    parser.add_argument(
        "--parse_images", action="store_true",
        help="also render posed RGB-D views + correspondence tables per room",
    )
    parser.add_argument("--num_keep", type=int, default=10000)
    args = parser.parse_args()
    if args.filter:
        moved = filter_scenes(args.dataset_root, args.num_keep)
        print(f"moved {len(moved)} rooms")
        return
    assert args.output_root, "--output_root required"
    scenes = [
        s
        for s in sorted(glob.glob(os.path.join(args.dataset_root, "*", "*.glb")))
        if not s.endswith("semantic.glb")
    ]
    for s in scenes:
        rooms = process_scene(s, args.output_root, args.mapping_tsv, args.density,
                              parse_images=args.parse_images)
        print(f"{s}: {len(rooms)} rooms")


if __name__ == "__main__":
    # allow running as a plain script (python .../hm3d.py): the image-export
    # helpers import from the package
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[3]))
    main()
