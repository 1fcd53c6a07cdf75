"""Host-side (numpy) data transforms.

Parity target: reference `pointcept/datasets/transform.py` (44 registered
transforms). These run in dataloader workers on CPU, exactly like the
reference — augmentation is inherently per-scene ragged work; the TPU sees only
the final padded PointBatch from the collate step. Implementations match the
reference's semantics (several, e.g. GridSample's voxel bucketing and
ElasticDistortion's blurred-lattice numerics, are behavior-exact by design);
citations give the reference class line numbers.
"""

from __future__ import annotations

import copy
import numbers
import random
from collections.abc import Mapping, Sequence

import numpy as np

from pointcept_tpu.utils.registry import Registry

TRANSFORMS = Registry("transforms")

DEFAULT_INDEX_VALID_KEYS = [
    "coord",
    "color",
    "normal",
    "superpoint",
    "strength",
    "segment",
    "instance",
]


def index_operator(data_dict, index, duplicate=False):
    """Apply index selection to all keys in index_valid_keys (reference `:23`)."""
    if "index_valid_keys" not in data_dict:
        data_dict["index_valid_keys"] = list(DEFAULT_INDEX_VALID_KEYS)
    if not duplicate:
        for key in data_dict["index_valid_keys"]:
            if key in data_dict:
                data_dict[key] = data_dict[key][index]
        return data_dict
    out = dict()
    for key in data_dict.keys():
        if key in data_dict["index_valid_keys"]:
            out[key] = data_dict[key][index]
        elif key == "index_valid_keys":
            out[key] = copy.copy(data_dict[key])
        else:
            out[key] = data_dict[key]
    return out


class Compose:
    """Sequential transform pipeline built from a list of cfg dicts (reference `:1358`)."""

    def __init__(self, cfg=None):
        self.cfg = cfg if cfg is not None else []
        self.transforms = [TRANSFORMS.build(dict(t)) for t in self.cfg]

    def __call__(self, data_dict):
        for t in self.transforms:
            data_dict = t(data_dict)
        return data_dict


@TRANSFORMS.register_module()
class Collect:
    """Assemble the final sample: pick keys, emit offset, concat feat_keys (reference `:54`)."""

    def __init__(self, keys, offset_keys_dict=None, **kwargs):
        if offset_keys_dict is None:
            offset_keys_dict = dict(offset="coord")
        self.keys = [keys] if isinstance(keys, str) else list(keys)
        self.offset_keys = offset_keys_dict
        self.kwargs = kwargs

    def __call__(self, data_dict):
        data = dict()
        for key in self.keys:
            data[key] = data_dict[key]
        for key, value in self.offset_keys.items():
            data[key] = np.array([data_dict[value].shape[0]])
        for name, keys in self.kwargs.items():
            name = name.replace("_keys", "")
            assert isinstance(keys, Sequence)
            data[name] = np.concatenate(
                [np.asarray(data_dict[key], dtype=np.float32) for key in keys], axis=1
            )
        return data


@TRANSFORMS.register_module()
class Copy:
    def __init__(self, keys_dict=None):
        self.keys_dict = keys_dict if keys_dict is not None else dict(coord="origin_coord", segment="origin_segment")

    def __call__(self, data_dict):
        for key, value in self.keys_dict.items():
            v = data_dict[key]
            data_dict[value] = v.copy() if isinstance(v, np.ndarray) else copy.deepcopy(v)
        return data_dict


@TRANSFORMS.register_module("Add")
@TRANSFORMS.register_module()
class Update:
    def __init__(self, keys_dict=None):
        self.keys_dict = keys_dict if keys_dict is not None else dict()

    def __call__(self, data_dict):
        for key, value in self.keys_dict.items():
            data_dict[key] = value
        return data_dict


@TRANSFORMS.register_module()
class ToTensor:
    """No-op in the TPU stack (arrays stay numpy until collate)."""

    def __call__(self, data):
        return data


@TRANSFORMS.register_module()
class NormalizeColor:
    def __call__(self, data_dict):
        if "color" in data_dict:
            data_dict["color"] = data_dict["color"] / 255
        return data_dict


@TRANSFORMS.register_module()
class NormalizeCoord:
    def __call__(self, data_dict):
        if "coord" in data_dict:
            centroid = np.mean(data_dict["coord"], axis=0)
            data_dict["coord"] = data_dict["coord"] - centroid
            m = np.max(np.sqrt(np.sum(data_dict["coord"] ** 2, axis=1)))
            data_dict["coord"] = data_dict["coord"] / m
        return data_dict


@TRANSFORMS.register_module()
class PositiveShift:
    def __call__(self, data_dict):
        if "coord" in data_dict:
            data_dict["coord"] = data_dict["coord"] - np.min(data_dict["coord"], 0)
        return data_dict


@TRANSFORMS.register_module()
class CenterShift:
    def __init__(self, apply_z=True):
        self.apply_z = apply_z

    def __call__(self, data_dict):
        if "coord" in data_dict:
            x_min, y_min, z_min = data_dict["coord"].min(axis=0)
            x_max, y_max, _ = data_dict["coord"].max(axis=0)
            shift = [(x_min + x_max) / 2, (y_min + y_max) / 2, z_min if self.apply_z else 0]
            data_dict["coord"] = data_dict["coord"] - shift
        return data_dict


@TRANSFORMS.register_module()
class RandomShift:
    def __init__(self, shift=((-0.2, 0.2), (-0.2, 0.2), (0, 0))):
        self.shift = shift

    def __call__(self, data_dict):
        if "coord" in data_dict:
            s = [np.random.uniform(lo, hi) for lo, hi in self.shift]
            data_dict["coord"] = data_dict["coord"] + s
        return data_dict


@TRANSFORMS.register_module()
class PointClip:
    def __init__(self, point_cloud_range=(-80, -80, -3, 80, 80, 1)):
        self.point_cloud_range = point_cloud_range

    def __call__(self, data_dict):
        if "coord" in data_dict:
            data_dict["coord"] = np.clip(
                data_dict["coord"],
                a_min=np.asarray(self.point_cloud_range[:3]),
                a_max=np.asarray(self.point_cloud_range[3:]),
            )
        return data_dict


@TRANSFORMS.register_module()
class RandomDropout:
    def __init__(self, dropout_ratio=0.2, dropout_application_ratio=0.5):
        self.dropout_ratio = dropout_ratio
        self.dropout_application_ratio = dropout_application_ratio

    def __call__(self, data_dict):
        if random.random() < self.dropout_application_ratio:
            n = len(data_dict["coord"])
            idx = np.random.choice(n, int(n * (1 - self.dropout_ratio)), replace=False)
            if "sampled_index" in data_dict:
                idx = np.unique(np.append(idx, data_dict["sampled_index"]))
                mask = np.zeros_like(data_dict["segment"]).astype(bool)
                mask[data_dict["sampled_index"]] = True
                data_dict["sampled_index"] = np.where(mask[idx])[0]
            data_dict = index_operator(data_dict, idx)
        return data_dict


def _rotation_matrix(axis: str, angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    if axis == "x":
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])
    if axis == "y":
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
    if axis == "z":
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    raise NotImplementedError(axis)


class _RotateBase:
    def _apply_rotation(self, data_dict, angle):
        rot_t = _rotation_matrix(self.axis, angle)
        if "coord" in data_dict:
            if self.center is None:
                mins = data_dict["coord"].min(axis=0)
                maxs = data_dict["coord"].max(axis=0)
                center = (mins + maxs) / 2
            else:
                center = np.asarray(self.center)
            data_dict["coord"] = (data_dict["coord"] - center) @ rot_t.T + center
        if "normal" in data_dict:
            data_dict["normal"] = data_dict["normal"] @ rot_t.T
        return data_dict


@TRANSFORMS.register_module()
class RandomRotate(_RotateBase):
    def __init__(self, angle=None, center=None, axis="z", always_apply=False, p=0.5):
        self.angle = [-1, 1] if angle is None else angle
        self.axis = axis
        self.center = center
        self.p = 1 if always_apply else p

    def __call__(self, data_dict):
        if random.random() > self.p:
            return data_dict
        angle = np.random.uniform(self.angle[0], self.angle[1]) * np.pi
        return self._apply_rotation(data_dict, angle)


@TRANSFORMS.register_module()
class RandomRotateTargetAngle(_RotateBase):
    def __init__(self, angle=(1 / 2, 1, 3 / 2), center=None, axis="z", always_apply=False, p=0.75):
        self.angle = angle
        self.axis = axis
        self.center = center
        self.p = 1 if always_apply else p

    def __call__(self, data_dict):
        if random.random() > self.p:
            return data_dict
        angle = np.random.choice(self.angle) * np.pi
        return self._apply_rotation(data_dict, angle)


@TRANSFORMS.register_module()
class RandomScale:
    def __init__(self, scale=None, anisotropic=False):
        self.scale = scale if scale is not None else [0.95, 1.05]
        self.anisotropic = anisotropic

    def __call__(self, data_dict):
        if "coord" in data_dict:
            scale = np.random.uniform(self.scale[0], self.scale[1], 3 if self.anisotropic else 1)
            data_dict["coord"] = data_dict["coord"] * scale
        return data_dict


@TRANSFORMS.register_module()
class RandomFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, data_dict):
        for dim in (0, 1):
            if np.random.rand() < self.p:
                if "coord" in data_dict:
                    data_dict["coord"][:, dim] = -data_dict["coord"][:, dim]
                if "normal" in data_dict:
                    data_dict["normal"][:, dim] = -data_dict["normal"][:, dim]
        return data_dict


@TRANSFORMS.register_module()
class RandomJitter:
    def __init__(self, sigma=0.01, clip=0.05):
        assert clip > 0
        self.sigma = sigma
        self.clip = clip

    def __call__(self, data_dict):
        if "coord" in data_dict:
            jitter = np.clip(self.sigma * np.random.randn(data_dict["coord"].shape[0], 3), -self.clip, self.clip)
            data_dict["coord"] = data_dict["coord"] + jitter
        return data_dict


@TRANSFORMS.register_module()
class ClipGaussianJitter:
    def __init__(self, scalar=0.02, store_jitter=False):
        self.scalar = scalar
        self.store_jitter = store_jitter

    def __call__(self, data_dict):
        if "coord" in data_dict:
            jitter = np.random.multivariate_normal(np.zeros(3), np.identity(3), data_dict["coord"].shape[0])
            jitter = self.scalar * np.clip(jitter / 1.96, -1, 1)
            data_dict["coord"] = data_dict["coord"] + jitter
            if self.store_jitter:
                data_dict["jitter"] = jitter
        return data_dict


@TRANSFORMS.register_module()
class ChromaticAutoContrast:
    def __init__(self, p=0.2, blend_factor=None):
        self.p = p
        self.blend_factor = blend_factor

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.rand() < self.p:
            color = data_dict["color"]
            lo = np.min(color, 0, keepdims=True)
            hi = np.max(color, 0, keepdims=True)
            diff = hi - lo
            if not np.any(diff > 0):
                return data_dict
            scale = np.divide(255, diff, out=np.ones_like(diff, dtype=color.dtype), where=diff > 0)
            contrast_feat = (color[:, :3] - lo) * scale
            blend = np.random.rand() if self.blend_factor is None else self.blend_factor
            data_dict["color"][:, :3] = (1 - blend) * color[:, :3] + blend * contrast_feat
        return data_dict


@TRANSFORMS.register_module()
class ChromaticTranslation:
    def __init__(self, p=0.95, ratio=0.05):
        self.p = p
        self.ratio = ratio

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.rand() < self.p:
            tr = (np.random.rand(1, 3) - 0.5) * 255 * 2 * self.ratio
            data_dict["color"][:, :3] = np.clip(tr + data_dict["color"][:, :3], 0, 255)
        return data_dict


@TRANSFORMS.register_module()
class ChromaticJitter:
    def __init__(self, p=0.95, std=0.005):
        self.p = p
        self.std = std

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.rand() < self.p:
            noise = np.random.randn(data_dict["color"].shape[0], 3) * self.std * 255
            data_dict["color"][:, :3] = np.clip(noise + data_dict["color"][:, :3], 0, 255)
        return data_dict


@TRANSFORMS.register_module()
class RandomColorGrayScale:
    def __init__(self, p):
        self.p = p

    @staticmethod
    def rgb_to_grayscale(color, num_output_channels=1):
        if color.shape[-1] < 3:
            raise TypeError(f"Input color should have at least 3 channels, found {color.shape[-1]}")
        if num_output_channels not in (1, 3):
            raise ValueError("num_output_channels should be either 1 or 3")
        r, g, b = color[..., 0], color[..., 1], color[..., 2]
        gray = (0.2989 * r + 0.587 * g + 0.114 * b).astype(color.dtype)[..., None]
        if num_output_channels == 3:
            gray = np.broadcast_to(gray, color.shape)
        return gray

    def __call__(self, data_dict):
        if np.random.rand() < self.p:
            data_dict["color"] = self.rgb_to_grayscale(data_dict["color"], 3)
        return data_dict


@TRANSFORMS.register_module()
class RandomColorDrop:
    """Zero out colors with probability p (reference transform.py RandomColorDrop)."""

    def __init__(self, p: float = 0.2, color_augment: float = 0.0):
        self.p = p
        self.color_augment = color_augment

    def __call__(self, data_dict):
        if "color" in data_dict and np.random.rand() < self.p:
            data_dict["color"] = data_dict["color"] * self.color_augment
        return data_dict


@TRANSFORMS.register_module()
class HueSaturationTranslation:
    """HSV-space hue/saturation jitter on 0-255 rgb (reference `:671`)."""

    # Vectorized colorsys semantics (hue in [0,1), s/v on the raw 0-255
    # scale), written via the chroma form and the piecewise-linear "k
    # formula" (Wikipedia, "HSL and HSV: Alternative HSV conversion").
    # Parity vs stdlib colorsys is asserted in tests/test_transforms.py.

    @staticmethod
    def rgb_to_hsv(rgb):
        x = rgb[..., :3].astype(np.float64)
        v = x.max(axis=-1)
        chroma = v - x.min(axis=-1)
        s = np.divide(chroma, v, out=np.zeros_like(v), where=v > 0)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        safe_c = np.where(chroma > 0, chroma, 1.0)
        # signed fractional position within the sector of the largest channel
        sector = np.choose(
            x.argmax(axis=-1),
            [(g - b) / safe_c, 2.0 + (b - r) / safe_c, 4.0 + (r - g) / safe_c],
        )
        h = np.where(chroma > 0, (sector / 6.0) % 1.0, 0.0)
        return np.stack([h, s, v], axis=-1)

    @staticmethod
    def hsv_to_rgb(hsv):
        h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]

        def channel(n):
            k = (n + h * 6.0) % 6.0
            return v * (1.0 - s * np.clip(np.minimum(k, 4.0 - k), 0.0, 1.0))

        out = np.stack([channel(5.0), channel(3.0), channel(1.0)], axis=-1)
        # round (not truncate): the piecewise-linear form above reproduces
        # integer channel values only up to float rounding (e.g. 97.999...)
        return np.clip(np.rint(out), 0, 255).astype("uint8")

    def __init__(self, hue_max=0.5, saturation_max=0.2):
        self.hue_max = hue_max
        self.saturation_max = saturation_max

    def __call__(self, data_dict):
        if "color" in data_dict:
            hsv = self.rgb_to_hsv(data_dict["color"][:, :3])
            hue_val = (np.random.rand() - 0.5) * 2 * self.hue_max
            sat_ratio = 1 + (np.random.rand() - 0.5) * 2 * self.saturation_max
            hsv[..., 0] = np.remainder(hue_val + hsv[..., 0] + 1, 1)
            hsv[..., 1] = np.clip(sat_ratio * hsv[..., 1], 0, 1)
            data_dict["color"][:, :3] = np.clip(self.hsv_to_rgb(hsv), 0, 255)
        return data_dict


@TRANSFORMS.register_module()
class RandomColorJitter:
    """torchvision-style brightness/contrast/saturation/hue jitter (reference `:487`)."""

    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0, p=0.95):
        self.brightness = self._check_input(brightness, "brightness")
        self.contrast = self._check_input(contrast, "contrast")
        self.saturation = self._check_input(saturation, "saturation")
        self.hue = self._check_input(hue, "hue", center=0, bound=(-0.5, 0.5), clip_first_on_zero=False)
        self.p = p

    @staticmethod
    def _check_input(value, name, center=1, bound=(0, float("inf")), clip_first_on_zero=True):
        if isinstance(value, numbers.Number):
            if value < 0:
                raise ValueError(f"If {name} is a single number, it must be non negative.")
            value = [center - float(value), center + float(value)]
            if clip_first_on_zero:
                value[0] = max(value[0], 0.0)
        elif isinstance(value, (tuple, list)) and len(value) == 2:
            if not bound[0] <= value[0] <= value[1] <= bound[1]:
                raise ValueError(f"{name} values should be between {bound}")
        else:
            raise TypeError(f"{name} should be a number or a pair")
        if value[0] == value[1] == center:
            value = None
        return value

    @staticmethod
    def blend(color1, color2, ratio):
        return (float(ratio) * color1 + (1.0 - float(ratio)) * color2).clip(0, 255.0).astype(color1.dtype)

    def adjust_brightness(self, color, factor):
        return self.blend(color, np.zeros_like(color), factor)

    def adjust_contrast(self, color, factor):
        mean = np.mean(RandomColorGrayScale.rgb_to_grayscale(color))
        return self.blend(color, mean, factor)

    def adjust_saturation(self, color, factor):
        gray = RandomColorGrayScale.rgb_to_grayscale(color, 3)
        return self.blend(color, gray, factor)

    def adjust_hue(self, color, factor):
        if not (-0.5 <= factor <= 0.5):
            raise ValueError(f"hue_factor ({factor}) is not in [-0.5, 0.5].")
        hsv = HueSaturationTranslation.rgb_to_hsv(color)
        hsv[..., 0] = (hsv[..., 0] + factor) % 1.0
        return HueSaturationTranslation.hsv_to_rgb(hsv).astype(color.dtype)

    def __call__(self, data_dict):
        if "color" not in data_dict:
            return data_dict
        fn_idx = np.random.permutation(4)
        b = None if self.brightness is None else np.random.uniform(*self.brightness)
        c = None if self.contrast is None else np.random.uniform(*self.contrast)
        s = None if self.saturation is None else np.random.uniform(*self.saturation)
        h = None if self.hue is None else np.random.uniform(*self.hue)
        for fn_id in fn_idx:
            if fn_id == 0 and b is not None and np.random.rand() < self.p:
                data_dict["color"] = self.adjust_brightness(data_dict["color"], b)
            elif fn_id == 1 and c is not None and np.random.rand() < self.p:
                data_dict["color"] = self.adjust_contrast(data_dict["color"], c)
            elif fn_id == 2 and s is not None and np.random.rand() < self.p:
                data_dict["color"] = self.adjust_saturation(data_dict["color"], s)
            elif fn_id == 3 and h is not None and np.random.rand() < self.p:
                data_dict["color"] = self.adjust_hue(data_dict["color"], h)
        return data_dict


@TRANSFORMS.register_module()
class RandomDropColor:
    def __init__(self, drop_ratio=0.2, drop_application_ratio=0.5):
        self.drop_ratio = drop_ratio
        self.drop_application_ratio = drop_application_ratio

    def __call__(self, data_dict):
        if "color" in data_dict and random.random() < self.drop_application_ratio:
            n = len(data_dict["color"])
            idx = np.random.choice(n, int(n * self.drop_ratio), replace=False)
            data_dict["color"][idx] = 0.0
        return data_dict


@TRANSFORMS.register_module()
class RandomDropNormal:
    def __init__(self, drop_ratio=0.2, drop_application_ratio=0.5):
        self.drop_ratio = drop_ratio
        self.drop_application_ratio = drop_application_ratio

    def __call__(self, data_dict):
        if "normal" in data_dict and random.random() < self.drop_application_ratio:
            n = len(data_dict["normal"])
            idx = np.random.choice(n, int(n * self.drop_ratio), replace=False)
            data_dict["normal"][idx] = 0.0
        return data_dict


@TRANSFORMS.register_module()
class ElasticDistortion:
    """Smooth random displacement field on coords (reference `:779`)."""

    def __init__(self, distortion_params=None):
        self.distortion_params = [[0.2, 0.4], [0.8, 1.6]] if distortion_params is None else distortion_params

    @staticmethod
    def elastic_distortion(coords, granularity, magnitude):
        """Gaussian-ish displacement lattice (box-blurred white noise, cell
        size = `granularity`, one-cell apron) sampled trilinearly at each
        point. Matches the reference's numerics (`transform.py:786-825`):
        separable 3-tap box blur applied twice == its explicit xyz kernels."""
        from scipy.ndimage import map_coordinates, uniform_filter

        cmin = coords.min(0)
        dims = ((coords.max(0) - cmin) // granularity).astype(int) + 3
        lattice = np.random.randn(*dims, 3).astype(np.float32)
        for _ in range(2):
            lattice = uniform_filter(lattice, size=(3, 3, 3, 1), mode="constant")
        # lattice origin is one cell below the cloud minimum, so every point's
        # fractional index lies strictly inside the lattice
        u = ((coords - cmin) / granularity + 1.0).T.astype(np.float32)
        disp = np.stack(
            [map_coordinates(lattice[..., a], u, order=1) for a in range(3)], axis=1
        )
        return coords + disp * magnitude

    def __call__(self, data_dict):
        if "coord" in data_dict and self.distortion_params is not None:
            if random.random() < 0.95:
                for granularity, magnitude in self.distortion_params:
                    data_dict["coord"] = self.elastic_distortion(data_dict["coord"], granularity, magnitude)
        return data_dict


@TRANSFORMS.register_module()
class GridSample:
    """Hash-based voxel sampling (reference `:840`).

    train mode: one random point per voxel; test mode: `count.max()` exhaustive
    complementary subsets, each with its source `index`.
    """

    def __init__(
        self,
        grid_size=0.05,
        hash_type="fnv",
        mode="train",
        keys=None,  # accepted for config parity
        return_inverse=False,
        return_grid_coord=False,
        return_min_coord=False,
        return_displacement=False,
        project_displacement=False,
    ):
        self.grid_size = grid_size
        self.hash = self.fnv_hash_vec if hash_type == "fnv" else self.ravel_hash_vec
        assert mode in ["train", "test"]
        self.mode = mode
        self.return_inverse = return_inverse
        self.return_grid_coord = return_grid_coord
        self.return_min_coord = return_min_coord
        self.return_displacement = return_displacement
        self.project_displacement = project_displacement

    def _voxel_runs(self, coord):
        """Voxelize: returns (grid_coord, scaled_coord, min_coord, order,
        starts, counts, voxel_of_point).

        Points of one voxel form a contiguous run of `order` at
        [starts[v], starts[v] + counts[v]); voxel_of_point maps each original
        point to its voxel's run id.
        """
        scaled = coord / self.grid_size
        grid = np.floor(scaled).astype(np.int64)
        gmin = grid.min(0)
        grid = grid - gmin
        scaled = scaled - gmin
        key = self.hash(grid)
        order = np.argsort(key)
        sk = key[order]
        head = np.empty(sk.shape[0], bool)
        head[0] = True
        np.not_equal(sk[1:], sk[:-1], out=head[1:])
        starts = np.flatnonzero(head)
        counts = np.diff(np.append(starts, sk.shape[0]))
        voxel_of_point = np.empty_like(order)
        voxel_of_point[order] = np.cumsum(head) - 1
        return grid, scaled, gmin * self.grid_size, order, starts, counts, voxel_of_point

    def _attach(self, out, picked, grid_coord, scaled_coord, min_coord, voxel_of_point, normal):
        if self.return_inverse:
            out["inverse"] = voxel_of_point
        if self.return_grid_coord:
            out["grid_coord"] = grid_coord[picked]
            if "grid_coord" not in out["index_valid_keys"]:
                out["index_valid_keys"] = list(out["index_valid_keys"]) + ["grid_coord"]
        if self.return_min_coord:
            out["min_coord"] = min_coord.reshape(1, 3)
        if self.return_displacement:
            # offset from the voxel center, in voxel units
            disp = scaled_coord - np.floor(scaled_coord) - 0.5
            if self.project_displacement:
                disp = np.sum(disp * normal, axis=-1, keepdims=True)
            out["displacement"] = disp[picked]
            if "displacement" not in out["index_valid_keys"]:
                out["index_valid_keys"] = list(out["index_valid_keys"]) + ["displacement"]
        return out

    def __call__(self, data_dict):
        assert "coord" in data_dict
        grid_coord, scaled_coord, min_coord, order, starts, counts, vox = self._voxel_runs(
            data_dict["coord"]
        )
        normal = data_dict.get("normal")
        if self.mode == "train":
            # one uniformly random point per voxel
            offsets = np.random.randint(0, counts.max(), counts.size) % counts
            picked = order[starts + offsets]
            if "sampled_index" in data_dict:
                # points required to survive sampling (data-efficient LA/LR
                # benchmarks, reference `transform.py:874-914`)
                must_keep = data_dict["sampled_index"]
                picked = np.unique(np.append(picked, must_keep))
                keep_mask = np.zeros(len(data_dict["segment"]), bool)
                keep_mask[must_keep] = True
                data_dict["sampled_index"] = np.flatnonzero(keep_mask[picked])
            data_dict = index_operator(data_dict, picked)
            return self._attach(
                data_dict, picked, grid_coord, scaled_coord, min_coord, vox, normal
            )

        # test mode: round-robin over each voxel's run -> count.max()
        # complementary subsets that together cover every point exactly once
        parts = []
        for i in range(counts.max()):
            picked = order[starts + i % counts]
            part = index_operator(data_dict, picked, duplicate=True)
            part["index"] = picked
            parts.append(
                self._attach(part, picked, grid_coord, scaled_coord, min_coord, vox, normal)
            )
        return parts

    @staticmethod
    def ravel_hash_vec(arr):
        """Row-wise mixed-radix ravel (collision-free for non-negative grids)."""
        assert arr.ndim == 2
        arr = np.ascontiguousarray(arr, dtype=np.int64)
        arr = (arr - arr.min(0)).astype(np.uint64)
        radix = arr.max(0).astype(np.uint64) + np.uint64(1)
        h = arr[:, 0]
        for j in range(1, arr.shape[1]):
            h = h * radix[j] + arr[:, j]
        return h

    @staticmethod
    def fnv_hash_vec(arr):
        """Row-wise FNV-1a (standard 64-bit offset basis / prime)."""
        assert arr.ndim == 2
        arr = np.ascontiguousarray(arr, dtype=np.uint64)
        h = np.full(arr.shape[0], np.uint64(0xCBF29CE484222325))
        for col in arr.T:
            h = (h * np.uint64(0x100000001B3)) ^ col
        return h


@TRANSFORMS.register_module()
class SphereCrop:
    def __init__(self, point_max=80000, sample_rate=None, mode="random"):
        self.point_max = point_max
        self.sample_rate = sample_rate
        assert mode in ["random", "center", "all"]
        self.mode = mode

    def __call__(self, data_dict):
        point_max = (
            int(self.sample_rate * data_dict["coord"].shape[0]) if self.sample_rate is not None else self.point_max
        )
        assert "coord" in data_dict
        if data_dict["coord"].shape[0] > point_max:
            if self.mode == "random":
                center = data_dict["coord"][np.random.randint(data_dict["coord"].shape[0])]
            elif self.mode == "center":
                center = data_dict["coord"][data_dict["coord"].shape[0] // 2]
            else:
                raise NotImplementedError
            idx_crop = np.argsort(np.sum(np.square(data_dict["coord"] - center), 1))[:point_max]
            data_dict = index_operator(data_dict, idx_crop)
        return data_dict


@TRANSFORMS.register_module()
class ShufflePoint:
    def __call__(self, data_dict):
        assert "coord" in data_dict
        shuffle_index = np.arange(data_dict["coord"].shape[0])
        np.random.shuffle(shuffle_index)
        return index_operator(data_dict, shuffle_index)


@TRANSFORMS.register_module()
class CropBoundary:
    def __call__(self, data_dict):
        assert "segment" in data_dict
        segment = data_dict["segment"].flatten()
        mask = (segment != 0) * (segment != 1)
        return index_operator(data_dict, mask)


@TRANSFORMS.register_module()
class ContrastiveViewsGenerator:
    """Two independently augmented views for MSC pretraining (reference `:1081`)."""

    def __init__(self, view_keys=("coord", "color", "normal", "origin_coord"), view_trans_cfg=None):
        self.view_keys = view_keys
        self.view_trans = Compose(view_trans_cfg)

    def __call__(self, data_dict):
        view1_dict = {k: data_dict[k].copy() for k in self.view_keys}
        view2_dict = {k: data_dict[k].copy() for k in self.view_keys}
        view1_dict = self.view_trans(view1_dict)
        view2_dict = self.view_trans(view2_dict)
        for key, value in view1_dict.items():
            data_dict["view1_" + key] = value
        for key, value in view2_dict.items():
            data_dict["view2_" + key] = value
        return data_dict


@TRANSFORMS.register_module()
class MultiViewGenerator:
    """Global/local multi-view crops for Sonata-style self-distillation
    (reference `:1106`): one major spherical view, further global views centered
    inside it, and local views with cover-mask resampling; per-view aug then
    concat with global_/local_ prefixes and offsets. (The Concerto 2D
    correspondence path is handled by the image dataset variants.)"""

    def __init__(
        self,
        global_view_num=2,
        global_view_scale=(0.4, 1.0),
        local_view_num=4,
        local_view_scale=(0.1, 0.4),
        global_shared_transform=None,
        global_transform=None,
        local_transform=None,
        max_size=65536,
        center_height_scale=(0, 1),
        shared_global_view=False,
        view_keys=("coord", "origin_coord", "color", "normal"),
    ):
        self.global_view_num = global_view_num
        self.global_view_scale = global_view_scale
        self.local_view_num = local_view_num
        self.local_view_scale = local_view_scale
        self.global_shared_transform = Compose(global_shared_transform)
        self.global_transform = Compose(global_transform)
        self.local_transform = Compose(local_transform)
        self.max_size = max_size
        self.center_height_scale = center_height_scale
        self.shared_global_view = shared_global_view
        self.view_keys = view_keys
        assert "coord" in view_keys

    def get_view(self, point, center, scale):
        coord = point["coord"]
        max_size = min(self.max_size, coord.shape[0])
        size = max(1, int(np.random.uniform(*scale) * max_size))
        index = np.argsort(np.sum(np.square(coord - center), axis=-1))[:size]
        view = dict(index=index)
        for key in point.keys():
            if key in self.view_keys:
                view[key] = point[key][index]
        if "index_valid_keys" in point:
            view["index_valid_keys"] = point["index_valid_keys"]
        return view

    def __call__(self, data_dict):
        coord = data_dict["coord"]
        point = self.global_shared_transform(copy.deepcopy(data_dict))
        z_min, z_max = coord[:, 2].min(), coord[:, 2].max()
        z_lo = z_min + (z_max - z_min) * self.center_height_scale[0]
        z_hi = z_min + (z_max - z_min) * self.center_height_scale[1]
        center_mask = (coord[:, 2] >= z_lo) & (coord[:, 2] <= z_hi)
        if not center_mask.any():
            center_mask[:] = True
        major_center = coord[np.random.choice(np.where(center_mask)[0])]
        major_view = self.get_view(point, major_center, self.global_view_scale)
        major_coord = major_view["coord"]

        if not self.shared_global_view:
            global_views = [
                self.get_view(point, major_coord[np.random.randint(major_coord.shape[0])], self.global_view_scale)
                for _ in range(self.global_view_num - 1)
            ]
        else:
            global_views = [
                {k: (v.copy() if isinstance(v, np.ndarray) else v) for k, v in major_view.items()}
                for _ in range(self.global_view_num - 1)
            ]
        global_views = [major_view] + global_views

        cover_mask = np.zeros_like(major_view["index"], dtype=bool)
        local_views = []
        for _ in range(self.local_view_num):
            if (~cover_mask).sum() == 0:
                cover_mask[:] = False
            center = major_coord[np.random.choice(np.where(~cover_mask)[0])]
            local_view = self.get_view(data_dict, center, self.local_view_scale)
            local_views.append(local_view)
            cover_mask[np.isin(major_view["index"], local_view["index"])] = True

        view_dict = {}
        for view in global_views:
            view.pop("index")
            view = self.global_transform(view)
            for key in self.view_keys:
                view_dict.setdefault(f"global_{key}", []).append(view[key])
        view_dict["global_offset"] = np.cumsum([d.shape[0] for d in view_dict["global_coord"]])
        for view in local_views:
            view.pop("index")
            view = self.local_transform(view)
            for key in self.view_keys:
                view_dict.setdefault(f"local_{key}", []).append(view[key])
        view_dict["local_offset"] = np.cumsum([d.shape[0] for d in view_dict["local_coord"]])
        for key in view_dict:
            if "offset" not in key:
                view_dict[key] = np.concatenate(view_dict[key], axis=0)
        data_dict.update(view_dict)
        return data_dict


@TRANSFORMS.register_module()
class InstanceParser:
    """Instance ground-truth preparation (reference `:1312`): remap instance ids
    over non-ignored segments, per-point instance centroid, 8-dof bboxes."""

    def __init__(self, segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1):
        self.segment_ignore_index = segment_ignore_index
        self.instance_ignore_index = instance_ignore_index

    def __call__(self, data_dict):
        coord = data_dict["coord"]
        segment = data_dict["segment"]
        instance = data_dict["instance"]
        mask = ~np.isin(segment, self.segment_ignore_index)
        instance[~mask] = self.instance_ignore_index
        unique, inverse = np.unique(instance[mask], return_inverse=True)
        instance_num = len(unique)
        instance[mask] = inverse
        centroid = np.ones((coord.shape[0], 3)) * self.instance_ignore_index
        bbox = np.ones((instance_num, 8)) * self.instance_ignore_index
        vacancy = [index for index in self.segment_ignore_index if index >= 0]
        for instance_id in range(instance_num):
            mask_ = instance == instance_id
            coord_ = coord[mask_]
            bbox_min = coord_.min(0)
            bbox_max = coord_.max(0)
            bbox_centroid = coord_.mean(0)
            bbox_center = (bbox_max + bbox_min) / 2
            bbox_size = bbox_max - bbox_min
            bbox_theta = np.zeros(1, dtype=coord_.dtype)
            bbox_class = np.array([segment[mask_][0]], dtype=coord_.dtype)
            bbox_class -= np.greater(bbox_class, vacancy).sum()
            centroid[mask_] = bbox_centroid
            bbox[instance_id] = np.concatenate([bbox_center, bbox_size, bbox_theta, bbox_class])
        data_dict["instance"] = instance
        data_dict["instance_centroid"] = centroid.astype(np.float32)
        data_dict["bbox"] = bbox
        return data_dict
