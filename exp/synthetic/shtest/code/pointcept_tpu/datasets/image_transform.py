"""Image transforms for 2D-3D joint training (Concerto).

Parity: reference `pointcept/datasets/transform.py:1372-1557` (ImgToTensor,
ImgGaussianBlur, ImgChromaticJitter, ImgPixelContrast, Imgnormalize,
ImgRandomHorizontalFlip, ImgRandomResizedCrop, ImgRandomColorJitter,
ImgRandomGrayscale, ImgRandomSolarize, ImgAugmentation). The reference wraps
torchvision; torchvision is not available here, so these are numpy
re-implementations over image stacks of shape [N, 3, H, W] float in [0, 1]
(after ImgToTensor). Hue jitter uses an RGB-space rotation approximation.
"""

from __future__ import annotations

import numpy as np

from pointcept_tpu.datasets.transform import TRANSFORMS

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)


def _as_batch(img):
    img = np.asarray(img)
    return (img[None], True) if img.ndim == 3 else (img, False)


@TRANSFORMS.register_module()
class ImgToTensor:
    """[..., H, W, 3] uint8/float -> [..., 3, H, W] float32 in [0, 1]."""

    def __call__(self, img):
        img = np.asarray(img)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        if img.shape[-1] == 3:
            img = np.moveaxis(img, -1, -3)
        return np.ascontiguousarray(img.astype(np.float32))


@TRANSFORMS.register_module()
class ImgGaussianBlur:
    def __init__(self, *, p: float = 0.5, radius_min: float = 0.1, radius_max: float = 2.0):
        self.p = p
        self.radius_min = radius_min
        self.radius_max = radius_max

    def __call__(self, img):
        if np.random.rand() >= self.p:
            return img
        sigma = np.random.uniform(self.radius_min, self.radius_max)
        r = 4  # kernel_size 9
        x = np.arange(-r, r + 1)
        k = np.exp(-0.5 * (x / max(sigma, 1e-3)) ** 2)
        k /= k.sum()
        img, single = _as_batch(img)
        pad_h = np.pad(img, ((0, 0), (0, 0), (r, r), (0, 0)), mode="reflect")
        img = np.einsum("k,nchw->nchw", np.ones(1), img) * 0
        for i, kv in enumerate(k):
            img += kv * pad_h[:, :, i : i + pad_h.shape[2] - 2 * r, :]
        pad_w = np.pad(img, ((0, 0), (0, 0), (0, 0), (r, r)), mode="reflect")
        img = img * 0
        for i, kv in enumerate(k):
            img += kv * pad_w[:, :, :, i : i + pad_w.shape[3] - 2 * r]
        return img[0] if single else img


@TRANSFORMS.register_module()
class ImgChromaticJitter:
    def __init__(self, p=0.95, std=0.005):
        self.p = p
        self.std = std

    def __call__(self, img):
        if np.random.rand() >= self.p:
            return img
        noise = np.random.rand(3).astype(np.float32) * self.std
        img = img + noise[:, None, None]
        return np.clip(img, 0, 1)


@TRANSFORMS.register_module()
class ImgPixelContrast:
    def __init__(self, threshold, p=0.2):
        self.threshold = threshold
        self.p = p

    def __call__(self, img):
        if np.random.rand() >= self.p:
            return img
        img, single = _as_batch(img)
        n, _, h, w = img.shape
        num = int(self.threshold * h * w * n)
        flat = np.moveaxis(img, 1, -1).reshape(-1, 3).copy()
        idx = np.random.randint(0, flat.shape[0], num)
        flat[idx] = 1.0 - flat[idx]  # [0,1] scale inversion
        img = np.moveaxis(flat.reshape(n, h, w, 3), -1, 1)
        return img[0] if single else img


@TRANSFORMS.register_module()
class Imgnormalize:
    def __init__(self, mean=IMAGENET_DEFAULT_MEAN, std=IMAGENET_DEFAULT_STD):
        self.mean = np.asarray(mean, np.float32)[:, None, None]
        self.std = np.asarray(std, np.float32)[:, None, None]

    def __call__(self, img):
        return (img - self.mean) / self.std


@TRANSFORMS.register_module()
class ImgRandomHorizontalFlip:
    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, img):
        if np.random.rand() < self.p:
            img = img[..., ::-1].copy()
        return img


@TRANSFORMS.register_module()
class ImgRandomResizedCrop:
    def __init__(self, size, scale, interpolation=None):
        self.size = (size, size) if isinstance(size, int) else tuple(size)
        self.scale = scale

    def _resize(self, img, oh, ow):
        h, w = img.shape[-2:]
        ys = np.clip((np.arange(oh) + 0.5) * h / oh - 0.5, 0, h - 1)
        xs = np.clip((np.arange(ow) + 0.5) * w / ow - 0.5, 0, w - 1)
        y0 = np.floor(ys).astype(int); y1 = np.minimum(y0 + 1, h - 1)
        x0 = np.floor(xs).astype(int); x1 = np.minimum(x0 + 1, w - 1)
        wy = (ys - y0)[None, None, :, None]
        wx = (xs - x0)[None, None, None, :]
        a = img[..., y0, :][..., :, x0]
        b = img[..., y0, :][..., :, x1]
        c = img[..., y1, :][..., :, x0]
        d = img[..., y1, :][..., :, x1]
        return a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx + c * wy * (1 - wx) + d * wy * wx

    def __call__(self, img):
        img, single = _as_batch(img)
        h, w = img.shape[-2:]
        area = h * w * np.random.uniform(*self.scale)
        ch = min(int(round(np.sqrt(area))), h)
        cw = min(int(round(np.sqrt(area))), w)
        top = np.random.randint(0, h - ch + 1)
        left = np.random.randint(0, w - cw + 1)
        img = img[..., top : top + ch, left : left + cw]
        img = self._resize(img, *self.size)
        return (img[0] if single else img).astype(np.float32)


@TRANSFORMS.register_module()
class ImgRandomColorJitter:
    def __init__(self, brightness=0.4, contrast=0.4, saturation=0.2, hue=0.1, p=0.8):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.p = p

    def __call__(self, img):
        if np.random.rand() >= self.p:
            return img
        if self.brightness > 0:
            img = img * np.random.uniform(1 - self.brightness, 1 + self.brightness)
        if self.contrast > 0:
            f = np.random.uniform(1 - self.contrast, 1 + self.contrast)
            mean = img.mean(axis=(-2, -1), keepdims=True)
            img = (img - mean) * f + mean
        if self.saturation > 0:
            f = np.random.uniform(1 - self.saturation, 1 + self.saturation)
            gray = (img * np.asarray([0.299, 0.587, 0.114], np.float32).reshape(3, 1, 1)).sum(
                -3, keepdims=True
            )
            img = (img - gray) * f + gray
        if self.hue > 0:
            theta = np.random.uniform(-self.hue, self.hue) * 2 * np.pi
            c, s = np.cos(theta), np.sin(theta)
            one_third = 1.0 / 3.0
            sqrt_third = np.sqrt(one_third)
            m = (
                np.eye(3) * c
                + (1 - c) * one_third
                + s * sqrt_third * np.array([[0, -1, 1], [1, 0, -1], [-1, 1, 0]])
            ).astype(np.float32)
            img = np.einsum("ij,...jhw->...ihw", m, img)
        return np.clip(img, 0, 1).astype(np.float32)


@TRANSFORMS.register_module()
class ImgRandomGrayscale:
    def __init__(self, p=0.1):
        self.p = p

    def __call__(self, img):
        if np.random.rand() >= self.p:
            return img
        gray = (img * np.asarray([0.299, 0.587, 0.114], np.float32).reshape(3, 1, 1)).sum(
            -3, keepdims=True
        )
        return np.broadcast_to(gray, img.shape).astype(np.float32).copy()


@TRANSFORMS.register_module()
class ImgRandomSolarize:
    def __init__(self, threshold, p=0.1):
        self.threshold = threshold if threshold <= 1 else threshold / 255.0
        self.p = p

    def __call__(self, img):
        if np.random.rand() >= self.p:
            return img
        return np.where(img >= self.threshold, 1.0 - img, img).astype(np.float32)


@TRANSFORMS.register_module()
class ImgAugmentation:
    """Crop images to (crop_h, crop_w), run the image-transform pipeline, and
    remap point-pixel correspondences (out-of-crop -> (-1, -1)); optionally
    convert pixel correspondences to patch indices (`to_patch`, the layout
    Concerto consumes). Reference `:1510-1557`."""

    def __init__(self, imgtransforms, crop_h=518, crop_w=518, patch_h=37, patch_w=37,
                 patch_size=14, to_patch=False):
        self.transforms = [TRANSFORMS.build(t) for t in imgtransforms]
        self.crop_h, self.crop_w = crop_h, crop_w
        self.patch_h, self.patch_w = patch_h, patch_w
        self.patch_size = patch_size
        self.to_patch = to_patch

    def __call__(self, point):
        import random

        top = random.randint(0, max(self.patch_h * self.patch_size - self.crop_h, 0))
        left = random.randint(0, max(self.patch_w * self.patch_size - self.crop_w, 0))
        img = np.asarray(point["images"])
        point["images"] = img[..., top : top + self.crop_h, left : left + self.crop_w]
        for t in self.transforms:
            point["images"] = t(point["images"])
        corr = np.asarray(point["correspondence"])
        shape = corr.shape
        corr = corr.reshape(-1, 2).copy()
        ok = (
            (top <= corr[:, 0]) & (corr[:, 0] < top + self.crop_h)
            & (left <= corr[:, 1]) & (corr[:, 1] < left + self.crop_w)
        )
        corr[~ok] = -1
        corr[ok] -= np.array([top, left])
        if self.to_patch:
            corr[ok] //= self.patch_size
        point["correspondence"] = corr.reshape(shape)
        return point
