"""Mip-NeRF 360 (COLMAP captures) dataset loader.

TPU-native analog of reference examples/datasets/nerf_360_v2.py: parses a
COLMAP sparse reconstruction (binary or text), recenters poses by the
camera-similarity transform, supports downscale factors, and yields
OpenCV-convention rays.  The COLMAP parser is self-contained (the reference
vendored a pycolmap submodule).
"""
from __future__ import annotations

import os
import struct
from typing import Dict, Optional, Tuple

import numpy as np

try:
    import imageio.v2 as imageio
except Exception:  # pragma: no cover
    imageio = None


# -- minimal COLMAP sparse-model parsing ------------------------------------

def _read_cameras_bin(path: str) -> Dict:
    cameras = {}
    model_params = {0: 3, 1: 4, 2: 4, 3: 5, 4: 8, 5: 8, 6: 12, 7: 5, 8: 4,
                    9: 5, 10: 12}
    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        for _ in range(n):
            cam_id, model, w, h = struct.unpack("<iiQQ", f.read(24))
            num_p = model_params[model]
            params = struct.unpack("<" + "d" * num_p, f.read(8 * num_p))
            cameras[cam_id] = {
                "model": model,
                "width": w,
                "height": h,
                "params": np.asarray(params),
            }
    return cameras


def _read_images_bin(path: str) -> Dict:
    images = {}
    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        for _ in range(n):
            im_id = struct.unpack("<i", f.read(4))[0]
            qvec = np.asarray(struct.unpack("<dddd", f.read(32)))
            tvec = np.asarray(struct.unpack("<ddd", f.read(24)))
            cam_id = struct.unpack("<i", f.read(4))[0]
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            n_p2d = struct.unpack("<Q", f.read(8))[0]
            f.read(24 * n_p2d)  # skip 2D points
            images[im_id] = {
                "qvec": qvec,
                "tvec": tvec,
                "camera_id": cam_id,
                "name": name.decode(),
            }
    return images


def _qvec2rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def similarity_from_cameras(c2w: np.ndarray) -> Tuple[np.ndarray, float]:
    """Recenter/rescale poses (reference: nerf_360_v2.py similarity_from_cameras,
    originally from the PlenOctrees codebase — standard 360 preprocessing)."""
    t = c2w[:, :3, 3]
    R = c2w[:, :3, :3]

    # (1) rotate up vector to +z
    ups = R @ np.array([0, -1.0, 0])
    world_up = np.mean(ups, axis=0)
    world_up /= np.linalg.norm(world_up)

    up_camspace = np.array([0.0, 0.0, 1.0])
    c = (up_camspace * world_up).sum()
    cross = np.cross(world_up, up_camspace)
    skew = np.array(
        [
            [0.0, -cross[2], cross[1]],
            [cross[2], 0.0, -cross[0]],
            [-cross[1], cross[0], 0.0],
        ]
    )
    if c > -1:
        R_align = np.eye(3) + skew + (skew @ skew) * 1 / (1 + c)
    else:
        R_align = np.array([[-1.0, 0.0, 0.0], [0.0, -1.0, 0.0], [0.0, 0.0, 1.0]])

    R = R_align @ R
    fwds = np.sum(R * np.array([0, 0.0, 1.0]), axis=-1)
    t = (R_align @ t[..., None])[..., 0]

    # (2) recenter the scene
    nearest = t + (fwds * -t).sum(-1)[:, None] * fwds
    translate = -np.median(nearest, axis=0)
    transform = np.eye(4)
    transform[:3, 3] = translate
    transform[:3, :3] = R_align

    # (3) rescale the scene
    scale = 1.0 / np.median(np.linalg.norm(t + translate, axis=-1))
    return transform, scale


class SubjectLoader:
    """Mip-NeRF 360 subject loader (reference: nerf_360_v2.py:52+).

    OpenCV camera convention; train mode samples random rays, test mode
    yields full images.
    """

    SPLITS = ["train", "test"]
    SUBJECT_IDS = [
        "garden", "bicycle", "bonsai", "counter", "kitchen", "room", "stump",
    ]
    OPENGL_CAMERA = False

    def __init__(
        self,
        subject_id: str,
        root_fp: str,
        split: str,
        color_bkgd_aug: str = "white",
        num_rays: Optional[int] = None,
        factor: int = 1,
        batch_over_images: bool = True,
        seed: int = 42,
    ):
        self.split = split
        self.num_rays = num_rays
        self.training = (num_rays is not None) and (split == "train")
        self.color_bkgd_aug = color_bkgd_aug
        self.batch_over_images = batch_over_images
        self.rng = np.random.default_rng(seed)

        data_dir = os.path.join(root_fp, subject_id)
        sparse = os.path.join(data_dir, "sparse", "0")
        cameras = _read_cameras_bin(os.path.join(sparse, "cameras.bin"))
        images_meta = _read_images_bin(os.path.join(sparse, "images.bin"))

        cam = cameras[list(cameras.keys())[0]]
        # COLMAP intrinsics layouts: single-focal models (SIMPLE_PINHOLE=0,
        # SIMPLE_RADIAL=2, RADIAL=3) are (f, cx, cy, ...); two-focal models
        # (PINHOLE=1, OPENCV=4, ...) are (fx, fy, cx, cy, ...).
        fx, fy, cx, cy = (
            (cam["params"][0], cam["params"][0], cam["params"][1], cam["params"][2])
            if cam["model"] in (0, 2, 3)
            else (cam["params"][0], cam["params"][1], cam["params"][2], cam["params"][3])
        )
        self.K = np.array(
            [[fx / factor, 0, cx / factor], [0, fy / factor, cy / factor], [0, 0, 1]],
            dtype=np.float32,
        )

        items = sorted(images_meta.values(), key=lambda d: d["name"])
        c2ws = []
        img_paths = []
        img_dir = (
            os.path.join(data_dir, f"images_{factor}")
            if factor > 1 and os.path.isdir(os.path.join(data_dir, f"images_{factor}"))
            else os.path.join(data_dir, "images")
        )
        for it in items:
            R = _qvec2rotmat(it["qvec"])
            t = it["tvec"]
            w2c = np.eye(4)
            w2c[:3, :3] = R
            w2c[:3, 3] = t
            c2ws.append(np.linalg.inv(w2c))
            img_paths.append(os.path.join(img_dir, it["name"]))
        c2w = np.stack(c2ws)

        transform, scale = similarity_from_cameras(c2w)
        c2w = transform @ c2w
        c2w[:, :3, 3] *= scale

        # every-8th-image test split, as in the reference
        indices = np.arange(len(img_paths))
        test_mask = indices % 8 == 0
        keep = ~test_mask if split == "train" else test_mask
        self.camtoworlds = c2w[keep].astype(np.float32)
        paths = [p for p, k in zip(img_paths, keep) if k]

        imgs = []
        for p in paths:
            img = imageio.imread(p)
            if factor > 1 and "images_" not in img_dir:
                h, w = img.shape[:2]
                img = img[:: factor, :: factor]  # nearest downsample fallback
            imgs.append(img[..., :3])
        self.images = np.stack(imgs).astype(np.uint8)
        self.HEIGHT, self.WIDTH = self.images.shape[1:3]

    def __len__(self):
        return len(self.images)

    def update_num_rays(self, num_rays: int) -> None:
        self.num_rays = num_rays

    def _rays_for_pixels(self, image_id, x, y):
        c2w = self.camtoworlds[image_id]
        camera_dirs = np.stack(
            [
                (x + 0.5 - self.K[0, 2]) / self.K[0, 0],
                (y + 0.5 - self.K[1, 2]) / self.K[1, 1],
                np.ones_like(x, dtype=np.float32),
            ],
            axis=-1,
        )  # OpenCV convention: +z forward
        directions = (camera_dirs[..., None, :] * c2w[..., :3, :3]).sum(-1)
        origins = np.broadcast_to(c2w[..., :3, -1], directions.shape)
        viewdirs = directions / np.linalg.norm(directions, axis=-1, keepdims=True)
        return origins.astype(np.float32), viewdirs.astype(np.float32)

    def __getitem__(self, index: int):
        if self.training:
            num_rays = self.num_rays
            if self.batch_over_images:
                image_id = self.rng.integers(0, len(self.images), size=(num_rays,))
            else:
                image_id = np.full((num_rays,), index)
            x = self.rng.integers(0, self.WIDTH, size=(num_rays,))
            y = self.rng.integers(0, self.HEIGHT, size=(num_rays,))
            if self.color_bkgd_aug == "random":
                color_bkgd = self.rng.random(3, dtype=np.float32)
            elif self.color_bkgd_aug == "white":
                color_bkgd = np.ones(3, np.float32)
            else:
                color_bkgd = np.zeros(3, np.float32)
        else:
            image_id = np.full((self.WIDTH * self.HEIGHT,), index)
            x, y = np.meshgrid(
                np.arange(self.WIDTH), np.arange(self.HEIGHT), indexing="xy"
            )
            x, y = x.reshape(-1), y.reshape(-1)
            color_bkgd = np.ones(3, np.float32)

        pixels = self.images[image_id, y, x].astype(np.float32) / 255.0
        origins, viewdirs = self._rays_for_pixels(image_id, x, y)
        return {
            "rgb": pixels,
            "rays_o": origins,
            "rays_d": viewdirs,
            "color_bkgd": color_bkgd,
        }
