"""NeRF-Synthetic (blender) dataset loader.

TPU-native analog of the reference loader
(reference: examples/datasets/nerf_synthetic.py:52-245): 800x800 blender JSON
scenes, OpenGL camera convention with +0.5 pixel centers, uint8 images kept
device-resident, train mode samples ``num_rays`` random (image, x, y) triples
per step, test mode yields full-image ray grids.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

try:
    import imageio.v2 as imageio
except Exception:  # pragma: no cover
    imageio = None


def _load_renderings(root_fp: str, subject_id: str, split: str):
    """(reference: nerf_synthetic.py:20-49)"""
    data_dir = os.path.join(root_fp, subject_id)
    with open(
        os.path.join(data_dir, "transforms_{}.json".format(split)), "r"
    ) as fp:
        meta = json.load(fp)
    images = []
    camtoworlds = []

    for i in range(len(meta["frames"])):
        frame = meta["frames"][i]
        fname = os.path.join(data_dir, frame["file_path"] + ".png")
        rgba = imageio.imread(fname)
        camtoworlds.append(frame["transform_matrix"])
        images.append(rgba)

    images = np.stack(images, axis=0)
    camtoworlds = np.stack(camtoworlds, axis=0)

    h, w = images.shape[1:3]
    camera_angle_x = float(meta["camera_angle_x"])
    focal = 0.5 * w / np.tan(0.5 * camera_angle_x)

    return images, camtoworlds, focal


class SubjectLoader:
    """Single-subject loader (reference: nerf_synthetic.py:52-245).

    Yields dicts with ``rgb`` (composited with the background), ``rays``
    (origins/viewdirs), and ``color_bkgd``.
    """

    SPLITS = ["train", "val", "trainval", "test"]
    SUBJECT_IDS = [
        "chair",
        "drums",
        "ficus",
        "hotdog",
        "lego",
        "materials",
        "mic",
        "ship",
    ]

    WIDTH, HEIGHT = 800, 800
    NEAR, FAR = 2.0, 6.0
    OPENGL_CAMERA = True

    def __init__(
        self,
        subject_id: str,
        root_fp: str,
        split: str,
        color_bkgd_aug: str = "white",
        num_rays: Optional[int] = None,
        near: Optional[float] = None,
        far: Optional[float] = None,
        batch_over_images: bool = True,
        seed: int = 42,
    ):
        assert split in self.SPLITS, "%s" % split
        assert color_bkgd_aug in ["white", "black", "random"]
        self.split = split
        self.num_rays = num_rays
        self.near = self.NEAR if near is None else near
        self.far = self.FAR if far is None else far
        self.training = (num_rays is not None) and (
            split in ["train", "trainval"]
        )
        self.color_bkgd_aug = color_bkgd_aug
        self.batch_over_images = batch_over_images
        self.rng = np.random.default_rng(seed)

        if split == "trainval":
            i0, c0, focal = _load_renderings(root_fp, subject_id, "train")
            i1, c1, _ = _load_renderings(root_fp, subject_id, "val")
            self.images = np.concatenate([i0, i1])
            self.camtoworlds = np.concatenate([c0, c1])
            self.focal = focal
        else:
            self.images, self.camtoworlds, self.focal = _load_renderings(
                root_fp, subject_id, split
            )
        assert self.images.shape[1:3] == (self.HEIGHT, self.WIDTH)
        self.K = np.array(
            [
                [self.focal, 0, self.WIDTH / 2.0],
                [0, self.focal, self.HEIGHT / 2.0],
                [0, 0, 1],
            ],
            dtype=np.float32,
        )
        self.images = self.images.astype(np.uint8)
        self.camtoworlds = self.camtoworlds.astype(np.float32)

    def __len__(self):
        return len(self.images)

    def update_num_rays(self, num_rays: int) -> None:
        self.num_rays = num_rays

    def _rays_for_pixels(self, image_id, x, y):
        """Pixel (x, y) + 0.5 centers -> world-space rays, OpenGL convention
        (reference: nerf_synthetic.py:210-226)."""
        c2w = self.camtoworlds[image_id]  # (n, 4, 4) or (4, 4)
        camera_dirs = np.stack(
            [
                (x + 0.5 - self.K[0, 2]) / self.K[0, 0],
                (y + 0.5 - self.K[1, 2])
                / self.K[1, 1]
                * (-1.0 if self.OPENGL_CAMERA else 1.0),
                np.full_like(x, -1.0 if self.OPENGL_CAMERA else 1.0, dtype=np.float32),
            ],
            axis=-1,
        )  # (n, 3)
        directions = (camera_dirs[..., None, :] * c2w[..., :3, :3]).sum(-1)
        origins = np.broadcast_to(c2w[..., :3, -1], directions.shape)
        viewdirs = directions / np.linalg.norm(
            directions, axis=-1, keepdims=True
        )
        return origins.astype(np.float32), viewdirs.astype(np.float32)

    def _sample_pixels(self, index: int):
        """Draw the (image, x, y) triples for one train batch."""
        num_rays = self.num_rays
        if self.batch_over_images:
            image_id = self.rng.integers(0, len(self.images), size=(num_rays,))
        else:
            image_id = np.full((num_rays,), index)
        x = self.rng.integers(0, self.WIDTH, size=(num_rays,))
        y = self.rng.integers(0, self.HEIGHT, size=(num_rays,))
        return image_id, x, y

    def pixel_batch(self, index: int):
        """Pixel-level batch for pose-optimizing trainers (BARF): raw
        ``(img_ids, x, y)`` plus composited target colors — the rays are
        generated inside the trainer from the LEARNED poses, so the loader
        must not precompute them."""
        image_id, x, y = self._sample_pixels(index)
        rgba = self.images[image_id, y, x].astype(np.float32) / 255.0
        if self.color_bkgd_aug == "random":
            color_bkgd = self.rng.random(3, dtype=np.float32)
        elif self.color_bkgd_aug == "white":
            color_bkgd = np.ones(3, np.float32)
        else:
            color_bkgd = np.zeros(3, np.float32)
        pixels = rgba[..., :3] * rgba[..., 3:] + color_bkgd * (
            1.0 - rgba[..., 3:]
        )
        return {
            "img_ids": np.asarray(image_id, np.int32),
            "x": np.asarray(x, np.int32),
            "y": np.asarray(y, np.int32),
            "rgb": pixels,
            "color_bkgd": color_bkgd,
        }

    def __getitem__(self, index: int):
        if self.training:
            image_id, x, y = self._sample_pixels(index)
            self._last_image_id = image_id
            rgba = self.images[image_id, y, x].astype(np.float32) / 255.0
            origins, viewdirs = self._rays_for_pixels(image_id, x, y)

            if self.color_bkgd_aug == "random":
                color_bkgd = self.rng.random(3, dtype=np.float32)
            elif self.color_bkgd_aug == "white":
                color_bkgd = np.ones(3, np.float32)
            else:
                color_bkgd = np.zeros(3, np.float32)
        else:
            image_id = index
            x, y = np.meshgrid(
                np.arange(self.WIDTH), np.arange(self.HEIGHT), indexing="xy"
            )
            x = x.reshape(-1)
            y = y.reshape(-1)
            self._last_image_id = np.full_like(x, image_id)
            rgba = self.images[image_id, y, x].astype(np.float32) / 255.0
            origins, viewdirs = self._rays_for_pixels(
                np.full_like(x, image_id), x, y
            )
            color_bkgd = np.ones(3, np.float32)

        pixels, alpha = rgba[..., :3], rgba[..., 3:]
        pixels = pixels * alpha + color_bkgd * (1.0 - alpha)
        return {
            "rgb": pixels,
            "rays_o": origins,
            "rays_d": viewdirs,
            "color_bkgd": color_bkgd,
        }
