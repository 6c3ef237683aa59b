"""D-NeRF synthetic dataset loader (dynamic scenes with timestamps).

TPU-native analog of reference examples/datasets/dnerf_synthetic.py: same
blender-JSON conventions as nerf_synthetic plus a per-frame ``time`` field;
batches carry per-ray ``timestamps``.
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from .nerf_synthetic import SubjectLoader as _StaticLoader

try:
    import imageio.v2 as imageio
except Exception:  # pragma: no cover
    imageio = None


def _load_renderings(root_fp: str, subject_id: str, split: str):
    """(reference: dnerf_synthetic.py:16-49)"""
    data_dir = os.path.join(root_fp, subject_id)
    with open(
        os.path.join(data_dir, "transforms_{}.json".format(split)), "r"
    ) as fp:
        meta = json.load(fp)
    images = []
    camtoworlds = []
    timestamps = []

    for i in range(len(meta["frames"])):
        frame = meta["frames"][i]
        fname = os.path.join(data_dir, frame["file_path"] + ".png")
        rgba = imageio.imread(fname)
        camtoworlds.append(frame["transform_matrix"])
        images.append(rgba)
        timestamps.append(
            frame["time"]
            if "time" in frame
            else float(i) / (len(meta["frames"]) - 1)
        )

    images = np.stack(images, axis=0)
    camtoworlds = np.stack(camtoworlds, axis=0)
    timestamps = np.asarray(timestamps, dtype=np.float32)

    h, w = images.shape[1:3]
    camera_angle_x = float(meta["camera_angle_x"])
    focal = 0.5 * w / np.tan(0.5 * camera_angle_x)
    return images, camtoworlds, focal, timestamps


class SubjectLoader(_StaticLoader):
    """D-NeRF subject loader — nerf_synthetic + per-frame timestamps
    (reference: dnerf_synthetic.py:52-235)."""

    SUBJECT_IDS = [
        "bouncingballs",
        "hellwarrior",
        "hook",
        "jumpingjacks",
        "lego",
        "mutant",
        "standup",
        "trex",
    ]

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
            i0, c0, focal, t0 = _load_renderings(root_fp, subject_id, "train")
            i1, c1, _, t1 = _load_renderings(root_fp, subject_id, "val")
            self.images = np.concatenate([i0, i1])
            self.camtoworlds = np.concatenate([c0, c1])
            self.timestamps = np.concatenate([t0, t1])
            self.focal = focal
        else:
            (
                self.images,
                self.camtoworlds,
                self.focal,
                self.timestamps,
            ) = _load_renderings(root_fp, subject_id, split)
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
        self.timestamps = self.timestamps.astype(np.float32)[:, None]

    def __getitem__(self, index: int):
        data = super().__getitem__(index)
        # parent records the image ids it drew for this batch
        data["timestamps"] = self.timestamps[self._last_image_id]
        return data
