"""Dataset-loader tests against generated on-disk fixtures.

The ray-convention math (+0.5 pixel centers, OpenGL vs OpenCV axes,
background compositing, COLMAP binary parsing, similarity recentering) is
exactly the kind of code that is wrong in silent ways — these tests pin it
to hand-computed values.  (reference behaviors:
examples/datasets/nerf_synthetic.py:126-222, dnerf_synthetic.py:34-57,
nerf_360_v2.py:140-220.)
"""
import json
import os
import struct

import numpy as np
import pytest

imageio = pytest.importorskip("imageio.v2")

from nerfacc_tpu.data.dnerf_synthetic import SubjectLoader as DnerfLoader
from nerfacc_tpu.data.nerf_360_v2 import (
    SubjectLoader as Loader360,
    _qvec2rotmat,
    _read_cameras_bin,
    _read_images_bin,
)
from nerfacc_tpu.data.nerf_synthetic import SubjectLoader


W = H = 8
FOCAL = 8.0  # camera_angle_x = 2*atan(W / (2*focal)) = 2*atan(0.5)
CAM_ANGLE_X = 2.0 * np.arctan(0.5 * W / FOCAL)


class TinyLoader(SubjectLoader):
    WIDTH, HEIGHT = W, H


class TinyDnerfLoader(DnerfLoader):
    WIDTH, HEIGHT = W, H


def _write_blender_fixture(root, subject="tiny", times=None):
    d = os.path.join(root, subject)
    os.makedirs(d, exist_ok=True)
    c2ws = [np.eye(4), np.eye(4)]
    c2ws[0][:3, 3] = [1.0, 2.0, 3.0]
    # second camera: 90 deg about z
    c2ws[1][:3, :3] = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    c2ws[1][:3, 3] = [0.0, 0.0, 4.0]
    frames = []
    for i, c2w in enumerate(c2ws):
        img = np.zeros((H, W, 4), np.uint8)
        img[..., 0] = 200  # red-ish
        img[..., 3] = 255  # opaque
        img[0, 0, 3] = 0  # one fully transparent pixel
        imageio.imwrite(os.path.join(d, f"r_{i}.png"), img)
        fr = {"file_path": f"r_{i}", "transform_matrix": c2w.tolist()}
        if times is not None:
            fr["time"] = times[i]
        frames.append(fr)
    meta = {"camera_angle_x": CAM_ANGLE_X, "frames": frames}
    with open(os.path.join(d, "transforms_train.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(d, "transforms_test.json"), "w") as f:
        json.dump(meta, f)
    return d


def test_nerf_synthetic_ray_convention(tmp_path):
    _write_blender_fixture(str(tmp_path))
    ds = TinyLoader("tiny", str(tmp_path), "test")
    assert abs(ds.focal - FOCAL) < 1e-6
    data = ds[0]
    assert data["rays_o"].shape == (W * H, 3)

    # identity camera at t=[1,2,3]: origins == t
    np.testing.assert_allclose(data["rays_o"], [[1, 2, 3]] * (W * H), atol=1e-6)
    # pixel (x=3, y=2): OpenGL convention with +0.5 centers ->
    # cam_dir = ((3.5-4)/8, -(2.5-4)/8, -1), normalized
    idx = 2 * W + 3  # row-major (y, x)
    want = np.array([-0.5 / 8, +1.5 / 8, -1.0])
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(data["rays_d"][idx], want, atol=1e-6)

    # rotated camera (90 deg about z): world dir = R @ cam_dir
    data1 = ds[1]
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(data1["rays_d"][idx], R @ want, atol=1e-6)
    np.testing.assert_allclose(data1["rays_o"][0], [0, 0, 4], atol=1e-6)


def test_nerf_synthetic_background_compositing(tmp_path):
    _write_blender_fixture(str(tmp_path))
    ds = TinyLoader("tiny", str(tmp_path), "test")  # white bkgd in test mode
    data = ds[0]
    # pixel (0,0) is fully transparent -> pure background (white)
    np.testing.assert_allclose(data["rgb"][0], [1.0, 1.0, 1.0], atol=1e-6)
    # opaque pixels -> image color
    np.testing.assert_allclose(
        data["rgb"][1], [200 / 255.0, 0.0, 0.0], atol=1e-6
    )


def test_nerf_synthetic_train_sampling(tmp_path):
    _write_blender_fixture(str(tmp_path))
    ds = TinyLoader("tiny", str(tmp_path), "train", num_rays=17)
    data = ds[0]
    assert data["rgb"].shape == (17, 3)
    assert data["rays_o"].shape == (17, 3)
    ds.update_num_rays(5)
    assert ds[0]["rgb"].shape == (5, 3)


def test_nerf_synthetic_pixel_batch(tmp_path):
    """pixel_batch (the BARF pose-optimization input): raw pixel coords +
    colors composited exactly like __getitem__, no precomputed rays."""
    _write_blender_fixture(str(tmp_path))
    ds = TinyLoader("tiny", str(tmp_path), "train", num_rays=13)
    b = ds.pixel_batch(0)
    assert set(b) == {"img_ids", "x", "y", "rgb", "color_bkgd"}
    assert b["rgb"].shape == (13, 3) and b["img_ids"].dtype == np.int32
    rgba = ds.images[b["img_ids"], b["y"], b["x"]].astype(np.float32) / 255.0
    expected = rgba[..., :3] * rgba[..., 3:] + b["color_bkgd"] * (
        1.0 - rgba[..., 3:]
    )
    np.testing.assert_allclose(b["rgb"], expected, atol=1e-6)


def test_dnerf_timestamps(tmp_path):
    _write_blender_fixture(str(tmp_path), times=[0.0, 0.5])
    ds = TinyDnerfLoader("tiny", str(tmp_path), "train", num_rays=9)
    data = ds[0]
    assert "timestamps" in data
    assert data["timestamps"].shape == (9, 1)
    assert set(np.unique(data["timestamps"])) <= {0.0, 0.5}
    np.testing.assert_array_equal(
        np.asarray(ds.timestamps).reshape(-1), [0.0, 0.5]
    )


# -- COLMAP / 360 fixtures ---------------------------------------------------

def _write_colmap_fixture(root, subject="garden_tiny", n_images=9):
    d = os.path.join(root, subject)
    sparse = os.path.join(d, "sparse", "0")
    imgdir = os.path.join(d, "images")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(imgdir, exist_ok=True)

    fx, fy, cx, cy = 10.0, 11.0, W / 2.0, H / 2.0
    with open(os.path.join(sparse, "cameras.bin"), "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, W, H))  # PINHOLE
        f.write(struct.pack("<dddd", fx, fy, cx, cy))

    rng = np.random.default_rng(0)
    with open(os.path.join(sparse, "images.bin"), "wb") as f:
        f.write(struct.pack("<Q", n_images))
        for i in range(n_images):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", 1.0, 0.0, 0.0, 0.0))  # identity q
            t = [float(i), 0.0, float(i % 3)]
            f.write(struct.pack("<ddd", *t))
            f.write(struct.pack("<i", 1))
            f.write(f"img_{i:03d}.png".encode() + b"\x00")
            n_p2d = 2
            f.write(struct.pack("<Q", n_p2d))
            f.write(b"\x00" * (24 * n_p2d))
            img = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
            imageio.imwrite(os.path.join(imgdir, f"img_{i:03d}.png"), img)
    return d, (fx, fy, cx, cy)


def test_colmap_binary_parsers(tmp_path):
    d, (fx, fy, cx, cy) = _write_colmap_fixture(str(tmp_path))
    cams = _read_cameras_bin(os.path.join(d, "sparse/0/cameras.bin"))
    assert cams[1]["model"] == 1
    assert cams[1]["width"] == W
    np.testing.assert_allclose(cams[1]["params"], [fx, fy, cx, cy])
    imgs = _read_images_bin(os.path.join(d, "sparse/0/images.bin"))
    assert len(imgs) == 9
    assert imgs[1]["name"] == "img_000.png"
    np.testing.assert_allclose(imgs[3]["tvec"], [2.0, 0.0, 2.0])


def test_qvec2rotmat():
    # 90 degrees about z: q = (cos45, 0, 0, sin45)
    q = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    R = _qvec2rotmat(q)
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    np.testing.assert_allclose(R, want, atol=1e-12)


def test_loader360_split_convention_and_rays(tmp_path):
    _write_colmap_fixture(str(tmp_path))
    train = Loader360("garden_tiny", str(tmp_path), "train", num_rays=13)
    test = Loader360("garden_tiny", str(tmp_path), "test")
    # every-8th-image test split: images 0 and 8 are test, 7 train
    assert len(test) == 2
    assert len(train) == 7

    data = test[0]
    assert data["rays_o"].shape == (W * H, 3)
    # OpenCV convention: +z forward, NO y flip.  Similarity recentering
    # rotates/translates/scales all cameras rigidly, so check the ray
    # direction in the CAMERA frame: d_cam = R_c2w^T @ d_world must match
    # ((x+.5-cx)/fx, (y+.5-cy)/fy, 1) normalized.
    idx = 2 * W + 3
    c2w = test.camtoworlds[0]
    d_world = data["rays_d"][idx]
    d_cam = c2w[:3, :3].T @ d_world
    want = np.array([(3.5 - 4.0) / 10.0, (2.5 - 4.0) / 11.0, 1.0])
    want = want / np.linalg.norm(want)
    np.testing.assert_allclose(d_cam, want, atol=1e-5)

    # similarity recentering preserves shape: pairwise camera-distance
    # RATIOS match the raw poses (identity rotations at t = (i, 0, i%3),
    # c2w translation = -t)
    raw = np.stack(
        [-np.array([i, 0.0, i % 3]) for i in range(9) if i % 8 != 0]
    )
    got = train.camtoworlds[:, :3, 3]
    raw_d = np.linalg.norm(raw[1:] - raw[:-1], axis=-1)
    got_d = np.linalg.norm(got[1:] - got[:-1], axis=-1)
    ratio = got_d / raw_d
    np.testing.assert_allclose(ratio, ratio[0], rtol=1e-4)

    # training batches
    b = train[0]
    assert b["rgb"].shape == (13, 3)
    assert b["rays_d"].shape == (13, 3)
    np.testing.assert_allclose(
        np.linalg.norm(b["rays_d"], axis=-1), 1.0, atol=1e-5
    )


def test_procedural_dynamic_scene():
    """Time-varying procedural scene: frames actually change over time and
    batches carry per-ray timestamps (the dnerf loader contract)."""
    from nerfacc_tpu.data import ProceduralDynamicSceneLoader

    ds = ProceduralDynamicSceneLoader(
        split="test", n_test=3, width=32, height=32, gt_samples=64
    )
    assert ds.timestamps.shape == (3, 1)
    # motion: first and last frames must differ substantially
    assert (
        np.abs(
            ds.images[0].astype(np.float32) - ds.images[-1].astype(np.float32)
        ).mean()
        > 1.0
    )
    d0 = ds[0]
    assert d0["timestamps"].shape == (32 * 32, 1)
    assert float(d0["timestamps"][0, 0]) == 0.0
    d2 = ds[2]
    assert float(d2["timestamps"][0, 0]) == 1.0

    tr = ProceduralDynamicSceneLoader(
        split="train", n_train=4, width=32, height=32, gt_samples=64,
        num_rays=128,
    )
    b = tr[0]
    assert b["timestamps"].shape == (128, 1)
    # per-ray times must match the sampled frames' times
    assert set(np.unique(b["timestamps"])) <= set(np.unique(tr.view_times))


def test_procedural_unbounded_scene():
    """Unbounded (360-role) procedural scene: content must extend OUTSIDE the
    unit box (ground plane + distant blobs) and cameras must sit on the
    360-capture ring, so the 4-level-grid + contraction config has something
    real to learn (reference benchmark: ngp.rst:52-85)."""
    import jax.numpy as jnp

    from nerfacc_tpu.data import ProceduralUnboundedSceneLoader

    ds = ProceduralUnboundedSceneLoader(
        split="test", n_test=2, width=32, height=32,
        gt_samples=64, gt_far_samples=32,
    )
    # density outside the unit box: ground plane at (3, 0, z0) is dense
    far_pts = jnp.asarray([[3.0, 0.0, ds.ground_z0], [5.0, 1.0, ds.ground_z0]])
    sig = np.asarray(ds.query_density(far_pts))
    assert (sig > 10.0).all(), sig
    # distant blobs sit outside the unit box but inside grid coverage (+-8)
    c = np.asarray(ds.far_centers)
    assert (np.linalg.norm(c[:, :2], axis=-1) > 1.5).all()
    assert (np.abs(c) < 8.0).all()
    # cameras on the ring, outside the base aabb
    eyes = ds.camtoworlds[:, :3, 3]
    np.testing.assert_allclose(np.linalg.norm(eyes[:, :2], axis=-1), 1.8, atol=1e-5)
    # images are dominated by content (a 360 capture has ~no empty sky)
    op = ds.images[0].astype(np.float32)[..., 3] / 255.0
    assert op.mean() > 0.9
    # cameras must sit in FREE SPACE (a fogged-in camera makes every GT ray
    # saturate to one constant color within a few samples — this exact bug
    # shipped once: far blobs with 3-sigma reach past the camera ring)
    for eye in eyes:
        assert float(ds.query_density(jnp.asarray(eye[None]))[0, 0]) < 0.1
    # and the images must carry real structure, not one fog color
    rgb = ds.images[0].astype(np.float32)[..., :3] / 255.0
    assert float(rgb.std(axis=(0, 1)).min()) > 0.02, rgb.std(axis=(0, 1))
    b = ds[0]
    assert b["rgb"].shape == (32 * 32, 3)
    np.testing.assert_allclose(
        np.linalg.norm(b["rays_d"], axis=-1), 1.0, atol=1e-5
    )


def test_procedural_textured_scene():
    """High-frequency-texture scene: albedo varies at grating frequencies a
    flat per-blob color cannot produce — adjacent-pixel differences on blob
    surfaces must far exceed the base opaque scene's."""
    from nerfacc_tpu.data import (
        ProceduralOpaqueSceneLoader,
        ProceduralTexturedSceneLoader,
    )

    kw = dict(split="test", n_test=1, width=48, height=48, gt_samples=96)
    tex = ProceduralTexturedSceneLoader(**kw)
    base = ProceduralOpaqueSceneLoader(**kw)
    # same geometry: opacity channels agree
    np.testing.assert_allclose(
        tex.images[0][..., 3], base.images[0][..., 3], atol=2
    )

    # the texture is the DIFFERENCE to the base render on interior pixels
    # (the base scene's overlapping-ball color boundaries carry high edge
    # energy of their own, so raw gradient energy cannot discriminate)
    rgb_t = tex.images[0][..., :3].astype(np.float32)
    rgb_b = base.images[0][..., :3].astype(np.float32)
    solid = tex.images[0][..., 3] > 200
    m = solid.copy()
    for s in (-2, -1, 1, 2):
        m &= np.roll(solid, s, axis=1)
    diff = (rgb_t - rgb_b).sum(-1)
    mean_abs = float((np.abs(diff) * m).sum() / max(m.sum(), 1))
    assert mean_abs > 20.0, mean_abs  # texture visibly applied
    # ... and it oscillates at few-pixel scale (high spatial frequency):
    # the x-gradient of the texture component is comparable to its value
    ddx = np.abs(np.diff(diff, axis=1))
    grad_ratio = float(
        (ddx * m[:, 1:]).sum() / max((np.abs(diff[:, 1:]) * m[:, 1:]).sum(), 1)
    )
    assert grad_ratio > 0.12, grad_ratio


def test_procedural_thin_scene():
    """Thin-geometry scene: rods must be thinner than ~2 occupancy voxels
    (the regime that stresses grid resolution) yet visible in the GT."""
    import jax.numpy as jnp

    from nerfacc_tpu.data import ProceduralThinSceneLoader

    ds = ProceduralThinSceneLoader(
        split="test", n_test=1, width=48, height=48, gt_samples=128
    )
    # rods thinner than 2 voxels of a 128^3 grid over the 3.0-unit span
    assert float(ds.rod_radius.max()) < 2 * 3.0 / 128
    # rod axis points are dense, offset points are empty
    mid = 0.5 * (ds.rod_a + ds.rod_b)
    sig_on = np.asarray(ds.query_density(mid))
    assert (sig_on > 100.0).all()
    off = mid + jnp.asarray([0.2, 0.2, 0.2])
    sig_off = np.asarray(ds.query_density(off))
    assert (sig_off < 50.0).mean() > 0.7  # most offsets fall in empty space
    # thin content covers a small but nonzero fraction of the frame
    op = ds.images[0].astype(np.float32)[..., 3] / 255.0
    assert 0.01 < op.mean() < 0.6, op.mean()


def test_procedural_mixed_scene():
    """Mixed-opacity scene: solid cores saturate alpha while fog regions
    show partial opacity — both regimes must be present in the GT."""
    from nerfacc_tpu.data import ProceduralMixedSceneLoader

    ds = ProceduralMixedSceneLoader(
        split="test", n_test=1, width=48, height=48, gt_samples=96
    )
    # fog densities are genuinely translucent: alpha over a 0.5-unit path
    # stays below ~0.97 (sigma*L <= 7*0.5), solids saturate in ~2 samples
    assert float(ds.fog_density.max()) < 10.0
    sig_core = np.asarray(ds.query_density(ds.blob_centers))
    assert (sig_core > 100.0).all()
    op = ds.images[0].astype(np.float32)[..., 3] / 255.0
    frac_solid = (op > 0.98).mean()
    frac_partial = ((op > 0.15) & (op < 0.85)).mean()
    assert frac_solid > 0.02, frac_solid
    assert frac_partial > 0.02, frac_partial


def test_procedural_local_dynamic_scene():
    """Local-motion dynamic scene: per-blob frequencies differ (no single
    global warp) and gated blobs appear/disappear across the capture —
    density at a gated blob's center must be ~zero outside its window."""
    import jax.numpy as jnp

    from nerfacc_tpu.data import ProceduralLocalDynamicSceneLoader

    ds = ProceduralLocalDynamicSceneLoader(
        split="test", n_test=3, width=32, height=32, gt_samples=64
    )
    freqs = np.asarray(ds.motion_freq)
    assert len(np.unique(freqs)) > 1  # independent per-blob frequencies
    gated = np.asarray(ds.appear_t0) > 0.0
    assert gated.any() and (~gated).any()
    g = int(np.argmax(gated))
    t_in = 0.5 * float(ds.appear_t0[g] + ds.appear_t1[g])
    t_out = float(ds.appear_t0[g]) - 0.08
    c = ds._centers_at(jnp.asarray(t_in))[g][None]
    sig_in = float(ds.query_density_t(c, jnp.asarray(t_in))[0, 0])
    assert sig_in > 20.0, sig_in
    # the gate itself: fully on inside the window, fully off outside
    # (neighbor blobs overlap the center, so point densities can't isolate
    # one blob's contribution — assert the amplitude directly)
    amp_in = float(ds._amplitude_at(jnp.asarray(t_in))[g])
    amp_out = float(ds._amplitude_at(jnp.asarray(t_out))[g])
    assert amp_in > 0.95, amp_in
    assert amp_out < 0.05, amp_out
    # frames change over time
    assert (
        np.abs(
            ds.images[0].astype(np.float32) - ds.images[-1].astype(np.float32)
        ).mean()
        > 1.0
    )
    tr = ProceduralLocalDynamicSceneLoader(
        split="train", n_train=4, width=32, height=32, gt_samples=64,
        num_rays=64,
    )
    assert tr[0]["timestamps"].shape == (64, 1)
