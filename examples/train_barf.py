"""BARF: joint radiance-field + camera-pose optimization.

TPU-native equivalent of the reference's camera benchmark family
(reference: docs/source/examples/camera/barf.rst — BARF + OccGrid reaches
PSNR 30.11 with pose errors R 0.070 deg / T 0.0035 from noisy poses on
nerf-synthetic).  Trains a vanilla NeRF with per-image SE(3) corrections
and the BARF coarse-to-fine positional-encoding schedule on the procedural
scene, starting from poses perturbed by gaussian twists, and reports the
Sim3-aligned pose registration errors next to PSNR.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--scene", type=str, default="lego")
    parser.add_argument("--train_split", type=str, default="train")
    parser.add_argument("--max_steps", type=int, default=10000)
    parser.add_argument("--num_rays", type=int, default=1024)
    parser.add_argument("--rot_std", type=float, default=0.05)
    parser.add_argument("--trans_std", type=float, default=0.05)
    parser.add_argument("--no_c2f", action="store_true",
                        help="disable the coarse-to-fine PE anneal (ablation)")
    parser.add_argument("--pose_start", type=int, default=None,
                        help="step at which pose updates unfreeze "
                        "(default min(500, max_steps/4))")
    parser.add_argument("--pose_horizon", type=float, default=None,
                        help="pose-lr decay horizon as a fraction of "
                        "max_steps (default: the PE anneal end)")
    parser.add_argument("--log_every", type=int, default=1000)
    parser.add_argument("--steps_per_call", type=int, default=8)
    parser.add_argument("--eval_images", type=int, default=3)
    parser.add_argument("--width", type=int, default=320)
    parser.add_argument("--height", type=int, default=320)
    parser.add_argument("--seed", type=int, default=42)
    args = parser.parse_args()

    import jax

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    from nerfacc_tpu.data import ProceduralSceneLoader
    from nerfacc_tpu.models import (
        VanillaNeRFRadianceField,
        perturb_poses,
        pose_registration_errors,
    )
    from nerfacc_tpu.trainers import BARFTrainer

    aabb = (-1.5, -1.5, -1.5, 1.5, 1.5, 1.5)
    if args.data_root is not None:
        from nerfacc_tpu.data import SubjectLoader

        train_dataset = SubjectLoader(
            subject_id=args.scene,
            root_fp=args.data_root,
            split=args.train_split,
            num_rays=args.num_rays,
            seed=args.seed,
        )
        test_dataset = SubjectLoader(
            subject_id=args.scene, root_fp=args.data_root, split="test"
        )
    else:
        train_dataset = ProceduralSceneLoader(
            split="train", num_rays=args.num_rays, seed=args.seed,
            width=args.width, height=args.height,
        )
        test_dataset = ProceduralSceneLoader(
            split="test", width=args.width, height=args.height
        )

    c2w_gt = np.asarray(train_dataset.camtoworlds, np.float32)[:, :3, :4]
    noisy, _ = perturb_poses(
        jax.random.PRNGKey(args.seed + 1),
        c2w_gt,
        rot_std=args.rot_std,
        trans_std=args.trans_std,
    )
    noisy = np.asarray(noisy)
    err0 = pose_registration_errors(noisy, c2w_gt)
    print(
        f"initial pose error: R {err0['rot_deg']:.3f} deg | "
        f"T {err0['trans']:.4f}"
    )

    field = VanillaNeRFRadianceField()
    trainer = BARFTrainer(
        field=field,
        camtoworlds_init=noisy,
        K=train_dataset.K,
        aabb=aabb,
        render_step_size=5e-3,
        max_steps=args.max_steps,
        lr_pose=1e-3,
        # joint optimization from a random field lets poses absorb early
        # photometric noise (measured: GT-init poses drift to 5 deg in 200
        # steps) — freeze them while the field fits coarse structure
        pose_start_step=(args.pose_start if args.pose_start is not None
                         else min(500, args.max_steps // 4)),
        pe_c2f=None if args.no_c2f else (0.1, 0.5),
        pose_lr_horizon_frac=args.pose_horizon,
        seed=args.seed,
    )
    state = trainer.init_state()

    rng = np.random.default_rng(args.seed)
    M = max(1, args.steps_per_call)
    tic = time.time()
    step = 0
    while step < args.max_steps:
        datas = [
            train_dataset.pixel_batch(int(rng.integers(0, len(train_dataset))))
            for _ in range(M)
        ]
        batches = {k: np.stack([d[k] for d in datas]) for k in datas[0]}
        state, auxs = trainer.train_steps(state, batches)
        step += M

        if step % args.log_every < M:
            jax.block_until_ready(state.params)
            mse = float(np.asarray(auxs["mse"])[-1])
            psnr = -10.0 * np.log10(max(mse, 1e-10))
            err = pose_registration_errors(trainer.refined_poses(state), c2w_gt)
            print(
                f"elapsed_time={time.time() - tic:.2f}s | step={step} | "
                f"train_psnr={psnr:.2f} | "
                f"pose R {err['rot_deg']:.3f} deg T {err['trans']:.4f}"
            )

    train_wall = time.time() - tic
    err = pose_registration_errors(trainer.refined_poses(state), c2w_gt)
    metrics = trainer.eval_metrics(state, test_dataset, args.eval_images)
    print(
        f"evaluation: psnr={metrics['psnr']:.2f} ssim={metrics['ssim']:.4f} | "
        f"pose R {err['rot_deg']:.3f} deg (from {err0['rot_deg']:.3f}) | "
        f"T {err['trans']:.4f} (from {err0['trans']:.4f})"
    )
    import json

    print(json.dumps({
        "name": f"barf@{args.scene if args.data_root else 'procedural'}",
        "steps": args.max_steps,
        "psnr": round(metrics["psnr"], 2),
        "ssim": round(metrics["ssim"], 4),
        "rot_deg": round(err["rot_deg"], 4),
        "trans": round(err["trans"], 5),
        "rot_deg_init": round(err0["rot_deg"], 4),
        "trans_init": round(err0["trans"], 5),
        "train_wall_s": round(train_wall, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
