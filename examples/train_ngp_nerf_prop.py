"""Train Instant-NGP-style field with proposal networks.

TPU-native equivalent of reference examples/train_ngp_nerf_prop.py.  Falls
back to the procedural benchmark scene without --data_root.
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

MIPNERF360_UNBOUNDED_SCENES = [
    "garden", "bicycle", "bonsai", "counter", "kitchen", "room", "stump",
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--scene", type=str, default="lego")
    parser.add_argument("--train_split", type=str, default="train")
    parser.add_argument("--max_steps", type=int, default=20000)
    parser.add_argument("--batch_size", type=int, default=4096)
    parser.add_argument("--log_every", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--field", type=str, default="cp", choices=["cp", "ngp"])
    parser.add_argument("--encoder_remat", type=str, default="none",
                        choices=["none", "dots", "full"])
    # steps fused into one dispatch (lax.scan) — the ~10 ms tunnel dispatch
    # otherwise dominates the small per-step compute
    parser.add_argument("--steps_per_call", type=int, default=32)
    parser.add_argument("--eval_images", type=int, default=None)
    # draw ray batches ON DEVICE (data.device_sampler) — removes host-side
    # numpy batch assembly from the steady-state loop (the fused device step
    # is ~8 ms; host assembly held the loop at ~13.5 ms/step).  0 = host path.
    parser.add_argument("--device_sampler", type=int, default=1)
    args = parser.parse_args()

    import jax

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    from nerfacc_tpu.estimators.prop_net import get_proposal_requires_grad_fn
    from nerfacc_tpu.models import NGPDensityField, NGPRadianceField
    from nerfacc_tpu.models.cp_field import CPDensityField, CPRadianceField
    from nerfacc_tpu.trainers import NGPPropTrainer

    unbounded = (
        args.scene in MIPNERF360_UNBOUNDED_SCENES
        or args.scene == "procedural360"
    )
    if unbounded:
        # reference: train_ngp_nerf_prop.py: 2 proposal nets [256, 96] -> 48,
        # lindisp, opaque background, far 1e3
        aabb = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
        prop_samples = [256, 96]
        num_samples = 48
        near_plane, far_plane = 0.2, 1e3
        sampling_type = "lindisp"
        opaque_bkgd = True
    else:
        # reference: 1 proposal net [128] -> 64, uniform, near/far 2/6
        aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
        prop_samples = [128]
        num_samples = 64
        near_plane, far_plane = 2.0, 6.0
        sampling_type = "uniform"
        opaque_bkgd = False

    if args.data_root is not None:
        from nerfacc_tpu.data import SubjectLoader

        train_dataset = SubjectLoader(
            subject_id=args.scene,
            root_fp=args.data_root,
            split=args.train_split,
            num_rays=args.batch_size,
            seed=args.seed,
        )
        test_dataset = SubjectLoader(
            subject_id=args.scene, root_fp=args.data_root, split="test"
        )
    elif args.scene == "procedural360":
        from nerfacc_tpu.data import ProceduralUnboundedSceneLoader

        train_dataset = ProceduralUnboundedSceneLoader(
            split="train", num_rays=args.batch_size, seed=args.seed
        )
        test_dataset = ProceduralUnboundedSceneLoader(split="test", n_test=6)
        # near/far from the scene's camera geometry (ring radius 1.8,
        # content out to radius ~6.5), same planes the occ script uses
        near_plane, far_plane = train_dataset.NEAR, train_dataset.FAR
    else:
        from nerfacc_tpu.data import ProceduralSceneLoader

        train_dataset = ProceduralSceneLoader(
            split="train", num_rays=args.batch_size, seed=args.seed
        )
        test_dataset = ProceduralSceneLoader(split="test")

    if args.field == "cp":
        field = CPRadianceField(aabb=tuple(aabb), unbounded=unbounded,
                                encoder_remat=args.encoder_remat)
        prop_fields = [
            CPDensityField(aabb=tuple(aabb), unbounded=unbounded,
                           encoder_remat=args.encoder_remat)
            for _ in prop_samples
        ]
    else:
        field = NGPRadianceField(aabb=tuple(aabb), unbounded=unbounded)
        prop_fields = [
            NGPDensityField(aabb=tuple(aabb), unbounded=unbounded)
            for _ in prop_samples
        ]

    trainer = NGPPropTrainer(
        field=field,
        prop_fields=prop_fields,
        prop_samples=prop_samples,
        num_samples=num_samples,
        near_plane=near_plane,
        far_plane=far_plane,
        sampling_type=sampling_type,
        opaque_bkgd=opaque_bkgd,
        max_steps=args.max_steps,
        seed=args.seed,
    )
    state = trainer.init_state()
    requires_grad_fn = get_proposal_requires_grad_fn()

    sampler = None
    if args.device_sampler:
        from nerfacc_tpu.data import DeviceRaySampler

        sampler = DeviceRaySampler.from_loader(
            train_dataset, num_rays=args.batch_size
        )

    rng = np.random.default_rng(args.seed)
    tic = time.time()
    M = max(1, args.steps_per_call)
    step = 0
    while step <= args.max_steps:
        rgs = np.array(
            [requires_grad_fn(step + i) for i in range(M)], bool
        )
        if sampler is not None:
            state, auxs = trainer.train_steps_sampled(state, sampler, rgs)
        else:
            datas = [
                train_dataset[int(rng.integers(0, len(train_dataset)))]
                for _ in range(M)
            ]
            batches = {
                k: np.stack([d[k] for d in datas]) for k in datas[0]
            }
            state, auxs = trainer.train_steps(state, batches, rgs)
        step += M

        if (step - M) // args.log_every != step // args.log_every:
            jax.block_until_ready(state.params)
            elapsed = time.time() - tic
            mse = float(np.asarray(auxs["mse"])[-1])
            psnr = -10.0 * np.log10(max(mse, 1e-10))
            rate = step * args.batch_size * (
                trainer.num_samples + sum(trainer.prop_samples)
            ) / elapsed
            print(
                f"elapsed_time={elapsed:.2f}s | step={step} | "
                f"loss={float(np.asarray(auxs['loss'])[-1]):.5f} | "
                f"psnr={psnr:.2f} | "
                f"prop_loss={float(np.asarray(auxs['prop_loss']).max()):.5f} | "
                f"samples/s={rate:.3g}"
            )

    if args.eval_images != 0:
        m = trainer.eval_metrics(
            state, test_dataset, max_images=args.eval_images
        )
        print(f"evaluation: psnr_avg={m['psnr']:.2f} ssim_avg={m['ssim']:.4f}")


if __name__ == "__main__":
    main()
