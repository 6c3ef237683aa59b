"""Train Instant-NGP with an occupancy grid.

TPU-native equivalent of reference examples/train_ngp_nerf_occ.py.  With
--data_root pointing at nerf_synthetic data it trains the blender scenes;
without data it falls back to the self-contained procedural benchmark scene
(see nerfacc_tpu/data/procedural.py).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

NERF_SYNTHETIC_SCENES = [
    "chair", "drums", "ficus", "hotdog", "lego", "materials", "mic", "ship",
]
MIPNERF360_UNBOUNDED_SCENES = [
    "garden", "bicycle", "bonsai", "counter", "kitchen", "room", "stump",
]


def round_to_bucket(n: int, buckets) -> int:
    """Quantize the dynamic ray batch to bounded buckets (avoids XLA
    recompile storms; the reference resizes freely every step,
    train_ngp_nerf_occ.py:187-194).  Rounds DOWN so the controller can
    actually shrink the batch when the sample budget overflows — overflowed
    samples are dropped, which starves tail rays and biases gradients."""
    chosen = buckets[0]
    for b in buckets:
        if b <= n:
            chosen = b
    return chosen


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--scene", type=str, default="lego")
    parser.add_argument("--train_split", type=str, default="train")
    parser.add_argument("--max_steps", type=int, default=20000)
    parser.add_argument("--target_sample_batch_size", type=int, default=1 << 18)
    parser.add_argument("--init_batch_size", type=int, default=1024)
    parser.add_argument("--eval_every", type=int, default=0)
    parser.add_argument("--log_every", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument(
        "--field",
        type=str,
        default="cp",
        choices=["cp", "ngp", "tensorf", "voxel"],
        help="cp: all-matmul factorized field (TPU fast path); "
        "ngp: hash-grid field (reference-parity path); "
        "tensorf: VM decomposition (line + tri-plane levels, the "
        "reference's TensoRF benchmark family); "
        "voxel: dense voxel grid, one row gather per sample per level "
        "(DVGO role, direct-indexing quality tier)",
    )
    parser.add_argument(
        "--steps_per_call",
        type=int,
        default=8,
        help="steps fused into one device dispatch via lax.scan",
    )
    parser.add_argument(
        "--traversal",
        type=str,
        default="pooled",
        choices=["pooled", "windowed", "padded"],
    )
    parser.add_argument("--window_budget", type=int, default=None)
    parser.add_argument(
        "--fine_probes",
        type=lambda s: s if s == "auto" else int(s),
        default="auto",
        help="pooled fine occupancy test: auto (box-27 when the config "
        "makes it exact, else 4 run-start probes), -1 box, 0 exact "
        "per-candidate, K>0 run-start probes",
    )
    # draw ray batches ON DEVICE (data.device_sampler) — removes host-side
    # numpy batch assembly from the steady-state loop.  0 = host path.
    parser.add_argument("--device_sampler", type=int, default=1)
    parser.add_argument("--encoder_remat", type=str, default="none",
                        choices=["none", "dots", "full"])
    # K-Planes hybrid: append tri-plane levels to the CP field (quality
    # tier; e.g. --plane_res 64 --plane_rank 16)
    parser.add_argument("--plane_res", type=int, nargs="*", default=[])
    parser.add_argument("--plane_rank", type=int, nargs="*", default=[])
    parser.add_argument("--field_reg_weight", type=float, default=0.0)
    parser.add_argument("--occ_stripes", type=int, default=1,
                        help="striped partial dense occupancy refresh: S>1 "
                             "refreshes one rotating 1/S stripe per update "
                             "after warmup (NGPOccTrainer.occ_refresh_stripes)")
    parser.add_argument("--sampled_occ_update", action="store_true",
                        help="reference-style sampled occupancy update "
                        "instead of the dense all-cell refresh")
    # checkpoint save/resume (reference analog: train_mlp_nerf.py's
    # torch.save/load of model+optimizer+estimator+step) — the TrainState
    # pytree carries params, opt state, occupancy grid, PRNG key and step
    parser.add_argument("--model_path", type=str, default=None,
                        help="checkpoint path: resumes from it when "
                        "present; saved every --ckpt_every steps")
    parser.add_argument("--ckpt_every", type=int, default=5000)
    args = parser.parse_args()

    import jax

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    from nerfacc_tpu.models import NGPRadianceField
    from nerfacc_tpu.models.cp_field import CPRadianceField
    from nerfacc_tpu.trainers import NGPOccTrainer

    unbounded = (
        args.scene in MIPNERF360_UNBOUNDED_SCENES
        or args.scene == "procedural360"
    )
    # reference configs: train_ngp_nerf_occ.py:32-78
    if unbounded:
        trainer_kwargs = dict(
            grid_nlvl=4,
            render_step_size=1e-3,
            cone_angle=0.004,
            alpha_thre=1e-2,
            near_plane=0.2,
        )
    else:
        trainer_kwargs = dict(grid_nlvl=1, render_step_size=5e-3)

    if args.data_root is not None and unbounded:
        from nerfacc_tpu.data.nerf_360_v2 import SubjectLoader as Loader360

        aabb = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
        train_dataset = Loader360(
            subject_id=args.scene,
            root_fp=args.data_root,
            split="train",
            num_rays=args.init_batch_size,
            color_bkgd_aug="random",
            factor=4,
            seed=args.seed,
        )
        test_dataset = Loader360(
            subject_id=args.scene, root_fp=args.data_root, split="test", factor=4
        )
        weight_decay = 0.0
    elif args.data_root is not None:
        from nerfacc_tpu.data import SubjectLoader

        aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
        train_dataset = SubjectLoader(
            subject_id=args.scene,
            root_fp=args.data_root,
            split=args.train_split,
            num_rays=args.init_batch_size,
            seed=args.seed,
        )
        test_dataset = SubjectLoader(
            subject_id=args.scene, root_fp=args.data_root, split="test"
        )
        weight_decay = (
            1e-5 if args.scene in ["materials", "ficus", "drums"] else 1e-6
        )
    elif unbounded:
        # self-contained unbounded benchmark: 360-style camera ring, ground
        # plane + distant content outside the unit box (no dataset on disk)
        from nerfacc_tpu.data import ProceduralUnboundedSceneLoader

        aabb = [-1.0, -1.0, -1.0, 1.0, 1.0, 1.0]
        train_dataset = ProceduralUnboundedSceneLoader(
            split="train",
            num_rays=args.init_batch_size,
            seed=args.seed,
            color_bkgd_aug="random",
        )
        test_dataset = ProceduralUnboundedSceneLoader(split="test", n_test=6)
        weight_decay = 0.0
    else:
        from nerfacc_tpu.data import PROCEDURAL_SCENES, ProceduralSceneLoader

        loader_cls = PROCEDURAL_SCENES.get(args.scene, ProceduralSceneLoader)
        aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
        train_dataset = loader_cls(
            split="train", num_rays=args.init_batch_size, seed=args.seed
        )
        test_dataset = loader_cls(split="test")
        weight_decay = 1e-6

    if args.field == "cp":
        field = CPRadianceField(aabb=tuple(aabb), unbounded=unbounded,
                                encoder_remat=args.encoder_remat,
                                plane_resolutions=tuple(args.plane_res),
                                plane_ranks=tuple(args.plane_rank))
    elif args.field == "tensorf":
        from nerfacc_tpu.models import TensoRFRadianceField

        field = TensoRFRadianceField(aabb=tuple(aabb), unbounded=unbounded,
                                     encoder_remat=args.encoder_remat)
    elif args.field == "voxel":
        from nerfacc_tpu.models import VoxelRadianceField

        field = VoxelRadianceField(aabb=tuple(aabb), unbounded=unbounded)
    else:
        field = NGPRadianceField(aabb=tuple(aabb), unbounded=unbounded)
    trainer = NGPOccTrainer(
        field=field,
        aabb=aabb,
        max_steps=args.max_steps,
        weight_decay=weight_decay,
        field_reg_weight=args.field_reg_weight,
        sample_budget=args.target_sample_batch_size,
        max_samples_per_ray=1024,
        seed=args.seed,
        traversal=args.traversal,
        window_budget=args.window_budget,
        fine_probes=args.fine_probes,
        dense_occ_update=not args.sampled_occ_update,
        occ_refresh_stripes=args.occ_stripes,
        **trainer_kwargs,
    )
    state = trainer.init_state()
    start_step = 0
    if args.model_path is not None and os.path.exists(args.model_path):
        from nerfacc_tpu.utils.checkpoint import load_checkpoint

        state = load_checkpoint(args.model_path, like=state)
        start_step = int(np.asarray(state.step))
        print(f"resumed from {args.model_path} at step {start_step}")

    base_sampler = None
    if args.device_sampler and hasattr(train_dataset, "images"):
        from nerfacc_tpu.data import DeviceRaySampler

        base_sampler = DeviceRaySampler.from_loader(
            train_dataset, num_rays=train_dataset.num_rays
        )

    buckets = sorted(
        {1024 * 2**i for i in range(8)}
        | {1536 * 2**i for i in range(7)}
    )  # 1k .. 128k rays, ~1.33x spacing
    rng = np.random.default_rng(args.seed)
    tic = time.time()
    samples_done = 0
    M = max(1, args.steps_per_call)
    step = start_step
    trunc_ema = 0.0
    n_samples = 0
    # Aux reads are deferred TWO calls: materializing the just-dispatched
    # call's auxs blocks the host for one dispatch latency per call (~3%
    # end-to-end over the tunnel) — same policy as the trainer's
    # _note_demand demand queue.  The ray-count controller and cliff guard
    # therefore react with a 2-call lag, which is harmless for both.
    pending_auxs = []

    def _consume_aux(entry):
        nonlocal samples_done, trunc_ema, n_samples
        auxs, aux_step, aux_nrays = entry
        n_samples = int(np.asarray(auxs["n_rendering_samples"])[-1])
        n_total = int(np.asarray(auxs["n_total_samples"])[-1])
        samples_done += int(np.asarray(auxs["n_rendering_samples"]).sum())
        if n_total > 0 and args.target_sample_batch_size > 0:
            num_rays = train_dataset.num_rays
            want = int(
                num_rays * (args.target_sample_batch_size / float(n_total))
            )
            # Damp growth to 2x per adjustment: on hard-surface scenes the
            # per-ray demand swings with every occupancy refresh, and an
            # undamped controller oscillates between the extreme buckets
            # (measured: 2048 <-> 131072 rays on the opaque scene — each
            # visited bucket is a full step recompile, and the overshoot
            # truncates the whole batch, collapsing the loss).  Shrinking
            # stays immediate: overflow starves tail rays.
            want = min(want, num_rays * 2)
            train_dataset.update_num_rays(round_to_bucket(want, buckets))

        # Cliff guard: a persistently high truncated-ray fraction means the
        # traversal budget (window pool / per-ray windows / sample budget) is
        # too small for the scene — quality degrades silently otherwise
        # (reference analog: traverse_steps_limit semantics, grid.cu:184,208).
        n_trunc = int(np.asarray(auxs["n_rays_truncated"])[-1])
        frac_trunc = n_trunc / max(aux_nrays, 1)
        trunc_ema = (
            0.9 * trunc_ema + 0.1 * frac_trunc if aux_step > M else frac_trunc
        )
        if trunc_ema > 0.5 and aux_step % (args.log_every) < M and aux_step > 500:
            print(
                f"WARNING: {trunc_ema:.0%} of rays are budget-truncated "
                f"(step {aux_step}). Raise --window_budget / "
                f"--target_sample_batch_size or quality will suffer."
            )

    while step <= args.max_steps:
        if base_sampler is not None:
            # device-side batches at the current bucket's static ray count
            # (samplers share the staged pixel/camera tables; one jit
            # specialization per bucket, same as the host path)
            n_rays_now = train_dataset.num_rays
            sampler = base_sampler.with_num_rays(n_rays_now)
            state, auxs = trainer.train_steps_sampled(state, sampler, M)
        else:
            datas = [
                train_dataset[int(rng.integers(0, len(train_dataset)))]
                for _ in range(M)
            ]
            batches = {
                k: np.stack([d[k] for d in datas]) for k in datas[0].keys()
            }
            n_rays_now = len(datas[0]["rgb"])
            state, auxs = trainer.train_steps(state, batches)
        step += M

        pending_auxs.append((auxs, step, n_rays_now))
        if len(pending_auxs) > 2:
            _consume_aux(pending_auxs.pop(0))

        if step % args.log_every < M:
            jax.block_until_ready(state.params)
            elapsed = time.time() - tic
            mse = float(np.asarray(auxs["mse"])[-1])
            psnr = -10.0 * np.log10(max(mse, 1e-10))
            print(
                f"elapsed_time={elapsed:.2f}s | step={step} | "
                f"loss={float(np.asarray(auxs['loss'])[-1]):.5f} | "
                f"psnr={psnr:.2f} | "
                f"n_rendering_samples={n_samples} | "
                f"num_rays={n_rays_now} | "
                f"samples/s={samples_done / max(elapsed, 1e-9):.3g}"
            )

        if args.eval_every and step % args.eval_every < M and step > M:
            psnr_avg = trainer.eval_psnr(state, test_dataset)
            print(f"evaluation: step={step} psnr_avg={psnr_avg:.2f}")

        if (
            args.model_path is not None
            and step % args.ckpt_every < M
            and step > start_step
        ):
            from nerfacc_tpu.utils.checkpoint import save_checkpoint

            jax.block_until_ready(state.params)
            save_checkpoint(args.model_path, state)

    for entry in pending_auxs:
        _consume_aux(entry)

    m = trainer.eval_metrics(state, test_dataset)
    print(f"evaluation: psnr_avg={m['psnr']:.2f} ssim_avg={m['ssim']:.4f}")


if __name__ == "__main__":
    main()
