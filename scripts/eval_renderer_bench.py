"""Eval-renderer s/frame benchmark: pooled vs cursor vs alive-ray, on the
translucent (default) and opaque procedural scenes.

Trains the shipping config for --train_steps, then times whole-frame
renders (single-dispatch scan renderer) per renderer mode at the trained
checkpoint.  The opaque scene is where early ray termination should pay:
rays saturate in ~2-3 samples at a surface (the reference's alive-ray
renderer regime, examples/utils.py:384-428), vs ~180 samples/ray on the
translucent scene.

Usage: python scripts/eval_renderer_bench.py --scene opaque
Prints one JSON line per measurement.
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", type=str, default="default",
                   choices=["default", "opaque"])
    p.add_argument("--train_steps", type=int, default=10000)
    p.add_argument("--frames", type=int, default=2)
    p.add_argument("--renderers", type=str, nargs="*",
                   default=["pooled", "cursor", "alive"])
    p.add_argument("--cursor_max_windows", type=int, nargs="*",
                   default=None, help="extra cursor variants to measure")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    import jax
    import numpy as np

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    from nerfacc_tpu.data import (
        DeviceRaySampler,
        ProceduralOpaqueSceneLoader,
        ProceduralSceneLoader,
    )
    from nerfacc_tpu.models.cp_field import CPRadianceField
    from nerfacc_tpu.trainers import NGPOccTrainer
    from nerfacc_tpu.utils import metrics as M

    loader_cls = (
        ProceduralOpaqueSceneLoader
        if args.scene == "opaque"
        else ProceduralSceneLoader
    )
    train_ds = loader_cls(split="train", num_rays=1024, seed=args.seed)
    test_ds = loader_cls(split="test")

    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    field = CPRadianceField(aabb=tuple(aabb))
    trainer = NGPOccTrainer(
        field=field,
        aabb=aabb,
        max_steps=args.train_steps,
        sample_budget=1 << 18,
        max_samples_per_ray=1024,
        render_step_size=5e-3,
        seed=args.seed,
    )
    state = trainer.init_state()
    # dynamic ray-batch controller (same role as the train scripts'): a
    # FIXED large ray count starves the loss during occupancy warmup —
    # budget truncation masks most rays out, which stalled learning
    # entirely on the opaque scene (13.6 dB at 10k) while the translucent
    # scene limped through.  Start small, grow toward the sample budget.
    base_sampler = DeviceRaySampler.from_loader(train_ds, num_rays=1024)
    buckets = [1024 * 2**i for i in range(6)]
    num_rays = 1024
    M_steps = 32
    t0 = time.time()
    step = 0
    while step < args.train_steps:
        sampler = base_sampler.with_num_rays(num_rays)
        state, auxs = trainer.train_steps_sampled(state, sampler, M_steps)
        step += M_steps
        n_total = int(np.asarray(auxs["n_total_samples"])[-1])
        if n_total > 0:
            want = int(num_rays * ((1 << 18) / float(n_total)))
            want = min(want, num_rays * 2)  # damped growth (see train script)
            num_rays = max([b for b in buckets if b <= max(want, 1024)])
    jax.block_until_ready(auxs["loss"])
    print(json.dumps({
        "scene": args.scene, "train_steps": step,
        "train_wall_s": round(time.time() - t0, 1),
    }), flush=True)

    data = test_ds[0]
    h, w = test_ds.HEIGHT, test_ds.WIDTH
    ref = np.asarray(data["rgb"])

    variants = []
    for r in args.renderers:
        variants.append((r, {"eval_renderer": r if r != "alive" else ""}))
    for mw in args.cursor_max_windows or []:
        variants.append(
            (f"cursor-mw{mw}",
             {"eval_renderer": "cursor", "cursor_max_windows": mw})
        )

    for name, over in variants:
        t = dataclasses.replace(trainer, **over)
        img = t.render_image(state, data)  # compile + warm
        t0 = time.time()
        for _ in range(args.frames):
            img = t.render_image(state, data)
        s_frame = (time.time() - t0) / args.frames
        psnr = M.psnr(img, ref)
        print(json.dumps({
            "scene": args.scene, "renderer": name,
            "s_per_frame_320": round(s_frame, 3),
            "s_per_frame_256_scaled": round(s_frame * (256 / w) ** 2, 3),
            "psnr": round(float(psnr), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
