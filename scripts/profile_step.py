"""Component-level timing of the fused train step on the current chip.

Times each stage of the NGPOccTrainer step (traversal, compaction, field
fwd / fwd+bwd, compositing, occupancy EMA, full step) with dependency-chained
repetition inside one jit so the ~10 ms dispatch overhead is amortized out.

Usage: python scripts/profile_step.py [--rays 2048] [--budget 262144]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=20, warmup=2):
    """Median wall time of fn(*args) with the output forced."""
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / iters)
    return sorted(times)[len(times) // 2]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--rays", type=int, default=2048)
    p.add_argument("--budget", type=int, default=1 << 18)
    p.add_argument("--windows", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    from nerfacc_tpu.data import ProceduralSceneLoader
    from nerfacc_tpu.estimators.occ_grid import sampling_padded, update_occ_grid
    from nerfacc_tpu.grid import traverse_grids_windowed
    from nerfacc_tpu.models.cp_field import CPRadianceField
    from nerfacc_tpu.trainers import NGPOccTrainer
    from nerfacc_tpu.utils.rendering import (
        compact_samples,
        render_rays_with_occgrid,
    )

    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    n_rays = args.rays
    budget = args.budget

    ds = ProceduralSceneLoader(split="train", num_rays=n_rays, width=256, height=256, n_train=6)
    field = CPRadianceField(aabb=tuple(aabb))
    trainer = NGPOccTrainer(
        field=field,
        aabb=aabb,
        sample_budget=budget,
        max_samples_per_ray=1024,
        render_step_size=5e-3,
        n_windows=args.windows,
    )
    state = trainer.init_state()
    state = state._replace(step=jnp.asarray(2048, jnp.int32))

    batch = {k: jnp.asarray(v) for k, v in ds[0].items()}
    # run some steps so the occupancy grid is converged-ish
    for _ in range(3):
        state, aux = trainer.train_step(state, batch)
    jax.block_until_ready(aux["loss"])
    print(f"grid occupancy: {float(jnp.mean(state.occ_state.binaries)):.3f}")

    rays_o, rays_d = batch["rays_o"], batch["rays_d"]
    occ = state.occ_state
    params = state.params

    max_coarse = max(trainer.max_samples_per_ray // trainer.window_size + 32, 64)

    # --- traversal ---
    trav = jax.jit(lambda o, d, b, a: traverse_grids_windowed(
        o, d, b, a, step_size=5e-3, n_windows=args.windows,
        window_size=trainer.window_size, max_coarse=max_coarse))
    t_trav = timed(trav, rays_o, rays_d, occ.binaries, occ.aabbs)
    res = trav(rays_o, rays_d, occ.binaries, occ.aabbs)
    n_valid = int(jnp.sum(res.valid))
    print(f"traversal(windowed W={args.windows}): {t_trav*1e3:.2f} ms  "
          f"({n_valid} valid of {res.valid.size} candidates, "
          f"{n_valid/n_rays:.1f}/ray)")

    # --- compaction ---
    comp = jax.jit(lambda r: compact_samples(r, budget))
    t_comp = timed(comp, res)
    print(f"compaction(budget={budget}): {t_comp*1e3:.2f} ms")
    samples = comp(res)

    # --- field fwd on the budget buffer ---
    t_mid = 0.5 * (samples.t_starts + samples.t_ends)
    gather_ids = jnp.minimum(samples.ray_indices, n_rays - 1)
    o = jnp.take(rays_o, gather_ids, axis=0)
    d = jnp.take(rays_d, gather_ids, axis=0)
    positions = o + t_mid[:, None] * d

    fwd = jax.jit(lambda p, x, dd: field(p, x, dd)[0])
    t_fwd = timed(fwd, params, positions, d)
    print(f"field fwd ({budget} samples): {t_fwd*1e3:.2f} ms")

    # encoder alone
    u = jnp.clip((positions - jnp.asarray(aabb[:3])) / 3.0, 0, 1)
    enc = jax.jit(lambda p, x: field.encoder(p, x))
    t_enc = timed(enc, params["encoder"], u)
    print(f"  encoder fwd: {t_enc*1e3:.2f} ms")

    fieldgrad = jax.jit(jax.grad(
        lambda p, x, dd: jnp.sum(field(p, x, dd)[0]) + jnp.sum(field(p, x, dd)[1])))
    t_fg = timed(fieldgrad, params, positions, d)
    print(f"field fwd+bwd: {t_fg*1e3:.2f} ms")

    # --- full render fwd+bwd (field + compositing) ---
    def render_loss(p, samples):
        def rgb_sigma_fn(pos, dirs, rid):
            rgb, density = field(p, pos, dirs)
            return rgb, density[..., 0]
        colors, opac, _, _ = render_rays_with_occgrid(
            rgb_sigma_fn, rays_o, rays_d, samples,
            render_bkgd=batch["color_bkgd"])
        return jnp.sum(colors**2)

    rgrad = jax.jit(jax.grad(render_loss))
    t_rg = timed(rgrad, params, samples)
    print(f"render fwd+bwd (field+compositing): {t_rg*1e3:.2f} ms")

    # --- POOLED traversal (the shipping path) -------------------------------
    from nerfacc_tpu.grid import traverse_grids_pooled
    from nerfacc_tpu.utils.rendering import compact_samples_from_windows

    wb = max(budget // 4, 1024)
    for fp, label in ((-1, "box-27 (default)"), (4, "fp4"), (0, "exact per-cand")):
        trav_p = jax.jit(lambda o, d, b, a, fp=fp: traverse_grids_pooled(
            o, d, b, a, step_size=5e-3, window_budget=wb,
            window_size=trainer.window_size, max_coarse=max_coarse,
            fine_probes=fp))
        t_p = timed(trav_p, rays_o, rays_d, occ.binaries, occ.aabbs)
        ws = trav_p(rays_o, rays_d, occ.binaries, occ.aabbs)
        print(f"pooled traversal [{label}]: {t_p*1e3:.2f} ms  "
              f"({int(jnp.sum(ws.valid))} valid)")
    comp_w = jax.jit(lambda w: compact_samples_from_windows(w, budget, n_rays))
    t_cw = timed(comp_w, ws)
    print(f"window compaction(budget={budget}): {t_cw*1e3:.2f} ms")

    # --- occupancy EMA update ---
    def occ_eval(x):
        return field.query_density(params, x)[..., 0] * 5e-3
    upd = jax.jit(lambda s, k: update_occ_grid(
        s, k, jnp.asarray(2048), occ_eval))
    t_upd = timed(upd, occ, jax.random.PRNGKey(0), iters=5)
    print(f"occ EMA update (every 16): {t_upd*1e3:.2f} ms  "
          f"(amortized {t_upd/16*1e3:.2f} ms/step)")

    # --- full fused step (state-threaded: donation-safe and truly serial) ---
    st = state
    for _ in range(3):
        st, aux = trainer.train_step(st, batch)
    jax.block_until_ready(aux["loss"])
    n_iter = 20
    t0_w = time.perf_counter()
    total_s = 0
    for _ in range(n_iter):
        st, aux = trainer.train_step(st, batch)
        total_s = total_s + aux["n_rendering_samples"]
    jax.block_until_ready(aux["loss"])
    t_step = (time.perf_counter() - t0_w) / n_iter
    nrs = int(jax.device_get(total_s)) // n_iter
    print(f"FULL STEP: {t_step*1e3:.2f} ms")
    print(f"  n_rendering_samples={nrs}  -> {nrs/t_step/1e6:.2f} M samples/s")

    # --- full fused 32-step scan (the bench.py operating point: per-call
    # dispatch amortized; this is the number that matches the headline) ---
    batches = {k: jnp.stack([v] * 32) for k, v in batch.items()}
    st = state
    st, auxs = trainer.train_steps(st, batches)
    jax.block_until_ready(auxs["loss"])
    n_iter = 3
    t0_w = time.perf_counter()
    tot = 0
    for _ in range(n_iter):
        st, auxs = trainer.train_steps(
            st, {k: v for k, v in batches.items()}
        )
        tot = tot + jnp.sum(auxs["n_rendering_samples"])
    jax.block_until_ready(auxs["loss"])
    t_scan = (time.perf_counter() - t0_w) / (n_iter * 32)
    nrs = int(jax.device_get(tot)) // (n_iter * 32)
    print(f"FUSED 32-STEP SCAN: {t_scan*1e3:.2f} ms/step  "
          f"-> {nrs/t_scan/1e6:.2f} M samples/s")


if __name__ == "__main__":
    main()
