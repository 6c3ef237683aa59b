"""Component-level timing of the fused proposal-network train step.

Times each stage of the NGPPropTrainer step (importance sampling cascade,
proposal-field eval, main-field eval fwd+bwd, interlevel loss, full fused
step) with dependency-chained repetition so the ~10 ms tunnel dispatch is
amortized out.  The occ-path analog is scripts/profile_step.py.

Usage: python scripts/profile_prop.py [--rays 4096]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, iters=20, warmup=2):
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
    p.add_argument("--rays", type=int, default=4096)
    p.add_argument("--prop_samples", type=int, default=128)
    p.add_argument("--num_samples", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()
    jax.config.update("jax_default_prng_impl", "rbg")

    from nerfacc_tpu.data import ProceduralSceneLoader
    from nerfacc_tpu.estimators.prop_net import propnet_loss, propnet_sampling
    from nerfacc_tpu.models.cp_field import CPDensityField, CPRadianceField
    from nerfacc_tpu.pdf import importance_sampling
    from nerfacc_tpu.data_specs import RayIntervals
    from nerfacc_tpu.trainers import NGPPropTrainer

    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    n_rays = args.rays
    near, far = 2.0, 6.0

    ds = ProceduralSceneLoader(
        split="train", num_rays=n_rays, width=256, height=256, n_train=6
    )
    field = CPRadianceField(aabb=tuple(aabb))
    prop_fields = [CPDensityField(aabb=tuple(aabb))]
    trainer = NGPPropTrainer(
        field=field,
        prop_fields=prop_fields,
        prop_samples=[args.prop_samples],
        num_samples=args.num_samples,
        near_plane=near,
        far_plane=far,
    )
    state = trainer.init_state()
    batch = {k: jnp.asarray(v) for k, v in ds[0].items()}
    rays_o, rays_d = batch["rays_o"], batch["rays_d"]
    params = state.params
    key = jax.random.PRNGKey(0)

    # --- importance sampling, level 0 (2 edges -> prop_samples) ---
    cdfs0 = jnp.concatenate(
        [jnp.zeros((n_rays, 1)), jnp.ones((n_rays, 1))], axis=-1
    )
    is0 = jax.jit(
        lambda c, k: importance_sampling(
            RayIntervals(vals=c), c, args.prop_samples, True, key=k
        )[0].vals
    )
    t_is0 = timed(is0, cdfs0, key)
    print(f"importance_sampling L0 (2 -> {args.prop_samples + 1} edges): "
          f"{t_is0 * 1e3:.2f} ms")

    # realistic level-1 inputs: run the actual cascade once
    def upto_l1(params, k):
        fns = [
            trainer._prop_sigma_fn(pf, pp, rays_o, rays_d)
            for pf, pp in zip(prop_fields, params["props"])
        ]
        t0, t1, cache = propnet_sampling(
            fns, [args.prop_samples], args.num_samples, n_rays,
            near, far, "uniform", stratified=True,
            requires_grad=True, key=k,
        )
        return t0, t1, cache

    t0f, t1f, cache = jax.jit(upto_l1)(params, key)
    edges1 = cache[0][0]
    cdfs1 = cache[0][1]
    is1 = jax.jit(
        lambda e, c, k: importance_sampling(
            RayIntervals(vals=e), c, args.num_samples, True, key=k
        )[0].vals
    )
    t_is1 = timed(is1, edges1, cdfs1, key)
    print(f"importance_sampling L1 ({edges1.shape[-1]} -> "
          f"{args.num_samples + 1} edges): {t_is1 * 1e3:.2f} ms")

    # --- proposal-field eval fwd ({n_rays} x prop_samples) ---
    tp_mid = jnp.linspace(near, far, args.prop_samples)
    tp0 = jnp.broadcast_to(tp_mid[None, :], (n_rays, args.prop_samples))
    prop_fn = trainer._prop_sigma_fn(prop_fields[0], params["props"][0],
                                     rays_o, rays_d)
    pf_fwd = jax.jit(lambda t: prop_fn(t, t + 1e-3))
    t_pf = timed(pf_fwd, tp0)
    n_prop = n_rays * args.prop_samples
    print(f"prop-field fwd ({n_prop} samples): {t_pf * 1e3:.2f} ms")

    pf_grad = jax.jit(jax.grad(
        lambda pp, t: jnp.sum(
            trainer._prop_sigma_fn(prop_fields[0], pp, rays_o, rays_d)(
                t, t + 1e-3
            )
        )
    ))
    t_pfg = timed(pf_grad, params["props"][0], tp0)
    print(f"prop-field fwd+bwd: {t_pfg * 1e3:.2f} ms")

    # --- main-field eval fwd+bwd ({n_rays} x num_samples) ---
    tm = jnp.broadcast_to(
        jnp.linspace(near, far, args.num_samples)[None, :],
        (n_rays, args.num_samples),
    )
    pos = (rays_o[:, None, :] + tm[..., None] * rays_d[:, None, :]).reshape(-1, 3)
    dirs = jnp.broadcast_to(rays_d[:, None, :],
                            (n_rays, args.num_samples, 3)).reshape(-1, 3)
    f_grad = jax.jit(jax.grad(
        lambda fp: jnp.sum(field(fp, pos, dirs)[0])
        + jnp.sum(field(fp, pos, dirs)[1])
    ))
    t_fg = timed(f_grad, params["field"])
    print(f"main-field fwd+bwd ({n_rays * args.num_samples} samples): "
          f"{t_fg * 1e3:.2f} ms")

    # --- full sampling cascade (no grad / grad) ---
    samp_ng = jax.jit(lambda p, k: propnet_sampling(
        [trainer._prop_sigma_fn(pf, pp, rays_o, rays_d)
         for pf, pp in zip(prop_fields, p["props"])],
        [args.prop_samples], args.num_samples, n_rays, near, far,
        "uniform", stratified=True, requires_grad=False, key=k)[:2])
    t_sng = timed(samp_ng, params, key)
    print(f"propnet_sampling cascade (no-grad): {t_sng * 1e3:.2f} ms")

    # --- interlevel loss fwd+bwd ---
    trans = jnp.linspace(1.0, 0.0, args.num_samples)[None, :].repeat(n_rays, 0)

    def ploss(pp):
        fns = [trainer._prop_sigma_fn(pf, ppp, rays_o, rays_d)
               for pf, ppp in zip(prop_fields, pp)]
        _, _, cache = propnet_sampling(
            fns, [args.prop_samples], args.num_samples, n_rays, near, far,
            "uniform", stratified=True, requires_grad=True, key=key)
        return propnet_loss(cache, trans, 1.0)

    pl_grad = jax.jit(jax.grad(lambda pp: ploss(pp)))
    t_pl = timed(pl_grad, params["props"])
    print(f"sampling+interlevel-loss fwd+bwd: {t_pl * 1e3:.2f} ms")

    # --- full fused step (grad and no-grad variants) ---
    batches = {k: jnp.stack([batch[k]] * 8) for k in batch}
    for rg in (True, False):
        # fresh state per variant: train_steps donates its input state
        st2 = trainer.init_state()
        rgs = jnp.asarray([rg] * 8)
        st2, aux = trainer.train_steps(st2, batches, rgs)
        jax.block_until_ready(aux["loss"])
        n_iter = 4
        t0w = time.perf_counter()
        for _ in range(n_iter):
            st2, aux = trainer.train_steps(st2, batches, rgs)
        jax.block_until_ready(aux["loss"])
        t_step = (time.perf_counter() - t0w) / n_iter / 8
        n_samp = n_rays * (args.prop_samples + args.num_samples)
        print(f"FULL STEP (requires_grad={rg}): {t_step * 1e3:.2f} ms  "
              f"-> {n_samp / t_step / 1e6:.1f} M samples/s")


if __name__ == "__main__":
    main()
