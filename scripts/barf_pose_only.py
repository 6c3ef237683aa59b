"""BARF isolation experiment (VERDICT r4 task 4a): pose-only registration
against the FROZEN analytic ground-truth field.

Joint BARF entangles pose error with field error; this script removes the
field from the loop entirely: rays are rendered through the procedural
scene's ANALYTIC density/rgb (the same closed forms that generated the GT
images), and ONLY the per-camera SE(3) twists are optimized on the
photometric loss.  Whatever registration error remains is the ceiling of
the pose pipeline itself (ray math, optimizer, loss), independent of NeRF
fitting dynamics.

Usage: python scripts/barf_pose_only.py [--steps 2000] [--rot_std 0.05]
Prints registration errors every 250 steps and one final JSON line.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--num_rays", type=int, default=2048)
    p.add_argument("--n_samples", type=int, default=192)
    p.add_argument("--rot_std", type=float, default=0.05)
    p.add_argument("--trans_std", type=float, default=0.05)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log_every", type=int, default=250)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from nerfacc_tpu.data import ProceduralSceneLoader
    from nerfacc_tpu.models.pose import (
        compose_pose,
        perturb_poses,
        pose_registration_errors,
        se3_exp,
    )

    ds = ProceduralSceneLoader(split="train", num_rays=args.num_rays,
                               width=256, height=256)
    c2w_gt = np.asarray(ds.camtoworlds, np.float32)[:, :3, :4]
    n_images = c2w_gt.shape[0]
    K = jnp.asarray(ds.K)
    c2w_init, _ = perturb_poses(
        jax.random.PRNGKey(args.seed + 1), jnp.asarray(c2w_gt),
        rot_std=args.rot_std, trans_std=args.trans_std,
    )
    err0 = pose_registration_errors(np.asarray(c2w_init), c2w_gt)
    print(f"init: R {err0['rot_deg']:.4f} deg | T {err0['trans']:.5f}")

    near, far = ds.NEAR, ds.FAR
    ts = jnp.linspace(near, far, args.n_samples + 1)
    t0s, t1s = ts[:-1], ts[1:]

    def render(rays_o, rays_d):
        """Analytic-field volume render along fixed uniform samples."""
        tm = 0.5 * (t0s + t1s)  # (S,)
        pos = rays_o[:, None, :] + tm[None, :, None] * rays_d[:, None, :]
        flat = pos.reshape(-1, 3)
        sigma = ds.query_density(flat).reshape(-1, args.n_samples)
        rgb = ds.query_rgb(flat).reshape(-1, args.n_samples, 3)
        dt = (t1s - t0s)[None, :]
        alpha = 1.0 - jnp.exp(-sigma * dt)
        trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
        trans = jnp.concatenate(
            [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1
        )
        w = alpha * trans
        color = jnp.sum(w[..., None] * rgb, axis=1)
        acc = jnp.sum(w, axis=1, keepdims=True)
        return color + (1.0 - acc)  # white background

    def rays_from(deltas, img_ids, x, y):
        c2w = jnp.take(
            compose_pose(
                se3_exp(deltas),
                jnp.asarray(np.asarray(c2w_init)),
            ),
            img_ids, axis=0,
        )
        fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
        dirs = jnp.stack(
            [
                (x + 0.5 - cx) / fx,
                (y + 0.5 - cy) / fy * -1.0,
                -jnp.ones_like(x),
            ],
            axis=-1,
        )
        rays_d = jnp.einsum(
            "nij,nj->ni", c2w[..., :3], dirs, precision="highest"
        )
        rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
        return c2w[..., 3], rays_d

    opt = optax.adam(args.lr)
    deltas = jnp.zeros((n_images, 6), jnp.float32)
    opt_state = opt.init(deltas)

    @jax.jit
    def step(deltas, opt_state, key):
        k1, k2, k3 = jax.random.split(key, 3)
        img_ids = jax.random.randint(k1, (args.num_rays,), 0, n_images)
        x = jax.random.uniform(k2, (args.num_rays,), minval=0.0,
                               maxval=float(ds.WIDTH) - 1.0)
        y = jax.random.uniform(k3, (args.num_rays,), minval=0.0,
                               maxval=float(ds.HEIGHT) - 1.0)
        # target rays: ground-truth poses, same pixels
        def loss_fn(d):
            ro, rd = rays_from(d, img_ids, x, y)
            pred = render(ro, rd)
            gt_c2w = jnp.take(jnp.asarray(c2w_gt), img_ids, axis=0)
            fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
            dirs = jnp.stack(
                [(x + 0.5 - cx) / fx, (y + 0.5 - cy) / fy * -1.0,
                 -jnp.ones_like(x)], axis=-1)
            rd_gt = jnp.einsum("nij,nj->ni", gt_c2w[..., :3], dirs,
                               precision="highest")
            rd_gt = rd_gt / jnp.linalg.norm(rd_gt, axis=-1, keepdims=True)
            target = render(gt_c2w[..., 3], rd_gt)
            return jnp.mean((pred - jax.lax.stop_gradient(target)) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(deltas)
        up, opt_state = opt.update(g, opt_state, deltas)
        return optax.apply_updates(deltas, up), opt_state, loss

    key = jax.random.PRNGKey(args.seed)
    tic = time.time()
    for i in range(1, args.steps + 1):
        key, sub = jax.random.split(key)
        deltas, opt_state, loss = step(deltas, opt_state, sub)
        if i % args.log_every == 0:
            refined = compose_pose(
                se3_exp(deltas), jnp.asarray(np.asarray(c2w_init))
            )
            err = pose_registration_errors(np.asarray(refined), c2w_gt)
            print(
                f"step {i}: loss={float(loss):.3e} | "
                f"R {err['rot_deg']:.4f} deg | T {err['trans']:.5f}",
                flush=True,
            )
    refined = compose_pose(se3_exp(deltas), jnp.asarray(np.asarray(c2w_init)))
    err = pose_registration_errors(np.asarray(refined), c2w_gt)
    print(json.dumps({
        "name": "barf-pose-only",
        "steps": args.steps,
        "rot_deg": round(err["rot_deg"], 4),
        "trans": round(err["trans"], 5),
        "rot_deg_init": round(err0["rot_deg"], 4),
        "trans_init": round(err0["trans"], 5),
        "wall_s": round(time.time() - tic, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
