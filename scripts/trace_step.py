"""Capture a jax.profiler trace of the bench operating point (fused 32-step
scan at 2048 rays x 2^18 budget) and print the op-profile shares.

Usage: python scripts/trace_step.py [trace_dir]  (default /tmp/step_trace)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_trace"

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerfacc_tpu.utils import setup_compilation_cache

    setup_compilation_cache()

    from nerfacc_tpu.data import ProceduralSceneLoader
    from nerfacc_tpu.models.cp_field import CPRadianceField
    from nerfacc_tpu.trainers import NGPOccTrainer

    aabb = [-1.5, -1.5, -1.5, 1.5, 1.5, 1.5]
    ds = ProceduralSceneLoader(
        split="train", num_rays=2048, width=256, height=256, n_train=6
    )
    field = CPRadianceField(aabb=tuple(aabb))
    trainer = NGPOccTrainer(
        field=field,
        aabb=aabb,
        sample_budget=1 << 18,
        max_samples_per_ray=1024,
        render_step_size=5e-3,
        # BENCH_COMPACTION mirrors bench.py's A/B knob
        compaction=os.environ.get("BENCH_COMPACTION", "onehot"),
    )
    state = trainer.init_state()
    state = state._replace(step=jnp.asarray(2048, jnp.int32))

    rng = np.random.default_rng(0)

    def make_batches():
        datas = [ds[int(rng.integers(0, len(ds)))] for _ in range(32)]
        return {
            k: jnp.asarray(np.stack([d[k] for d in datas]))
            for k in datas[0]
        }

    for _ in range(3):
        state, auxs = trainer.train_steps(state, make_batches())
    jax.block_until_ready(auxs["loss"])

    batches = jax.device_put(make_batches())
    jax.block_until_ready(batches)
    with jax.profiler.trace(trace_dir):
        state, auxs = trainer.train_steps(state, batches)
        jax.block_until_ready(auxs["loss"])
    print("trace captured to", trace_dir)

    from trace_summary import summarize

    summarize(trace_dir, 40)


if __name__ == "__main__":
    main()
