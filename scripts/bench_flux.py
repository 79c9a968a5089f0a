"""On-chip bench: FLUX.1 transformer step cost at 1024x1024.

The full FLUX.1 model (19 double + 38 single blocks at 3072 hidden,
~11.9 B params) needs ~24 GB in bf16 — more than one v5e chip's HBM — so
it is a tp>=2 deployment (the TP rules in parallel/mesh.py shard it
head-aligned: 24 heads x 128). On the single tunnel chip this bench
measures the REAL per-block cost instead: two depth-scaled variants
(4+8 and 8+16 blocks, identical 3072 hidden / 24x128 heads / 4608-token
[512 txt + 4096 img] sequence) give a per-(double+2 single) slope, from
which the full 19+38 model's step time extrapolates with the fixed
(embedders, final norm) cost removed.

Adds flux_block_ms / flux_1024_step_extrapolated_ms to
BENCH_CONFIGS.json. Run on the real chip: python scripts/bench_flux.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

RESULTS = {}
if os.path.isfile("BENCH_CONFIGS.json"):
    with open("BENCH_CONFIGS.json") as _f:
        RESULTS = json.load(_f)


def record(tag, value):
    RESULTS[tag] = value
    with open("BENCH_CONFIGS.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def main():
    from sdxl_tpu.utils.cache import init_compilation_cache

    init_compilation_cache()

    import jax
    import jax.numpy as jnp

    from sdxl_tpu.configs import FluxConfig
    from sdxl_tpu.models.flux import init_flux
    from sdxl_tpu.pipeline.flux import flux_diffuse_latent, flux_schedule
    from sdxl_tpu.utils import fence, log

    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 512, 4096),
                            jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (1, 768),
                               jnp.bfloat16)
    lat = jax.random.normal(jax.random.PRNGKey(4), (1, 128, 128, 16),
                            jnp.float32)
    g = jnp.full((1,), 3.5, jnp.float32)
    n_steps = 4
    ts, sig = flux_schedule(n_steps, 64 * 64)

    times = {}
    for n_double in (4, 8):
        cfg = FluxConfig(num_layers=n_double,
                         num_single_layers=2 * n_double)
        log(f"init flux {n_double}+{2 * n_double} blocks (3072h, bf16)")
        params = jax.jit(init_flux, static_argnums=(1, 2))(
            jax.random.PRNGKey(0), cfg, jnp.bfloat16)
        fence(params["proj_out"]["w"])

        def run():
            out = flux_diffuse_latent(
                params, cfg, lat.copy(), ctx, pooled, g,
                jnp.asarray(ts), jnp.asarray(sig),
                compute_dtype=jnp.bfloat16)
            fence(out)
            return out

        t0 = time.perf_counter()
        run()
        log(f"  compile+first: {time.perf_counter() - t0:.1f}s")
        best = min(
            (lambda s: (run(), time.perf_counter() - s)[1])(
                time.perf_counter())
            for _ in range(3))
        step_ms = best / n_steps * 1000.0
        times[n_double] = step_ms
        log(f"  {n_double}+{2 * n_double} blocks: {step_ms:.1f} ms/step")
        del params

    # slope per (1 double + 2 single) block unit; intercept = fixed cost;
    # full model: 19 double + 38 single = 19 such units
    unit_ms = (times[8] - times[4]) / 4.0
    fixed_ms = times[4] - 4 * unit_ms
    full_ms = fixed_ms + 19 * unit_ms
    log(f"per-(double+2 single) block: {unit_ms:.2f} ms; "
        f"fixed: {fixed_ms:.2f} ms; "
        f"extrapolated full FLUX.1 step: {full_ms:.1f} ms "
        f"(needs tp>=2 for the 24 GB of bf16 weights)")
    record("flux_block_unit_ms", round(unit_ms, 2))
    record("flux_1024_step_extrapolated_ms", round(full_ms, 1))
    record("flux_bench_note",
           "3072h/24x128 heads, 4608-token seq, bf16; depth-scaled 4+8 vs "
           "8+16 blocks on one v5e chip; full 19+38 model is a tp>=2 "
           "deployment (~24 GB bf16 weights)")


if __name__ == "__main__":
    main()
