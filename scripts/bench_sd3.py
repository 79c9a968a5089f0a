"""On-chip bench: SD3-medium MMDiT at 1024x1024, 28 flow-matching steps.

Measures the diffuser scan (pair-batched CFG over the real 24-layer /
1536-hidden MMDiT, 4096 latent + 333 context tokens per stream) plus the
16-ch VAE decode, with random weights (identical FLOPs/HBM traffic to
real ones). The text towers run once per prompt and are benched
separately by the SDXL configs; here the conditioning is a fixed random
tensor so the measurement isolates the new architecture.

Adds sd3_1024_28steps_s to BENCH_CONFIGS.json.
Run on the real chip: python scripts/bench_sd3.py
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

    from sdxl_tpu.configs import SD3_MEDIUM_MMDIT
    from sdxl_tpu.models.mmdit import init_mmdit
    from sdxl_tpu.models.vae import init_autoencoder
    from sdxl_tpu.pipeline.flow_match import fm_diffuse_latent
    from sdxl_tpu.pipeline.sd3 import sd3_decode_latent, sd3_vae_config
    from sdxl_tpu.utils import fence, log

    cfg = SD3_MEDIUM_MMDIT
    log("init sd3-medium MMDiT (24L/1536h, bf16) + 16-ch VAE")
    params = jax.jit(init_mmdit, static_argnums=(1, 2))(
        jax.random.PRNGKey(0), cfg, jnp.bfloat16
    )
    vae_cfg = sd3_vae_config()
    vae = jax.jit(init_autoencoder, static_argnums=(1,))(
        jax.random.PRNGKey(1), vae_cfg
    )
    fence(params["proj_out"]["w"])

    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 333, 4096),
                            jnp.bfloat16)
    pooled = jax.random.normal(jax.random.PRNGKey(3), (2, 2048),
                               jnp.bfloat16)

    def run(seed):
        lat = jax.random.normal(jax.random.PRNGKey(seed),
                                (1, 128, 128, 16), jnp.float32)
        lat = fm_diffuse_latent(params, cfg, lat, ctx, pooled, 7.0,
                                n_steps=28)
        img = sd3_decode_latent(vae, vae_cfg, lat, 1.5305, 0.0609)
        fence(img)
        return img

    log("compile + warmup")
    run(0)
    ts = []
    for i in range(2):
        t0 = time.perf_counter()
        run(i + 1)
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    record("sd3_1024_28steps_s", round(best, 3))
    log(f"sd3_1024_28steps_s: {best:.3f}s "
        f"({60.0 / best:.1f} images/min/chip)")
    print(json.dumps({"sd3_1024_28steps_s": RESULTS["sd3_1024_28steps_s"]}))


if __name__ == "__main__":
    main()
