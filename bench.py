"""Benchmark: SDXL-base 1024x1024 @ 30 steps on one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Metric: 1024x1024 images/min/chip at 30 DDIM steps with CFG 7.5 (the
BASELINE.md north-star). vs_baseline is measured against the 4 s/image
target (= 15 images/min) from BASELINE.md; the reference itself publishes
no numbers. Weights are random (no public checkpoint in this environment)
— identical FLOPs/memory traffic to real weights.
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from sdxl_tpu.configs import SDXL_BASE_DIFFUSER
    from sdxl_tpu.models.unet import init_unet
    from sdxl_tpu.pipeline.conditioning import Conditioning
    from sdxl_tpu.pipeline.sampler import (
        sample_latent,
        scaled_linear_alphas_cumprod,
    )
    from sdxl_tpu.utils import log

    n_steps = 30
    height = width = 1024
    batch = 1

    cfg = SDXL_BASE_DIFFUSER
    log(f"devices: {jax.devices()}")
    log("initializing SDXL-base UNet (bf16)...")
    params = init_unet(jax.random.PRNGKey(0), cfg.unet_config(), jnp.bfloat16)
    alphas = jnp.asarray(scaled_linear_alphas_cumprod())

    ks = jax.random.split(jax.random.PRNGKey(1), 8)
    cond = Conditioning(
        unconditional_context_full=jax.random.normal(ks[0], (1, 77, 2048), jnp.bfloat16),
        unconditional_context_open_clip=jax.random.normal(ks[1], (1, 77, 1280), jnp.bfloat16),
        context_full=jax.random.normal(ks[2], (batch, 77, 2048), jnp.bfloat16),
        context_open_clip=jax.random.normal(ks[3], (batch, 77, 1280), jnp.bfloat16),
        unconditional_channel_context=jax.random.normal(ks[4], (1, 2816), jnp.bfloat16),
        unconditional_channel_context_refiner=jax.random.normal(ks[5], (1, 2560), jnp.bfloat16),
        channel_context=jax.random.normal(ks[6], (batch, 2816), jnp.bfloat16),
        channel_context_refiner=jax.random.normal(ks[7], (batch, 2560), jnp.bfloat16),
        resolution=(height, width),
    )

    def run(seed):
        out = sample_latent(
            params, cfg, alphas, cond, jax.random.PRNGKey(seed),
            guidance_scale=7.5, n_steps=n_steps,
        )
        # NOTE: on the axon tunnel platform jax.block_until_ready does not
        # synchronize; a scalar readback is the only reliable fence.
        return float(jnp.sum(out))

    log("compiling + warmup run...")
    t0 = time.perf_counter()
    run(0)
    log(f"warmup (incl. compile): {time.perf_counter() - t0:.1f}s")

    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(i + 1)
        times.append(time.perf_counter() - t0)
        log(f"run {i}: {times[-1]:.3f}s")

    p50 = sorted(times)[len(times) // 2]
    per_image = p50 / batch
    images_per_min = 60.0 / per_image
    target = 15.0  # 4 s/image BASELINE target

    print(
        json.dumps(
            {
                "metric": "sdxl_base_1024_30steps_images_per_min_per_chip",
                "value": round(images_per_min, 3),
                "unit": "images/min/chip",
                "vs_baseline": round(images_per_min / target, 3),
                "p50_latency_s": round(per_image, 3),
                "n_steps": n_steps,
                "batch": batch,
            }
        )
    )


if __name__ == "__main__":
    main()
