"""In-program A/B of flash routing at non-square aspect buckets.

Times the full 30-step base sampling scan (the real UNet program, random
bf16 weights) at a non-square bucket under the current flash env config:
  SDXL_TPU_DISABLE_FLASH=1            -> all attention on XLA
  SDXL_TPU_FLASH_MIN_T=3000           -> level-1 (+VAE) only
  (default, 924)                      -> level-1 and level-2

Usage: python scripts/bench_nonsquare.py [HEIGHT WIDTH]
Prints: NONSQUARE <h>x<w> sample_s <t>
"""

import sys
import time

sys.path.insert(0, ".")

from sdxl_tpu.utils.cache import init_compilation_cache

init_compilation_cache()

import jax

from sdxl_tpu.pipeline.pipeline import random_pipeline
from sdxl_tpu.pipeline.sampler import sample_latent
from sdxl_tpu.utils.sync import fence


def main():
    h, w = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 else (832, 1216)
    import os

    print(
        f"[nonsquare] {h}x{w} disable_flash="
        f"{os.environ.get('SDXL_TPU_DISABLE_FLASH', '0')} "
        f"min_t={os.environ.get('SDXL_TPU_FLASH_MIN_T', '924')}",
        flush=True,
    )
    pipe = random_pipeline()
    cond = pipe.conditioning(["an astronaut riding a horse"], (h, w)).astype(
        pipe.compute_dtype
    )

    def run(seed):
        lat = sample_latent(
            pipe.unet_params, pipe.diffuser_cfg, pipe.alphas_cumprod, cond,
            jax.random.PRNGKey(seed), 7.5, 30, pipe.compute_dtype,
        )
        fence(lat)
        return lat

    run(0)  # compile
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        run(i + 1)
        ts.append(time.perf_counter() - t0)
    print(f"NONSQUARE {h}x{w} sample_s {min(ts):.3f}", flush=True)


if __name__ == "__main__":
    main()
