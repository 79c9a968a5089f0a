"""Benchmark the BASELINE.json config list on one TPU chip.

Configs (BASELINE.md):
  2. SDXL-base 1024x1024, 30 steps, CFG 7.5 (bench.py's headline)
  3. base + refiner two-stage (latent handoff at t=800)
  4. inpainting, 100 steps, crop-region mask
  5. batched txt2img throughput (8 prompts/chip, CFG pair-batched)

The refiner config runs with its own pipeline after the first is released
(base + refiner + embedder + VAE ~13.5 GB resident would crowd out decode
temps — the reference bounds VRAM the same way by loading each stage in a
scope, sample/main.rs:217-278).

Writes BENCH_CONFIGS.json at the repo root, updating after each config.
"""

import gc
import json
import sys
import time

sys.path.insert(0, ".")

RESULTS = {}


def record(tag, value):
    RESULTS[tag] = value
    with open("BENCH_CONFIGS.json", "w") as f:
        json.dump(RESULTS, f, indent=2)


def timed(tag, fn, runs=2):
    from sdxl_tpu.utils import log

    try:
        fn(0)  # compile
        ts = []
        for i in range(runs):
            t0 = time.perf_counter()
            fn(i + 1)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        record(tag, round(best, 3))
        log(f"{tag}: {best:.3f}s")
        return best
    except Exception as e:  # keep the suite alive; record the failure
        record(tag, f"ERROR: {type(e).__name__}: {str(e)[:120]}")
        log(f"{tag}: FAILED {e}")
        return None


def main():
    from sdxl_tpu.utils.cache import init_compilation_cache

    init_compilation_cache()

    import numpy as np

    from sdxl_tpu.configs import SDXL_REFINER_DIFFUSER
    from sdxl_tpu.pipeline.pipeline import random_pipeline

    common = dict(resolution=(1024, 1024), guidance_scale=7.5,
                  device_output=True, profile_stages=False)

    # ---- group A: base-only pipeline ----------------------------------------
    pipe = random_pipeline()

    timed("base_30steps_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=30, seed=s, **common))

    ref_img = np.random.default_rng(0).integers(
        0, 255, (1, 1024, 1024, 3)).astype(np.uint8)
    timed("inpaint_100steps_s", lambda s: pipe.inpaint(
        "an astronaut riding a horse", ref_img,
        crop_left=256, crop_right=768, crop_top=256, crop_bottom=768,
        n_steps=100, seed=s, guidance_scale=7.5,
        device_output=True, profile_stages=False), runs=1)

    t8 = timed("batch8_30steps_s", lambda s: pipe.txt2img(
        ["an astronaut riding a horse"] * 8, n_steps=30, seed=s, **common),
        runs=1)
    if t8:
        record("batch8_images_per_min_per_chip", round(8 * 60.0 / t8, 2))

    del pipe
    gc.collect()

    # ---- group B: base + refiner two-stage ----------------------------------
    pipe = random_pipeline(refiner_cfg=SDXL_REFINER_DIFFUSER)
    timed("base_plus_refiner_30steps_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=30, seed=s,
        use_refiner=True, **common), runs=1)

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
