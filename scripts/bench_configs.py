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

import os

# start from the previously recorded file so entries measured by other
# harnesses (sd15_*, batch16_*) survive a re-run of this script
RESULTS = {}
if os.path.isfile("BENCH_CONFIGS.json"):
    with open("BENCH_CONFIGS.json") as _f:
        RESULTS = json.load(_f)


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

    # config #1 (512x512, 8 Euler steps) + the low-step DPM++ 2M config
    # (VERDICT r1 item 7: fewer steps at equal quality is the cheapest
    # images/min multiplier; DPM++ 2M at 20 steps ~ DDIM at 30+)
    timed("base_512_euler8_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", resolution=(512, 512), n_steps=8,
        guidance_scale=7.5, sampler="euler", seed=s,
        device_output=True, profile_stages=False))

    timed("base_1024_dpmpp20_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=20, sampler="dpmpp", seed=s,
        **common))

    # Turbo-style serving config: guidance-distilled checkpoints run 4
    # steps with no CFG (the no_cfg fast path halves the UNet batch)
    timed("base_1024_turbo4_nocfg_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", resolution=(1024, 1024), n_steps=4,
        guidance_scale=1.0, sampler="euler", no_cfg=True, seed=s,
        device_output=True, profile_stages=False))

    # batch-8 throughput: drop the (f32, 3.3 GB) embedder before sampling —
    # the reference bounds VRAM the same way by loading each stage in a
    # scope and dropping it (sample/main.rs:217-278)
    import jax

    from sdxl_tpu.pipeline.sampler import sample_latent
    from sdxl_tpu.utils.sync import fence

    cond8 = pipe.conditioning(
        ["an astronaut riding a horse"] * 8, (1024, 1024), profile_stages=False
    ).astype(pipe.compute_dtype)
    pipe.embedder_params = None
    gc.collect()

    def batch8(seed):
        lat = sample_latent(
            pipe.unet_params, pipe.diffuser_cfg, pipe.alphas_cumprod, cond8,
            jax.random.PRNGKey(seed), 7.5, 30, pipe.compute_dtype,
        )
        fence(pipe._decode(lat))

    t8 = timed("batch8_30steps_s", batch8, runs=1)
    if t8:
        record("batch8_images_per_min_per_chip", round(8 * 60.0 / t8, 2))

    del pipe, cond8
    gc.collect()

    # ---- group B: base + refiner two-stage (own process: ~13.4 GB params) ---
    import subprocess

    code = (
        "import sys,time,json; sys.path.insert(0, '.')\n"
        "from sdxl_tpu.utils.cache import init_compilation_cache\n"
        "init_compilation_cache()\n"
        "from sdxl_tpu.configs import SDXL_REFINER_DIFFUSER\n"
        "from sdxl_tpu.pipeline.pipeline import random_pipeline\n"
        "pipe = random_pipeline(refiner_cfg=SDXL_REFINER_DIFFUSER)\n"
        "kw = dict(resolution=(1024,1024), guidance_scale=7.5,"
        " device_output=True, profile_stages=False, use_refiner=True,"
        " n_steps=30)\n"
        "pipe.txt2img('an astronaut riding a horse', seed=0, **kw)\n"
        "t0=time.perf_counter();"
        " pipe.txt2img('an astronaut riding a horse', seed=1, **kw);"
        " print('REFINER_S', round(time.perf_counter()-t0, 3))\n"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=1800,
        )
        found = False
        for line in out.stdout.splitlines():
            if line.startswith("REFINER_S"):
                record("base_plus_refiner_30steps_s", float(line.split()[1]))
                found = True
        if not found:
            record("base_plus_refiner_30steps_s",
                   f"ERROR: {out.stderr.strip()[-150:]}")
    except Exception as e:
        record("base_plus_refiner_30steps_s", f"ERROR: {e}")

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
