"""On-chip bench for the round-3 extension surface: LCM few-step
sampling and DeepCache, at the real SDXL-base 1024x1024 config.

Adds to BENCH_CONFIGS.json:
  lcm_1024_4steps_s       — 4-step LCM, no-CFG (the LCM-LoRA / distilled
                            operating point: ~1/15 the UNet evals of the
                            30-step CFG headline)
  deepcache_1024_i2b3_s   — 30-step DDIM + CFG with DeepCache interval 2 /
                            branch 3 (alternate steps skip the deep
                            transformers)
  pag_1024_30steps_s      — 30-step DDIM + CFG + PAG 3.0 (one extra cond
                            UNet eval per step: the quality-max config)
  ays_1024_dpmpp10_s      — 10-step DPM++ 2M on the published AYS schedule
                            (the low-step quality operating point)

Weights are random (no public checkpoint here) — identical FLOPs/HBM
traffic to real weights. Run on the real chip: python scripts/bench_r3_extras.py
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
    except Exception as e:
        record(tag, f"ERROR: {type(e).__name__}: {str(e)[:120]}")
        log(f"{tag}: FAILED {e}")
        return None


def main():
    from sdxl_tpu.utils.cache import init_compilation_cache

    init_compilation_cache()

    from sdxl_tpu.pipeline.pipeline import random_pipeline

    pipe = random_pipeline()
    prompt = ["an astronaut riding a horse on the moon"]

    def lcm4(seed):
        return pipe.txt2img(prompt, resolution=(1024, 1024), n_steps=4,
                            guidance_scale=1.0, sampler="lcm", no_cfg=True,
                            seed=seed, device_output=True,
                            profile_stages=False)

    timed("lcm_1024_4steps_s", lcm4)

    def dc(seed):
        return pipe.txt2img(prompt, resolution=(1024, 1024), n_steps=30,
                            guidance_scale=7.5, deepcache=(2, 3),
                            seed=seed, device_output=True,
                            profile_stages=False)

    timed("deepcache_1024_i2b3_s", dc)

    def pag(seed):
        return pipe.txt2img(prompt, resolution=(1024, 1024), n_steps=30,
                            guidance_scale=7.5, pag_scale=3.0,
                            seed=seed, device_output=True,
                            profile_stages=False)

    timed("pag_1024_30steps_s", pag)

    def ays10(seed):
        return pipe.txt2img(prompt, resolution=(1024, 1024), n_steps=10,
                            guidance_scale=7.5, sampler="dpmpp",
                            schedule="ays", seed=seed, device_output=True,
                            profile_stages=False)

    timed("ays_1024_dpmpp10_s", ays10)

    print(json.dumps({k: RESULTS[k] for k in
                      ("lcm_1024_4steps_s", "deepcache_1024_i2b3_s",
                       "pag_1024_30steps_s", "ays_1024_dpmpp10_s")}))


if __name__ == "__main__":
    main()
