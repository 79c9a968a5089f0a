"""On-chip bench: SDXL UNet-family weight-only quantization.

Measures, at the REAL SDXL base config on one chip:
  1. base 1024x1024 / 30-step DDIM / CFG e2e, --quantize int8 vs the bf16
     baseline (quantization is a MEMORY lever; this records its speed
     cost — the in-scan dequant rides the consuming matmul, so the
     expected delta is small),
  2. base + refiner two-stage with BOTH UNets int8-RESIDENT — the
     configuration the shrunken-HBM tunnel chip can no longer hold in
     bf16 (STATUS.md r2: 9.8 GB params + scan workspace OOMs; int8 drops
     the two UNets' block linears ~4.0 GiB -> ~2.0 GiB).

Writes results into BENCH_CONFIGS.json:
  base_1024_30steps_int8_s, base_plus_refiner_resident_int8_s (or an
  ERROR string if a config genuinely cannot run).
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
    import jax

    from sdxl_tpu.cli.sample import _quantize_unet_inplace
    from sdxl_tpu.configs import SDXL_REFINER_DIFFUSER
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from sdxl_tpu.utils import log
    from sdxl_tpu.utils.cache import init_compilation_cache

    init_compilation_cache()
    log(f"devices: {jax.devices()}")

    # --- 1. base-only: int8 e2e vs the recorded bf16 headline
    pipe = random_pipeline(tokenizer_dir=None)
    _quantize_unet_inplace(pipe, "int8")
    timed(
        "base_1024_30steps_int8_s",
        lambda i: pipe.txt2img(
            "a photo of a crab on the beach", resolution=(1024, 1024),
            n_steps=30, seed=i,
        ),
    )
    del pipe

    # --- 2. base + refiner, both int8, RESIDENT (no stage scoping)
    pipe = random_pipeline(tokenizer_dir=None,
                           refiner_cfg=SDXL_REFINER_DIFFUSER)
    _quantize_unet_inplace(pipe, "int8")
    timed(
        "base_plus_refiner_resident_int8_s",
        lambda i: pipe.txt2img(
            "a photo of a crab on the beach", resolution=(1024, 1024),
            n_steps=30, seed=i, use_refiner=True,
        ),
    )
    record(
        "unet_quant_bench_note",
        "random weights, real SDXL configs, one tunnel chip; int8 = "
        "UNet block linears quantized (io/quantize.py UNET_WITHIN); "
        "resident two-stage is the config bf16 can no longer fit "
        "(STATUS.md r2 HBM note)",
    )


if __name__ == "__main__":
    main()
