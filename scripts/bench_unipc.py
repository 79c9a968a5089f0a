"""On-chip bench for the UniPC sampler (records into BENCH_CONFIGS.json).

UniPC's value is quality at LOW step counts (arXiv:2302.04867 reports
parity with 2-3x more DDIM steps), so the recorded configs are the
10-step karras run (the practical preset) and a 20-step linear run for
comparison against base_1024_dpmpp20_s. Random weights, same harness as
scripts/bench_configs.py.
"""

import pathlib
import sys

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT / "scripts"))
sys.path.insert(0, str(_ROOT))

import os  # noqa: E402

os.chdir(_ROOT)  # record() writes BENCH_CONFIGS.json at the repo root

from bench_configs import record, timed  # noqa: E402


def main():
    from sdxl_tpu.utils.cache import init_compilation_cache

    init_compilation_cache()

    from sdxl_tpu.pipeline.pipeline import random_pipeline

    common = dict(resolution=(1024, 1024), guidance_scale=7.5,
                  device_output=True, profile_stages=False)
    pipe = random_pipeline()

    timed("unipc_1024_karras10_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=10, sampler="unipc",
        schedule="karras", seed=s, **common))
    timed("unipc_1024_20steps_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=20, sampler="unipc",
        seed=s, **common))
    record("unipc_bench_note",
           "UniPC bh2/order-2: one UNet eval per step like DPM++ 2M; the "
           "corrector stage adds only elementwise work, so s/image tracks "
           "the step count")
    print("done")


if __name__ == "__main__":
    main()
