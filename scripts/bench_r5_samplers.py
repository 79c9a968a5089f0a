"""On-chip bench for the round-5 sampler surface (records into
BENCH_CONFIGS.json).

- lms (order 4): one UNet eval per step — s/image should track euler's;
  the multistep coefficients are schedule-static elementwise work.
- dpm2_a: TWO UNet evals per step (midpoint method) — a 15-step run
  costs ~a 30-step single-eval run; recorded to document the tradeoff.
- ddim_eta=1.0: the stochastic DDIM path adds one normal draw per step
  inside the scan — recorded vs the deterministic 30-step baseline.

Random weights, same harness as scripts/bench_configs.py.
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

    timed("lms_1024_30steps_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=30, sampler="lms",
        schedule="karras", seed=s, **common))
    timed("dpm2a_1024_15steps_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=15, sampler="dpm2_a",
        schedule="karras", seed=s, **common))
    timed("ddim_eta1_1024_30steps_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=30, seed=s,
        ddim_eta=1.0, **common))
    record("r5_sampler_bench_note",
           "lms = 1 eval/step (tracks euler); dpm2_a = 2 evals/step "
           "(15 steps ~ a 30-step single-eval run); ddim_eta adds one "
           "on-chip normal draw per step over the 3.77s deterministic "
           "baseline")
    print("done")


if __name__ == "__main__":
    main()
