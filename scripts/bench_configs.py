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

    # ---- base + refiner two-stage FIRST, in its own process (~13.4 GB
    # params): it needs a clean chip; running it after group A leaves
    # this process's executables resident and OOMs the subprocess ----
    import subprocess

    # FULLY stage-scoped, exactly like the reference (sample/main.rs:
    # 217-278 loads each stage in a scope and drops it before the next):
    # embedder -> drop -> base scan -> swap base for refiner -> refiner
    # scan -> drop -> decode; the stages are strictly sequential so the
    # summed stage times ARE the e2e latency. Holding base+refiner
    # together (9.8 GB) no longer leaves the ~6 GB of scan workspace this
    # chip currently has free (r1 fit 13.4 GB resident — the tunnel chip
    # appears to carry a co-tenant now; memory_stats() is unavailable
    # through it), and the reference's own flow never holds both either.
    code = 'import sys, time, gc\nsys.path.insert(0, \'.\')\nfrom sdxl_tpu.utils.cache import init_compilation_cache\ninit_compilation_cache()\nimport jax, jax.numpy as jnp\nfrom sdxl_tpu.configs import SDXL_BASE_DIFFUSER, SDXL_REFINER_DIFFUSER\nfrom sdxl_tpu.models.unet import fuse_unet_qkv, init_unet\nfrom sdxl_tpu.pipeline.pipeline import random_pipeline\nfrom sdxl_tpu.pipeline.sampler import refine_latent, sample_latent\nfrom sdxl_tpu.utils.sync import fence\n\ndef stage(msg):\n    print(f"[probe] {msg}", flush=True)\n\nstage("init base-only pipeline")\npipe = random_pipeline()  # embedder + base unet + vae\ncond = pipe.conditioning([\'an astronaut riding a horse\'], (1024, 1024),\n                         profile_stages=False).astype(pipe.compute_dtype)\npipe.embedder_params = None; gc.collect()\n\nstage("base warm")\ndef base(seed):\n    lat = sample_latent(pipe.unet_params, pipe.diffuser_cfg,\n                        pipe.alphas_cumprod, cond, jax.random.PRNGKey(seed),\n                        7.5, 30, pipe.compute_dtype)\n    fence(lat); return lat\nbase(0)\nstage("base timed")\nt0 = time.perf_counter(); lat = base(1); t_base = time.perf_counter() - t0\nstage(f"base {t_base:.3f}s; swap base -> refiner")\nalphas = pipe.alphas_cumprod\nvae_params, vae_cfg, scale, vdt = (pipe.vae_params, pipe.vae_cfg,\n                                   pipe.scale_factor, pipe.vae_dtype)\ndecode_chunk = pipe.vae_decode_chunk\ncompute_dtype = pipe.compute_dtype\npipe.unet_params = None; del pipe; gc.collect()\n\nj_unet = jax.jit(init_unet, static_argnums=(1, 2))\nref_params = jax.jit(fuse_unet_qkv)(\n    j_unet(jax.random.PRNGKey(3), SDXL_REFINER_DIFFUSER.unet_config(),\n           jnp.bfloat16))\nfence(jax.tree_util.tree_leaves(ref_params)[0])\n\nstage("refiner warm")\ndef refine(x, seed):\n    out = refine_latent(ref_params, SDXL_REFINER_DIFFUSER, alphas, x, cond,\n                        jax.random.PRNGKey(seed), 7.5, 800, 30, compute_dtype)\n    fence(out); return out\nrefine(lat, 7)\nstage("refiner timed")\nt0 = time.perf_counter(); lat2 = refine(lat, 2); t_ref = time.perf_counter() - t0\nstage(f"refiner {t_ref:.3f}s; drop refiner; decode")\nref_params = None; gc.collect()\n\nfrom sdxl_tpu.pipeline.latent import decode_latent_to_images\ndef dec():\n    fence(decode_latent_to_images(vae_params, vae_cfg, lat2, scale, vdt))\ndec()\nt0 = time.perf_counter(); dec(); t_dec = time.perf_counter() - t0\nprint(\'REFINER_S\', round(t_base + t_ref + t_dec, 3),\n      \'base\', round(t_base, 3), \'ref\', round(t_ref, 3),\n      \'dec\', round(t_dec, 3), flush=True)\n'
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

    # stochastic k-samplers (r3): per-step in-scan noise draws add two
    # jax.random.normal calls per step — confirm the cost is noise-level
    timed("base_1024_euler_a30_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=30, sampler="euler_a", seed=s,
        **common))

    timed("base_1024_dpmpp_sde_karras20_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=20, sampler="dpmpp_sde",
        schedule="karras", seed=s, **common))

    # DeepCache (opt-in, quality-trading): interval-2 and -3 at the
    # default branch (shallow steps skip every transformer)
    timed("base_1024_dc2_30steps_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=30, deepcache=(2, 3), seed=s,
        **common))
    timed("base_1024_dc3_30steps_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=30, deepcache=(3, 3), seed=s,
        **common))

    # FreeU adds two FFT filters + two channel scalings per step
    import dataclasses as _dc

    from sdxl_tpu.configs import FREEU_DEFAULTS

    _plain_cfg = pipe.diffuser_cfg
    pipe.diffuser_cfg = _dc.replace(_plain_cfg, freeu=FREEU_DEFAULTS["sdxl"])
    timed("base_30steps_freeu_s", lambda s: pipe.txt2img(
        "an astronaut riding a horse", n_steps=30, seed=s, **common))
    pipe.diffuser_cfg = _plain_cfg

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

    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
