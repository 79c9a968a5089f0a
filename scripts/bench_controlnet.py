"""On-chip ControlNet benchmarks at real SDXL scale (random weights —
step time is weight-value-independent):

  1. inference: base UNet + full ControlNet trunk (the ~1.25B-param
     encoder copy), 1024² / 30 DDIM steps / CFG — the guided analogue of
     bench.py's headline config. The trunk runs INSIDE the sampling scan
     every step (its cond_embed + cross-KV are hoisted, like the UNet's).
  2. training: one jitted ControlNet train step (masters bf16,
     Adafactor, rematerialized trunk+UNet) at the largest resolution
     that fits the chip (tries 1024 -> 768 -> 512).

Writes into BENCH_CONFIGS.json:
  controlnet_1024_30steps_s
  controlnet_1024_30steps_images_per_min_per_chip
  train_controlnet_b1_<res>_step_ms
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

RESULTS = {}
if os.path.isfile("BENCH_CONFIGS.json"):
    with open("BENCH_CONFIGS.json") as _f:
        RESULTS = json.load(_f)


def record(tag, value):
    RESULTS[tag] = value
    with open("BENCH_CONFIGS.json", "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[bench_controlnet] {tag} = {value}")


def bench_inference(n_steps=30, res=1024, runs=3):
    from sdxl_tpu.models.controlnet import init_controlnet
    from sdxl_tpu.pipeline.pipeline import random_pipeline

    print(f"[bench_controlnet] devices: {jax.devices()}")
    pipe = random_pipeline()
    ucfg = pipe.diffuser_cfg.unet_config()
    pipe.controlnet_params = jax.jit(
        init_controlnet, static_argnums=(1, 2))(
            jax.random.PRNGKey(7), ucfg, jnp.bfloat16)
    pipe.controlnet_cfg = ucfg
    control = (np.random.default_rng(0).random((res, res, 3)) * 255
               ).astype(np.uint8)

    def run():
        t0 = time.perf_counter()
        img = pipe.txt2img(
            "a benchmark crab", resolution=(res, res), n_steps=n_steps,
            seed=0, control_image=control, control_scale=1.0,
            profile_stages=False)
        assert img.shape[1] == res
        return time.perf_counter() - t0

    t_warm = run()
    print(f"[bench_controlnet] warmup (incl. compile): {t_warm:.1f}s")
    times = sorted(run() for _ in range(runs))
    p50 = times[len(times) // 2]
    record(f"controlnet_{res}_{n_steps}steps_s", round(p50, 3))
    record(f"controlnet_{res}_{n_steps}steps_images_per_min_per_chip",
           round(60.0 / p50, 2))


def bench_train(steps=6):
    from sdxl_tpu.configs import SDXL_BASE_DIFFUSER
    from sdxl_tpu.models.unet import init_unet
    from sdxl_tpu.pipeline.sampler import scaled_linear_alphas_cumprod
    from sdxl_tpu.train.controlnet import (
        controlnet_loss_fn,
        init_controlnet_from_unet,
    )
    from sdxl_tpu.train.finetune import FinetuneConfig
    from sdxl_tpu.train.full import (
        adafactor_sched,
        full_trainable,
        wrap_loss_full,
    )
    from sdxl_tpu.train.step import TrainState, make_train_step

    d_cfg = SDXL_BASE_DIFFUSER
    u_cfg = d_cfg.unet_config()
    frozen = jax.jit(init_unet, static_argnums=(1, 2))(
        jax.random.PRNGKey(0), u_cfg, jnp.bfloat16)

    class PipeShim:
        diffuser_cfg = d_cfg
        alphas_cumprod = jnp.asarray(scaled_linear_alphas_cumprod())
        compute_dtype = jnp.bfloat16
        unet_params = frozen

    pipe = PipeShim()
    control = init_controlnet_from_unet(pipe)
    cfg = FinetuneConfig(steps=steps, batch_size=1, lr=1e-5,
                         optimizer="adafactor", master_dtype="bf16",
                         remat=True)
    master, dtypes, template = full_trainable(control, jnp.bfloat16)
    n_tr = sum(int(np.prod(v.shape)) for v in master.values())
    print(f"[bench_controlnet] train: {n_tr/1e9:.2f}B trainable params")
    tx = adafactor_sched(cfg.lr, steps)
    loss_fn = wrap_loss_full(controlnet_loss_fn(pipe, cfg), dtypes)
    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))
    fr = {"control": template, "unet": frozen}

    for res in (1024, 768, 512):
        lat = res // 8
        batch = {
            "latents": jnp.zeros((1, lat, lat, 4), jnp.float32),
            "ctx": jnp.zeros((1, 77, 2048), jnp.float32),
            "label": jnp.zeros((1, u_cfg.adm_in_channels), jnp.float32),
            "control": jnp.zeros((1, res, res, 3), jnp.float32),
        }
        try:
            state = TrainState.create(master, tx)
            t0 = time.perf_counter()
            state, loss = step(state, fr, batch, jax.random.PRNGKey(0))
            jax.block_until_ready(loss)
            print(f"[bench_controlnet] {res}: compile+step "
                  f"{time.perf_counter()-t0:.1f}s")
            t0 = time.perf_counter()
            for i in range(steps):
                state, loss = step(state, fr, batch,
                                   jax.random.fold_in(jax.random.PRNGKey(1),
                                                      i))
            jax.block_until_ready(loss)
            ms = (time.perf_counter() - t0) / steps * 1000
            record(f"train_controlnet_b1_{res}_step_ms", round(ms, 1))
            return
        except Exception as e:  # noqa: BLE001
            print(f"[bench_controlnet] {res} failed ({type(e).__name__}); "
                  f"trying smaller")
            continue
    print("[bench_controlnet] no train resolution fit")


if __name__ == "__main__":
    bench_inference()
    bench_train()
