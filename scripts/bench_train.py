"""On-chip LoRA train-step benchmark: the FULL SDXL-base UNet (2.6B
params, bf16) fine-tuning at 1024² (128×128 latent) on one chip.

Measures the jitted train step (forward + backward through the
rematerialized UNet + AdamW update on the f32 factors) — the training
analogue of bench.py's inference step. Random weights (no checkpoint in
this environment); step time is weight-value-independent.

Writes results into BENCH_CONFIGS.json:
  train_sdxl_lora_r16_b1_1024_step_ms
  train_sdxl_lora_r16_b1_1024_imgs_per_min  (1 image/step at batch 1)
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
    print(f"[bench_train] {tag} = {value}")


def main(batch=1, rank=16, latent=128, steps=6):
    from sdxl_tpu.configs import SDXL_BASE_DIFFUSER
    from sdxl_tpu.models.unet import init_unet
    from sdxl_tpu.pipeline.sampler import scaled_linear_alphas_cumprod
    from sdxl_tpu.train.finetune import FinetuneConfig, _unet_loss_fn
    from sdxl_tpu.train.lora import init_lora
    from sdxl_tpu.train.step import TrainState, adamw_cosine, make_train_step

    d_cfg = SDXL_BASE_DIFFUSER
    u_cfg = d_cfg.unet_config()
    print(f"[bench_train] devices: {jax.devices()}")
    frozen = jax.jit(init_unet, static_argnums=(1, 2))(
        jax.random.PRNGKey(0), u_cfg, jnp.bfloat16)
    flat = init_lora(frozen, rank, jax.random.PRNGKey(1))
    n_tr = sum(int(np.prod(v.shape)) for v in flat.values())
    print(f"[bench_train] rank {rank}: {len(flat)//2} sites, "
          f"{n_tr/1e6:.1f}M trainable")

    class PipeShim:  # the loss builder only reads these three fields
        diffuser_cfg = d_cfg
        alphas_cumprod = jnp.asarray(scaled_linear_alphas_cumprod())
        compute_dtype = jnp.bfloat16

    cfg = FinetuneConfig(rank=rank, batch_size=batch, remat=True,
                         snr_gamma=5.0)
    loss_fn = _unet_loss_fn(PipeShim(), cfg)
    tx = adamw_cosine(1e-4, steps=1000)
    state = TrainState.create(flat, tx)
    step = jax.jit(make_train_step(loss_fn, tx), donate_argnums=(0,))

    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    batch_d = {
        "latents": jax.random.normal(
            ks[0], (batch, latent, latent, 4), jnp.float32),
        "ctx": jax.random.normal(ks[1], (batch, 77, 2048), jnp.float32),
        "label": jax.random.normal(ks[2], (batch, 2816), jnp.float32),
    }

    t0 = time.time()
    state, loss = step(state, frozen, batch_d, jax.random.PRNGKey(3))
    jax.block_until_ready(loss)
    print(f"[bench_train] compile + first step: {time.time()-t0:.1f}s "
          f"(loss {float(loss):.4f})")

    times = []
    for i in range(steps):
        t0 = time.time()
        state, loss = step(state, frozen, batch_d,
                           jax.random.fold_in(jax.random.PRNGKey(4), i))
        jax.block_until_ready(loss)
        times.append(time.time() - t0)
    ms = 1e3 * float(np.median(times))
    print(f"[bench_train] step times (ms): "
          f"{[f'{1e3*t:.0f}' for t in times]}")
    record("train_sdxl_lora_r16_b1_1024_step_ms", round(ms, 1))
    record("train_sdxl_lora_r16_b1_1024_imgs_per_min",
           round(60e3 / ms * batch, 2))


if __name__ == "__main__":
    main()
