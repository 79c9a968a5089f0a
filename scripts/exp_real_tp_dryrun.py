"""Timing probe: full real-config SDXL-base UNet forward, dp2 x tp4, on the
8-device virtual CPU mesh at a 16x16 latent. Informs whether the driver
dryrun can afford the real config (VERDICT r2 #3).

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     python scripts/exp_real_tp_dryrun.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from sdxl_tpu.configs import SDXL_BASE_DIFFUSER
from sdxl_tpu.models.unet import init_unet, unet_forward
from sdxl_tpu.parallel.mesh import make_mesh, shard_batch, shard_params

cfg = SDXL_BASE_DIFFUSER.unet_config()
t0 = time.perf_counter()
params = jax.jit(init_unet, static_argnums=(1, 2))(
    jax.random.PRNGKey(0), cfg, jnp.float32
)
jax.block_until_ready(params)
print(f"init: {time.perf_counter() - t0:.1f}s", flush=True)

for tp in (2, 4):
    mesh = make_mesh(n_data=8 // tp, n_model=tp)
    t0 = time.perf_counter()
    p_sh = shard_params(params, mesh, head_channels=cfg.n_head_channels)
    jax.block_until_ready(p_sh)
    print(f"tp={tp} shard: {time.perf_counter() - t0:.1f}s", flush=True)

    b = 2 * (8 // tp)
    x = jnp.zeros((b, 16, 16, 4), jnp.float32)
    t = jnp.full((b,), 999, jnp.int32)
    ctx = jnp.zeros((b, 77, cfg.context_dim), jnp.float32)
    label = jnp.zeros((b, cfg.adm_in_channels), jnp.float32)
    x, t, ctx, label = shard_batch((x, t, ctx, label), mesh)

    f = jax.jit(lambda p, a, b_, c, d: unet_forward(p, cfg, a, b_, c, d))
    t0 = time.perf_counter()
    lowered = f.lower(p_sh, x, t, ctx, label)
    compiled = lowered.compile()
    print(f"tp={tp} compile: {time.perf_counter() - t0:.1f}s", flush=True)
    hlo = compiled.as_text()
    import re as _re

    for kind in ("all-reduce", "all-gather", "collective-permute",
                 "all-to-all", "reduce-scatter"):
        n = len(_re.findall(rf"= \S+ {kind}", hlo))
        print(f"  {kind}: {n}", flush=True)
    t0 = time.perf_counter()
    out = compiled(p_sh, x, t, ctx, label)
    jax.block_until_ready(out)
    print(f"tp={tp} run: {time.perf_counter() - t0:.1f}s out {out.shape}",
          flush=True)
