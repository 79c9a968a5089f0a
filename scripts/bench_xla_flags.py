"""Sweep XLA TPU flags over the pair-batched UNet step (subprocess per flag).

The step profile (r2) shows convs at ~55% MFU and ~10% elementwise —
scheduler/fusion flags are the cheapest lever left. Each candidate runs in a
fresh process because XLA_FLAGS are read at backend init.
"""

import os
import subprocess
import sys

CANDIDATES = [
    "",
    "--xla_tpu_scoped_vmem_limit_kib=65536",
    "--xla_tpu_scoped_vmem_limit_kib=98304",
    "--xla_tpu_enable_latency_hiding_scheduler=true",
    "--xla_tpu_licm_size_inflation_ratio=1",
]

CHILD = r"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
from sdxl_tpu.configs import SDXL_BASE_DIFFUSER
from sdxl_tpu.models.unet import init_unet, unet_forward, fuse_unet_qkv, precompute_cross_kv
from sdxl_tpu.utils.sync import fence

cfg = SDXL_BASE_DIFFUSER.unet_config()
params = fuse_unet_qkv(init_unet(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
x = jnp.zeros((2, 128, 128, 4), jnp.bfloat16)
t = jnp.full((2,), 500, jnp.int32)
ctx = jnp.zeros((2, 77, 2048), jnp.bfloat16)
label = jnp.zeros((2, 2816), jnp.bfloat16)
kv = precompute_cross_kv(params, cfg, ctx)
f = jax.jit(lambda p, a, b, c, d: unet_forward(p, cfg, a, b, c, d, cross_kv=kv))
fence(f(params, x, t, ctx, label))
t0 = time.perf_counter()
for _ in range(20):
    out = f(params, x, t, ctx, label)
fence(out)
print(f"STEP_MS {(time.perf_counter()-t0)/20*1000:.1f}")
"""


def main():
    for flags in CANDIDATES:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        # flag changes must not hit stale cache entries
        env["SDXL_TPU_XLA_CACHE"] = "/tmp/xla_flag_sweep_cache"
        r = subprocess.run(
            [sys.executable, "-c", CHILD], capture_output=True, text=True,
            env=env, timeout=1200, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))),
        )
        ms = [ln for ln in r.stdout.splitlines() if ln.startswith("STEP_MS")]
        label = flags or "(none)"
        if ms:
            print(f"{label:55s} {ms[0].split()[1]} ms", flush=True)
        else:
            err = (r.stderr or "").strip().splitlines()
            print(f"{label:55s} ERR {err[-1][:90] if err else r.returncode}",
                  flush=True)


if __name__ == "__main__":
    main()
