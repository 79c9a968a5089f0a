"""Capture a TPU trace of the pair-batched UNet step and print op stats.

Answers "where do the 123 ms go" with real xplane data instead of guesses:
dumps the top self-time ops (fusion names include the originating HLO) and
the category split (convolution / fusion elementwise / custom-call pallas /
all-reduce ...).

Usage: python scripts/profile_unet.py [--trace-dir /tmp/unet_trace]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default="/tmp/unet_trace")
    p.add_argument("--steps", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sdxl_tpu.configs import SDXL_BASE_DIFFUSER
    from sdxl_tpu.models.unet import init_unet, unet_forward

    cfg = SDXL_BASE_DIFFUSER.unet_config()
    params = init_unet(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    x = jnp.zeros((2, 128, 128, 4), jnp.bfloat16)
    t = jnp.full((2,), 500, jnp.int32)
    ctx = jnp.zeros((2, 77, 2048), jnp.bfloat16)
    label = jnp.zeros((2, 2816), jnp.bfloat16)

    f = jax.jit(lambda p_, a, b, c, d: unet_forward(p_, cfg, a, b, c, d))
    out = f(params, x, t, ctx, label)
    out.block_until_ready()
    print("compiled; tracing...", flush=True)

    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.steps):
            out = f(params, x, t, ctx, label)
        out.block_until_ready()

    xplanes = glob.glob(
        os.path.join(args.trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    xplanes.sort(key=os.path.getmtime)
    if not xplanes:
        print("no xplane captured", file=sys.stderr)
        return 1
    xplane = xplanes[-1]
    print(f"xplane: {xplane}", flush=True)

    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "framework_op_stats^", {}
    )
    # data is gzipped-or-plain JSON rows depending on version; handle both
    if isinstance(data, bytes):
        import gzip

        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", errors="replace")
    try:
        rows = json.loads(data)
    except json.JSONDecodeError:
        print(data[:4000])
        return 0

    # TF-ish schema: list of tables; find the op table and print top rows
    print(json.dumps(rows, indent=1)[:8000])
    return 0


if __name__ == "__main__":
    main()
