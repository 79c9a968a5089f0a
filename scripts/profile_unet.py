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

    # xprof ships a working converter; tensorboard_plugin_profile 2.13 has
    # a protobuf-version conflict on this image
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplane], "framework_op_stats^", {}
    )
    if isinstance(data, bytes):
        import gzip

        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", errors="replace")
    rows = json.loads(data)
    table = rows[0] if isinstance(rows, list) else rows
    cols = [c["id"] for c in table["cols"]]
    out = []
    for r in table["rows"]:
        vals = dict(zip(cols, [c.get("v") for c in r["c"]]))
        if vals.get("host_or_device") == "Device":
            out.append(vals)
    out.sort(key=lambda v: -v["total_self_time"])
    tot = sum(v["total_self_time"] for v in out)
    print(f"total device self time: {tot/1e3:.1f} ms ({args.steps} steps)")
    from collections import defaultdict

    bytype = defaultdict(float)
    for v in out:
        bytype[v["type"]] += v["total_self_time"]
    for t_, us in sorted(bytype.items(), key=lambda kv: -kv[1]):
        print(f"  {t_:30s} {us/1e3/args.steps:8.2f} ms/step {100*us/tot:5.1f}%")
    print("--- top 15 ops ---")
    for v in out[:15]:
        print(
            f"  {v['total_self_time']/1e3/args.steps:8.2f} ms/step "
            f"{100*v['total_self_time']/tot:5.1f}%  {v['type']:18s} "
            f"{str(v['operation'])[:70]}"
        )
    return 0


if __name__ == "__main__":
    main()
