"""Per-HLO profile of the pair-batched UNet step (hlo_stats xprof tool).

Where framework_op_stats aggregates all convs into one row, this dumps the
top individual HLO instructions with their occupancy/FLOP-rate columns, so
the low-MFU convs can be identified by shape.

Usage: python scripts/profile_unet_hlo.py [--filter conv] [--top 25]
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trace-dir", default="/tmp/unet_trace_hlo")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--filter", default="")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sdxl_tpu.configs import SDXL_BASE_DIFFUSER
    from sdxl_tpu.models.unet import (
        fuse_unet_qkv,
        init_unet,
        precompute_cross_kv,
        unet_forward,
    )

    cfg = SDXL_BASE_DIFFUSER.unet_config()
    params = fuse_unet_qkv(init_unet(jax.random.PRNGKey(0), cfg, jnp.bfloat16))
    x = jnp.zeros((2, 128, 128, 4), jnp.bfloat16)
    t = jnp.full((2,), 500, jnp.int32)
    ctx = jnp.zeros((2, 77, 2048), jnp.bfloat16)
    label = jnp.zeros((2, 2816), jnp.bfloat16)
    kv = precompute_cross_kv(params, cfg, ctx)

    f = jax.jit(lambda p_, a, b, c, d: unet_forward(p_, cfg, a, b, c, d,
                                                    cross_kv=kv))
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

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "hlo_stats^", {}
    )
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode("utf-8", errors="replace")
    table = json.loads(data)
    if isinstance(table, list):
        table = table[0]
    cols = [c["id"] for c in table["cols"]]
    rows = []
    for r in table["rows"]:
        rows.append(dict(zip(cols, [c.get("v") for c in r["c"]])))
    print(f"columns: {cols}", flush=True)

    key_time = next(
        (c for c in cols if "total_time" in c or "self_time" in c), None
    )

    # category aggregate with time-weighted mean flop rate and dma stall
    from collections import defaultdict
    agg = defaultdict(lambda: [0.0, 0.0, 0.0])  # time, flops*time, stall*time
    for r in rows:
        t_us = r.get(key_time) or 0
        cat = r.get("category") or "?"
        agg[cat][0] += t_us
        agg[cat][1] += (r.get("model_flop_rate") or 0) * t_us
        agg[cat][2] += (r.get("dma_stall_percent") or 0) * t_us
    print("--- category aggregate ---")
    for cat, (t, fw, sw) in sorted(agg.items(), key=lambda kv: -kv[1][0]):
        print(f"  {cat:30s} {t/1e3/args.steps:8.2f} ms/step  "
              f"mean_flops={fw/max(t,1e-9):9.1f}  dma_stall={sw/max(t,1e-9):5.1f}%",
              flush=True)

    rows = [r for r in rows if args.filter in str(r.get("category", ""))
            or args.filter in str(r.get("hlo_op_name", ""))]
    rows.sort(key=lambda r: -(r.get(key_time) or 0))
    for r in rows[: args.top]:
        t_us = r.get(key_time) or 0
        name = str(r.get("hlo_op_name", ""))[:40]
        expr = str(r.get("hlo_op_expression", ""))[:130]
        flops = r.get("model_flop_rate") or 0
        stall = r.get("dma_stall_percent") or 0
        bound = r.get("bound_by") or ""
        occ = r.get("occurrences")
        print(f"{t_us:10.1f}us n={occ} flops={flops:9.1f} stall={stall}% "
              f"bound={bound} {name}\n    {expr}", flush=True)
    return 0


if __name__ == "__main__":
    main()
