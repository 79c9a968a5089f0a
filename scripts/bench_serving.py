"""On-chip serving load test: 16 mixed requests through GenerationServer.

Records the serving latency distribution (p50/p95 per request, makespan,
throughput) into BENCH_CONFIGS.json — the VERDICT r2 #6 deliverable.

Mix: 12 default-config txt2img (fusable into pair-batched micro-batches),
4 txt2img at a different step count (forces batch splits + the pending-
head path). All at 1024x1024 so only two scan programs compile.

Run (TPU): python scripts/bench_serving.py
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, ".")

from sdxl_tpu.utils.cache import init_compilation_cache

init_compilation_cache()


def main(max_batch=None):
    from sdxl_tpu.cli.serve import GenConfig, GenerationServer, GenRequest
    from sdxl_tpu.pipeline.pipeline import random_pipeline
    from sdxl_tpu.utils import log

    if max_batch is None:
        # the tunnel chip's free HBM varies with its co-tenant: batch-4
        # fusion (= batch-8 UNet under CFG) fit in r2 but OOMs when the
        # co-tenant is large. Each attempt runs in a FRESH process (an
        # in-process retry would keep the OOMed executables resident).
        import subprocess

        for mb in (4, 2, 1):
            r = subprocess.run(
                [sys.executable, __file__, str(mb)], cwd=os.getcwd()
            )
            if r.returncode == 0:
                return
            log(f"max_batch={mb} failed (rc={r.returncode}); "
                "retrying smaller")
        raise RuntimeError("even max_batch=1 failed")

    pipe = random_pipeline()
    cfg_a = GenConfig(width=1024, height=1024, steps=30)
    cfg_b = GenConfig(width=1024, height=1024, steps=20)
    srv = GenerationServer(pipe, max_batch=max_batch, batch_window_ms=50,
                           default_cfg=cfg_a)
    log("warmup (compiles both configs)...")
    srv._generate([GenRequest("warmup", cfg_a, seed=0)])
    srv._generate([GenRequest("warmup", cfg_b, seed=0)])
    srv.ready.set()
    srv.worker.start()

    reqs = []
    for i in range(16):
        cfg = cfg_b if i % 4 == 3 else cfg_a
        reqs.append(GenRequest(f"a photograph of astronaut {i}", cfg, seed=i))

    lat = {}
    t_start = time.perf_counter()

    def client(i, r):
        t0 = time.perf_counter()
        srv.submit(r, timeout=900)
        lat[i] = time.perf_counter() - t0

    threads = [threading.Thread(target=client, args=(i, r))
               for i, r in enumerate(reqs)]
    for t in threads:
        t.start()
        time.sleep(0.05)  # a burst, not a single instant
    for t in threads:
        t.join()
    makespan = time.perf_counter() - t_start

    errors = [r.error for r in reqs if r.error]
    assert not errors, errors
    ls = sorted(lat.values())
    p50 = ls[len(ls) // 2]
    p95 = ls[int(len(ls) * 0.95)]
    info = srv.info()
    srv.stop()
    out = {
        "serving_16req_max_batch": max_batch,
        "serving_16req_p50_s": round(p50, 3),
        "serving_16req_p95_s": round(p95, 3),
        "serving_16req_makespan_s": round(makespan, 3),
        "serving_16req_throughput_img_per_min": round(16 * 60 / makespan, 2),
        "serving_16req_batches": info["batches"],
    }
    print(json.dumps(out))

    results = {}
    if os.path.isfile("BENCH_CONFIGS.json"):
        with open("BENCH_CONFIGS.json") as f:
            results = json.load(f)
    results.update(out)
    with open("BENCH_CONFIGS.json", "w") as f:
        json.dump(results, f, indent=2)
    log("recorded into BENCH_CONFIGS.json")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else None)
