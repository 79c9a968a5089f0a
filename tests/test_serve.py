"""HTTP serving mode (cli/serve.py): micro-batching worker + HTTP layer."""

import io
import json
import threading
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from sdxl_tpu.cli.serve import (
    GenConfig,
    GenerationServer,
    GenRequest,
    make_handler,
)
from tests.test_pipeline_e2e import TINY_DIFFUSER, TINY_EMBEDDER, TINY_VAE

TINY_CFG = GenConfig(width=64, height=64, steps=1)


@pytest.fixture(scope="module")
def tiny_pipe():
    from sdxl_tpu.pipeline.pipeline import random_pipeline

    return random_pipeline(
        embedder_cfg=TINY_EMBEDDER,
        diffuser_cfg=TINY_DIFFUSER,
        vae_cfg=TINY_VAE,
        compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32,
        tokenizer_dir=None,
    )


def _png_shape(data: bytes):
    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data))).shape


def test_single_request_roundtrip(tiny_pipe):
    srv = GenerationServer(tiny_pipe, default_cfg=TINY_CFG)
    srv.start(warmup=False)
    req = srv.submit(GenRequest("a cat", TINY_CFG, seed=3), timeout=300)
    srv.stop()
    assert req.error is None
    assert _png_shape(req.result[0]) == (64, 64, 3)
    info = srv.info()
    assert info["requests"] == 1 and info["images"] == 1


def test_microbatch_fuses_same_config_requests(tiny_pipe):
    srv = GenerationServer(tiny_pipe, max_batch=3, batch_window_ms=200,
                           default_cfg=TINY_CFG)
    reqs = [GenRequest(p, TINY_CFG, seed=0)
            for p in ("a cat", "a dog", "a crab")]
    # enqueue BEFORE the worker starts: the window sees them immediately
    for r in reqs:
        srv.queue.put(r)
    srv.start(warmup=False)
    for r in reqs:
        assert r.done.wait(300)
        assert r.error is None, r.error
        assert _png_shape(r.result[0]) == (64, 64, 3)
    srv.stop()
    assert srv.info()["batches"] == 1  # fused into one pair-batched run


def test_mixed_configs_split_batches(tiny_pipe):
    other = GenConfig(width=64, height=64, steps=2)
    srv = GenerationServer(tiny_pipe, max_batch=4, batch_window_ms=100,
                           default_cfg=TINY_CFG)
    r1 = GenRequest("a cat", TINY_CFG, seed=0)
    r2 = GenRequest("a dog", other, seed=0)
    srv.queue.put(r1)
    srv.queue.put(r2)
    srv.start(warmup=False)
    assert r1.done.wait(300) and r2.done.wait(300)
    srv.stop()
    assert r1.error is None and r2.error is None
    assert srv.info()["batches"] == 2


def test_http_layer(tiny_pipe):
    from http.server import ThreadingHTTPServer

    srv = GenerationServer(tiny_pipe, default_cfg=TINY_CFG)
    srv.start(warmup=False)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as resp:
            assert resp.status == 200
            assert json.load(resp)["status"] == "ok"

        body = json.dumps({"prompt": "a crab", "width": 64, "height": 64,
                           "steps": 1, "seed": 5}).encode()
        req = urllib.request.Request(f"{base}/v1/generate", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = json.load(resp)
        import base64

        assert _png_shape(base64.b64decode(out["images"][0])) == (64, 64, 3)
        assert out["seed"] == 5

        # raw PNG via Accept header
        req = urllib.request.Request(
            f"{base}/v1/generate", data=body,
            headers={"Content-Type": "application/json",
                     "Accept": "image/png"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            assert resp.headers["Content-Type"] == "image/png"
            assert _png_shape(resp.read()) == (64, 64, 3)

        # missing prompt -> 400
        bad = urllib.request.Request(f"{base}/v1/generate", data=b"{}")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400

        with urllib.request.urlopen(f"{base}/v1/info", timeout=30) as resp:
            info = json.load(resp)
        assert info["requests"] >= 2
    finally:
        httpd.shutdown()
        srv.stop()


def test_serve_parser_defaults():
    from sdxl_tpu.cli.serve import build_parser

    args = build_parser().parse_args(["--random-weights"])
    assert args.port == 8000 and args.max_batch == 4
    assert args.steps == 30 and args.guidance_scale == 7.5
    assert args.sampler == "ddim"


def test_http_img2img_endpoint(tiny_pipe):
    import base64

    from http.server import ThreadingHTTPServer

    srv = GenerationServer(tiny_pipe, default_cfg=TINY_CFG)
    srv.start(warmup=False)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        # build a 64x64 reference PNG in-memory
        from PIL import Image

        rng = np.random.default_rng(3)
        ref = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(ref).save(buf, format="PNG")
        body = json.dumps({
            "prompt": "a crab", "steps": 2, "seed": 1,
            "image": base64.b64encode(buf.getvalue()).decode(),
            "strength": 0.5,
        }).encode()
        req = urllib.request.Request(f"{base}/v1/img2img", data=body,
                                     headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as resp:
            out = json.load(resp)
        img = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(out["images"][0]))))
        assert img.shape == (64, 64, 3)
        # img2img at strength<1 keeps reference structure: correlation with
        # the reference beats a fresh txt2img draw's
        assert not np.array_equal(img, ref)

        # missing image -> 400
        bad = urllib.request.Request(
            f"{base}/v1/img2img",
            data=json.dumps({"prompt": "x"}).encode())
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        srv.stop()


def test_fused_batch_keeps_per_request_seeds(tiny_pipe):
    """Two fused same-prompt requests with different seeds must get the
    same images they would get served alone (per-image seeds)."""
    def run(reqs, max_batch):
        srv = GenerationServer(tiny_pipe, max_batch=max_batch,
                               batch_window_ms=200, default_cfg=TINY_CFG)
        for r in reqs:
            srv.queue.put(r)
        srv.start(warmup=False)
        for r in reqs:
            assert r.done.wait(300) and r.error is None, r.error
        srv.stop()
        return srv

    a = GenRequest("a cat", TINY_CFG, seed=101)
    b = GenRequest("a cat", TINY_CFG, seed=202)
    srv = run([a, b], max_batch=2)
    assert srv.info()["batches"] == 1  # really fused

    solo_a = GenRequest("a cat", TINY_CFG, seed=101)
    run([solo_a], max_batch=1)

    from PIL import Image

    img_a = np.asarray(Image.open(io.BytesIO(a.result[0])), dtype=int)
    img_b = np.asarray(Image.open(io.BytesIO(b.result[0])), dtype=int)
    img_solo = np.asarray(Image.open(io.BytesIO(solo_a.result[0])), dtype=int)
    assert not np.array_equal(img_a, img_b)
    # batch-size-dependent f32 reduction order: allow off-by-one pixels
    d = np.abs(img_a - img_solo)
    assert d.max() <= 1 and (d > 0).mean() < 0.01, (d.max(), (d > 0).mean())


def test_stop_joins_worker(tiny_pipe):
    srv = GenerationServer(tiny_pipe, default_cfg=TINY_CFG)
    srv.start(warmup=False)
    assert srv.worker.is_alive()
    srv.stop()
    assert not srv.worker.is_alive()


def test_queue_overflow_returns_503(tiny_pipe):
    srv = GenerationServer(tiny_pipe, default_cfg=TINY_CFG, max_queue=1)
    # worker not started: the queue fills
    srv.queue.put(GenRequest("filler", TINY_CFG, seed=0))
    req = srv.submit(GenRequest("overflow", TINY_CFG, seed=0), timeout=1)
    assert req.error == "queue full" and req.status == 503
    assert req.done.is_set()


def test_timed_out_request_is_dropped_not_generated(tiny_pipe):
    """A client timeout marks the request abandoned; the worker must drop
    it at dequeue instead of burning a generation on it."""
    import time

    srv = GenerationServer(tiny_pipe, default_cfg=TINY_CFG)
    # submit with an immediate timeout BEFORE the worker runs
    req = srv.submit(GenRequest("left already", TINY_CFG, seed=0),
                     timeout=0.01)
    assert req.error == "generation timed out" and req.status == 504
    assert req.abandoned
    live = GenRequest("still here", TINY_CFG, seed=0)
    srv.queue.put(live)
    srv.start(warmup=False)
    assert live.done.wait(300) and live.error is None
    srv.stop()
    info = srv.info()
    assert info["dropped"] == 1
    assert info["requests"] == 1  # only the live request was generated


def test_mismatched_request_becomes_next_batch_head(tiny_pipe):
    """A config-mismatched request is held as the head of the NEXT batch —
    it must complete before later same-config requests (the old tail
    re-queue starved it behind them)."""
    import time

    other = GenConfig(width=64, height=64, steps=2)
    srv = GenerationServer(tiny_pipe, max_batch=4, batch_window_ms=200,
                           default_cfg=TINY_CFG)
    r1 = GenRequest("a", TINY_CFG, seed=0)
    r2 = GenRequest("b", other, seed=0)       # mismatched
    r3 = GenRequest("c", TINY_CFG, seed=0)
    r4 = GenRequest("d", TINY_CFG, seed=0)
    times = {}

    def waiter(name, r):
        r.done.wait(600)
        times[name] = time.monotonic()

    threads = [threading.Thread(target=waiter, args=(n, r), daemon=True)
               for n, r in (("r1", r1), ("r2", r2), ("r3", r3), ("r4", r4))]
    for t in threads:
        t.start()
    for r in (r1, r2, r3, r4):
        srv.queue.put(r)
    srv.start(warmup=False)
    for t in threads:
        t.join(600)
    srv.stop()
    for r in (r1, r2, r3, r4):
        assert r.error is None, r.error
    assert srv.info()["batches"] == 3  # [r1], [r2], [r3+r4]
    assert times["r2"] < times["r3"]


def test_http_inpaint_endpoint(tiny_pipe):
    import base64

    from http.server import ThreadingHTTPServer
    from PIL import Image

    strict = tiny_pipe.strict_resolutions
    tiny_pipe.strict_resolutions = False  # 64x64 is not an SDXL bucket
    srv = GenerationServer(tiny_pipe, default_cfg=TINY_CFG)
    srv.start(warmup=False)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        rng = np.random.default_rng(3)
        ref = rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)

        def b64_png(arr):
            buf = io.BytesIO()
            Image.fromarray(arr).save(buf, format="PNG")
            return base64.b64encode(buf.getvalue()).decode()

        def post(payload):
            req = urllib.request.Request(
                f"{base}/v1/inpaint", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=300) as resp:
                return json.load(resp)

        # crop-window variant
        out = post({"prompt": "a crab", "steps": 2, "seed": 1,
                    "image": b64_png(ref), "crop_left": 16, "crop_right": 48,
                    "crop_top": 16, "crop_bottom": 48})
        img = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(out["images"][0]))))
        assert img.shape == (64, 64, 3)

        # mask-image variant (white square = generate)
        mask = np.zeros((64, 64, 3), np.uint8)
        mask[16:48, 16:48] = 255
        out = post({"prompt": "a crab", "steps": 2, "seed": 1,
                    "image": b64_png(ref), "mask": b64_png(mask)})
        img = np.asarray(Image.open(
            io.BytesIO(base64.b64decode(out["images"][0]))))
        assert img.shape == (64, 64, 3)

        # neither crop nor mask -> 400
        bad = urllib.request.Request(
            f"{base}/v1/inpaint",
            data=json.dumps({"prompt": "x", "image": b64_png(ref)}).encode())
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(bad, timeout=30)
        assert e.value.code == 400
    finally:
        httpd.shutdown()
        srv.stop()
        tiny_pipe.strict_resolutions = strict


def test_controlnet_request_runs_solo_and_differs(tiny_pipe):
    """A control_image request is solo (never fused), requires a loaded
    ControlNet, and with nonzero zero-convs changes the image vs the same
    seed without control."""
    import jax

    from sdxl_tpu.models.controlnet import init_controlnet
    from tests.test_controlnet import _randomize_zero_convs

    base_cn = tiny_pipe.controlnet_params
    try:
        tiny_pipe.controlnet_params = _randomize_zero_convs(
            init_controlnet(jax.random.PRNGKey(21),
                            tiny_pipe.diffuser_cfg.unet_config(),
                            jnp.float32),
            jax.random.PRNGKey(22),
        )
        tiny_pipe.controlnet_cfg = tiny_pipe.diffuser_cfg.unet_config()
        img = (np.random.default_rng(1).random((64, 64, 3)) * 255).astype(
            np.uint8
        )
        r_ctl = GenRequest("a cat", TINY_CFG, seed=3, control_image=img)
        assert r_ctl.solo

        srv = GenerationServer(tiny_pipe, default_cfg=TINY_CFG)
        srv.start(warmup=False)
        plain = srv.submit(GenRequest("a cat", TINY_CFG, seed=3), timeout=300)
        ctl = srv.submit(r_ctl, timeout=300)
        srv.stop()
        assert plain.error is None and ctl.error is None
        a = np.frombuffer(plain.result[0], np.uint8)
        b = np.frombuffer(ctl.result[0], np.uint8)
        assert a.shape != b.shape or not np.array_equal(a, b)
    finally:
        tiny_pipe.controlnet_params = base_cn
        tiny_pipe.controlnet_cfg = None


# ---------------------------------------------------------------------------
# SD3 family serving
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_sd3_pipe(tokenizer_dir):
    from sdxl_tpu.pipeline.sd3 import random_sd3_pipeline
    from tests.test_sd3_loader import (
        TINY_CLIP_G,
        TINY_CLIP_L,
        TINY_SD3_MMDIT,
        TINY_SD3_VAE,
    )

    return random_sd3_pipeline(
        mmdit_cfg=TINY_SD3_MMDIT, clip_l_cfg=TINY_CLIP_L,
        clip_g_cfg=TINY_CLIP_G, vae_cfg=TINY_SD3_VAE,
        compute_dtype=jnp.float32, tokenizer_dir=tokenizer_dir,
    )


def test_sd3_server_fuses_and_keeps_per_image_seeds(tiny_sd3_pipe):
    cfg = GenConfig(width=64, height=64, steps=2, guidance_scale=4.0)
    srv = GenerationServer(tiny_sd3_pipe, max_batch=2, batch_window_ms=200,
                           default_cfg=cfg)
    a = GenRequest("a cat", cfg, seed=7)
    b = GenRequest("a dog", cfg, seed=8)
    for r in (a, b):
        srv.queue.put(r)
    srv.start(warmup=False)
    for r in (a, b):
        assert r.done.wait(300) and r.error is None, r.error
    srv.stop()
    assert srv.info()["batches"] == 1  # fused into one pair-batched run

    # request a's image must equal a solo run with the same seed
    srv2 = GenerationServer(tiny_sd3_pipe, max_batch=1, default_cfg=cfg)
    srv2.start(warmup=False)
    solo = srv2.submit(GenRequest("a cat", cfg, seed=7), timeout=300)
    srv2.stop()
    from PIL import Image

    pa = np.asarray(Image.open(io.BytesIO(a.result[0])), dtype=int)
    ps = np.asarray(Image.open(io.BytesIO(solo.result[0])), dtype=int)
    # per-image seeds make the noise identical; the batch-4 (fused CFG)
    # vs batch-2 (solo) MMDiT run reorders f32 reductions, so a few
    # pixels sitting on the uint8 rounding boundary may flip by 1 level
    d = np.abs(pa - ps)
    assert d.max() <= 1 and d.mean() < 0.01, (d.max(), d.mean())


def test_sd3_server_img2img_and_rejections(tiny_sd3_pipe):
    cfg = GenConfig(width=64, height=64, steps=2, guidance_scale=4.0)
    srv = GenerationServer(tiny_sd3_pipe, default_cfg=cfg)
    srv.start(warmup=False)
    ref = np.zeros((64, 64, 3), np.uint8)
    ok = srv.submit(GenRequest("a crab", cfg, seed=1, image=ref,
                               strength=0.5), timeout=300)
    assert ok.error is None and _png_shape(ok.result[0]) == (64, 64, 3)

    # crop-window inpaint runs through SD3Pipeline.inpaint (solo)
    inp = srv.submit(GenRequest("a crab", cfg, seed=2, image=ref,
                                crop=(16, 48, 16, 48, False)), timeout=300)
    assert inp.error is None and _png_shape(inp.result[0]) == (64, 64, 3)
    # mask-image variant
    mask = np.zeros((64, 64), np.uint8)
    mask[16:48, 16:48] = 255
    inp_m = srv.submit(GenRequest("a crab", cfg, seed=2, image=ref,
                                  mask_image=mask), timeout=300)
    assert inp_m.error is None and inp_m.result[0] == inp.result[0]

    bad = srv.submit(
        GenRequest("x", GenConfig(width=64, height=64, steps=2,
                                  sampler="euler"), seed=0), timeout=300)
    assert bad.error is not None and "flow-matching" in bad.error
    srv.stop()


def test_sd3_server_slg_and_unet_rejection(tiny_sd3_pipe, tiny_pipe):
    cfg = GenConfig(width=64, height=64, steps=2, guidance_scale=4.0,
                    slg_scale=2.8)
    # slg default layers (7,8,9) are out of range for the tiny 2-block
    # MMDiT — the error proves the scale reached SD3Pipeline.txt2img
    srv = GenerationServer(tiny_sd3_pipe, default_cfg=cfg)
    srv.start(warmup=False)
    r = srv.submit(GenRequest("a crab", cfg, seed=1), timeout=300)
    assert r.error is not None and "out of range" in r.error
    srv.stop()

    # the UNet families reject slg_scale with a pointer to pag_scale
    srv2 = GenerationServer(tiny_pipe, default_cfg=cfg)
    srv2.start(warmup=False)
    r2 = srv2.submit(GenRequest("a crab", cfg, seed=1), timeout=300)
    assert r2.error is not None and "SD3 family only" in r2.error
    srv2.stop()


# ---------------------------------------------------------------------------
# Flux family serving
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_flux_pipe_srv(tokenizer_dir):
    from sdxl_tpu.pipeline.flux import random_flux_pipeline
    from tests.test_flux_loader import (
        TINY_CLIP_L as FLUX_CLIP,
        TINY_FLUX_PIPE,
        TINY_FLUX_VAE,
        TINY_T5 as FLUX_T5,
    )

    return random_flux_pipeline(
        flux_cfg=TINY_FLUX_PIPE, clip_cfg=FLUX_CLIP, vae_cfg=TINY_FLUX_VAE,
        t5_cfg=FLUX_T5, t5_tokens=16, compute_dtype=jnp.float32,
        tokenizer_dir=tokenizer_dir,
    )


def test_flux_server_fuses_and_keeps_per_image_seeds(tiny_flux_pipe_srv):
    cfg = GenConfig(width=64, height=64, steps=2, guidance_scale=3.5)
    srv = GenerationServer(tiny_flux_pipe_srv, max_batch=2,
                           batch_window_ms=200, default_cfg=cfg)
    a = GenRequest("a cat", cfg, seed=7)
    b = GenRequest("a dog", cfg, seed=8)
    for r in (a, b):
        srv.queue.put(r)
    srv.start(warmup=False)
    for r in (a, b):
        assert r.done.wait(300) and r.error is None, r.error
    srv.stop()
    assert srv.info()["batches"] == 1

    srv2 = GenerationServer(tiny_flux_pipe_srv, max_batch=1,
                            default_cfg=cfg)
    srv2.start(warmup=False)
    solo = srv2.submit(GenRequest("a cat", cfg, seed=7), timeout=300)
    srv2.stop()
    from PIL import Image

    pa = np.asarray(Image.open(io.BytesIO(a.result[0])), dtype=int)
    ps = np.asarray(Image.open(io.BytesIO(solo.result[0])), dtype=int)
    d = np.abs(pa - ps)
    assert d.max() <= 1 and d.mean() < 0.01, (d.max(), d.mean())


def test_flux_server_img2img_inpaint_and_rejections(tiny_flux_pipe_srv):
    cfg = GenConfig(width=64, height=64, steps=2, guidance_scale=3.5)
    srv = GenerationServer(tiny_flux_pipe_srv, default_cfg=cfg)
    srv.start(warmup=False)
    ref = np.zeros((64, 64, 3), np.uint8)
    ok = srv.submit(GenRequest("a crab", cfg, seed=1, image=ref,
                               strength=0.5), timeout=300)
    assert ok.error is None and _png_shape(ok.result[0]) == (64, 64, 3)
    inp = srv.submit(GenRequest("a crab", cfg, seed=2, image=ref,
                                crop=(16, 48, 16, 48, False)), timeout=300)
    assert inp.error is None and _png_shape(inp.result[0]) == (64, 64, 3)

    bad = srv.submit(GenRequest(
        "x", GenConfig(width=64, height=64, steps=2,
                       negative_prompt="ugly"), seed=0), timeout=300)
    assert bad.error is not None and "no built-in CFG" in bad.error
    bad2 = srv.submit(GenRequest(
        "x", GenConfig(width=64, height=64, steps=2, sampler="euler"),
        seed=0), timeout=300)
    assert bad2.error is not None and "flow-matching" in bad2.error
    srv.stop()


def test_flux_server_kontext_edit(tiny_flux_pipe_srv):
    """/v1/edit: the Kontext request runs solo, output at the image's own
    size; non-flux pipelines reject it."""
    cfg = GenConfig(width=64, height=64, steps=2, guidance_scale=2.5)
    srv = GenerationServer(tiny_flux_pipe_srv, default_cfg=cfg)
    srv.start(warmup=False)
    edit = np.full((64, 64, 3), 128, np.uint8)
    ok = srv.submit(GenRequest("make it a crab", cfg, seed=1,
                               edit_image=edit), timeout=300)
    assert ok.error is None and _png_shape(ok.result[0]) == (64, 64, 3)
    srv.stop()


def test_non_flux_server_rejects_edit(tiny_pipe):
    """/v1/edit on a UNet family routes to InstructPix2Pix, which needs
    an 8-channel edit checkpoint — a plain 4-channel UNet gets the
    actionable ip2p error (the flux-only rejection predates ip2p
    serving)."""
    cfg = GenConfig(width=64, height=64, steps=2)
    srv = GenerationServer(tiny_pipe, default_cfg=cfg)
    srv.start(warmup=False)
    bad = srv.submit(GenRequest("x", cfg, seed=0,
                                edit_image=np.zeros((64, 64, 3), np.uint8)),
                     timeout=300)
    assert bad.error is not None and "8-channel" in bad.error
    srv.stop()


# ---------------------------------------------------------------------------
# /v1/lora hot-swap
# ---------------------------------------------------------------------------


def test_lora_hot_swap(tiny_pipe):
    calls = []

    def reload_fn(specs):
        calls.append(list(specs))
        if specs and specs[0][0] == "broken":
            raise FileNotFoundError("no such adapter")
        return tiny_pipe

    srv = GenerationServer(tiny_pipe, default_cfg=TINY_CFG,
                           reload_fn=reload_fn)
    srv.start(warmup=False)
    out = srv.request_swap([("style.safetensors", 0.8)], timeout=300)
    assert out["ok"], out
    assert out["loras"] == ["style.safetensors:0.8"]
    assert calls[-1] == [("style.safetensors", 0.8)]
    assert srv.info()["loras"] == ["style.safetensors:0.8"]

    # the server still serves after the swap
    req = srv.submit(GenRequest("a cat", TINY_CFG, seed=1), timeout=300)
    assert req.error is None

    # failed swap restores the previous adapter set and reports the error
    out = srv.request_swap([("broken", 1.0)], timeout=300)
    assert not out["ok"] and "no such adapter" in out["error"]
    assert srv.info()["loras"] == ["style.safetensors:0.8"]
    assert calls[-1] == [("style.safetensors", 0.8)]  # restore call
    req = srv.submit(GenRequest("still alive", TINY_CFG, seed=2),
                     timeout=300)
    srv.stop()
    assert req.error is None

    # unload
    srv2 = GenerationServer(tiny_pipe, default_cfg=TINY_CFG,
                            reload_fn=reload_fn)
    srv2.active_loras = [("style.safetensors", 0.8)]
    srv2.start(warmup=False)
    out = srv2.request_swap([], timeout=300)
    srv2.stop()
    assert out["ok"] and out["loras"] == []


def test_lora_swap_without_reload_path(tiny_pipe):
    srv = GenerationServer(tiny_pipe, default_cfg=TINY_CFG)
    out = srv.request_swap([("x", 1.0)])
    assert not out["ok"] and out["status"] == 400


# ---------------------------------------------------------------------------
# InstructPix2Pix serving (/v1/edit for the UNet families)
# ---------------------------------------------------------------------------


def test_ip2p_edit_request(tokenizer_dir):
    """/v1/edit on a UNet-family pipeline routes to pipe.ip2p: an
    8-channel edit checkpoint serves it solo; a 4-channel one reports a
    clear error; the image_guidance_scale config key changes the output."""
    import dataclasses

    from sdxl_tpu.pipeline.pipeline import random_pipeline

    pipe8 = random_pipeline(
        embedder_cfg=TINY_EMBEDDER,
        diffuser_cfg=dataclasses.replace(TINY_DIFFUSER, in_channels=8),
        vae_cfg=TINY_VAE, compute_dtype=jnp.float32,
        param_dtype_unet=jnp.float32, tokenizer_dir=tokenizer_dir,
    )
    img = (np.random.default_rng(2).random((64, 64, 3)) * 255).astype(
        np.uint8)
    r = GenRequest("make it blue", TINY_CFG, seed=3, edit_image=img)
    assert r.solo
    srv = GenerationServer(pipe8, default_cfg=TINY_CFG)
    srv.start(warmup=False)
    a = srv.submit(GenRequest("make it blue", TINY_CFG, seed=3,
                              edit_image=img), timeout=300)
    cfg_hi = dataclasses.replace(TINY_CFG, image_guidance_scale=3.0)
    b = srv.submit(GenRequest("make it blue", cfg_hi, seed=3,
                              edit_image=img), timeout=300)
    srv.stop()
    assert a.error is None, a.error
    assert b.error is None, b.error
    assert _png_shape(a.result[0]) == (64, 64, 3)
    assert a.result[0] != b.result[0]  # image guidance is live


def test_ip2p_edit_rejected_on_four_channel_model(tiny_pipe):
    img = (np.random.default_rng(2).random((64, 64, 3)) * 255).astype(
        np.uint8)
    srv = GenerationServer(tiny_pipe, default_cfg=TINY_CFG)
    srv.start(warmup=False)
    r = srv.submit(GenRequest("edit", TINY_CFG, seed=0, edit_image=img),
                   timeout=300)
    srv.stop()
    assert r.error is not None and "8-channel" in r.error
