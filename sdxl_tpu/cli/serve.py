"""`serve` CLI: HTTP inference server with dynamic micro-batching.

Capability extension over the reference (which only ships a one-shot
`sample` binary, /root/reference/src/bin/sample/main.rs): a long-lived
server process that compiles once at boot and then serves prompt requests
over HTTP. TPU-shaped design decisions:

  - ONE generation worker thread: a TPU chip executes one program at a
    time, so concurrency above the device only adds queueing — requests
    are queued and the worker drains them in order.
  - dynamic micro-batching: queued requests with identical sampling
    configs (resolution/steps/guidance/sampler/negative prompt) are fused
    into one pair-batched CFG run up to --max-batch; conditioning and the
    DDIM scan batch across prompts at zero marginal dispatch cost.
  - compile-at-boot: a warmup generation at the default resolution runs
    before the socket accepts traffic, so first-request latency is steady
    state (with the persistent compile cache, boot is a cache hit).

Endpoints:
  GET  /healthz     -> {"status": "ok", ...} once warm
  GET  /v1/info     -> config + serving metrics (requests, batches, p50)
  POST /v1/generate -> {"prompt": ..., "width": ..., "height": ...,
                        "steps": ..., "guidance_scale": ..., "seed": ...,
                        "negative_prompt": ..., "sampler": ...,
                        "schedule": ..., "guidance_rescale": ...};
                       optional (boot-loaded nets): {"control_image":
                       "<base64 png>", "control_scale": x} and/or
                       {"ip_image": "<base64 png>", "ip_scale": x}
  POST /v1/img2img  -> same + {"image": "<base64 png>", "strength": 0.3}
                       (runs unbatched; resolution follows the image)
  POST /v1/edit     -> same + {"image": "<base64 png>"} — instruction
                       editing; the prompt describes the edit, output at
                       the image's own size, runs unbatched. Flux: Kontext
                       in-context editing. UNet families: InstructPix2Pix
                       (needs an 8-channel edit checkpoint; optional
                       {"image_guidance_scale": 1.5})
  POST /v1/lora     -> {"loras": ["path:scale", ...] | [{"path","scale"}]}
                       hot-swaps the served LoRA set without a restart
                       (worker reloads the checkpoint between batches;
                       [] unloads); compile-cache hits make the swap a
                       reload + one warmup generation, not a recompile
  POST /v1/inpaint  -> same + {"image": "<base64 png>"} and EITHER a
                       pixel-space crop window {"crop_left", "crop_right",
                       "crop_top", "crop_bottom", "crop_out"} OR a
                       {"mask": "<base64 png>"} image (>127 = generate);
                       optional {"mask_blur": sigma_px} feathers the
                       boundary (soft inpainting); runs unbatched
     responds {"images": ["<base64 png>", ...], "seed": N, "latency_s": x}
     (or a raw PNG body with Accept: image/png)

Robustness: the queue is bounded (--max-queue; overflow -> 503), a client
timeout (504) marks its request abandoned so the worker drops it at
dequeue instead of generating for a client that left, and a config-
mismatched request is held as the HEAD of the next batch (never re-queued
to the tail, which could starve it under a same-config stream).

Usage:
  python -m sdxl_tpu.cli.serve --model-dir ./weights --port 8000
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import statistics
import sys
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional

from ..utils import log


# ---------------------------------------------------------------------------
# request plumbing (HTTP-independent, unit-testable)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class GenConfig:
    """The fields that must match for two requests to share one batch."""
    width: int = 1024
    height: int = 1024
    steps: int = 30
    guidance_scale: float = 7.5
    negative_prompt: str = ""
    sampler: str = "ddim"
    schedule: str = "linear"
    guidance_rescale: float = 0.0
    # Perturbed-Attention Guidance (arXiv:2403.17377); one extra cond
    # UNet eval per step when > 0
    pag_scale: float = 0.0
    # SD3.5 skip-layer guidance (--family sd3 only); one extra cond-only
    # MMDiT eval per early step when > 0
    slg_scale: float = 0.0
    # Flux true-CFG (--family flux only): real pair-batched CFG over the
    # negative prompt on top of the embedded guidance when > 1
    true_cfg_scale: float = 1.0
    # InstructPix2Pix image guidance (UNet families' /v1/edit; the
    # checkpoint must be an 8-channel edit UNet)
    image_guidance_scale: float = 1.5
    # stochastic DDIM (diffusers eta; sampler "ddim" only)
    ddim_eta: float = 0.0


@dataclass
class GenRequest:
    prompt: str
    cfg: GenConfig
    seed: int
    # img2img: reference image [H, W, 3] u8 + re-noise strength; such
    # requests run alone (no micro-batch fusion)
    image: Optional[object] = None
    strength: float = 0.3
    # inpaint (reference image + one of): pixel-space crop window
    # (left, right, top, bottom, crop_out) or a [H, W] u8 mask image
    # (>127 = generate); also runs alone
    crop: Optional[tuple] = None
    mask_image: Optional[object] = None
    # soft inpainting: gaussian sigma (pixels) feathering the mask
    # boundary (A1111 mask_blur); 0 = the hard reference mask
    mask_blur: float = 0.0
    # ControlNet-guided txt2img (server boot must have loaded one via
    # --controlnet): per-request conditioning image; also runs alone
    control_image: Optional[object] = None
    control_scale: float = 1.0
    # IP-Adapter image prompt (server boot must have loaded one via
    # --ip-adapter); also runs alone
    ip_image: Optional[object] = None
    ip_scale: float = 0.6
    # Flux Kontext in-context editing: the image to edit (clean reference
    # token stream); also runs alone
    edit_image: Optional[object] = None
    # set when the submitter stopped waiting (timeout): the worker drops
    # the request at dequeue instead of burning a generation on a client
    # that left
    abandoned: bool = False
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[List[bytes]] = None  # PNG bytes per image
    error: Optional[str] = None
    status: int = 200
    latency_s: float = 0.0

    @property
    def solo(self) -> bool:
        """True for requests that cannot join a micro-batch (per-request
        reference image / mask / control image)."""
        return (self.image is not None or self.crop is not None
                or self.mask_image is not None
                or self.control_image is not None
                or self.ip_image is not None
                or self.edit_image is not None)


def _png_bytes(img_u8) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img_u8, mode="RGB").save(buf, format="PNG")
    return buf.getvalue()


class GenerationServer:
    """Owns the pipeline and the single worker thread."""

    def __init__(self, pipe, max_batch: int = 4, batch_window_ms: float = 20.0,
                 default_cfg: GenConfig = GenConfig(), max_queue: int = 64,
                 reload_fn=None):
        self.pipe = pipe
        # adapter hot-swap (POST /v1/lora): reload_fn(specs) rebuilds the
        # pipeline with a new LoRA set; the WORKER performs the swap
        # between batches (it is the only pipeline user)
        self.reload_fn = reload_fn
        self.active_loras: list = []
        self._swap_lock = threading.Lock()
        self._swap = None
        self.max_batch = max_batch
        self.batch_window_s = batch_window_ms / 1000.0
        self.default_cfg = default_cfg
        self.queue: "queue.Queue[GenRequest]" = queue.Queue(maxsize=max_queue)
        self.ready = threading.Event()
        self.stats_lock = threading.Lock()
        self.n_requests = 0
        self.n_images = 0
        self.n_batches = 0
        self.n_dropped = 0
        self.latencies: List[float] = []
        self._stop = False
        self.worker = threading.Thread(target=self._run, daemon=True)

    # -- lifecycle ----------------------------------------------------------

    def start(self, warmup: bool = True):
        if warmup:
            self._generate([GenRequest("warmup", self.default_cfg, seed=0)])
        self.ready.set()
        self.worker.start()

    def stop(self, join_timeout: float = 10.0):
        self._stop = True
        if self.worker.is_alive():
            self.worker.join(timeout=join_timeout)

    # -- serving ------------------------------------------------------------

    def submit(self, req: GenRequest, timeout: float = 600.0) -> GenRequest:
        try:
            self.queue.put_nowait(req)
        except queue.Full:
            req.error = "queue full"
            req.status = 503
            req.done.set()
            return req
        if not req.done.wait(timeout):
            req.error = "generation timed out"
            req.status = 504
            # the worker drops it at dequeue instead of generating for a
            # client that already left
            req.abandoned = True
        return req

    def _drop(self, req: GenRequest):
        with self.stats_lock:
            self.n_dropped += 1
        req.done.set()

    def request_swap(self, specs: list, timeout: float = 600.0) -> dict:
        """Hot-swap the served LoRA set (worker-executed). specs:
        [(path, scale)]; [] unloads. Returns {ok, error, seconds,
        loras}."""
        if self.reload_fn is None:
            return {"ok": False,
                    "error": "server started without a reload path "
                             "(--random-weights)", "status": 400}
        swap = type("Swap", (), {})()
        swap.specs, swap.done = specs, threading.Event()
        swap.error, swap.seconds = None, 0.0
        with self._swap_lock:
            if self._swap is not None:
                return {"ok": False, "error": "swap already in progress",
                        "status": 409}
            self._swap = swap
        if not swap.done.wait(timeout):
            return {"ok": False, "error": "swap timed out", "status": 504}
        return {"ok": swap.error is None, "error": swap.error,
                "seconds": round(swap.seconds, 2),
                "loras": [f"{p}:{sc}" for p, sc in self.active_loras],
                "status": 200 if swap.error is None else 500}

    def _do_swap(self):
        import gc
        import time as _t

        with self._swap_lock:
            swap, self._swap = self._swap, None
        t0 = _t.perf_counter()
        prev = self.active_loras
        try:
            # free-first: the tunnel chip cannot hold two full pipelines;
            # on failure we rebuild the previous set (best effort)
            self.pipe = None
            gc.collect()
            self.pipe = self.reload_fn(swap.specs)
            self.active_loras = list(swap.specs)
            # warmup at the serving config: identical shapes -> compile
            # cache hits, so this is one generation, not a recompile
            self._generate([GenRequest("warmup", self.default_cfg,
                                       seed=0)])
        except Exception as e:  # noqa: BLE001
            swap.error = f"{type(e).__name__}: {e}"
            log(f"lora swap failed: {swap.error}; restoring previous set")
            try:
                self.pipe = self.reload_fn(prev)
                self.active_loras = prev
            except Exception as e2:  # noqa: BLE001
                log(f"restore failed too: {e2} — server needs a restart")
        swap.seconds = _t.perf_counter() - t0
        swap.done.set()

    def _run(self):
        pending: Optional[GenRequest] = None  # config-mismatched holdover
        while not self._stop:
            if self._swap is not None:
                self._do_swap()
            if pending is not None:
                first, pending = pending, None
            else:
                try:
                    first = self.queue.get(timeout=0.2)
                except queue.Empty:
                    continue
            if first.abandoned:
                self._drop(first)
                continue
            batch = [first]
            # micro-batch window: fuse queued same-config txt2img requests
            # (img2img/inpaint run alone — per-request reference image)
            deadline = time.perf_counter() + self.batch_window_s
            while not first.solo and len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                try:
                    nxt = self.queue.get(timeout=max(remaining, 0.0))
                except queue.Empty:
                    break
                if nxt.abandoned:
                    self._drop(nxt)
                    continue
                if nxt.cfg == first.cfg and not nxt.solo:
                    batch.append(nxt)
                else:
                    # hold it as the HEAD of the next batch — re-queueing
                    # to the tail would starve it under a sustained stream
                    # of same-config requests
                    pending = nxt
                    break
            # drop requests whose client timed out during the window
            live = [r for r in batch if not r.abandoned]
            for r in batch:
                if r.abandoned:
                    self._drop(r)
            if live:
                self._generate(live)

    def _generate(self, batch: List[GenRequest]):
        cfg = batch[0].cfg
        t0 = time.perf_counter()
        try:
            import numpy as np

            seeds = [r.seed for r in batch]
            if (batch[0].edit_image is not None
                    and not hasattr(self.pipe, "flux_cfg")):
                # UNet families: InstructPix2Pix (8-channel edit UNet,
                # 3-way CFG; see pipeline.ip2p). SD3 has no edit mode.
                if not hasattr(self.pipe, "diffuser_cfg"):
                    raise ValueError("/v1/edit is Kontext (--family flux) "
                                     "or InstructPix2Pix (UNet families); "
                                     "the SD3 family has no edit mode")
                r0 = batch[0]
                images = self.pipe.ip2p(
                    r0.prompt, np.asarray(r0.edit_image)[None],
                    n_steps=cfg.steps, guidance_scale=cfg.guidance_scale,
                    image_guidance_scale=cfg.image_guidance_scale,
                    seed=r0.seed, negative_prompt=cfg.negative_prompt,
                    sampler=cfg.sampler, schedule=cfg.schedule,
                )
            elif hasattr(self.pipe, "flux_cfg"):
                # Flux family (pipeline/flux.py): guidance-distilled, no
                # CFG; same fused-batch per-image-seed contract
                images = self._generate_flux(batch, cfg, seeds)
            elif not hasattr(self.pipe, "diffuser_cfg"):
                # SD3 family (pipeline/sd3.py): narrower surface — flow
                # matching is the only scheduler; same fused-batch
                # per-image-seed contract as the UNet families
                images = self._generate_sd3(batch, cfg, seeds)
            elif cfg.slg_scale:
                raise ValueError(
                    "slg_scale applies to the SD3 family only (use "
                    "pag_scale for the UNet families)")
            elif cfg.true_cfg_scale != 1.0:
                raise ValueError(
                    "true_cfg_scale applies to the Flux family only")
            elif batch[0].crop is not None or batch[0].mask_image is not None:
                images = self._inpaint_one(batch[0], cfg)
            elif batch[0].image is not None:
                images = self.pipe.img2img(
                    batch[0].prompt,
                    np.asarray(batch[0].image)[None],
                    strength=batch[0].strength,
                    n_steps=cfg.steps,
                    guidance_scale=cfg.guidance_scale,
                    seed=batch[0].seed,
                    negative_prompt=cfg.negative_prompt,
                    sampler=cfg.sampler,
                    schedule=cfg.schedule,
                    guidance_rescale=cfg.guidance_rescale,
                    pag_scale=cfg.pag_scale,
                    ddim_eta=cfg.ddim_eta,
                )
            else:
                control_kw = {}
                if batch[0].control_image is not None:  # solo -> len 1
                    control_kw = dict(
                        control_image=np.asarray(batch[0].control_image),
                        control_scale=batch[0].control_scale,
                    )
                if batch[0].ip_image is not None:  # solo -> len 1
                    control_kw.update(
                        ip_adapter_image=np.asarray(batch[0].ip_image),
                        ip_adapter_scale=batch[0].ip_scale,
                    )
                images = self.pipe.txt2img(
                    [r.prompt for r in batch],
                    resolution=(cfg.height, cfg.width),
                    n_steps=cfg.steps,
                    guidance_scale=cfg.guidance_scale,
                    # ALWAYS per-image seeds: a request's image depends
                    # only on its own seed, never on how it was batched
                    seed=seeds,
                    negative_prompt=cfg.negative_prompt,
                    sampler=cfg.sampler,
                    schedule=cfg.schedule,
                    guidance_rescale=cfg.guidance_rescale,
                    pag_scale=cfg.pag_scale,
                    ddim_eta=cfg.ddim_eta,
                    **control_kw,
                )
            images = np.asarray(images)
            dt = time.perf_counter() - t0
            for i, r in enumerate(batch):
                r.result = [_png_bytes(images[i])]
                r.latency_s = dt
        except Exception as e:  # noqa: BLE001 — report to the client
            for r in batch:
                r.error = f"{type(e).__name__}: {e}"
        finally:
            with self.stats_lock:
                self.n_batches += 1
                self.n_requests += len(batch)
                self.n_images += len(batch)
                self.latencies.append(time.perf_counter() - t0)
                self.latencies = self.latencies[-256:]
            for r in batch:
                r.done.set()

    def _generate_sd3(self, batch, cfg: GenConfig, seeds):
        import numpy as np

        if cfg.sampler != "ddim" or cfg.schedule != "linear":
            raise ValueError("SD3 uses flow-matching Euler; per-request "
                             "sampler/schedule do not apply")
        if cfg.guidance_rescale or cfg.pag_scale:
            raise ValueError("guidance_rescale/pag_scale do not apply to "
                             "the SD3 family (use slg_scale)")
        if cfg.true_cfg_scale != 1.0:
            raise ValueError("true_cfg_scale applies to the Flux family "
                             "only (SD3 has standard CFG)")
        r0 = batch[0]
        if r0.control_image is not None or r0.ip_image is not None:
            raise ValueError("controlnet/ip-adapter are not supported for "
                             "--family sd3")
        if r0.crop is not None or r0.mask_image is not None:  # solo inpaint
            common = dict(n_steps=cfg.steps,
                          guidance_scale=cfg.guidance_scale, seed=r0.seed,
                          negative_prompt=cfg.negative_prompt,
                          slg_scale=cfg.slg_scale)
            ref = np.asarray(r0.image)[None]
            if r0.mask_image is not None:
                return self.pipe.inpaint(
                    [r0.prompt], ref, mask_image=np.asarray(r0.mask_image),
                    mask_blur=r0.mask_blur, **common)
            left, right, top, bottom, crop_out = r0.crop
            return self.pipe.inpaint(
                [r0.prompt], ref, crop_left=left, crop_right=right,
                crop_top=top, crop_bottom=bottom, crop_out=crop_out,
                **common)
        if r0.image is not None:  # solo img2img
            return self.pipe.img2img(
                r0.prompt, np.asarray(r0.image)[None],
                strength=r0.strength, n_steps=cfg.steps,
                guidance_scale=cfg.guidance_scale, seed=r0.seed,
                negative_prompt=cfg.negative_prompt,
                slg_scale=cfg.slg_scale,
            )
        return self.pipe.txt2img(
            [r.prompt for r in batch],
            resolution=(cfg.height, cfg.width),
            n_steps=cfg.steps,
            guidance_scale=cfg.guidance_scale,
            seed=seeds,
            negative_prompt=cfg.negative_prompt,
            slg_scale=cfg.slg_scale,
        )

    def _generate_flux(self, batch, cfg: GenConfig, seeds):
        import numpy as np

        if cfg.sampler != "ddim" or cfg.schedule != "linear":
            raise ValueError("Flux uses flow-matching Euler; per-request "
                             "sampler/schedule do not apply")
        if cfg.guidance_rescale or cfg.pag_scale or cfg.slg_scale:
            raise ValueError("guidance_rescale/pag_scale/slg_scale do not "
                             "apply to the Flux family")
        if cfg.negative_prompt and cfg.true_cfg_scale <= 1.0:
            raise ValueError("the Flux family has no built-in CFG — a "
                             "negative_prompt needs true_cfg_scale > 1 "
                             "(real pair-batched CFG on top of the "
                             "embedded guidance)")
        r0 = batch[0]
        if r0.control_image is not None or r0.ip_image is not None:
            raise ValueError("controlnet/ip-adapter are not supported for "
                             "--family flux")
        common = dict(n_steps=cfg.steps,
                      guidance_scale=cfg.guidance_scale, seed=r0.seed)
        if r0.crop is not None or r0.mask_image is not None:  # solo
            ref = np.asarray(r0.image)[None]
            if r0.mask_image is not None:
                return self.pipe.inpaint(
                    [r0.prompt], ref, mask_image=np.asarray(r0.mask_image),
                    mask_blur=r0.mask_blur, **common)
            left, right, top, bottom, crop_out = r0.crop
            return self.pipe.inpaint(
                [r0.prompt], ref, crop_left=left, crop_right=right,
                crop_top=top, crop_bottom=bottom, crop_out=crop_out,
                **common)
        if r0.edit_image is not None:  # solo Kontext edit
            return self.pipe.kontext(
                [r0.prompt], np.asarray(r0.edit_image)[None], **common,
                negative_prompt=cfg.negative_prompt,
                true_cfg_scale=cfg.true_cfg_scale)
        if r0.image is not None:  # solo img2img
            return self.pipe.img2img(r0.prompt, np.asarray(r0.image)[None],
                                     strength=r0.strength, **common)
        return self.pipe.txt2img(
            [r.prompt for r in batch],
            resolution=(cfg.height, cfg.width),
            n_steps=cfg.steps, guidance_scale=cfg.guidance_scale,
            seed=seeds, negative_prompt=cfg.negative_prompt,
            true_cfg_scale=cfg.true_cfg_scale,
        )

    def _inpaint_one(self, r: GenRequest, cfg: GenConfig):
        """Dispatch one inpaint request: crop-window variant goes through
        pipe.inpaint (reference sample/main.rs:135-197 semantics); the
        mask-image variant builds a latent mask (any >127 pixel in an 8x8
        cell marks the cell generated) and uses the same pinned-latent
        machinery."""
        import numpy as np

        common = dict(
            n_steps=cfg.steps, guidance_scale=cfg.guidance_scale,
            seed=r.seed, negative_prompt=cfg.negative_prompt,
            sampler=cfg.sampler, schedule=cfg.schedule,
            guidance_rescale=cfg.guidance_rescale,
            pag_scale=cfg.pag_scale, ddim_eta=cfg.ddim_eta,
        )
        ref = np.asarray(r.image)[None]
        if r.mask_image is not None:
            # pipe.inpaint owns both mask surfaces (identical cell
            # semantics to the old in-server construction)
            return self.pipe.inpaint(
                [r.prompt], ref, mask_image=np.asarray(r.mask_image),
                mask_blur=r.mask_blur, **common,
            )
        left, right, top, bottom, crop_out = r.crop
        return self.pipe.inpaint(
            [r.prompt], ref, crop_left=left, crop_right=right,
            crop_top=top, crop_bottom=bottom, crop_out=crop_out,
            mask_blur=r.mask_blur, **common,
        )

    def info(self) -> dict:
        with self.stats_lock:
            lat = sorted(self.latencies)
            return {
                "ready": self.ready.is_set(),
                "max_batch": self.max_batch,
                "batch_window_ms": self.batch_window_s * 1000,
                "default": self.default_cfg.__dict__,
                "requests": self.n_requests,
                "images": self.n_images,
                "batches": self.n_batches,
                "dropped": self.n_dropped,
                "p50_batch_latency_s": (
                    round(statistics.median(lat), 3) if lat else None
                ),
                "queue_depth": self.queue.qsize(),
                "loras": [f"{p}:{sc}" for p, sc in self.active_loras],
            }


# ---------------------------------------------------------------------------
# HTTP layer
# ---------------------------------------------------------------------------

def make_handler(server: GenerationServer):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # quiet default logging
            pass

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                if server.ready.is_set():
                    self._json(200, {"status": "ok"})
                else:
                    self._json(503, {"status": "warming_up"})
            elif self.path == "/v1/info":
                self._json(200, server.info())
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def _decode_image(self, payload, key="image"):
            import numpy as np
            from PIL import Image

            raw = base64.b64decode(payload[key])
            return np.asarray(
                Image.open(io.BytesIO(raw)).convert("RGB"), dtype=np.uint8
            )

        def do_POST(self):
            if self.path == "/v1/lora":
                try:
                    length = int(self.headers.get("Content-Length", 0))
                    payload = json.loads(self.rfile.read(length) or b"{}")
                    from ..io.lora import parse_lora_specs

                    raw = payload.get("loras", [])
                    specs = parse_lora_specs([
                        (x if isinstance(x, str)
                         else f"{x['path']}:{x.get('scale', 1.0)}")
                        for x in raw])
                except Exception as e:  # noqa: BLE001
                    self._json(400, {"error": f"bad request: {e}"})
                    return
                out = server.request_swap(specs)
                status = out.pop("status", 200)
                self._json(status, out)
                return
            if self.path not in ("/v1/generate", "/v1/img2img",
                                 "/v1/inpaint", "/v1/edit"):
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                prompt = payload["prompt"]
                d = server.default_cfg
                cfg = GenConfig(
                    width=int(payload.get("width", d.width)),
                    height=int(payload.get("height", d.height)),
                    steps=int(payload.get("steps", d.steps)),
                    guidance_scale=float(
                        payload.get("guidance_scale", d.guidance_scale)
                    ),
                    negative_prompt=payload.get(
                        "negative_prompt", d.negative_prompt
                    ),
                    sampler=payload.get("sampler", d.sampler),
                    schedule=payload.get("schedule", d.schedule),
                    guidance_rescale=float(
                        payload.get("guidance_rescale", d.guidance_rescale)
                    ),
                    pag_scale=float(payload.get("pag_scale", d.pag_scale)),
                    ddim_eta=float(payload.get("ddim_eta", d.ddim_eta)),
                    slg_scale=float(payload.get("slg_scale", d.slg_scale)),
                    true_cfg_scale=float(
                        payload.get("true_cfg_scale", d.true_cfg_scale)),
                    image_guidance_scale=float(
                        payload.get("image_guidance_scale",
                                    d.image_guidance_scale)),
                )
                seed = int(payload.get("seed", 0))
                image = None
                strength = 0.3
                crop = None
                mask_image = None
                mask_blur = 0.0
                control_image = None
                control_scale = 1.0
                ip_image = None
                ip_scale = 0.6
                edit_image = None
                if self.path == "/v1/edit":
                    edit_image = self._decode_image(payload)
                if self.path == "/v1/generate" and "control_image" in payload:
                    control_image = self._decode_image(payload, "control_image")
                    control_scale = float(payload.get("control_scale", 1.0))
                if self.path == "/v1/generate" and "ip_image" in payload:
                    ip_image = self._decode_image(payload, "ip_image")
                    ip_scale = float(payload.get("ip_scale", 0.6))
                if self.path == "/v1/img2img":
                    image = self._decode_image(payload)
                    strength = float(payload.get("strength", 0.3))
                elif self.path == "/v1/inpaint":
                    image = self._decode_image(payload)
                    h, w = image.shape[:2]
                    mask_blur = float(payload.get("mask_blur", 0.0))
                    if "mask" in payload:
                        mask_image = self._decode_image(payload, "mask")
                    elif any(
                        k in payload for k in
                        ("crop_left", "crop_right", "crop_top", "crop_bottom")
                    ):
                        crop = (
                            int(payload.get("crop_left", 0)),
                            int(payload.get("crop_right", w)),
                            int(payload.get("crop_top", 0)),
                            int(payload.get("crop_bottom", h)),
                            bool(payload.get("crop_out", False)),
                        )
                    else:
                        raise ValueError(
                            "inpaint needs a 'mask' image or crop_* window"
                        )
            except (KeyError, ValueError, json.JSONDecodeError) as e:
                self._json(400, {"error": f"bad request: {e}"})
                return

            req = server.submit(
                GenRequest(prompt, cfg, seed, image=image, strength=strength,
                           crop=crop, mask_image=mask_image,
                           mask_blur=mask_blur,
                           control_image=control_image,
                           control_scale=control_scale,
                           ip_image=ip_image, ip_scale=ip_scale,
                           edit_image=edit_image)
            )
            if req.error:
                self._json(req.status if req.status != 200 else 500,
                           {"error": req.error})
                return
            if "image/png" in (self.headers.get("Accept") or ""):
                body = req.result[0]
                self.send_response(200)
                self.send_header("Content-Type", "image/png")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                return
            self._json(200, {
                "images": [base64.b64encode(b).decode() for b in req.result],
                "seed": seed,
                "latency_s": round(req.latency_s, 3),
            })

    return Handler


# ---------------------------------------------------------------------------
# CLI
# ---------------------------------------------------------------------------

def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="SDXL-on-TPU inference server")
    p.add_argument("--model-dir", type=str, default=None)
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--family", type=str, default="sdxl",
                   choices=["sdxl", "sd1", "sd2", "sd3", "flux"])
    p.add_argument("--tokenizer-dir", type=str, default=None)
    p.add_argument("--embedding", action="append", default=[],
                   help="Textual-inversion embedding file PATH[:word] "
                        "(repeatable), merged at boot")
    p.add_argument("--lora", action="append", default=[],
                   metavar="PATH[:SCALE]")
    p.add_argument("--quantize", choices=["int8", "int4"], default=None,
                   help="Weight-only quantized storage (see sample "
                        "--quantize): sd3/flux transformers + T5, or the "
                        "UNet-family block linears; the "
                        "single-chip fit mode for FLUX.1")
    p.add_argument("--controlnet", action="append", default=None,
                   metavar="DIR",
                   help="diffusers-layout ControlNetModel directory "
                        "(repeatable for multi-ControlNet; a request's "
                        "control_image then conditions every net); requests "
                        "may then pass control_image/control_scale")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--max-queue", type=int, default=64,
                   help="Pending-request bound; overflow returns 503")
    p.add_argument("--batch-window-ms", type=float, default=20.0)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--height", type=int, default=1024)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--guidance-scale", type=float, default=7.5)
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddim", "euler", "dpmpp", "euler_a", "dpmpp_sde",
                            "dpmpp_3m_sde", "unipc", "heun", "euler_cfgpp",
                            "dpm2", "dpm2_a", "dpmpp_2s_a", "lms", "lcm"])
    p.add_argument("--zsnr", action="store_true",
                   help="Rescale the alpha-bar table(s) to zero terminal "
                        "SNR at boot (UNet families; see sample --zsnr)")
    p.add_argument("--vae-bf16", action="store_true")
    p.add_argument("--freeu", type=str, nargs="?", const="auto",
                   default=None, metavar="B1,B2,S1,S2",
                   help="FreeU decoder rebalancing (see sample --freeu)")
    p.add_argument("--ip-adapter", type=str, default=None, metavar="FILE",
                   help="Official IP-Adapter safetensors; requests may then "
                        "pass ip_image/ip_scale (needs --ip-image-encoder)")
    p.add_argument("--ip-image-encoder", type=str, default=None,
                   metavar="DIR",
                   help="transformers CLIPVisionModelWithProjection dir "
                        "matching --ip-adapter")
    p.add_argument("--dp", type=int, default=None,
                   help="Data-parallel mesh axis size (multi-chip)")
    p.add_argument("--tp", type=int, default=None,
                   help="Tensor-parallel mesh axis size (multi-chip)")
    p.add_argument("--no-t5", action="store_true",
                   help="SD3: drop the T5-XXL tower (its token block "
                        "becomes zeros — the public pipeline's "
                        "memory-saving mode)")
    p.add_argument("--no-warmup", action="store_true",
                   help="Skip the compile-at-boot generation")
    return p


def build_pipeline(args, loras_override=None):
    """Same model resolution logic as the sample CLI. loras_override:
    already-parsed [(path, scale)] replacing the boot --lora set (the
    /v1/lora hot-swap path)."""
    import jax.numpy as jnp

    from ..io.lora import parse_lora_specs

    loras = (loras_override if loras_override is not None
             else parse_lora_specs(args.lora))

    def _quant_unet(pipe):
        from ..cli.sample import _quantize_unet_inplace

        _quantize_unet_inplace(pipe, getattr(args, "quantize", None))
        return pipe

    if args.family in ("sd1", "sd2"):
        from ..configs import (
            CLIP_VIT_L_CONFIG,
            OPEN_CLIP_VITH_CONFIG,
            SD2_DIFFUSER,
            SD15_DIFFUSER,
        )
        from ..pipeline.sd1 import load_sd1_pipeline, random_sd1_pipeline

        sd2 = args.family == "sd2"
        clip_cfg = OPEN_CLIP_VITH_CONFIG if sd2 else CLIP_VIT_L_CONFIG
        d_cfg = SD2_DIFFUSER if sd2 else SD15_DIFFUSER
        if args.random_weights:
            return _quant_unet(random_sd1_pipeline(
                clip_cfg=clip_cfg, diffuser_cfg=d_cfg,
                tokenizer_dir=args.tokenizer_dir, penultimate_hidden=sd2,
            ))
        return load_sd1_pipeline(
            args.model_dir, clip_cfg, d_cfg, jnp.bfloat16,
            args.tokenizer_dir, penultimate_hidden=sd2, loras=loras,
            quantize=args.quantize,
        )
    if args.family == "sd3":
        from ..pipeline.sd3 import load_sd3_pipeline, random_sd3_pipeline

        bad = [name for name, hit in (
            ("--freeu", args.freeu is not None),
            ("--controlnet", bool(args.controlnet)),
            ("--ip-adapter", args.ip_adapter is not None),
            ("--embedding", bool(args.embedding)),
            ("--vae-bf16", args.vae_bf16),
            ("--zsnr", args.zsnr),
        ) if hit]
        if bad:
            raise ValueError(
                f"{', '.join(bad)} not supported with --family sd3")
        if args.random_weights:
            return random_sd3_pipeline(tokenizer_dir=args.tokenizer_dir)
        return load_sd3_pipeline(args.model_dir,
                                 tokenizer_dir=args.tokenizer_dir,
                                 load_t5=not args.no_t5, loras=loras,
                                 quantize=args.quantize)
    if args.family == "flux":
        from ..pipeline.flux import load_flux_pipeline, random_flux_pipeline

        bad = [name for name, hit in (
            ("--freeu", args.freeu is not None),
            ("--controlnet", bool(args.controlnet)),
            ("--ip-adapter", args.ip_adapter is not None),
            ("--embedding", bool(args.embedding)),
            ("--vae-bf16", args.vae_bf16), ("--no-t5", args.no_t5),
            ("--zsnr", args.zsnr),
        ) if hit]
        if bad:
            raise ValueError(
                f"{', '.join(bad)} not supported with --family flux")
        if args.random_weights:
            return random_flux_pipeline(tokenizer_dir=args.tokenizer_dir)
        return load_flux_pipeline(args.model_dir,
                                  tokenizer_dir=args.tokenizer_dir,
                                  loras=loras, quantize=args.quantize)
    if args.random_weights:
        from ..pipeline.pipeline import random_pipeline

        return _quant_unet(random_pipeline(tokenizer_dir=args.tokenizer_dir))
    from ..pipeline.loader import load_pipeline

    return load_pipeline(args.model_dir, tokenizer_dir=args.tokenizer_dir,
                         loras=loras, quantize=args.quantize)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if not args.random_weights and args.model_dir is None:
        print("error: --model-dir is required (or --random-weights)",
              file=sys.stderr)
        return 1

    from ..utils.cache import init_compilation_cache

    init_compilation_cache()

    from ..utils import log

    def _prepare_pipe(pipe):
        """Post-load pipeline setup, shared by boot and /v1/lora reload."""
        if args.zsnr:
            pipe.rescale_zsnr()
            log("zsnr: alpha-bar table rescaled to zero terminal SNR")
        if args.vae_bf16:
            import jax.numpy as jnp

            pipe.vae_dtype = jnp.bfloat16
        if args.freeu is not None:
            import dataclasses

            from ..configs import parse_freeu_spec

            fu = parse_freeu_spec(args.freeu, args.family)
            pipe.diffuser_cfg = dataclasses.replace(pipe.diffuser_cfg,
                                                    freeu=fu)
            log(f"freeu: (b1,b2,s1,s2) = {fu}")
        if args.embedding:
            pipe.add_textual_inversions(args.embedding)
        if args.controlnet:
            pipe.load_controlnet(
                args.controlnet[0] if len(args.controlnet) == 1
                else args.controlnet
            )
        if args.ip_adapter:
            pipe.load_ip_adapter(args.ip_adapter, args.ip_image_encoder)
        if args.dp is not None or args.tp is not None:
            pipe.shard(args.dp, args.tp)
        return pipe

    if args.ip_adapter and not args.ip_image_encoder:
        print("error: --ip-adapter needs --ip-image-encoder",
              file=sys.stderr)
        return 1
    try:
        pipe = _prepare_pipe(build_pipeline(args))
    except (KeyError, FileNotFoundError, ValueError) as e:
        # same clean checkpoint-error UX as the sample CLI
        print(f"error: failed to load checkpoint from "
              f"{args.model_dir}: {e}", file=sys.stderr)
        return 1

    from ..io.lora import parse_lora_specs

    server = GenerationServer(
        pipe,
        max_batch=args.max_batch,
        max_queue=args.max_queue,
        batch_window_ms=args.batch_window_ms,
        default_cfg=GenConfig(
            width=args.width, height=args.height, steps=args.steps,
            guidance_scale=args.guidance_scale, sampler=args.sampler,
        ),
        reload_fn=(None if args.random_weights else
                   (lambda specs: _prepare_pipe(
                       build_pipeline(args, loras_override=specs)))),
    )
    server.active_loras = parse_lora_specs(args.lora)
    log("compiling (warmup generation)..." if not args.no_warmup
        else "skipping warmup")
    server.start(warmup=not args.no_warmup)

    httpd = ThreadingHTTPServer((args.host, args.port), make_handler(server))
    log(f"serving on http://{args.host}:{args.port} "
        f"(max_batch={args.max_batch})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        log("shutting down")
        server.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
