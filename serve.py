"""Production serving: request-batching HTTP front-end over the jitted pipeline.

Unlike run_gradio.py (one request at a time), this server accumulates
concurrent requests into device batches — the TPU-native way to serve a
diffusion restorer:

- a collector thread groups up to ``--batch`` same-shape requests arriving
  within ``--max_wait_ms`` (static-shape bucketing via ``size_bucket`` keeps
  the number of compiled programs bounded);
- one dispatcher owns the TPU: batches run back-to-back, Python threads only
  decode/encode PNGs, so host work overlaps device work;
- responses are matched back to their requests by slot.

API:  POST /restore   {"image": <base64 png/jpg>, "task": "sr"|"face",
                       "steps": 10, "cfg_scale": 6.0, "pos_prompt": "",
                       "neg_prompt": "", "seed": 231,
                       "sampler": "edm_dpm++_3m_sde"}
      -> {"image": <base64 png>}
      GET /healthz    -> {"ok": true, "queue": N}

The reference has no batched server (run_gradio.py processes serially); this
is a beyond-parity component. Sampling parameters (including the seed) are
part of the batch key, so requests only share a device batch when their
(steps, cfg, sampler, prompts, seed, bucketed shape) agree. Note: within a
shared batch each slot draws distinct noise from the common seed's stream,
so a request's exact output depends on its slot; for bit-reproducible
outputs send requests with batch=1 (or a unique seed, which prevents
co-batching).
"""

import argparse
import base64
import io
import json
import os
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
from PIL import Image


class _Request:
    __slots__ = ("image", "key", "seed", "event", "result", "error")

    def __init__(self, image, key, seed):
        self.image = image          # uint8 HWC (already upscaled)
        self.key = key              # batchable parameter tuple
        self.seed = seed            # per-request -> per-sample rng
        self.event = threading.Event()
        self.result = None
        self.error = None


class BatchingServer:
    def __init__(self, pipeline, batch: int, max_wait_ms: float,
                 size_bucket: int = 64, max_size: int = 2048):
        # ``pipeline``: a Pipeline (single-task) or a {task: Pipeline} dict
        self.pipelines = pipeline if isinstance(pipeline, dict) else {"sr": pipeline}
        self.batch = batch
        self.max_wait = max_wait_ms / 1000.0
        self.size_bucket = size_bucket
        self.max_size = max_size
        self.q: "queue.Queue[_Request]" = queue.Queue()
        self._thread = threading.Thread(target=self._dispatch, daemon=True)
        self._thread.start()

    def submit(self, image, steps, cfg_scale, pos, neg, sampler, seed,
               task="sr"):
        if task not in self.pipelines:
            raise ValueError(
                f"task {task!r} unavailable (serving: {sorted(self.pipelines)})"
            )
        if max(image.shape[:2]) > self.max_size:
            raise ValueError(f"input larger than {self.max_size} not allowed")
        h0, w0 = image.shape[:2]
        # pad to the size bucket HERE so different request sizes in the same
        # bucket share one device batch (and one compiled program)
        b = self.size_bucket
        ph, pw = (b - h0 % b) % b, (b - w0 % b) % b
        if ph or pw:
            image = np.pad(image, ((0, ph), (0, pw), (0, 0)), mode="edge")
        # seed is part of the key: requests only share a batch when they'd
        # also share the RNG stream, so a request's output can never depend
        # on a co-batched request's seed
        key = (str(task), image.shape[0], image.shape[1], int(steps),
               float(cfg_scale), str(pos), str(neg), str(sampler), int(seed))
        req = _Request(image, key, int(seed))
        self.q.put(req)
        req.event.wait()
        if req.error is not None:
            raise req.error
        # x1 pipeline (input pre-upscaled by the handler) -> same-size crop
        return req.result[:h0, :w0]

    # ------------------------------------------------------------------ #
    def _collect(self):
        """Block for one request, then gather same-key requests for up to
        max_wait or until the batch is full."""
        first = self.q.get()
        group = [first]
        deadline = time.time() + self.max_wait
        leftover = []
        while len(group) < self.batch:
            timeout = deadline - time.time()
            if timeout <= 0:
                break
            try:
                r = self.q.get(timeout=timeout)
            except queue.Empty:
                break
            (group if r.key == first.key else leftover).append(r)
        for r in leftover:  # different bucket: requeue for the next round
            self.q.put(r)
        return group

    def _dispatch(self):
        while True:
            group = self._collect()
            try:
                imgs = np.stack([r.image for r in group])
                (task, h, w, steps, cfg, pos, neg, sampler,
                 _seed) = group[0].key
                # one rng stream per batch (each slot draws distinct noise);
                # for bit-reproducible outputs send requests with batch=1
                out = self.pipelines[task].run(
                    imgs, steps=steps, cfg_scale=cfg, pos_prompt=pos,
                    neg_prompt=neg, sampler_type=sampler,
                    seed=group[0].seed, size_bucket=self.size_bucket,
                )
                for i, r in enumerate(group):
                    r.result = out[i]
            except Exception as e:  # noqa: BLE001 — report to every waiter
                for r in group:
                    r.error = e
            finally:
                for r in group:
                    r.event.set()


def make_handler(server: BatchingServer, upscale: float):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            if self.path != "/healthz":
                self.send_error(404)
                return
            body = json.dumps({"ok": True, "queue": server.q.qsize()}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            if self.path != "/restore":
                self.send_error(404)
                return
            try:
                n = int(self.headers["Content-Length"])
                req = json.loads(self.rfile.read(n))
                img = np.array(Image.open(
                    io.BytesIO(base64.b64decode(req["image"]))).convert("RGB"))
                if upscale != 1.0:
                    hh = int(img.shape[0] * upscale)
                    ww = int(img.shape[1] * upscale)
                    img = np.array(Image.fromarray(img).resize((ww, hh), Image.BICUBIC))
                out = server.submit(
                    img,
                    task=req.get("task", "sr"),
                    steps=req.get("steps", 10),
                    cfg_scale=req.get("cfg_scale", 6.0),
                    pos=req.get("pos_prompt", ""),
                    neg=req.get("neg_prompt", ""),
                    sampler=req.get("sampler", "edm_dpm++_3m_sde"),
                    seed=req.get("seed", 231),
                )
                buf = io.BytesIO()
                Image.fromarray(np.asarray(out)).save(buf, "PNG")
                body = json.dumps(
                    {"image": base64.b64encode(buf.getvalue()).decode()}).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.end_headers()
                self.wfile.write(body)
            except Exception as e:  # noqa: BLE001
                self.send_error(500, str(e))

    return Handler


def main():
    from diffbir_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--max_wait_ms", type=float, default=150.0)
    ap.add_argument("--size_bucket", type=int, default=64)
    ap.add_argument("--upscale", type=float, default=4.0)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--precision", default="bf16")
    ap.add_argument("--fast_gelu", action="store_true",
                    help="tanh-approx GELU serving mode: 1.178 vs 1.2596 "
                         "s/image on v5e, drift ~50.7 dB vs exact "
                         "(GELU_QUALITY.json; sets DIFFBIR_TPU_FAST_GELU=1)")
    ap.add_argument("--fused_ffn", action="store_true",
                    help="Pallas fused GEGLU-MLP serving mode "
                         "(sets DIFFBIR_TPU_FUSED_FFN=1; see ops/fused_ffn.py)")
    ap.add_argument("--quant_dense", action="store_true",
                    help="int8 weight-only UNet/ControlNet dense sites")
    ap.add_argument("--tasks", default="sr", help="comma list: sr,face")
    args = ap.parse_args()
    if args.fused_ffn:
        os.environ["DIFFBIR_TPU_FUSED_FFN"] = "1"  # read at trace time
    if args.fast_gelu:
        os.environ["DIFFBIR_TPU_FAST_GELU"] = "1"  # read at trace time

    import run_gradio

    # reuse the model/loop bootstrap; we batch at a lower level than process()
    from types import SimpleNamespace

    from diffbir_tpu.inference.bsr_loop import BSRInferenceLoop

    loop_args = SimpleNamespace(
        task="sr", version="v2.1", upscale=args.upscale,
        precision=args.precision, quant_dense=args.quant_dense,
        captioner="none", guidance=False,
        input=".", output=".", n_samples=1, seed=231, steps=args.steps,
        pos_prompt="", neg_prompt="low quality, blurry, low-resolution, "
        "noisy, unsharp, weird textures", cfg_scale=6.0, strength=1.0,
        start_point_type="noise", sampler="edm_dpm++_3m_sde", noise_aug=0,
        rescale_cfg=False, cleaner_tiled=False, cleaner_tile_size=512,
        cleaner_tile_stride=256,
    )
    wanted = [t.strip() for t in args.tasks.split(",") if t.strip()]
    pipelines = {}
    if "sr" in wanted:
        pipelines["sr"] = BSRInferenceLoop(loop_args).pipeline
    if "face" in wanted:
        from types import SimpleNamespace as NS

        from diffbir_tpu.inference.bfr_loop import BFRInferenceLoop

        try:
            pipelines["face"] = BFRInferenceLoop(
                NS(**{**vars(loop_args), "task": "face"})
            ).pipeline
        except Exception as e:  # face weights absent: degrade
            print(f"face pipeline unavailable ({e})")
    if not pipelines:
        raise RuntimeError("no task pipeline could be loaded")
    srv = BatchingServer(pipelines, args.batch, args.max_wait_ms,
                         args.size_bucket, max_size=run_gradio.MAX_SIZE)
    print(f"serving {sorted(pipelines)} on :{args.port} (batch {args.batch}, "
          f"wait {args.max_wait_ms} ms, bucket {args.size_bucket}px)")
    ThreadingHTTPServer(("0.0.0.0", args.port),
                        make_handler(srv, args.upscale)).serve_forever()


if __name__ == "__main__":
    main()
