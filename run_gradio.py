"""Web demo / serving entry point.

Behavioral parity target: /root/reference/run_gradio.py:52-418 — eager
v2.1-only model load, per-request ``process()`` with all sampler/tiling
knobs, seed control, output-resolution cap, error-image fallback.

Two front-ends over one shared ``process()``:
- gradio Blocks UI when gradio is importable (same layout intent as the
  reference demo);
- otherwise a dependency-free stdlib HTTP JSON/PNG service (POST /restore)
  so TPU hosts without gradio can still serve (see serve.py for the
  production path).
"""

import argparse
import base64
import io
import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
from PIL import Image

MAX_SIZE = 2048  # output cap, run_gradio.py:36-38


def build_runner(args):
    from types import SimpleNamespace

    from diffbir_tpu.inference.bsr_loop import BSRInferenceLoop

    loop_args = SimpleNamespace(
        task="sr", version="v2.1", upscale=args.upscale, precision=args.precision,
        captioner="none", guidance=False, input=".", output=".",
        n_samples=1, seed=231, steps=args.steps,
        pos_prompt="", neg_prompt="low quality, blurry, low-resolution, noisy, unsharp, weird textures",
        cfg_scale=6.0, strength=1.0, start_point_type="noise",
        sampler="edm_dpm++_3m_sde", noise_aug=0, rescale_cfg=False,
        cleaner_tiled=False, cleaner_tile_size=512, cleaner_tile_stride=256,
    )
    loop = BSRInferenceLoop(loop_args)

    def process(
        image: np.ndarray, steps: int = 10, cfg_scale: float = 6.0,
        pos_prompt: str = "", neg_prompt: str = loop_args.neg_prompt,
        seed: int = 231, sampler: str = "edm_dpm++_3m_sde",
        strength: float = 1.0,
    ) -> np.ndarray:
        h, w = image.shape[:2]
        if max(h, w) * args.upscale > MAX_SIZE:
            raise ValueError(f"output larger than {MAX_SIZE}^2 not allowed in demo")
        img = Image.fromarray(image).resize(
            (int(w * args.upscale), int(h * args.upscale)), Image.BICUBIC
        )
        batch = np.asarray(img)[None]
        out = loop.pipeline.run(
            batch, steps=steps, strength=strength, pos_prompt=pos_prompt,
            neg_prompt=neg_prompt, cfg_scale=cfg_scale, sampler_type=sampler,
            seed=seed,
        )
        return out[0]

    return process


def run_gradio(process, port):
    import gradio as gr

    with gr.Blocks() as app:
        gr.Markdown("# diffbir_tpu — blind image restoration (v2.1)")
        with gr.Row():
            inp = gr.Image(type="numpy", label="input")
            out = gr.Image(type="numpy", label="restored")
        steps = gr.Slider(1, 100, value=10, step=1, label="steps")
        cfg = gr.Slider(1.0, 15.0, value=6.0, label="cfg scale")
        pos = gr.Textbox(label="positive prompt")
        neg = gr.Textbox(label="negative prompt")
        seed = gr.Number(value=231, label="seed")
        btn = gr.Button("restore")

        def safe_process(image, steps, cfg, pos, neg, seed):
            try:
                return process(image, int(steps), float(cfg), pos, neg, int(seed))
            except Exception as e:  # error-image fallback (run_gradio.py:190-191)
                print(f"error: {e}")
                return np.zeros((128, 128, 3), np.uint8)

        btn.click(safe_process, [inp, steps, cfg, pos, neg, seed], [out])
    app.queue().launch(server_port=port)


class _Handler(BaseHTTPRequestHandler):
    process = None

    def do_POST(self):
        if self.path != "/restore":
            self.send_error(404)
            return
        try:
            length = int(self.headers["Content-Length"])
            req = json.loads(self.rfile.read(length))
            img = np.array(
                Image.open(io.BytesIO(base64.b64decode(req["image"]))).convert("RGB")
            )
            out = type(self).process(
                img,
                steps=int(req.get("steps", 10)),
                cfg_scale=float(req.get("cfg_scale", 6.0)),
                pos_prompt=req.get("pos_prompt", ""),
                neg_prompt=req.get("neg_prompt", ""),
                seed=int(req.get("seed", 231)),
                sampler=req.get("sampler", "edm_dpm++_3m_sde"),
            )
            buf = io.BytesIO()
            Image.fromarray(out).save(buf, "PNG")
            body = json.dumps({"image": base64.b64encode(buf.getvalue()).decode()}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)
        except Exception as e:
            self.send_error(500, str(e))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=7860)
    ap.add_argument("--upscale", type=float, default=4.0)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--precision", default="bf16")
    args = ap.parse_args()
    process = build_runner(args)
    try:
        import gradio  # noqa: F401

        run_gradio(process, args.port)
    except ImportError:
        print(f"gradio unavailable; serving HTTP JSON on :{args.port} (POST /restore)")
        _Handler.process = staticmethod(process)
        ThreadingHTTPServer(("0.0.0.0", args.port), _Handler).serve_forever()


if __name__ == "__main__":
    main()
