"""Web demo / serving entry point.

Behavioral parity target: /root/reference/run_gradio.py:52-418 — eager model
load, per-request ``process()`` with the FULL knob surface (task switch,
every tiling knob, start point, guidance, all samplers + EDM params, seed,
2048^2 output cap, error-image fallback).

Beyond the reference demo: a ``--version`` launch flag (the reference demo is
hardwired to v2.1) and guidance controls (the reference parses guidance flags
only in the CLI).

Two front-ends over one shared ``process()``:
- gradio Blocks UI when gradio is importable;
- otherwise a dependency-free stdlib HTTP JSON/PNG service (POST /restore)
  so TPU hosts without gradio can still serve (see serve.py for the
  production request-batching path).
"""

import argparse
import base64
import io
import json
import os
import threading
import traceback
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
from PIL import Image

MAX_SIZE = 2048  # output cap, reference run_gradio.py:36-38

DEFAULT_NEG = "low quality, blurry, low-resolution, noisy, unsharp, weird textures"

SAMPLERS = [
    "spaced", "ddim",
    "dpm++_m2", "dpm++_m3", "dpm++_s2", "dpm++_s3",
    "edm_euler", "edm_euler_a", "edm_heun", "edm_dpm_2", "edm_dpm_2_a",
    "edm_lms", "edm_dpm_fast", "edm_dpm++_2s_a", "edm_dpm++_sde",
    "edm_dpm++_2m", "edm_dpm++_2m_sde", "edm_dpm++_3m_sde",
]


def build_runner(args):
    from types import SimpleNamespace

    from diffbir_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from diffbir_tpu.inference.bsr_loop import BSRInferenceLoop
    from diffbir_tpu.inference.bfr_loop import BFRInferenceLoop
    from diffbir_tpu.utils.cond_fn import MSEGuidance, WeightedMSEGuidance

    def loop_args(task):
        return SimpleNamespace(
            task=task, version=args.version, upscale=args.upscale,
            precision=args.precision, captioner="none", guidance=False,
            input=".", output=".", n_samples=1, seed=231, steps=args.steps,
            pos_prompt="", neg_prompt=DEFAULT_NEG, cfg_scale=6.0,
            strength=1.0, start_point_type="noise",
            sampler="edm_dpm++_3m_sde", noise_aug=0, rescale_cfg=False,
            cleaner_tiled=False, cleaner_tile_size=512, cleaner_tile_stride=256,
        )

    # eager load the requested task pipelines (reference run_gradio.py:52-100)
    wanted = [t.strip() for t in args.tasks.split(",") if t.strip()]
    unknown = [t for t in wanted if t not in ("sr", "face")]
    if unknown:
        raise ValueError(f"unknown --tasks entries {unknown}; valid: sr, face")
    pipelines = {}
    if "sr" in wanted:
        pipelines["sr"] = BSRInferenceLoop(loop_args("sr")).pipeline
    if "face" in wanted:
        try:
            pipelines["face"] = BFRInferenceLoop(loop_args("face")).pipeline
        except Exception as e:  # face weights absent: demo degrades
            print(f"face pipeline unavailable ({e})")
    if not pipelines:
        raise RuntimeError("no task pipeline could be loaded")
    _run_lock = threading.Lock()

    def process(
        image: np.ndarray,
        task: str = "sr",
        upscale: float = None,
        steps: int = 10,
        cfg_scale: float = 6.0,
        pos_prompt: str = "",
        neg_prompt: str = DEFAULT_NEG,
        seed: int = 231,
        sampler: str = "edm_dpm++_3m_sde",
        strength: float = 1.0,
        noise_aug: int = 0,
        rescale_cfg: bool = False,
        start_point_type: str = "noise",
        cleaner_tiled: bool = False,
        cleaner_tile_size: int = 512,
        cleaner_tile_stride: int = 256,
        vae_encoder_tiled: bool = False,
        vae_encoder_tile_size: int = 256,
        vae_decoder_tiled: bool = False,
        vae_decoder_tile_size: int = 256,
        cldm_tiled: bool = False,
        cldm_tile_size: int = 512,
        cldm_tile_stride: int = 256,
        guidance: bool = False,
        g_loss: str = "w_mse",
        g_scale: float = 0.0,
        g_space: str = "latent",
        g_start: int = 1001,
        g_stop: int = -1,
        g_repeat: int = 1,
        s_churn: float = 0.0,
        s_tmin: float = 0.0,
        s_tmax: float = 300.0,
        s_noise: float = 1.0,
        order: int = 1,
        eta: float = 1.0,
    ) -> np.ndarray:
        pipe = pipelines.get(task)
        if pipe is None:
            raise ValueError(f"task {task!r} unavailable (weights not loaded)")
        up = args.upscale if upscale is None else float(upscale)
        h, w = image.shape[:2]
        if max(h, w) * up > MAX_SIZE:
            raise ValueError(f"output larger than {MAX_SIZE}^2 not allowed in demo")
        img = Image.fromarray(image).resize(
            (int(w * up), int(h * up)), Image.BICUBIC
        )
        batch = np.asarray(img)[None]
        # one request at a time: the HTTP front-end is threaded, but the
        # pipeline is shared mutable state (cond_fn below) and the single
        # chip serializes concurrent programs badly anyway (CLAUDE.md)
        with _run_lock:
            if guidance and g_scale > 0:
                cls = MSEGuidance if g_loss == "mse" else WeightedMSEGuidance
                pipe.cond_fn = cls(
                    scale=float(g_scale), t_start=int(g_start), t_stop=int(g_stop),
                    space=g_space, repeat=int(g_repeat),
                )
            else:
                pipe.cond_fn = None
            out = pipe.run(
                batch, steps=int(steps), strength=float(strength),
                pos_prompt=pos_prompt, neg_prompt=neg_prompt,
                cfg_scale=float(cfg_scale), sampler_type=sampler, seed=int(seed),
                noise_aug=int(noise_aug), rescale_cfg=bool(rescale_cfg),
                start_point_type=start_point_type,
                cleaner_tiled=bool(cleaner_tiled),
                cleaner_tile_size=int(cleaner_tile_size),
                cleaner_tile_stride=int(cleaner_tile_stride),
                vae_encoder_tiled=bool(vae_encoder_tiled),
                vae_encoder_tile_size=int(vae_encoder_tile_size),
                vae_decoder_tiled=bool(vae_decoder_tiled),
                vae_decoder_tile_size=int(vae_decoder_tile_size),
                cldm_tiled=bool(cldm_tiled),
                cldm_tile_size=int(cldm_tile_size),
                cldm_tile_stride=int(cldm_tile_stride),
                s_churn=float(s_churn), s_tmin=float(s_tmin), s_tmax=float(s_tmax),
                s_noise=float(s_noise), order=int(order), eta=float(eta),
            )
        return out[0]

    process.tasks = list(pipelines)
    return process


def run_gradio(process, port):
    import gradio as gr

    with gr.Blocks() as app:
        gr.Markdown("# diffbir_tpu — blind image restoration")
        with gr.Row():
            with gr.Column():
                inp = gr.Image(type="numpy", label="input")
                btn = gr.Button("restore")
                with gr.Accordion("Basic Options", open=True):
                    with gr.Row():
                        task = gr.Dropdown(
                            choices=process.tasks, value=process.tasks[0],
                            label="task"
                        )
                        upscale = gr.Slider(1, 8, value=4, step=1, label="upscale")
                    with gr.Row():
                        with gr.Column():
                            cleaner_tiled = gr.Checkbox(value=False, label="cleaner tiled")
                            cleaner_tile_size = gr.Slider(256, 1024, value=512, step=64, label="cleaner tile size")
                        with gr.Column():
                            vae_encoder_tiled = gr.Checkbox(value=False, label="VAE encoder tiled")
                            vae_encoder_tile_size = gr.Slider(128, 1024, value=256, step=8, label="VAE encoder tile size")
                    with gr.Row():
                        with gr.Column():
                            vae_decoder_tiled = gr.Checkbox(value=False, label="VAE decoder tiled")
                            vae_decoder_tile_size = gr.Slider(128, 1024, value=256, step=8, label="VAE decoder tile size")
                        with gr.Column():
                            cldm_tiled = gr.Checkbox(value=False, label="diffusion tiled")
                            cldm_tile_size = gr.Slider(512, 1024, value=512, step=64, label="diffusion tile size")
                    seed = gr.Number(value=231, label="seed")
                with gr.Accordion("Condition Options", open=True):
                    pos = gr.Textbox(label="positive prompt")
                    neg = gr.Textbox(value=DEFAULT_NEG, label="negative prompt")
                    cfg = gr.Slider(1.0, 15.0, value=6.0, label="cfg scale")
                    rescale_cfg = gr.Checkbox(value=False, label="gradually increase cfg scale")
                    with gr.Row():
                        strength = gr.Slider(0.0, 1.5, value=1.0, label="control strength")
                        noise_aug = gr.Slider(0, 300, value=0, step=1, label="noise aug")
                    start_point = gr.Dropdown(choices=["noise", "cond"], value="noise", label="start point")
                with gr.Accordion("Guidance Options", open=False):
                    guidance = gr.Checkbox(value=False, label="restoration guidance")
                    g_loss = gr.Dropdown(choices=["mse", "w_mse"], value="w_mse", label="loss")
                    g_scale = gr.Slider(0.0, 10.0, value=0.0, label="scale")
                    g_space = gr.Dropdown(choices=["latent", "rgb"], value="latent", label="space")
                    g_start = gr.Slider(-1, 1001, value=1001, step=1, label="t start")
                    g_stop = gr.Slider(-1, 1001, value=-1, step=1, label="t stop")
                with gr.Accordion("Sampler Options", open=True):
                    steps = gr.Slider(1, 100, value=10, step=1, label="steps")
                    sampler = gr.Dropdown(choices=SAMPLERS, value="edm_dpm++_3m_sde", label="sampler")
                    s_churn = gr.Slider(0, 40, value=0, label="s_churn")
                    s_tmin = gr.Slider(0, 300, value=0, label="s_tmin")
                    s_tmax = gr.Slider(0, 1000, value=300, label="s_tmax")
                    s_noise = gr.Slider(1.0, 1.1, value=1.0, label="s_noise")
                    eta = gr.Slider(0.0, 1.0, value=1.0, label="eta")
                    order = gr.Slider(1, 8, value=1, step=1, label="order (lms)")
            with gr.Column():
                out = gr.Image(type="numpy", label="restored")
                status = gr.Textbox(label="status")

        def safe_process(
            image, task, upscale, steps, cfg, pos, neg, seed, sampler, strength,
            noise_aug, rescale_cfg, start_point, cleaner_tiled, cleaner_tile_size,
            vae_encoder_tiled, vae_encoder_tile_size, vae_decoder_tiled,
            vae_decoder_tile_size, cldm_tiled, cldm_tile_size, guidance, g_loss,
            g_scale, g_space, g_start, g_stop, s_churn, s_tmin, s_tmax, s_noise,
            eta, order,
        ):
            try:
                res = process(
                    image, task=task, upscale=upscale, steps=int(steps),
                    cfg_scale=float(cfg), pos_prompt=pos, neg_prompt=neg,
                    seed=int(seed), sampler=sampler, strength=float(strength),
                    noise_aug=int(noise_aug), rescale_cfg=bool(rescale_cfg),
                    start_point_type=start_point,
                    cleaner_tiled=bool(cleaner_tiled),
                    cleaner_tile_size=int(cleaner_tile_size),
                    vae_encoder_tiled=bool(vae_encoder_tiled),
                    vae_encoder_tile_size=int(vae_encoder_tile_size),
                    vae_decoder_tiled=bool(vae_decoder_tiled),
                    vae_decoder_tile_size=int(vae_decoder_tile_size),
                    cldm_tiled=bool(cldm_tiled),
                    cldm_tile_size=int(cldm_tile_size),
                    guidance=bool(guidance), g_loss=g_loss, g_scale=float(g_scale),
                    g_space=g_space, g_start=int(g_start), g_stop=int(g_stop),
                    s_churn=float(s_churn), s_tmin=float(s_tmin),
                    s_tmax=float(s_tmax), s_noise=float(s_noise),
                    eta=float(eta), order=int(order),
                )
                return res, "success"
            except Exception as e:  # error-image fallback (ref :190-191)
                traceback.print_exc()
                return np.zeros((128, 128, 3), np.uint8), f"error: {e}"

        btn.click(
            safe_process,
            [inp, task, upscale, steps, cfg, pos, neg, seed, sampler, strength,
             noise_aug, rescale_cfg, start_point, cleaner_tiled,
             cleaner_tile_size, vae_encoder_tiled, vae_encoder_tile_size,
             vae_decoder_tiled, vae_decoder_tile_size, cldm_tiled,
             cldm_tile_size, guidance, g_loss, g_scale, g_space, g_start,
             g_stop, s_churn, s_tmin, s_tmax, s_noise, eta, order],
            [out, status],
        )
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
                Image.open(io.BytesIO(base64.b64decode(req.pop("image")))).convert("RGB")
            )
            # ignore unknown keys (older clients may send extra fields)
            import inspect

            known = set(inspect.signature(type(self).process).parameters) - {"image"}
            out = type(self).process(img, **{k: v for k, v in req.items() if k in known})
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
    ap.add_argument("--version", default="v2.1", choices=["v1", "v2", "v2.1"])
    ap.add_argument("--tasks", default="sr,face", help="comma list: sr,face")
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
