"""diffbir_tpu inference CLI.

Behavioral parity target: /root/reference/inference.py:55-305 — same task /
version / sampler / tiling / guidance flag surface, adapted to TPU:
``--device`` selects the jax platform and ``--precision`` maps fp16 -> bf16.
"""

import os
from argparse import ArgumentParser, Namespace

DEFAULT_POS_PROMPT = (
    "Cinematic, High Contrast, highly detailed, taken using a Canon EOS R camera, "
    "hyper detailed photo - realistic maximum detail, 32k, Color Grading, ultra HD, "
    "extreme meticulous detailing, skin pore detailing, hyper sharpness, perfect "
    "without deformations."
)

DEFAULT_NEG_PROMPT = (
    "painting, oil painting, illustration, drawing, art, sketch, oil painting, "
    "cartoon, CG Style, 3D render, unreal engine, blurring, dirty, messy, worst "
    "quality, low quality, frames, watermark, signature, jpeg artifacts, deformed, "
    "lowres, over-smooth."
)

SAMPLER_CHOICES = [
    # reference CLI surface (inference.py:89-108) ...
    "dpm++_m2", "spaced", "ddim",
    "edm_euler", "edm_euler_a", "edm_heun", "edm_dpm_2", "edm_dpm_2_a",
    "edm_lms", "edm_dpm++_2s_a", "edm_dpm++_sde", "edm_dpm++_2m",
    "edm_dpm++_2m_sde", "edm_dpm++_3m_sde",
    # ... plus extras this stack supports. edm_dpm_adaptive runs its PID
    # step-size controller as a lax.while_loop inside the jitted pipeline
    # (sampler/edm.py::_solve_dpm_adaptive_traced); --steps only sets the
    # sigma range, the controller picks the actual step count.
    "dpm++_m1", "dpm++_m3", "dpm++_s2", "dpm++_s3", "dpm_m2", "dpm_m3",
    "edm_dpm_fast", "edm_dpm_adaptive",
]


def parse_args() -> Namespace:
    p = ArgumentParser()
    # model
    p.add_argument("--task", type=str, required=True,
                   choices=["sr", "face", "denoise", "unaligned_face"])
    p.add_argument("--upscale", type=float, default=1.0)
    p.add_argument("--version", type=str, default="v2.1",
                   choices=["v1", "v2", "v2.1", "custom"])
    p.add_argument("--train_cfg", type=str, default="",
                   help="training config path (version=custom)")
    p.add_argument("--ckpt", type=str, default="",
                   help="checkpoint path (version=custom)")
    # sampling
    p.add_argument("--sampler", type=str, default="edm_dpm++_3m_sde",
                   choices=SAMPLER_CHOICES)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--start_point_type", type=str, default="noise",
                   choices=["noise", "cond"])
    p.add_argument("--cleaner_tiled", action="store_true")
    p.add_argument("--cleaner_tile_size", type=int, default=512)
    p.add_argument("--cleaner_tile_stride", type=int, default=256)
    p.add_argument("--vae_encoder_tiled", action="store_true")
    p.add_argument("--vae_encoder_tile_size", type=int, default=256)
    p.add_argument("--vae_decoder_tiled", action="store_true")
    p.add_argument("--vae_decoder_tile_size", type=int, default=256)
    p.add_argument("--vae_tile_mode", type=str, default="blend",
                   choices=["blend", "sync_gn"],
                   help="tiled-VAE mode: Gaussian blending (bounded memory) "
                        "or cross-tile GroupNorm sync (seam-free)")
    p.add_argument("--cldm_tiled", action="store_true")
    p.add_argument("--cldm_tile_size", type=int, default=512)
    p.add_argument("--cldm_tile_stride", type=int, default=256)
    p.add_argument("--size_bucket", type=int, default=0,
                   help="pad inputs (reflect) up to multiples of this many "
                   "pixels before the cleaner and crop the output back — "
                   "bounds the number of distinct XLA programs when serving "
                   "arbitrary resolutions (TPU static-shape bucketing); 0 "
                   "preserves the reference's exact x64 padding")
    p.add_argument("--cldm_tiles_per_batch", type=int, default=1,
                   help="diffusion tiles batched per model call (MXU "
                        "utilization knob for the tiled path)")
    p.add_argument("--captioner", type=str, default="none",
                   choices=["none", "llava", "ram"])
    p.add_argument("--pos_prompt", type=str, default=DEFAULT_POS_PROMPT)
    p.add_argument("--neg_prompt", type=str, default=DEFAULT_NEG_PROMPT)
    p.add_argument("--cfg_scale", type=float, default=6.0)
    p.add_argument("--rescale_cfg", action="store_true")
    p.add_argument("--noise_aug", type=int, default=0)
    p.add_argument("--s_churn", type=float, default=0.0)
    p.add_argument("--s_tmin", type=float, default=0.0)
    p.add_argument("--s_tmax", type=float, default=300.0)
    p.add_argument("--s_noise", type=float, default=1.0)
    p.add_argument("--eta", type=float, default=1.0)
    p.add_argument("--order", type=int, default=4,
                   help="order of the edm_lms solver")
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--turbo_encoder", action="store_true",
                   help="with --control_interval>1, also cache the UNet "
                        "encoder between refreshes (encoder propagation)")
    p.add_argument("--control_interval", type=int, default=1,
                   help="turbo: recompute ControlNet residuals every k steps "
                        "(k>1 trades a little fidelity for speed; spaced/ddim/"
                        "edm_dpm++_3m_sde/edm_dpm++_2m_sde/edm_euler_a samplers)")
    p.add_argument("--batch_size", type=int, default=1)
    # guidance
    p.add_argument("--guidance", action="store_true")
    p.add_argument("--g_loss", type=str, default="w_mse", choices=["mse", "w_mse"])
    p.add_argument("--g_scale", type=float, default=0.0)
    p.add_argument("--g_start", type=int, default=1001)
    p.add_argument("--g_stop", type=int, default=-1)
    p.add_argument("--g_space", type=str, default="latent", choices=["latent", "rgb"])
    p.add_argument("--g_repeat", type=int, default=1)
    # io
    p.add_argument("--input", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--n_samples", type=int, default=1)
    p.add_argument("--seed", type=int, default=231)
    # platform
    p.add_argument("--device", type=str, default="auto",
                   choices=["auto", "tpu", "cpu"])
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["fp32", "fp16", "bf16"])
    p.add_argument("--quant_dense", action="store_true",
                   help="int8 weight-only UNet/ControlNet dense sites "
                        "(serving mode; ~half the dense weight HBM traffic, "
                        "quality delta measured in QUANT_QUALITY.json)")
    p.add_argument("--fused_resblock", action="store_true",
                   help="Pallas fused-ResBlock serving mode: each UNet/"
                        "ControlNet ResBlock runs as one kernel with the "
                        "activation pinned in VMEM")
    p.add_argument("--quant_conv", action="store_true",
                   help="int8 ResBlock conv weights inside the fused kernel "
                        "(requires --fused_resblock; halves conv weight HBM "
                        "traffic and brings the 2560-in decoder sites under "
                        "the VMEM budget)")
    p.add_argument("--llava_bit", type=str, default="4", choices=["16", "8", "4"])
    p.add_argument("--fused_ffn", action="store_true",
                   help="Pallas fused GEGLU-MLP serving mode: each "
                        "transformer FFN runs as one kernel with the (N,8d) "
                        "intermediates pinned in VMEM (ops/fused_ffn.py; "
                        "opt-in until the on-chip step A/B proves it)")
    p.add_argument("--fast_gelu", action="store_true",
                   help="tanh-approximate GELU in the transformer FFNs "
                        "(exact erf is 1.67 ms of the 26.4 ms denoise step "
                        "on v5e — VPU transcendental-bound; drift is at the "
                        "bf16 rounding scale, measured in TURBO_QUALITY)")
    return p.parse_args()


def apply_serving_env(args) -> None:
    """Translate opt-in serving flags that dispatch via env (read at trace
    time) into the environment before any model is traced."""
    import os

    if getattr(args, "fused_ffn", False):
        os.environ["DIFFBIR_TPU_FUSED_FFN"] = "1"
    if getattr(args, "fast_gelu", False):
        os.environ["DIFFBIR_TPU_FAST_GELU"] = "1"


def main():
    args = parse_args()
    apply_serving_env(args)
    if args.device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from diffbir_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    from diffbir_tpu.inference import (
        BFRInferenceLoop,
        BIDInferenceLoop,
        BSRInferenceLoop,
        CustomInferenceLoop,
        UnAlignedBFRInferenceLoop,
    )

    if args.version == "custom":
        loop = CustomInferenceLoop(args)
    else:
        loop = {
            "sr": BSRInferenceLoop,
            "face": BFRInferenceLoop,
            "denoise": BIDInferenceLoop,
            "unaligned_face": UnAlignedBFRInferenceLoop,
        }[args.task](args)
    loop.run()
    print(f"done! results saved to {args.output}")


if __name__ == "__main__":
    main()
