"""Convert a diffusers-format SD2.1 checkpoint to original-SD key layout.

Behavioral parity target: /root/reference/scripts/convert_diffusers_to_sd.py
(key remap for UNet / VAE / text encoder). The output .pth (or .safetensors)
uses the ``model.diffusion_model`` / ``first_stage_model`` /
``cond_stage_model.model`` prefixes that diffbir_tpu's weight loader consumes.

Usage:
  python scripts/convert_diffusers_to_sd.py --model_path <diffusers_dir> \
      --checkpoint_path out.pth [--half]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import os
import sys

import numpy as np

# ---------------------------------------------------------------------- #
# UNet
# ---------------------------------------------------------------------- #
_RES_MAP = [
    ("norm1", "in_layers.0"), ("conv1", "in_layers.2"),
    ("norm2", "out_layers.0"), ("conv2", "out_layers.3"),
    ("time_emb_proj", "emb_layers.1"), ("conv_shortcut", "skip_connection"),
]


def _res(k: str) -> str:
    for a, b in _RES_MAP:
        k = k.replace(a, b)
    return k


def convert_unet(sd: dict) -> dict:
    out = {}
    n_res = 2
    per_level = n_res + 1
    for k, v in sd.items():
        nk = None
        if k.startswith("time_embedding.linear_1"):
            nk = k.replace("time_embedding.linear_1", "time_embed.0")
        elif k.startswith("time_embedding.linear_2"):
            nk = k.replace("time_embedding.linear_2", "time_embed.2")
        elif k.startswith("conv_in"):
            nk = k.replace("conv_in", "input_blocks.0.0")
        elif k.startswith("conv_norm_out"):
            nk = k.replace("conv_norm_out", "out.0")
        elif k.startswith("conv_out"):
            nk = k.replace("conv_out", "out.2")
        elif k.startswith("down_blocks."):
            parts = k.split(".")
            i = int(parts[1])
            if parts[2] == "resnets":
                j = int(parts[3])
                idx = 1 + i * per_level + j
                nk = f"input_blocks.{idx}.0." + _res(".".join(parts[4:]))
            elif parts[2] == "attentions":
                j = int(parts[3])
                idx = 1 + i * per_level + j
                nk = f"input_blocks.{idx}.1." + ".".join(parts[4:])
            elif parts[2] == "downsamplers":
                idx = 1 + (i + 1) * per_level - 1
                nk = f"input_blocks.{idx}.0.op." + parts[-1]
        elif k.startswith("mid_block."):
            parts = k.split(".")
            if parts[1] == "resnets":
                nk = f"middle_block.{0 if parts[2] == '0' else 2}." + _res(".".join(parts[3:]))
            elif parts[1] == "attentions":
                nk = "middle_block.1." + ".".join(parts[3:])
        elif k.startswith("up_blocks."):
            parts = k.split(".")
            i = int(parts[1])
            per_up = n_res + 2  # 3 resnets per up level in SD
            if parts[2] == "resnets":
                j = int(parts[3])
                idx = i * per_up + j
                nk = f"output_blocks.{idx}.0." + _res(".".join(parts[4:]))
            elif parts[2] == "attentions":
                j = int(parts[3])
                idx = i * per_up + j
                nk = f"output_blocks.{idx}.1." + ".".join(parts[4:])
            elif parts[2] == "upsamplers":
                idx = i * per_up + (per_up - 1)
                # attention levels use slot 2, non-attention slot 1
                nk = f"output_blocks.{idx}.__UPSAMPLE__.conv." + parts[-1]
        if nk is None:
            continue
        out["model.diffusion_model." + nk] = v
    # fix upsample slot: slot 2 if an attention exists at that block else 1
    fixed = {}
    for k, v in out.items():
        if "__UPSAMPLE__" in k:
            prefix = k.split(".__UPSAMPLE__")[0]
            has_attn = any(x.startswith(prefix + ".1.") for x in out)
            fixed[k.replace("__UPSAMPLE__", "2" if has_attn else "1")] = v
        else:
            fixed[k] = v
    return fixed


# ---------------------------------------------------------------------- #
# VAE
# ---------------------------------------------------------------------- #
def convert_vae(sd: dict, n_levels: int = 4) -> dict:
    out = {}
    for k, v in sd.items():
        nk = k
        nk = nk.replace("mid_block.resnets.0", "mid.block_1")
        nk = nk.replace("mid_block.resnets.1", "mid.block_2")
        nk = nk.replace("mid_block.attentions.0", "mid.attn_1")
        for i in range(n_levels):
            nk = nk.replace(f"encoder.down_blocks.{i}.resnets", f"encoder.down.{i}.block")
            nk = nk.replace(
                f"encoder.down_blocks.{i}.downsamplers.0.conv",
                f"encoder.down.{i}.downsample.conv",
            )
            # decoder up order is reversed between diffusers and SD
            nk = nk.replace(
                f"decoder.up_blocks.{i}.resnets", f"decoder.up.{n_levels - 1 - i}.block"
            )
            nk = nk.replace(
                f"decoder.up_blocks.{i}.upsamplers.0.conv",
                f"decoder.up.{n_levels - 1 - i}.upsample.conv",
            )
        nk = nk.replace("conv_norm_out", "norm_out")
        # attention projections
        nk = nk.replace(".to_q.", ".q.").replace(".to_k.", ".k.")
        nk = nk.replace(".to_v.", ".v.").replace(".to_out.0.", ".proj_out.")
        nk = nk.replace("group_norm", "norm")
        if any(f".{p}.weight" in nk for p in ("q", "k", "v", "proj_out")) and v.ndim == 2:
            v = v[:, :, None, None]  # linear -> 1x1 conv
        out["first_stage_model." + nk] = v
    return out


# ---------------------------------------------------------------------- #
# text encoder
# ---------------------------------------------------------------------- #
def convert_text_encoder(sd: dict) -> dict:
    import torch

    out = {}
    qkv = {}
    for k, v in sd.items():
        if not k.startswith("text_model."):
            continue
        k2 = k[len("text_model."):]
        if k2.startswith("embeddings.token_embedding"):
            out["cond_stage_model.model.token_embedding." + k2.split(".")[-1]] = v
        elif k2.startswith("embeddings.position_embedding"):
            out["cond_stage_model.model.positional_embedding"] = v
        elif k2.startswith("final_layer_norm"):
            out[k2.replace("final_layer_norm", "cond_stage_model.model.ln_final")] = v
        elif ".self_attn." in k2:
            parts = k2.split(".")
            i = parts[2]
            which = parts[4]  # q_proj / k_proj / v_proj / out_proj
            kind = parts[5]
            if which == "out_proj":
                out[f"cond_stage_model.model.transformer.resblocks.{i}.attn.out_proj.{kind}"] = v
            else:
                qkv.setdefault((i, kind), {})[which] = v
        elif ".layer_norm1." in k2 or ".layer_norm2." in k2:
            parts = k2.split(".")
            i = parts[2]
            ln = "ln_1" if "layer_norm1" in k2 else "ln_2"
            out[f"cond_stage_model.model.transformer.resblocks.{i}.{ln}.{parts[-1]}"] = v
        elif ".mlp.fc1." in k2 or ".mlp.fc2." in k2:
            parts = k2.split(".")
            i = parts[2]
            fc = "c_fc" if "fc1" in k2 else "c_proj"
            out[f"cond_stage_model.model.transformer.resblocks.{i}.mlp.{fc}.{parts[-1]}"] = v
    for (i, kind), d in qkv.items():
        packed = torch.cat([d["q_proj"], d["k_proj"], d["v_proj"]], dim=0)
        name = "in_proj_weight" if kind == "weight" else "in_proj_bias"
        out[f"cond_stage_model.model.transformer.resblocks.{i}.attn.{name}"] = packed
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", required=True, help="diffusers model dir")
    ap.add_argument("--checkpoint_path", required=True)
    ap.add_argument("--half", action="store_true")
    args = ap.parse_args()

    import torch
    from safetensors.torch import load_file

    def load_component(sub):
        d = os.path.join(args.model_path, sub)
        for fname in ("diffusion_pytorch_model.safetensors", "model.safetensors"):
            p = os.path.join(d, fname)
            if os.path.exists(p):
                return load_file(p)
        for fname in ("diffusion_pytorch_model.bin", "pytorch_model.bin"):
            p = os.path.join(d, fname)
            if os.path.exists(p):
                return torch.load(p, map_location="cpu")
        raise FileNotFoundError(f"no weights found under {d}")

    sd = {}
    sd.update(convert_unet(load_component("unet")))
    sd.update(convert_vae(load_component("vae")))
    sd.update(convert_text_encoder(load_component("text_encoder")))
    if args.half:
        sd = {k: v.half() for k, v in sd.items()}
    torch.save({"state_dict": sd}, args.checkpoint_path)
    print(f"wrote {len(sd)} tensors to {args.checkpoint_path}")


if __name__ == "__main__":
    main()
