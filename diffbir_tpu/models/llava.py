"""LLaVA-1.5 on TPU: CLIP-ViT-L vision tower + MLP projector + Llama decode.

Behavioral parity target: the reference's vendored LLaVA-v1.5 stack
(/root/reference/llava/model/builder.py:26-80 loads llava-v1.5-7b 4/8-bit
via bitsandbytes; diffbir/utils/caption.py:99-149 drives greedy generation).

TPU-first redesign (SURVEY.md §2.10 bitsandbytes row):
- functional param-dict forward (no torch, no HF generate): the language
  model's big linears run through the int8 weight-only Pallas matmul
  (ops/quant_matmul.py) — decoding is weight-bandwidth-bound, so int8
  halves HBM traffic per token vs bf16;
- greedy decode is ONE ``lax.scan`` over a static max_new_tokens with a
  preallocated KV cache (static shapes; EOS handled by masking);
- the vision tower + projector + prompt prefill run as a single jitted
  forward.

Weight layout follows HF ``llava-hf/llava-1.5-7b-hf`` key names (see
``load_llava_params``); parity tests vs HF transformers are weights-gated.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.quant_matmul import quant_matmul, quantize_weight

Params = Any


# --------------------------------------------------------------------------- #
# configs
# --------------------------------------------------------------------------- #
@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    ffn_dim: int = 11008
    vocab_size: int = 32000
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 1024

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads

    @classmethod
    def tiny(cls) -> "LlamaConfig":
        return cls(dim=64, n_layers=2, n_heads=4, ffn_dim=128, vocab_size=256,
                   max_seq_len=64)


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 336
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    mlp_dim: int = 4096
    norm_eps: float = 1e-5

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def tiny(cls) -> "ClipVisionConfig":
        return cls(image_size=28, patch_size=14, width=32, layers=2, heads=4,
                   mlp_dim=64)


# --------------------------------------------------------------------------- #
# primitives (functional; params are plain dicts)
# --------------------------------------------------------------------------- #
def _linear(p: Dict, x: jax.Array) -> jax.Array:
    """Dense layer; quantized when the param dict holds {w_q, scale} (int8)
    or {w_q4, scale_g} (packed int4, per-group scales)."""
    if "w_q4" in p:
        from ..ops.quant_matmul import quant_matmul_int4

        y = quant_matmul_int4(x, p["w_q4"], p["scale_g"])
    elif "w_q" in p:
        y = quant_matmul(x, p["w_q"], p["scale"])
    else:
        y = jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32).astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"]
    return y


def _rms_norm(w: jax.Array, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _layer_norm(p: Dict, x: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]).astype(
        x.dtype
    )


def _rope(x: jax.Array, positions: jax.Array, theta: float) -> jax.Array:
    """Rotary embedding, HF llama convention (rotate_half over dim/2 split).

    x: [B, T, H, Dh]; positions: [T].
    """
    dh = x.shape[-1]
    inv = 1.0 / (theta ** (jnp.arange(0, dh, 2, dtype=jnp.float32) / dh))
    ang = positions.astype(jnp.float32)[:, None] * inv  # [T, Dh/2]
    # HF llama: freqs are CONCATENATED (not interleaved): [ang, ang]
    cos = jnp.cos(jnp.concatenate([ang, ang], axis=-1))  # [T, Dh]
    sin = jnp.sin(jnp.concatenate([ang, ang], axis=-1))
    cos = cos[None, :, None, :]  # -> [1, T, 1, Dh]
    sin = sin[None, :, None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rotated.astype(jnp.float32) * sin).astype(
        x.dtype
    )


def _attention(q, k, v, mask) -> jax.Array:
    """q [B,Tq,H,Dh], k/v [B,Tk,H,Dh], mask [Tq,Tk] additive or None.

    Delegates to the shared dispatching attention op (fp32 logits/softmax,
    flash kernel when shapes qualify) instead of a private einsum copy."""
    from ..ops.attention import attention

    bias = mask[None, None] if mask is not None else None
    return attention(q, k, v, bias=bias)


# --------------------------------------------------------------------------- #
# Llama decoder
# --------------------------------------------------------------------------- #
def llama_block(p: Dict, cfg: LlamaConfig, x, positions, kv, mask):
    """One decoder layer. kv: None (prefill, returns full k/v) or
    (k_cache [B,S,H,Dh], v_cache, write_pos scalar) for cached decode."""
    b, t, _ = x.shape
    h = _rms_norm(p["input_layernorm"]["weight"], x, cfg.norm_eps)
    q = _linear(p["self_attn"]["q_proj"], h).reshape(b, t, cfg.n_heads, cfg.head_dim)
    k = _linear(p["self_attn"]["k_proj"], h).reshape(b, t, cfg.n_heads, cfg.head_dim)
    v = _linear(p["self_attn"]["v_proj"], h).reshape(b, t, cfg.n_heads, cfg.head_dim)
    q = _rope(q, positions, cfg.rope_theta)
    k = _rope(k, positions, cfg.rope_theta)
    if kv is None:
        k_all, v_all = k, v
        new_kv = (k, v)
    else:
        k_cache, v_cache, pos = kv
        k_all = jax.lax.dynamic_update_slice(k_cache, k, (0, pos, 0, 0))
        v_all = jax.lax.dynamic_update_slice(v_cache, v, (0, pos, 0, 0))
        new_kv = (k_all, v_all)
    att = _attention(q, k_all, v_all, mask).reshape(b, t, cfg.dim)
    x = x + _linear(p["self_attn"]["o_proj"], att)
    h = _rms_norm(p["post_attention_layernorm"]["weight"], x, cfg.norm_eps)
    gate = jax.nn.silu(_linear(p["mlp"]["gate_proj"], h))
    up = _linear(p["mlp"]["up_proj"], h)
    x = x + _linear(p["mlp"]["down_proj"], gate * up)
    return x, new_kv


def llama_prefill(p: Dict, cfg: LlamaConfig, embeds: jax.Array, cache_len: int):
    """embeds [B, T, D] -> (last-token logits [B, V], kv caches padded to
    cache_len). Causal mask over the prompt."""
    b, t, _ = embeds.shape
    positions = jnp.arange(t)
    causal = jnp.where(
        jnp.arange(t)[:, None] >= jnp.arange(t)[None, :], 0.0, -1e9
    ).astype(jnp.float32)
    x = embeds
    caches = []
    for li in range(cfg.n_layers):
        x, (k, v) = llama_block(p["layers"][li], cfg, x, positions, None, causal)
        pad = cache_len - t
        caches.append(
            (
                jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))),
                jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))),
            )
        )
    x = _rms_norm(p["norm"]["weight"], x, cfg.norm_eps)
    logits = _linear(p["lm_head"], x[:, -1])
    return logits, caches


def llama_decode_step(p: Dict, cfg: LlamaConfig, token: jax.Array, pos, caches):
    """token [B] int32 at absolute position pos; returns (logits, caches)."""
    x = jnp.take(p["embed_tokens"]["weight"], token, axis=0)[:, None, :]
    positions = pos[None] if pos.ndim == 0 else pos
    # mask future cache slots (cache is padded to cache_len)
    s = caches[0][0].shape[1]
    mask = jnp.where(jnp.arange(s)[None, :] <= pos, 0.0, -1e9).astype(jnp.float32)
    new_caches = []
    for li in range(cfg.n_layers):
        k_cache, v_cache = caches[li]
        x, (k2, v2) = llama_block(
            p["layers"][li], cfg, x, positions, (k_cache, v_cache, pos), mask
        )
        new_caches.append((k2, v2))
    x = _rms_norm(p["norm"]["weight"], x, cfg.norm_eps)
    return _linear(p["lm_head"], x[:, 0]), new_caches


def greedy_decode(
    p: Dict, cfg: LlamaConfig, prompt_embeds: jax.Array,
    max_new_tokens: int, eos_id: int,
) -> jax.Array:
    """Prefill + scan of cached decode steps. Returns [B, max_new_tokens]
    int32 (eos-padded with eos_id after the first EOS)."""
    b, t0, _ = prompt_embeds.shape
    cache_len = t0 + max_new_tokens
    logits, caches = llama_prefill(p, cfg, prompt_embeds, cache_len)
    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def body(carry, i):
        token, pos, caches, done = carry
        out_token = jnp.where(done, eos_id, token)
        logits, caches = llama_decode_step(p, cfg, token, pos, caches)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        done = done | (token == eos_id)
        return (nxt, pos + 1, caches, done), out_token

    init = (first, jnp.asarray(t0, jnp.int32), caches,
            jnp.zeros((b,), jnp.bool_))
    _, tokens = jax.lax.scan(body, init, jnp.arange(max_new_tokens))
    return jnp.moveaxis(tokens, 0, 1)  # [B, T_new]


# --------------------------------------------------------------------------- #
# CLIP ViT-L vision tower (HF CLIPVisionModel layout)
# --------------------------------------------------------------------------- #
def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_vision_features(
    p: Dict, cfg: ClipVisionConfig, images: jax.Array, select_layer: int = -2
) -> jax.Array:
    """images [B, S, S, 3] (CLIP-normalized) -> patch features [B, P, W]
    from the ``select_layer`` hidden state, CLS dropped (LLaVA's
    select_feature='patch', vendored clip_encoder.py semantics)."""
    b = images.shape[0]
    emb = p["embeddings"]
    patches = jax.lax.conv_general_dilated(
        images, emb["patch_embedding"]["kernel"],
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(b, -1, cfg.width)
    cls = jnp.broadcast_to(emb["class_embedding"], (b, 1, cfg.width))
    x = jnp.concatenate([cls, patches], axis=1)
    x = x + emb["position_embedding"]["weight"][None]
    x = _layer_norm(p["pre_layrnorm"], x, cfg.norm_eps)
    n_keep = cfg.layers + select_layer + 1 if select_layer < 0 else select_layer
    for li in range(n_keep):
        lp = p["layers"][li]
        h = _layer_norm(lp["layer_norm1"], x, cfg.norm_eps)
        t = h.shape[1]
        q = _linear(lp["self_attn"]["q_proj"], h).reshape(b, t, cfg.heads, -1)
        k = _linear(lp["self_attn"]["k_proj"], h).reshape(b, t, cfg.heads, -1)
        v = _linear(lp["self_attn"]["v_proj"], h).reshape(b, t, cfg.heads, -1)
        att = _attention(q, k, v, None).reshape(b, t, cfg.width)
        x = x + _linear(lp["self_attn"]["out_proj"], att)
        h = _layer_norm(lp["layer_norm2"], x, cfg.norm_eps)
        h = _quick_gelu(_linear(lp["mlp"]["fc1"], h))
        x = x + _linear(lp["mlp"]["fc2"], h)
    return x[:, 1:]  # drop CLS


def project_image_features(p: Dict, feats: jax.Array) -> jax.Array:
    """mm projector: linear -> gelu -> linear (HF multi_modal_projector)."""
    h = jax.nn.gelu(_linear(p["linear_1"], feats), approximate=False)
    return _linear(p["linear_2"], h)


# --------------------------------------------------------------------------- #
# init (tests) / quantization / weight loading
# --------------------------------------------------------------------------- #
def init_llama_params(rng: np.random.Generator, cfg: LlamaConfig) -> Dict:
    """Random-init params as HOST numpy arrays. jit/device_put moves them on
    demand; keeping them off-device matters at 7B scale, where the fp32 tree
    (~26 GB) must live on the 125 GB host, not the 16 GB v5e HBM
    (scripts/bench_llava.py synthetic mode)."""
    def lin(k_in, k_out, bias=False):
        # divide BEFORE the cast: f32_array / np.float64_scalar promotes the
        # whole kernel to float64 under NEP 50 — at 7B that silently doubled
        # the host tree to ~52 GB and defeated the bench's bf16 cast
        # (dtype==float32 miss -> 24.86 GB of f32 args on a 15.75 GB chip,
        # the r5 bf16-variant compile OOM)
        d = {"kernel": (
            rng.standard_normal((k_in, k_out)) / np.sqrt(k_in)
        ).astype(np.float32)}
        if bias:
            d["bias"] = np.zeros((k_out,), np.float32)
        return d

    layers = []
    for _ in range(cfg.n_layers):
        layers.append({
            "input_layernorm": {"weight": np.ones((cfg.dim,), np.float32)},
            "post_attention_layernorm": {"weight": np.ones((cfg.dim,), np.float32)},
            "self_attn": {
                "q_proj": lin(cfg.dim, cfg.dim), "k_proj": lin(cfg.dim, cfg.dim),
                "v_proj": lin(cfg.dim, cfg.dim), "o_proj": lin(cfg.dim, cfg.dim),
            },
            "mlp": {
                "gate_proj": lin(cfg.dim, cfg.ffn_dim),
                "up_proj": lin(cfg.dim, cfg.ffn_dim),
                "down_proj": lin(cfg.ffn_dim, cfg.dim),
            },
        })
    return {
        "embed_tokens": {"weight": (
            rng.standard_normal((cfg.vocab_size, cfg.dim)).astype(np.float32) * 0.02
        )},
        "layers": layers,
        "norm": {"weight": np.ones((cfg.dim,), np.float32)},
        "lm_head": lin(cfg.dim, cfg.vocab_size),
    }


# lm_head is NOT quantized: bitsandbytes' load_in_8bit (the reference LLaVA
# builder) auto-skips it (llm_int8_skip_modules=["lm_head"]) because logit
# perturbation flips near-tie greedy tokens; match that.
_QUANT_KEYS = ("q_proj", "k_proj", "v_proj", "o_proj",
               "gate_proj", "up_proj", "down_proj")


def quantize_llama_params(params: Dict, bits: int = 8, host: bool = False) -> Dict:
    """Replace the big linears' fp weights with quantized forms:
    bits=8 -> {w_q int8, scale fp32} (the bitsandbytes-8bit equivalent);
    bits=4 -> {w_q4 packed int8, scale_g fp32 [K/group, N]} (the reference's
    DEFAULT 4-bit load, llava/model/builder.py:32-41). Embed/norms stay fp.
    ``host=True`` quantizes with the bit-identical numpy twins, keeping 7B
    trees off the 16 GB device (scripts/bench_llava.py)."""
    from ..ops.quant_matmul import (
        INT4_WINDOW,
        quantize_weight_int4,
        quantize_weight_int4_np,
        quantize_weight_np,
    )

    assert bits in (4, 8), bits
    q8 = quantize_weight_np if host else quantize_weight
    q4 = quantize_weight_int4_np if host else quantize_weight_int4

    def walk(tree, name=""):
        if isinstance(tree, dict):
            if "kernel" in tree and name in _QUANT_KEYS:
                k_in = tree["kernel"].shape[0]
                if bits == 4 and k_in % INT4_WINDOW == 0:
                    w_q4, scale_g = q4(tree["kernel"])
                    out = {"w_q4": w_q4, "scale_g": scale_g}
                else:
                    w_q, scale = q8(tree["kernel"])
                    out = {"w_q": w_q, "scale": scale}
                if "bias" in tree:
                    out["bias"] = tree["bias"]
                return out
            return {k: walk(v, k) for k, v in tree.items()}
        if isinstance(tree, list):
            return [walk(v, name) for v in tree]
        return tree

    return walk(params)


def load_llava_params(model_dir: str, quantize=True):
    """Load HF ``llava-hf/llava-1.5-7b-hf`` safetensors shards into the
    functional param dicts. Returns (llama, vision, projector, configs).

    ``quantize``: 4 -> packed int4 (the reference default), 8 or True ->
    int8, False or 16 -> bf16 linears (the reference 16-bit mode)."""
    import glob
    import os

    from safetensors.numpy import load_file

    sd = {}
    for shard in sorted(glob.glob(os.path.join(model_dir, "*.safetensors"))):
        sd.update(load_file(shard))
    if not sd:
        raise FileNotFoundError(f"no .safetensors under {model_dir}")

    def lin(prefix, transpose=True):
        d = {"kernel": jnp.asarray(
            sd[prefix + ".weight"].T if transpose else sd[prefix + ".weight"]
        )}
        if prefix + ".bias" in sd:
            d["bias"] = jnp.asarray(sd[prefix + ".bias"])
        return d

    def ln(prefix):
        return {"scale": jnp.asarray(sd[prefix + ".weight"]),
                "bias": jnp.asarray(sd[prefix + ".bias"])}

    lm = "language_model.model."
    n_layers = 0
    while f"{lm}layers.{n_layers}.input_layernorm.weight" in sd:
        n_layers += 1
    dim = sd[lm + "embed_tokens.weight"].shape[1]
    cfg = LlamaConfig(
        dim=dim, n_layers=n_layers,
        n_heads=32 if dim == 4096 else max(1, dim // 128),
        ffn_dim=sd[f"{lm}layers.0.mlp.gate_proj.weight"].shape[0],
        vocab_size=sd[lm + "embed_tokens.weight"].shape[0],
    )
    layers = []
    for i in range(n_layers):
        pre = f"{lm}layers.{i}."
        layers.append({
            "input_layernorm": {"weight": jnp.asarray(sd[pre + "input_layernorm.weight"])},
            "post_attention_layernorm": {"weight": jnp.asarray(sd[pre + "post_attention_layernorm.weight"])},
            "self_attn": {k: lin(pre + "self_attn." + k) for k in
                          ("q_proj", "k_proj", "v_proj", "o_proj")},
            "mlp": {k: lin(pre + "mlp." + k) for k in
                    ("gate_proj", "up_proj", "down_proj")},
        })
    llama = {
        "embed_tokens": {"weight": jnp.asarray(sd[lm + "embed_tokens.weight"])},
        "layers": layers,
        "norm": {"weight": jnp.asarray(sd[lm + "norm.weight"])},
        "lm_head": lin("language_model.lm_head"),
    }
    if quantize in (True, 4, 8):
        llama = quantize_llama_params(llama, bits=4 if quantize == 4 else 8)
    else:
        # Unquantized = the reference's 16-bit mode (fp16 bitsandbytes-free
        # load, llava/model/builder.py:43-47). fp32 7B would be ~28 GB —
        # over v5e HBM — so cast the big linears + embeddings to bf16;
        # RMSNorm weights stay fp32 (norm math runs fp32 anyway).
        def _bf16(tree, name=""):
            if isinstance(tree, dict):
                if "kernel" in tree or (name == "embed_tokens" and "weight" in tree):
                    return {
                        k: (v.astype(jnp.bfloat16)
                            if k in ("kernel", "weight") else v)
                        for k, v in tree.items()
                    }
                return {k: _bf16(v, k) for k, v in tree.items()}
            if isinstance(tree, list):
                return [_bf16(v, name) for v in tree]
            return tree

        llama = _bf16(llama)

    vt = "vision_tower.vision_model."
    v_layers = []
    i = 0
    while f"{vt}encoder.layers.{i}.layer_norm1.weight" in sd:
        pre = f"{vt}encoder.layers.{i}."
        v_layers.append({
            "layer_norm1": ln(pre + "layer_norm1"),
            "layer_norm2": ln(pre + "layer_norm2"),
            "self_attn": {k: lin(pre + "self_attn." + k) for k in
                          ("q_proj", "k_proj", "v_proj", "out_proj")},
            "mlp": {"fc1": lin(pre + "mlp.fc1"), "fc2": lin(pre + "mlp.fc2")},
        })
        i += 1
    pk = sd[vt + "embeddings.patch_embedding.weight"]  # OIHW -> HWIO
    width = pk.shape[0]
    vcfg = ClipVisionConfig(
        width=width, layers=i,
        heads=width // 64,
        mlp_dim=sd[vt + "encoder.layers.0.mlp.fc1.weight"].shape[0],
        image_size=int(
            np.sqrt(sd[vt + "embeddings.position_embedding.weight"].shape[0] - 1)
        ) * pk.shape[2],
        patch_size=pk.shape[2],
    )
    vision = {
        "embeddings": {
            "class_embedding": jnp.asarray(sd[vt + "embeddings.class_embedding"]),
            "patch_embedding": {"kernel": jnp.asarray(pk.transpose(2, 3, 1, 0))},
            "position_embedding": {"weight": jnp.asarray(
                sd[vt + "embeddings.position_embedding.weight"]
            )},
        },
        "pre_layrnorm": ln(vt + "pre_layrnorm"),
        "layers": v_layers,
    }
    projector = {
        "linear_1": lin("multi_modal_projector.linear_1"),
        "linear_2": lin("multi_modal_projector.linear_2"),
    }
    return llama, vision, projector, (cfg, vcfg)
