"""TPU LLaVA stack: int8 quant matmul, llama KV-cache decode, vision tower.

Weights-free tests on tiny configs; HF parity is weights-gated (skipped when
no model dir is present). Covers VERDICT r1 missing #3.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffbir_tpu.models import llava as L
from diffbir_tpu.ops.quant_matmul import quantize_weight, quant_matmul


# --------------------------------------------------------------------------- #
# quant matmul
# --------------------------------------------------------------------------- #
def test_quantize_roundtrip_error():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((256, 512)).astype(np.float32) * 0.02)
    w_q, scale = quantize_weight(w)
    assert w_q.dtype == jnp.int8 and scale.shape == (512,)
    deq = w_q.astype(jnp.float32) * scale[None, :]
    rel = float(jnp.abs(deq - w).max() / jnp.abs(w).max())
    assert rel < 1.0 / 127  # half-step symmetric quantization bound


def test_quant_matmul_close_to_exact():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.standard_normal((3, 512)).astype(np.float32))
    w_q, s = quantize_weight(w)
    got = quant_matmul(x, w_q, s, force="xla")
    exact = x @ w
    rel = float(jnp.abs(got - exact).max() / jnp.abs(exact).max())
    assert rel < 0.02


def test_quant_matmul_batch_leading_dims():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.standard_normal((64, 128)).astype(np.float32))
    x = jnp.asarray(rng.standard_normal((2, 5, 64)).astype(np.float32))
    w_q, s = quantize_weight(w)
    out = quant_matmul(x, w_q, s, force="xla")
    assert out.shape == (2, 5, 128)


def test_quant_matmul_pallas_interpret_matches_xla():
    """Kernel logic check on CPU via the pallas interpreter (multi-tile grid:
    2 N-tiles x 2 K-tiles exercises the accumulator carry + final scale)."""
    from diffbir_tpu.ops.quant_matmul import _pallas_quant_matmul

    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    w_q, s = quantize_weight(w)
    a = _pallas_quant_matmul(x, w_q, s, block_n=256, block_k=256, interpret=True)
    b = quant_matmul(x, w_q, s, force="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_quant_matmul_pallas_interpret_mtiled():
    """M-tiled grid (UNet prefill rows): 3 M-tiles incl. a padded tail x
    2 N x 2 K — exercises the (mi, ni, ki) index maps + tail masking."""
    from diffbir_tpu.ops.quant_matmul import _pallas_quant_matmul

    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.standard_normal((300, 512)).astype(np.float32))
    w_q, s = quantize_weight(w)
    a = _pallas_quant_matmul(
        x, w_q, s, block_m=128, block_n=256, block_k=256, interpret=True
    )
    b = quant_matmul(x, w_q, s, force="xla")
    assert a.shape == (300, 512)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="pallas TPU kernel")
def test_quant_matmul_pallas_matches_xla():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((512, 768)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    w_q, s = quantize_weight(w)
    a = quant_matmul(x, w_q, s, force="pallas")
    b = quant_matmul(x, w_q, s, force="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


# --------------------------------------------------------------------------- #
# int4 (packed) quant matmul — the reference's DEFAULT LLaVA load is 4-bit
# bitsandbytes (llava/model/builder.py:32-41)
# --------------------------------------------------------------------------- #
def test_quantize_int4_roundtrip_error():
    from diffbir_tpu.ops.quant_matmul import _unpack_int4, quantize_weight_int4

    rng = np.random.default_rng(10)
    w = jnp.asarray(rng.standard_normal((512, 384)).astype(np.float32) * 0.02)
    packed, scale = quantize_weight_int4(w, group_size=128)
    assert packed.shape == (256, 384) and packed.dtype == jnp.int8
    assert scale.shape == (4, 384)
    w_int = _unpack_int4(packed)
    assert int(w_int.max()) <= 7 and int(w_int.min()) >= -7
    deq = (w_int.reshape(4, 128, 384) * scale[:, None, :]).reshape(512, 384)
    # symmetric grid with 7 positive levels: |err| <= scale/2 per group
    err = jnp.abs(deq - w)
    bound = jnp.repeat(scale / 2, 128, axis=0) + 1e-8
    assert bool(jnp.all(err <= bound))


def test_quantize_np_twins_bit_identical():
    """Host numpy quantizers (7B synthetic bench path) must produce the exact
    same packed bytes + scales as the jnp versions."""
    from diffbir_tpu.ops.quant_matmul import (
        quantize_weight_int4,
        quantize_weight_int4_np,
        quantize_weight_np,
    )

    rng = np.random.default_rng(11)
    w = rng.standard_normal((512, 384)).astype(np.float32) * 0.02
    q_j, s_j = quantize_weight(jnp.asarray(w))
    q_n, s_n = quantize_weight_np(w)
    np.testing.assert_array_equal(np.asarray(q_j), q_n)
    np.testing.assert_allclose(np.asarray(s_j), s_n, rtol=0, atol=0)
    p_j, g_j = quantize_weight_int4(jnp.asarray(w), group_size=128)
    p_n, g_n = quantize_weight_int4_np(w, group_size=128)
    np.testing.assert_array_equal(np.asarray(p_j), p_n)
    np.testing.assert_allclose(np.asarray(g_j), g_n, rtol=0, atol=0)


def test_quant_matmul_int4_close_to_exact():
    from diffbir_tpu.ops.quant_matmul import quant_matmul_int4, quantize_weight_int4

    rng = np.random.default_rng(11)
    w = jnp.asarray(rng.standard_normal((512, 256)).astype(np.float32) * 0.05)
    x = jnp.asarray(rng.standard_normal((3, 512)).astype(np.float32))
    packed, s = quantize_weight_int4(w)
    got = quant_matmul_int4(x, packed, s, force="xla")
    assert got.shape == (3, 256)
    exact = x @ w
    rel = float(jnp.abs(got - exact).max() / jnp.abs(exact).max())
    # 16x coarser grid than int8 — and i.i.d. gaussian weights are the
    # worst case for groupwise quant (no outlier structure to absorb)
    assert rel < 0.2


def test_quant_matmul_int4_pallas_interpret_matches_xla():
    """Kernel check on CPU: 2 N-tiles x 2 pack windows exercises the
    accumulator carry, nibble unpack, and per-group dequant."""
    from diffbir_tpu.ops.quant_matmul import (
        _pallas_quant_matmul_int4, quant_matmul_int4, quantize_weight_int4)

    rng = np.random.default_rng(12)
    w = jnp.asarray(rng.standard_normal((512, 512)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.standard_normal((4, 512)).astype(np.float32))
    packed, s = quantize_weight_int4(w, group_size=128)
    a = _pallas_quant_matmul_int4(x, packed, s, block_n=256, interpret=True)
    b = quant_matmul_int4(x, packed, s, force="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="pallas TPU kernel")
def test_quant_matmul_int4_pallas_matches_xla():
    from diffbir_tpu.ops.quant_matmul import quant_matmul_int4, quantize_weight_int4

    rng = np.random.default_rng(13)
    w = jnp.asarray(rng.standard_normal((1024, 768)).astype(np.float32) * 0.02)
    x = jnp.asarray(rng.standard_normal((4, 1024)).astype(np.float32))
    packed, s = quantize_weight_int4(w)
    a = quant_matmul_int4(x, packed, s, force="pallas")
    b = quant_matmul_int4(x, packed, s, force="xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_quantize_llama_params_int4_decode():
    """bits=4 quantization plugs into the llama forward; logits stay close
    to fp (tiny config: dims divisible by the pack window)."""
    cfg = L.LlamaConfig(dim=256, n_layers=1, n_heads=4, ffn_dim=512,
                        vocab_size=64, max_seq_len=32)
    params = L.init_llama_params(np.random.default_rng(20), cfg)
    q4 = L.quantize_llama_params(params, bits=4)
    flat = jax.tree_util.tree_leaves(q4["layers"][0]["self_attn"]["q_proj"])
    assert any(a.dtype == jnp.int8 for a in flat)
    x = jnp.asarray(
        np.random.default_rng(21).standard_normal((1, 5, cfg.dim)).astype(np.float32)
    )
    positions = jnp.arange(5)
    causal = jnp.where(
        jnp.arange(5)[:, None] >= jnp.arange(5)[None, :], 0.0, -1e9
    ).astype(jnp.float32)
    y_fp, _ = L.llama_block(params["layers"][0], cfg, x, positions, None, causal)
    y_q4, _ = L.llama_block(q4["layers"][0], cfg, x, positions, None, causal)
    rel = float(jnp.abs(y_q4 - y_fp).max() / jnp.abs(y_fp).max())
    assert rel < 0.3  # random-weight worst case; plumbing + rough accuracy


# --------------------------------------------------------------------------- #
# llama decode
# --------------------------------------------------------------------------- #
@pytest.fixture(scope="module")
def tiny_llama():
    cfg = L.LlamaConfig.tiny()
    params = L.init_llama_params(np.random.default_rng(0), cfg)
    return cfg, params


def _naive_greedy(params, cfg, prompt_embeds, n_new):
    """Reference decode: recompute the FULL forward each step (no cache)."""
    tok_embed = params["embed_tokens"]["weight"]
    embeds = prompt_embeds
    tokens = []
    for _ in range(n_new):
        t = embeds.shape[1]
        positions = jnp.arange(t)
        causal = jnp.where(
            jnp.arange(t)[:, None] >= jnp.arange(t)[None, :], 0.0, -1e9
        ).astype(jnp.float32)
        x = embeds
        for li in range(cfg.n_layers):
            x, _ = L.llama_block(params["layers"][li], cfg, x, positions, None, causal)
        x = L._rms_norm(params["norm"]["weight"], x, cfg.norm_eps)
        logits = L._linear(params["lm_head"], x[:, -1])
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        tokens.append(int(nxt[0]))
        embeds = jnp.concatenate(
            [embeds, jnp.take(tok_embed, nxt, axis=0)[:, None, :]], axis=1
        )
    return tokens


def test_kv_cache_decode_matches_full_recompute(tiny_llama):
    """greedy_decode (prefill + cached scan) must emit the same tokens as a
    naive full-recompute loop — locks RoPE positions, cache masking, and the
    scan carry."""
    cfg, params = tiny_llama
    rng = np.random.default_rng(1)
    prompt = jnp.asarray(rng.standard_normal((1, 7, cfg.dim)).astype(np.float32) * 0.5)
    n_new = 6
    got = np.asarray(L.greedy_decode(params, cfg, prompt, n_new, eos_id=-1))[0]
    want = _naive_greedy(params, cfg, prompt, n_new)
    assert got.tolist() == want


def test_greedy_decode_eos_masking(tiny_llama):
    cfg, params = tiny_llama
    rng = np.random.default_rng(2)
    prompt = jnp.asarray(rng.standard_normal((1, 4, cfg.dim)).astype(np.float32) * 0.5)
    free = np.asarray(L.greedy_decode(params, cfg, prompt, 5, eos_id=-1))[0]
    eos = int(free[1])  # force the 2nd emitted token to be "EOS"
    got = np.asarray(L.greedy_decode(params, cfg, prompt, 5, eos_id=eos))[0]
    assert got[1] == eos
    assert all(t == eos for t in got[2:])  # everything after EOS is padding


def test_quantized_llama_decodes(tiny_llama):
    cfg, params = tiny_llama
    qparams = L.quantize_llama_params(params)
    # the big linears got quantized, embeddings/norms did not
    assert "w_q" in qparams["layers"][0]["self_attn"]["q_proj"]
    # lm_head stays unquantized (bitsandbytes llm_int8_skip_modules parity)
    assert "w_q" not in qparams["lm_head"]
    assert "weight" in qparams["embed_tokens"]
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.standard_normal((1, 5, cfg.dim)).astype(np.float32) * 0.5)
    toks = np.asarray(L.greedy_decode(qparams, cfg, prompt, 4, eos_id=-1))[0]
    assert toks.shape == (4,)
    assert np.all((toks >= 0) & (toks < cfg.vocab_size))


def test_batch_decode(tiny_llama):
    cfg, params = tiny_llama
    rng = np.random.default_rng(4)
    p1 = rng.standard_normal((1, 6, cfg.dim)).astype(np.float32) * 0.5
    p2 = rng.standard_normal((1, 6, cfg.dim)).astype(np.float32) * 0.5
    both = np.asarray(
        L.greedy_decode(params, cfg, jnp.asarray(np.concatenate([p1, p2])), 4, -1)
    )
    solo1 = np.asarray(L.greedy_decode(params, cfg, jnp.asarray(p1), 4, -1))[0]
    solo2 = np.asarray(L.greedy_decode(params, cfg, jnp.asarray(p2), 4, -1))[0]
    assert both[0].tolist() == solo1.tolist()
    assert both[1].tolist() == solo2.tolist()


# --------------------------------------------------------------------------- #
# vision tower + projector
# --------------------------------------------------------------------------- #
def test_clip_vision_tower_shapes():
    vcfg = L.ClipVisionConfig.tiny()
    rng = np.random.default_rng(5)

    def lin(i, o, bias=True):
        d = {"kernel": jnp.asarray(rng.standard_normal((i, o)).astype(np.float32) / np.sqrt(i))}
        if bias:
            d["bias"] = jnp.zeros((o,), jnp.float32)
        return d

    def ln(c):
        return {"scale": jnp.ones((c,), jnp.float32), "bias": jnp.zeros((c,), jnp.float32)}

    w = vcfg.width
    params = {
        "embeddings": {
            "class_embedding": jnp.asarray(rng.standard_normal((w,)).astype(np.float32)),
            "patch_embedding": {"kernel": jnp.asarray(
                rng.standard_normal((vcfg.patch_size, vcfg.patch_size, 3, w)).astype(np.float32) * 0.02
            )},
            "position_embedding": {"weight": jnp.asarray(
                rng.standard_normal((vcfg.n_patches + 1, w)).astype(np.float32) * 0.02
            )},
        },
        "pre_layrnorm": ln(w),
        "layers": [
            {
                "layer_norm1": ln(w), "layer_norm2": ln(w),
                "self_attn": {k: lin(w, w) for k in ("q_proj", "k_proj", "v_proj", "out_proj")},
                "mlp": {"fc1": lin(w, vcfg.mlp_dim), "fc2": lin(vcfg.mlp_dim, w)},
            }
            for _ in range(vcfg.layers)
        ],
    }
    img = jnp.asarray(rng.standard_normal((2, vcfg.image_size, vcfg.image_size, 3)).astype(np.float32))
    feats = L.clip_vision_features(params, vcfg, img, select_layer=-2)
    assert feats.shape == (2, vcfg.n_patches, w)
    proj = {"linear_1": lin(w, 48), "linear_2": lin(48, 48)}
    out = L.project_image_features(proj, feats)
    assert out.shape == (2, vcfg.n_patches, 48)


def test_clip_preprocess_shapes():
    from PIL import Image

    from diffbir_tpu.captioners.llava_tpu import clip_preprocess

    img = Image.fromarray(
        (np.random.default_rng(6).random((100, 180, 3)) * 255).astype(np.uint8)
    )
    x = clip_preprocess(img, 28)
    assert x.shape == (28, 28, 3)
    assert abs(float(x.mean())) < 3.0  # normalized range


# --------------------------------------------------------------------------- #
# weights-gated HF parity
# --------------------------------------------------------------------------- #
LLAVA_DIR = os.environ.get("DIFFBIR_TPU_LLAVA_PATH", "")


@pytest.mark.skipif(
    not (LLAVA_DIR and os.path.isdir(LLAVA_DIR)),
    reason="set DIFFBIR_TPU_LLAVA_PATH to a llava-1.5-hf model dir",
)
def test_llava_tokens_match_transformers():
    import torch
    from transformers import AutoProcessor, LlavaForConditionalGeneration

    from diffbir_tpu.captioners.llava_tpu import LLaVATPUCaptioner, PROMPT

    from PIL import Image

    img = Image.fromarray(
        (np.random.default_rng(7).random((336, 336, 3)) * 255).astype(np.uint8)
    )
    ours = LLaVATPUCaptioner(LLAVA_DIR, max_new_tokens=16, quantize=False)
    got = ours(img)

    processor = AutoProcessor.from_pretrained(LLAVA_DIR)
    model = LlavaForConditionalGeneration.from_pretrained(
        LLAVA_DIR, torch_dtype=torch.float32
    )
    prompt = f"USER: <image>\n{PROMPT} ASSISTANT:"
    inputs = processor(images=img, text=prompt, return_tensors="pt")
    out_ids = model.generate(**inputs, max_new_tokens=16, do_sample=False)
    want = processor.batch_decode(
        out_ids[:, inputs.input_ids.shape[1]:], skip_special_tokens=True
    )[0].strip()
    assert got == want
