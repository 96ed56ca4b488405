"""RAM++ (Recognize Anything Plus) image tagger -> prompt captioner.

Behavioral parity target: /root/reference/ram/models/ram_plus.py:280-340
``generate_tag``: swin-L tokens -> image_proj(512) -> per-class descriptor
reweighting against the CLIP label embeddings (51 descriptors/class, softmax
over the cls-token similarity) -> wordvec_proj + relu -> 2-layer tagging
head cross-attending to the image tokens -> per-class sigmoid vs per-class
thresholds -> tag strings. RAMCaptioner joins tags with ", " like
/root/reference/diffbir/utils/caption.py:152-171.

Assets (tag list, per-class thresholds, checkpoint) are data files: set
``DIFFBIR_TPU_RAM_CKPT`` / ``DIFFBIR_TPU_RAM_DATA`` (falls back to the
mounted reference's ram/data for the public tag lists).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..models.layers import Dtype, dense
from .bert_tagging import TaggingHead
from .swin_cls import SwinClassifier

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def default_tag_list_path() -> str:
    for c in [
        os.environ.get("DIFFBIR_TPU_RAM_DATA", ""),
        os.path.join(os.getcwd(), "weights", "ram_data"),
        "/root/reference/ram/data",
    ]:
        if c and os.path.exists(os.path.join(c, "ram_tag_list.txt")):
            return c
    raise FileNotFoundError(
        "RAM tag lists not found; set DIFFBIR_TPU_RAM_DATA to a directory with "
        "ram_tag_list.txt and ram_tag_list_threshold.txt"
    )


class RAMPlus(nn.Module):
    """Image -> per-class tag logits."""

    num_class: int = 4585
    des_per_class: int = 51
    vision_width: int = 1536
    embed_dim: int = 512
    hidden: int = 768
    swin_embed_dim: int = 192
    swin_depths: Sequence[int] = (2, 2, 18, 2)
    swin_heads: Sequence[int] = (6, 12, 24, 48)
    swin_window: int = 12
    tagging_heads: int = 4
    tagging_layers: int = 2
    tagging_intermediate: int = 3072
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, image: jax.Array) -> jax.Array:
        """image: [B,384,384,3] imagenet-normalized -> logits [B, num_class]."""
        tokens = SwinClassifier(
            embed_dim=self.swin_embed_dim, depths=self.swin_depths,
            num_heads=self.swin_heads, window_size=self.swin_window,
            dtype=self.dtype, name="visual_encoder",
        )(image)
        embeds = dense(self.embed_dim, dtype=self.dtype, name="image_proj")(tokens)
        cls = embeds[:, 0, :]
        cls = cls / (jnp.linalg.norm(cls, axis=-1, keepdims=True) + 1e-12)

        label_embed = self.param(
            "label_embed", nn.initializers.zeros,
            (self.num_class * self.des_per_class, self.embed_dim), jnp.float32,
        )
        reweight_scale = self.param(
            "reweight_scale", nn.initializers.constant(np.log(1 / 0.07)), (), jnp.float32
        )
        logits_per_image = jnp.exp(reweight_scale) * (cls @ label_embed.T)
        b = cls.shape[0]
        w = jax.nn.softmax(
            logits_per_image.reshape(b, self.num_class, self.des_per_class), axis=2
        )
        descs = label_embed.reshape(self.num_class, self.des_per_class, self.embed_dim)
        reweighted = jnp.einsum("bnd,nde->bne", w, descs)

        queries = nn.relu(
            dense(self.hidden, dtype=self.dtype, name="wordvec_proj")(reweighted)
        )
        tag_embed = TaggingHead(
            hidden=self.hidden, heads=self.tagging_heads, layers=self.tagging_layers,
            intermediate=self.tagging_intermediate, dtype=self.dtype,
            name="tagging_head",
        )(queries, embeds)
        logits = dense(1, dtype=jnp.float32, name="fc")(tag_embed.astype(jnp.float32))
        return logits[..., 0]


class RAMCaptioner:
    def __init__(
        self,
        ckpt_path: Optional[str] = None,
        data_dir: Optional[str] = None,
        image_size: int = 384,
        dtype=jnp.bfloat16,
    ):
        from ..weights.convert import fill_flax_params, load_torch_state_dict

        data_dir = data_dir or default_tag_list_path()
        with open(os.path.join(data_dir, "ram_tag_list.txt"), encoding="utf-8") as f:
            self.tag_list = np.array([line.strip() for line in f if line.strip()])
        with open(os.path.join(data_dir, "ram_tag_list_threshold.txt")) as f:
            self.thresholds = np.array([float(s.strip()) for s in f if s.strip()], np.float32)
        assert len(self.thresholds) == len(self.tag_list), (
            f"tag list ({len(self.tag_list)}) and threshold file "
            f"({len(self.thresholds)}) lengths differ — mismatched data files"
        )
        self.image_size = image_size

        self.model = RAMPlus(num_class=len(self.tag_list), dtype=dtype)
        ckpt_path = ckpt_path or os.environ.get("DIFFBIR_TPU_RAM_CKPT")
        if not ckpt_path:
            raise FileNotFoundError("set DIFFBIR_TPU_RAM_CKPT to the ram_plus checkpoint")
        sd = load_torch_state_dict(ckpt_path)
        shapes = jax.eval_shape(
            self.model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, image_size, image_size, 3), jnp.float32),
        )
        params, missing, _ = fill_flax_params(shapes, sd, strict=False)
        if missing:
            print(f"RAM: {len(missing)} params missing from checkpoint")
        self.params = jax.tree_util.tree_map(jnp.asarray, params)
        self._logits_fn = jax.jit(self.model.apply)

    def tags(self, image: Image.Image) -> List[str]:
        img = image.convert("RGB").resize(
            # torchvision Resize default = BILINEAR (reference ram
            # transform); bicubic shifted near-threshold tag probabilities
            (self.image_size, self.image_size), Image.BILINEAR
        )
        arr = (np.asarray(img, np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        logits = np.asarray(self._logits_fn(self.params, jnp.asarray(arr[None])))[0]
        probs = 1.0 / (1.0 + np.exp(-logits))
        return [t for t, p, th in zip(self.tag_list, probs, self.thresholds) if p > th]

    def __call__(self, image: Image.Image) -> str:
        # "tag1 | tag2" -> "tag1, tag2" prompt form (caption.py:166-171)
        return ", ".join(self.tags(image))
