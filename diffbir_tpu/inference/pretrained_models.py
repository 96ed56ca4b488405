"""Pretrained weight registry.

Behavioral parity target: /root/reference/diffbir/inference/pretrained_models.py
(same public checkpoint URLs; the version/task -> model matrix):

- BSR: v1 swinir_general+v1_general | v2 bsrnet+v2 | v2.1 swinir_realesrgan+v2.1
- BFR: v1 swinir_face+v1_face | v2 swinir_face+v2 | v2.1 swinir_realesrgan+v2.1
- BID: v1 swinir_general+v1_general | v2 scunet_psnr+v2 | v2.1 swinir_realesrgan+v2.1
- SD base: v1/v2 -> sd_v2.1; v2.1 -> sd_v2.1_zsnr (zero-SNR + v-pred finetune)

Checkpoints are torch ``.pth/.ckpt/.pt`` files; weights/convert.py turns them
into flax trees at load time. Downloads go to ``$DIFFBIR_TPU_WEIGHTS`` (or
``./weights``); in offline environments place the files there manually.
"""

import os
import urllib.request

MODELS = {
    # stage-1 cleaners
    "bsrnet": "https://github.com/cszn/KAIR/releases/download/v1.0/BSRNet.pth",
    "swinir_face": "https://huggingface.co/lxq007/DiffBIR/resolve/main/face_swinir_v1.ckpt",
    "scunet_psnr": "https://github.com/cszn/KAIR/releases/download/v1.0/scunet_color_real_psnr.pth",
    "swinir_general": "https://huggingface.co/lxq007/DiffBIR/resolve/main/general_swinir_v1.ckpt",
    "swinir_realesrgan": "https://huggingface.co/lxq007/DiffBIR-v2/resolve/main/realesrgan_s4_swinir_100k.pth",
    # pre-trained stable diffusion
    "sd_v2.1": "https://huggingface.co/stabilityai/stable-diffusion-2-1-base/resolve/main/v2-1_512-ema-pruned.ckpt",
    "sd_v2.1_zsnr": "https://huggingface.co/lxq007/DiffBIR-v2/resolve/main/sd2.1-base-zsnr-laionaes5.ckpt",
    # IRControlNet
    "v1_face": "https://huggingface.co/lxq007/DiffBIR-v2/resolve/main/v1_face.pth",
    "v1_general": "https://huggingface.co/lxq007/DiffBIR-v2/resolve/main/v1_general.pth",
    "v2": "https://huggingface.co/lxq007/DiffBIR-v2/resolve/main/v2.pth",
    "v2.1": "https://huggingface.co/lxq007/DiffBIR-v2/resolve/main/DiffBIR_v2.1.pt",
    # face helper networks (facexlib checkpoints; used by unaligned BFR —
    # reference face.py:113-117 detector + parse-net soft mask)
    "retinaface_resnet50": "https://github.com/xinntao/facexlib/releases/download/v0.1.0/detection_Resnet50_Final.pth",
    "parsenet": "https://github.com/xinntao/facexlib/releases/download/v0.2.2/parsing_parsenet.pth",
}


def weights_dir() -> str:
    d = os.environ.get("DIFFBIR_TPU_WEIGHTS", os.path.join(os.getcwd(), "weights"))
    os.makedirs(d, exist_ok=True)
    return d


def load_file_from_url(url: str, model_dir: str = None) -> str:
    """Download (or find cached) checkpoint; returns the local path.

    Mirrors utils/common.py:81-110 in the reference. Local paths pass through.
    """
    if os.path.exists(url):
        return url
    model_dir = model_dir or weights_dir()
    fname = os.path.basename(url.split("?")[0])
    path = os.path.join(model_dir, fname)
    if not os.path.exists(path):
        print(f"downloading {url} -> {path}")
        tmp = path + ".tmp"
        try:
            urllib.request.urlretrieve(url, tmp)
        except Exception as e:
            raise FileNotFoundError(
                f"could not download {url} ({e}); on offline hosts place the "
                f"file manually at {path} (or set DIFFBIR_TPU_WEIGHTS)"
            ) from e
        os.replace(tmp, path)
    return path


def resolve_model(name_or_path: str) -> str:
    """Registry name or direct path/url -> local file path."""
    url = MODELS.get(name_or_path, name_or_path)
    return load_file_from_url(url)
