"""Data pipeline tests: degradation synth, DiffJPEG, datasets, batch transform."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from diffbir_tpu.dataset import degradation as D


def test_kernels_normalized(rng):
    g = np.random.default_rng(0)
    for kind in ["iso", "aniso", "generalized_iso", "plateau_aniso"]:
        k = D.random_mixed_kernels(g, [kind], [1.0], 21)
        assert k.shape == (21, 21)
        assert abs(k.sum() - 1.0) < 1e-6


def test_sinc_kernel():
    k = D.circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)
    assert k.shape == (21, 21)
    assert abs(k.sum() - 1.0) < 1e-6


def test_diffjpeg_close_to_cv2():
    from diffbir_tpu.ops.diffjpeg import diff_jpeg

    g = np.random.default_rng(1)
    x = np.clip(g.random((1, 64, 64, 3)) * 0.5 + 0.25, 0, 1).astype(np.float32)
    # smooth the image so JPEG error is small
    import cv2

    x[0] = cv2.GaussianBlur(x[0], (9, 9), 3)
    out = np.asarray(diff_jpeg(jnp.asarray(x), jnp.array([95.0])))
    assert out.shape == x.shape
    cv2_out = D.jpeg_compress_np(x[0], 95)
    # both should stay close to the source at q95
    assert np.abs(out[0] - x[0]).mean() < 0.02
    assert np.abs(out[0] - cv2_out).mean() < 0.02


def test_gaussian_noise_batch():
    img = jnp.full((2, 16, 16, 3), 0.5)
    out = D.add_gaussian_noise_batch(
        jax.random.PRNGKey(0), img, jnp.array([0.1, 0.0]), jnp.array([False, False])
    )
    assert float(jnp.std(out[0] - img[0])) > 0.05
    assert float(jnp.std(out[1] - img[1])) < 1e-6


def test_codeformer_dataset(tmp_path):
    from diffbir_tpu.dataset.codeformer import CodeformerDataset

    g = np.random.default_rng(2)
    paths = []
    for i in range(3):
        p = tmp_path / f"im{i}.png"
        Image.fromarray((g.random((64, 64, 3)) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    flist = tmp_path / "list.txt"
    flist.write_text("\n".join(f"{p}\ta photo" for p in paths))

    ds = CodeformerDataset(
        file_list=str(flist),
        file_backend_cfg={"target": "hard_disk_backend"},
        out_size=64, crop_type="none", blur_kernel_size=21,
        kernel_list=["iso", "aniso"], kernel_prob=[0.5, 0.5],
        blur_sigma=[0.1, 4.0], downsample_range=[1, 4],
        noise_range=[0, 10], jpeg_range=[60, 95],
    )
    item = ds[0]
    assert item["gt"].shape == (64, 64, 3) and item["lq"].shape == (64, 64, 3)
    assert item["gt"].min() >= -1.001 and item["gt"].max() <= 1.001
    assert item["lq"].min() >= 0 and item["lq"].max() <= 1
    batch = next(ds.as_iterator(2, seed=0))
    assert batch["gt"].shape == (2, 64, 64, 3)


def test_realesrgan_dataset_and_transform(tmp_path):
    from diffbir_tpu.dataset.batch_transform import RealESRGANBatchTransform
    from diffbir_tpu.dataset.realesrgan import RealESRGANDataset

    g = np.random.default_rng(3)
    paths = []
    for i in range(2):
        p = tmp_path / f"hq{i}.png"
        Image.fromarray((g.random((64, 64, 3)) * 255).astype(np.uint8)).save(p)
        paths.append(str(p))
    flist = tmp_path / "list.txt"
    flist.write_text("\n".join(f"{p}\tportrait" for p in paths))

    ds = RealESRGANDataset(
        file_list=str(flist), out_size=64, crop_type="none",
    )
    item = ds[0]
    assert item["hq"].shape == (64, 64, 3)
    assert item["kernel1"].shape == (21, 21)

    bt = RealESRGANBatchTransform(
        use_sharpener=True, queue_size=4,
        resize_prob=[0.2, 0.7, 0.1], resize_range=[0.3, 1.5],
        gray_noise_prob=0.4, gaussian_noise_prob=0.5, noise_range=[1, 15],
        poisson_scale_range=[0.05, 2.0], jpeg_range=[60, 95],
        second_blur_prob=0.5, stage2_scale=4,
        resize_prob2=[0.3, 0.4, 0.3], resize_range2=[0.6, 1.2],
        gray_noise_prob2=0.4, gaussian_noise_prob2=0.5, noise_range2=[1, 12],
        poisson_scale_range2=[0.05, 1.0], jpeg_range2=[60, 95],
    )
    batch = next(ds.as_iterator(2, seed=1))
    out = bt(batch)
    assert out["gt"].shape == (2, 64, 64, 3)
    assert out["lq"].shape == (2, 64, 64, 3)
    assert -1.001 <= out["gt"].min() and out["gt"].max() <= 1.001
    assert 0 <= out["lq"].min() and out["lq"].max() <= 1
    assert len(out["txt"]) == 2
    # queue fills then swaps without crashing
    for _ in range(3):
        out = bt(next(ds.as_iterator(2, seed=2)))


def test_prefetch_iterator():
    from diffbir_tpu.dataset.prefetch import PrefetchIterator

    def gen():
        for i in range(5):
            yield {"x": np.full((2, 2), i)}

    it = PrefetchIterator(gen(), transform=lambda b: {"x": b["x"] * 2})
    out = [batch["x"][0, 0] for batch in it]
    assert out == [0, 2, 4, 6, 8]

    # errors surface on the consumer side
    def bad():
        yield {"x": 1}
        raise ValueError("boom")

    it = PrefetchIterator(bad())
    next(it)
    with pytest.raises(ValueError):
        while True:
            next(it)
