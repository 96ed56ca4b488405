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


def test_poisson_gray_noise_is_single_draw():
    """Gray-mask Poisson noise must be ONE [h,w,1] draw broadcast across
    channels (3 independent draws averaged would shrink std by sqrt(3))."""
    from diffbir_tpu.dataset.degradation import add_poisson_noise_batch

    img = jnp.asarray(
        np.random.default_rng(0).random((2, 64, 64, 3)).astype(np.float32)
    )
    # clip=False would leave noise symmetric; use mid-range to avoid clipping
    img = img * 0.5 + 0.25
    out = add_poisson_noise_batch(
        jax.random.PRNGKey(0), img, jnp.array([1.0, 1.0]),
        jnp.array([True, False]),
    )
    noise = np.asarray(out - img)
    # gray sample: one draw broadcast across channels (recovered via
    # out-img, so fp32 re-rounding leaves ~1e-5 channel differences)
    np.testing.assert_allclose(noise[0, :, :, 0], noise[0, :, :, 1], atol=1e-5)
    np.testing.assert_allclose(noise[0, :, :, 0], noise[0, :, :, 2], atol=1e-5)
    # color sample: channels differ
    assert np.any(noise[1, :, :, 0] != noise[1, :, :, 1])
    # shot-noise scale sanity: the [0.25,0.75] image has ~128 unique levels
    # -> vals=128 -> std ~ sqrt(0.5/128) ~ 0.063; a sqrt(3)-shrunk gray draw
    # (~0.036) or the old fixed vals=256 (~0.044) both fail the lower bound
    assert 0.05 < noise[0].std() < 0.08


def test_jpeg_compress_np_bgr_roundtrip_parity():
    """jpeg_compress_np(RGB) must equal cv2-on-BGR (the reference pipeline)
    with the channels flipped at the boundary — red/blue asymmetry check."""
    import cv2
    from diffbir_tpu.dataset.degradation import jpeg_compress_np

    rng = np.random.default_rng(0)
    base = rng.random((64, 64, 3)).astype(np.float32)
    base[:, :, 0] = np.clip(base[:, :, 0] * 2.0, 0, 1)  # red-dominant
    ours = jpeg_compress_np(base, 40)

    bgr = (base[..., ::-1] * 255.0).round().astype(np.uint8)
    enc = cv2.imencode(".jpg", bgr, [int(cv2.IMWRITE_JPEG_QUALITY), 40])[1]
    ref = cv2.imdecode(enc, cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.0
    ref = ref[..., ::-1]
    np.testing.assert_array_equal(ours, ref)


def test_dataset_iterator_reproducible_with_seed(tmp_path):
    """Same seed -> identical batches including degradations/kernels."""
    from PIL import Image as PILImage
    from diffbir_tpu.dataset.realesrgan import RealESRGANDataset

    for i in range(4):
        arr = (np.random.default_rng(i).random((512, 512, 3)) * 255).astype(np.uint8)
        PILImage.fromarray(arr).save(tmp_path / f"{i}.png")
    flist = tmp_path / "files.list"
    flist.write_text("\n".join(str(tmp_path / f"{i}.png") for i in range(4)))

    def make():
        return RealESRGANDataset(
            file_metas=[{"file_list": str(flist), "image_path_key": "image_path"}],
            out_size=512, crop_type="center", use_hflip=False, use_rot=False,
        )

    a = next(make().as_iterator(2, seed=7))
    b = next(make().as_iterator(2, seed=7))
    np.testing.assert_array_equal(a["hq"], b["hq"])
    np.testing.assert_array_equal(a["kernel1"], b["kernel1"])
    np.testing.assert_array_equal(a["sinc_kernel"], b["sinc_kernel"])


def test_prefetch_iterator_terminal_and_close():
    """Exhaustion raises StopIteration on EVERY call (no blocking), close()
    at depth=1 neither deadlocks the worker nor leaves __next__ hanging."""
    import time
    from diffbir_tpu.dataset.prefetch import PrefetchIterator

    it = PrefetchIterator(iter([1, 2]), transform=lambda b: b * 10)
    assert sorted([next(it), next(it)]) == [10, 20]
    for _ in range(3):  # terminal state is sticky
        try:
            next(it)
            assert False, "expected StopIteration"
        except StopIteration:
            pass

    # worker error surfaces on the consumer side
    def bad():
        yield 1
        raise RuntimeError("boom")

    it = PrefetchIterator(bad())
    assert next(it) == 1
    try:
        while True:
            next(it)
    except RuntimeError as e:
        assert "boom" in str(e)

    # close with depth=1 and an infinite producer: must not deadlock
    def infinite():
        i = 0
        while True:
            yield i
            i += 1

    it = PrefetchIterator(infinite(), depth=1)
    assert isinstance(next(it), int)
    t0 = time.time()
    it.close()
    assert time.time() - t0 < 6.0  # join bounded, no deadlock
    try:
        next(it)
        assert False, "expected StopIteration after close"
    except StopIteration:
        pass


def test_prefetch_close_unblocks_waiting_consumer():
    """close() from another thread while a consumer is blocked in __next__
    (slow producer, empty queue) must unblock it with StopIteration rather
    than strand it forever (advisor round-2 finding)."""
    import threading
    import time

    from diffbir_tpu.dataset.prefetch import PrefetchIterator

    def slow():
        yield 1
        time.sleep(30)  # consumer blocks in next() during this window
        yield 2

    it = PrefetchIterator(slow(), depth=1)
    assert next(it) == 1
    outcome = {}

    def consume():
        try:
            outcome["val"] = next(it)
        except StopIteration:
            outcome["stop"] = True

    t = threading.Thread(target=consume)
    t.start()
    time.sleep(0.3)  # let the consumer block on the empty queue
    it.close()
    t.join(timeout=5.0)
    assert not t.is_alive(), "consumer stranded in __next__ after close()"
    assert outcome.get("stop"), f"expected StopIteration, got {outcome}"
