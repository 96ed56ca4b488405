"""Request-batching server logic (serve.py): grouping, keys, HTTP round-trip."""

import base64
import io
import json
import sys
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from serve import BatchingServer, make_handler  # noqa: E402


class StubPipeline:
    """Records the batch size of every run() call; echoes inputs."""

    def __init__(self, delay=0.0):
        self.batches = []
        self.delay = delay
        self.lock = threading.Lock()

    def run(self, imgs, **kw):
        with self.lock:
            self.batches.append(len(imgs))
        time.sleep(self.delay)
        return np.asarray(imgs)


def _submit_async(srv, img, **kw):
    out = {}

    def go():
        out["result"] = srv.submit(
            img, steps=kw.get("steps", 4), cfg_scale=2.0, pos="", neg="",
            sampler="spaced", seed=kw.get("seed", 1),
        )

    t = threading.Thread(target=go)
    t.start()
    return t, out


def test_same_key_requests_batch_together():
    pipe = StubPipeline(delay=0.05)
    srv = BatchingServer(pipe, batch=4, max_wait_ms=250)
    img = np.zeros((32, 32, 3), np.uint8)
    jobs = [_submit_async(srv, img) for _ in range(4)]
    for t, _ in jobs:
        t.join(timeout=10)
    assert all(o["result"].shape == (32, 32, 3) for _, o in jobs)
    assert max(pipe.batches) >= 2  # at least some grouping happened
    assert sum(pipe.batches) == 4


def test_different_shapes_never_share_a_batch():
    pipe = StubPipeline()
    srv = BatchingServer(pipe, batch=4, max_wait_ms=100, size_bucket=16)
    a = np.zeros((32, 32, 3), np.uint8)
    b = np.zeros((48, 32, 3), np.uint8)   # different 16px bucket than a
    jobs = [_submit_async(srv, a), _submit_async(srv, b),
            _submit_async(srv, a), _submit_async(srv, b)]
    for t, _ in jobs:
        t.join(timeout=10)
    # np.stack would throw on mixed shapes; results echo correct shapes
    assert jobs[0][1]["result"].shape == (32, 32, 3)
    assert jobs[1][1]["result"].shape == (48, 32, 3)
    assert sum(pipe.batches) == 4


def test_same_bucket_different_sizes_batch_together():
    """30x30 and 25x32 both pad to the 32px bucket -> one device batch,
    results cropped back to each request's own size."""
    pipe = StubPipeline(delay=0.05)
    srv = BatchingServer(pipe, batch=2, max_wait_ms=500, size_bucket=32)
    a = np.full((30, 30, 3), 7, np.uint8)
    b = np.full((25, 32, 3), 9, np.uint8)
    ja, jb = _submit_async(srv, a), _submit_async(srv, b)
    ja[0].join(timeout=10), jb[0].join(timeout=10)
    assert ja[1]["result"].shape == (30, 30, 3)
    assert jb[1]["result"].shape == (25, 32, 3)
    np.testing.assert_array_equal(ja[1]["result"], a)
    np.testing.assert_array_equal(jb[1]["result"], b)
    assert 2 in pipe.batches  # they actually shared a batch


def test_oversize_rejected():
    srv = BatchingServer(StubPipeline(), batch=1, max_wait_ms=10, max_size=64)
    with pytest.raises(ValueError):
        srv.submit(np.zeros((128, 128, 3), np.uint8), steps=1, cfg_scale=1.0,
                   pos="", neg="", sampler="spaced", seed=0)


def test_http_round_trip():
    pipe = StubPipeline()
    srv = BatchingServer(pipe, batch=2, max_wait_ms=20)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(srv, 1.0))
    port = httpd.server_address[1]
    th = threading.Thread(target=httpd.serve_forever, daemon=True)
    th.start()
    try:
        img = np.random.default_rng(0).integers(0, 255, (16, 16, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "PNG")
        payload = json.dumps({
            "image": base64.b64encode(buf.getvalue()).decode(), "steps": 2,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/restore", data=payload,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=10) as resp:
            out = json.loads(resp.read())
        got = np.array(Image.open(io.BytesIO(base64.b64decode(out["image"]))))
        np.testing.assert_array_equal(got, img)  # stub echoes

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=10
        ) as resp:
            assert json.loads(resp.read())["ok"] is True
    finally:
        httpd.shutdown()


def test_different_seeds_never_share_a_batch():
    """Seed is part of the batch key (ADVICE r1): a request's RNG stream can
    never be decided by a co-batched request."""
    class SeedRecorder(StubPipeline):
        def __init__(self):
            super().__init__(delay=0.05)
            self.seeds = []

        def run(self, imgs, **kw):
            with self.lock:
                self.seeds.append((len(imgs), kw["seed"]))
            time.sleep(self.delay)
            return np.asarray(imgs)

    pipe = SeedRecorder()
    srv = BatchingServer(pipe, batch=4, max_wait_ms=250)
    img = np.zeros((32, 32, 3), np.uint8)
    jobs = [_submit_async(srv, img, seed=s) for s in (1, 1, 2, 2)]
    for t, _ in jobs:
        t.join(timeout=10)
    # both distinct seeds ran, and no batch mixed seeds
    ran = sorted(set(s for _, s in pipe.seeds))
    assert ran == [1, 2]
    assert sum(n for n, _ in pipe.seeds) == 4


def test_task_routing_and_unavailable_task():
    """Multi-task dict: requests route by task; unknown tasks error clearly."""
    srv = BatchingServer({"sr": StubPipeline()}, batch=2, max_wait_ms=30,
                         size_bucket=64, max_size=2048)
    img = (np.random.default_rng(0).random((64, 64, 3)) * 255).astype(np.uint8)
    out = srv.submit(img, steps=2, cfg_scale=1.0, pos="", neg="",
                     sampler="spaced", seed=1, task="sr")
    assert out.shape == (64, 64, 3)
    try:
        srv.submit(img, steps=2, cfg_scale=1.0, pos="", neg="",
                   sampler="spaced", seed=1, task="face")
        assert False, "expected ValueError for unavailable task"
    except ValueError as e:
        assert "face" in str(e)
