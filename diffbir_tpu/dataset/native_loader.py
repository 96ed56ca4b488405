"""ctypes binding for the native C++ data loader (native/dataloader/).

TPU-native replacement for the torch DataLoader worker pool the reference
uses (train_stage1.py / train_stage2.py wrap datasets in
``torch.utils.data.DataLoader(num_workers=...)``): a C++ thread pool decodes
JPEG/PNG, resizes/crops/augments, and queues fixed-shape uint8 RGB batches,
so the Python host thread only does a memcpy + ``jax.device_put`` per step.

Falls back cleanly: ``native_available()`` is False when the shared library
is missing AND cannot be built (``make -C native``); callers then use the
pure-Python dataset path (PrefetchIterator over CodeformerDataset etc.).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "build", "libdiffbir_loader.so")

CROP_CENTER = 0       # scale-to-fit + center crop (center_crop_arr)
CROP_RANDOM = 1       # random crop at native scale
CROP_RANDOM_ZOOM = 2  # random zoom + random crop (random_crop_arr, frac 0.7-1)
_CROP_MODES = {"center": CROP_CENTER, "random": CROP_RANDOM,
               "random_zoom": CROP_RANDOM_ZOOM}
AUG_HFLIP = 1
AUG_ROT90 = 2

_lib = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    makefile = os.path.join(_REPO_ROOT, "native", "Makefile")
    if os.path.exists(makefile):
        try:  # mtime-based: a no-op when the .so is current, rebuilds on
            subprocess.run(  # source changes (keeps the ABI in sync)
                ["make", "-C", os.path.join(_REPO_ROOT, "native")],
                capture_output=True, timeout=120,
                check=not os.path.exists(_LIB_PATH),
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    try:  # ABI check: v2 adds the shuffle flag
        if lib.dl_api_version() < 2:
            return None
    except AttributeError:
        return None  # stale pre-v2 .so that make failed to refresh
    lib.dl_create.restype = ctypes.c_void_p
    lib.dl_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_ulonglong, ctypes.c_int,
    ]
    lib.dl_next.restype = ctypes.c_int
    lib.dl_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte)]
    lib.dl_next_idx.restype = ctypes.c_int
    lib.dl_next_idx.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte),
        ctypes.POINTER(ctypes.c_long),
    ]
    lib.dl_n_files.restype = ctypes.c_long
    lib.dl_n_files.argtypes = [ctypes.c_void_p]
    lib.dl_batches_per_epoch.restype = ctypes.c_long
    lib.dl_batches_per_epoch.argtypes = [ctypes.c_void_p]
    lib.dl_destroy.restype = None
    lib.dl_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeImageLoader:
    """Threaded C++ decode->crop->augment loader yielding uint8 RGB batches.

    Yields [batch, size, size, 3] uint8 arrays indefinitely (epochs roll
    over with a fresh seeded shuffle). Sample-level RNG is keyed on
    (seed, epoch, file index), so output is independent of thread timing.
    """

    def __init__(
        self,
        paths: Sequence[str],
        batch_size: int,
        out_size: int,
        crop: str = "random",
        hflip: bool = True,
        rot90: bool = False,
        num_threads: int = 4,
        queue_depth: int = 4,
        seed: int = 231,
        shuffle: bool = True,
    ):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                "native loader unavailable: build it with `make -C native`"
            )
        if not paths:
            raise ValueError("empty file list")
        self._lib = lib
        self.batch_size = batch_size
        self.out_size = out_size
        arr = (ctypes.c_char_p * len(paths))(
            *[os.fspath(p).encode() for p in paths]
        )
        augment = (AUG_HFLIP if hflip else 0) | (AUG_ROT90 if rot90 else 0)
        self._h = lib.dl_create(
            arr, len(paths), batch_size, out_size, _CROP_MODES[crop],
            augment, num_threads, queue_depth, seed, int(shuffle),
        )
        if not self._h:
            raise RuntimeError("dl_create failed")
        self._buf = np.empty((batch_size, out_size, out_size, 3), np.uint8)

    @property
    def n_files(self) -> int:
        return int(self._lib.dl_n_files(self._h))

    @property
    def batches_per_epoch(self) -> int:
        return int(self._lib.dl_batches_per_epoch(self._h))

    def next(self) -> np.ndarray:
        rc = self._lib.dl_next(
            self._h, self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
        )
        if rc != 0:
            raise StopIteration
        return self._buf.copy()

    def next_with_idx(self):
        """Returns (batch [B,S,S,3] uint8, file indices [B] int64)."""
        idx = np.empty((self.batch_size,), np.int64)
        rc = self._lib.dl_next_idx(
            self._h,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        )
        if rc != 0:
            raise StopIteration
        return self._buf.copy(), idx

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            yield self.next()

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.dl_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
