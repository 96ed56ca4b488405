"""File backends: abstract byte access for dataset sources.

Behavioral parity target: /root/reference/diffbir/dataset/file_backend.py
(HardDiskBackend :106-120; PetrelBackend S3-like cluster storage :26-105,
optional import). The cluster backend is gated the same way — constructed
only if its client library is importable.
"""

from __future__ import annotations

from typing import Optional

from ..config import register


class FileBackend:
    def get(self, filepath: str) -> Optional[bytes]:
        raise NotImplementedError


@register("hard_disk_backend")
class HardDiskBackend(FileBackend):
    def get(self, filepath: str) -> Optional[bytes]:
        try:
            with open(filepath, "rb") as f:
                return f.read()
        except OSError:
            return None


@register("petrel_backend")
class PetrelBackend(FileBackend):
    """S3-like cluster storage via the petrel_client SDK (optional)."""

    def __init__(self, enable_mc: bool = True):
        try:
            from petrel_client.client import Client  # type: ignore
        except ImportError as e:
            raise ImportError(
                "petrel_client is not installed; use hard_disk_backend"
            ) from e
        self._client = Client(enable_mc=enable_mc)

    def get(self, filepath: str) -> Optional[bytes]:
        try:
            data = self._client.Get(filepath)
            return bytes(data) if data is not None else None
        except Exception:
            return None
