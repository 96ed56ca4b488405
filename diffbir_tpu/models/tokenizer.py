"""CLIP byte-level BPE tokenizer (pure Python, no torch).

Behavioral parity target: the OpenAI/OpenCLIP SimpleTokenizer used by the
reference (/root/reference/diffbir/model/open_clip/tokenizer.py:72-188):
byte→unicode remap, lowercase + whitespace collapse, word regex, greedy
lowest-rank pair merging with ``</w>`` end-of-word marker, 49408-entry vocab
(256 bytes + 256 byte+``</w>`` + 48894 merges + 2 specials), and 77-token
padded output with SOT/EOT.

The merges table (``bpe_simple_vocab_16e6.txt.gz``, a public data asset) is
loaded from ``DIFFBIR_TPU_BPE_PATH``, ``<repo>/weights/``, or the mounted
reference copy — it ships alongside model weights, not with this source tree.
``ftfy`` text fixing is applied when available (it is optional upstream-wise:
prompts here are produced by our own captioners or CLI flags).
"""

from __future__ import annotations

import functools
import gzip
import html
import os
from typing import Dict, List, Sequence, Tuple, Union

import numpy as np
import regex

# merges kept so total vocab = 49408: 512 base + merges + 2 specials
_MERGE_COUNT = 49408 - 512 - 2

SOT = "<start_of_text>"
EOT = "<end_of_text>"

_WORD_RE = regex.compile(
    r"""'s|'t|'re|'ve|'m|'ll|'d|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+""",
    regex.IGNORECASE,
)


@functools.lru_cache()
def _byte_unicode_table() -> Dict[int, str]:
    """Reversible printable-unicode encoding of the 256 byte values."""
    keep = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    table = {b: chr(b) for b in keep}
    extra = 0
    for b in range(256):
        if b not in table:
            table[b] = chr(256 + extra)
            extra += 1
    return table


def default_bpe_path() -> str:
    candidates = [
        os.environ.get("DIFFBIR_TPU_BPE_PATH", ""),
        os.path.join(os.path.dirname(__file__), "..", "..", "weights", "bpe_simple_vocab_16e6.txt.gz"),
        "/root/reference/diffbir/model/open_clip/bpe_simple_vocab_16e6.txt.gz",
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    raise FileNotFoundError(
        "CLIP BPE merges file not found; set DIFFBIR_TPU_BPE_PATH or place "
        "bpe_simple_vocab_16e6.txt.gz under weights/"
    )


def _clean(text: str) -> str:
    try:
        import ftfy

        text = ftfy.fix_text(text)
    except ImportError:
        pass
    text = html.unescape(html.unescape(text))
    text = regex.sub(r"\s+", " ", text.strip())
    return text.strip().lower()


class ClipTokenizer:
    def __init__(self, bpe_path: str | None = None):
        bpe_path = bpe_path or default_bpe_path()
        with gzip.open(bpe_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        merge_lines = lines[1 : _MERGE_COUNT + 1]
        merges: List[Tuple[str, str]] = [tuple(m.split()) for m in merge_lines]

        base = list(_byte_unicode_table().values())
        vocab = base + [c + "</w>" for c in base]
        vocab += ["".join(m) for m in merges]
        vocab += [SOT, EOT]
        self.encoder: Dict[str, int] = {tok: i for i, tok in enumerate(vocab)}
        self.decoder = {i: tok for tok, i in self.encoder.items()}
        self.rank: Dict[Tuple[str, str], int] = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = _byte_unicode_table()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.sot_id = self.encoder[SOT]
        self.eot_id = self.encoder[EOT]
        self._cache: Dict[str, List[str]] = {}

    @property
    def vocab_size(self) -> int:
        return len(self.encoder)

    def _merge_word(self, token: str) -> List[str]:
        """Greedy BPE: repeatedly merge the lowest-rank adjacent pair."""
        if token in self._cache:
            return self._cache[token]
        parts: List[str] = list(token[:-1]) + [token[-1] + "</w>"]
        while len(parts) > 1:
            best_rank, best_i = None, -1
            for i in range(len(parts) - 1):
                r = self.rank.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            a, b = parts[best_i], parts[best_i + 1]
            # merge every non-overlapping (a, b) occurrence, left to right
            out: List[str] = []
            i = 0
            while i < len(parts):
                if i < len(parts) - 1 and parts[i] == a and parts[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(parts[i])
                    i += 1
            parts = out
        self._cache[token] = parts
        return parts

    def encode(self, text: str) -> List[int]:
        ids: List[int] = []
        for word in _WORD_RE.findall(_clean(text)):
            mapped = "".join(self.byte_encoder[b] for b in word.encode("utf-8"))
            ids.extend(self.encoder[p] for p in self._merge_word(mapped))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        text = "".join(self.decoder[int(i)] for i in ids if int(i) not in (self.sot_id, self.eot_id))
        raw = bytearray(self.byte_decoder[c] for c in text if c in self.byte_decoder)
        return raw.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    def __call__(self, texts: Union[str, List[str]], context_length: int = 77) -> np.ndarray:
        """Tokenize to a padded [N, context_length] int32 array (SOT ... EOT 0...)."""
        if isinstance(texts, str):
            texts = [texts]
        out = np.zeros((len(texts), context_length), dtype=np.int32)
        for i, t in enumerate(texts):
            ids = [self.sot_id] + self.encode(t) + [self.eot_id]
            if len(ids) > context_length:
                ids = ids[: context_length - 1] + [self.eot_id]
            out[i, : len(ids)] = ids
        return out


@functools.lru_cache()
def get_tokenizer(bpe_path: str | None = None) -> ClipTokenizer:
    return ClipTokenizer(bpe_path)
