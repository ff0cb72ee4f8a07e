"""Dedup sketches: shingling, MinHash, SimHash — numpy-vectorized kernels.

Engine extensions for large-scale near-dedup (task brief): each kernel is a
pure deterministic function of (text, seed) designed to run inside Arrow
batches. Base hash = zlib.crc32 (C-speed, deterministic) expanded to the
needed widths; minhash permutations are universal hashes
h_i(x) = (a_i·x + b_i) mod 2^31-1 over a 31-bit universe so every product
fits native uint64 — no object-dtype math anywhere (the earlier
object-array variant was ~100× slower and dominated the sf0.1 bench).
"""

from __future__ import annotations

import re
import zlib

import numpy as np

_WORD_RE = re.compile(r"\S+")
_MERSENNE31 = np.uint64((1 << 31) - 1)


def char_shingles(text: str, k: int = 5) -> set[str]:
    """Character k-shingles over lowercased, whitespace-collapsed text."""
    norm = " ".join(_WORD_RE.findall(text.lower()))
    if len(norm) < k:
        return {norm} if norm else set()
    return {norm[i : i + k] for i in range(len(norm) - k + 1)}


def word_ngrams(text: str, n: int = 3) -> set[str]:
    tokens = _WORD_RE.findall(text.lower())
    if not tokens:
        return set()
    if len(tokens) < n:
        return {" ".join(tokens)}
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def _crc32_vec(items: list[str]) -> np.ndarray:
    """crc32 per item (C-speed; ~50 ns/shingle)."""
    return np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in items), dtype=np.uint64, count=len(items)
    )


def _crc64_vec(items: list[str]) -> np.ndarray:
    """64-bit hash per item: two independent crc32 lanes (salted) packed."""
    hi = np.fromiter(
        (zlib.crc32(s.encode("utf-8")) for s in items), dtype=np.uint64, count=len(items)
    )
    lo = np.fromiter(
        (zlib.crc32((s + "\x01#").encode("utf-8")) for s in items),
        dtype=np.uint64, count=len(items),
    )
    return (hi << np.uint64(32)) | lo


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    bound = int(_MERSENNE31)
    a = rng.randint(1, bound, size=num_perm).astype(np.uint64)
    b = rng.randint(0, bound, size=num_perm).astype(np.uint64)
    return a, b


_PARAM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(
    text: str | None, num_perm: int = 64, k: int = 5, seed: int = 42
) -> list[int]:
    """MinHash signature (Broder): min over shingle hashes of
    (a_i·h + b_i) mod M31; a·h < 2^62 so everything stays native uint64."""
    if not text:
        return [0] * num_perm
    # no sort: min() over the permuted hashes is order-independent, and the
    # sort was ~35% of kernel time at bench scale
    shingles = list(char_shingles(text, k))
    if not shingles:
        return [0] * num_perm
    key = (num_perm, seed)
    if key not in _PARAM_CACHE:
        _PARAM_CACHE[key] = _minhash_params(num_perm, seed)
    a, b = _PARAM_CACHE[key]
    base = _crc32_vec(shingles) % _MERSENNE31  # (n,) uint64 < 2^31
    vals = (a[:, None] * base[None, :] + b[:, None]) % _MERSENNE31
    return np.min(vals, axis=1).astype(np.int64).tolist()


def minhash_bands(signature: list[int], bands: int = 16) -> list[int]:
    """LSH banding: hash each signature band to one int64 bucket key.
    Candidate pair ⇔ any band key equal (standard banding scheme)."""
    sig = np.asarray(signature, dtype=np.uint64)
    rows = len(signature) // bands
    keys = []
    for band in range(bands):
        chunk = sig[band * rows : (band + 1) * rows]
        h = zlib.crc32(chunk.tobytes()) ^ (band << 20)
        keys.append(np.int64(np.uint64(h)).item())
    return keys


def simhash64(text: str | None, k: int = 5) -> int:
    """64-bit SimHash over char shingles (Charikar): sign of per-bit sums."""
    if not text:
        return 0
    shingles = list(char_shingles(text, k))  # per-bit sums are order-independent
    if not shingles:
        return 0
    hashes = _crc64_vec(shingles)
    bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    sums = bits.astype(np.int64).sum(axis=0)
    majority = (sums * 2 >= len(shingles)).astype(np.uint64)
    value = int((majority << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64))
    return value - (1 << 64) if value >= (1 << 63) else value


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
