"""Dedup sketches: shingling, MinHash, SimHash — numpy-vectorized kernels.

Engine extensions for large-scale near-dedup (task brief): each kernel is a
pure deterministic function of (text, seed) designed to run inside Arrow
batches. Hash base is xxhash-free (not in container): 64-bit FNV-1a via numpy
with universal-hash rehashing h_i(x) = (a_i * x + b_i) mod 2^61-1 for minhash
permutations — the standard Broder construction.
"""

from __future__ import annotations

import re

import numpy as np

_WORD_RE = re.compile(r"\S+")
_MERSENNE61 = (1 << 61) - 1
_MASK64 = np.uint64(0xFFFFFFFFFFFFFFFF)


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


def _fnv1a64_np(items: list[bytes]) -> np.ndarray:
    """Vector FNV-1a over a list of byte strings (python loop over items, but
    each doc has bounded shingle counts; the heavy math below is numpy)."""
    out = np.empty(len(items), dtype=np.uint64)
    prime = 0x100000001B3
    offset = 0xCBF29CE484222325
    mask = (1 << 64) - 1
    for i, item in enumerate(items):
        h = offset
        for byte in item:
            h = ((h ^ byte) * prime) & mask
        out[i] = h
    return out


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE61, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


_PARAM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(
    text: str | None, num_perm: int = 64, k: int = 5, seed: int = 42
) -> list[int]:
    """MinHash signature (Broder): min over shingle hashes of
    (a_i*h + b_i) mod M61, truncated to int64 for Spark ArrayType(LongType)."""
    if not text:
        return [0] * num_perm
    shingles = sorted(char_shingles(text, k))
    if not shingles:
        return [0] * num_perm
    key = (num_perm, seed)
    if key not in _PARAM_CACHE:
        _PARAM_CACHE[key] = _minhash_params(num_perm, seed)
    a, b = _PARAM_CACHE[key]
    base = _fnv1a64_np([s.encode("utf-8") for s in shingles]) % np.uint64(_MERSENNE61)
    # (num_perm, n_shingles) universal hash, min over shingles
    vals = (
        a[:, None].astype(np.object_) * base[None, :].astype(np.object_)
        + b[:, None].astype(np.object_)
    ) % _MERSENNE61
    sig = np.min(np.asarray(vals, dtype=np.uint64), axis=1)
    return [int(v) - (1 << 64) if int(v) >= (1 << 63) else int(v) for v in sig]


def minhash_bands(signature: list[int], bands: int = 16) -> list[int]:
    """LSH banding: hash each band of the signature to one int64 bucket key.
    Candidate pair ⇔ any band key equal (standard banding scheme)."""
    rows = len(signature) // bands
    keys = []
    for band in range(bands):
        chunk = signature[band * rows : (band + 1) * rows]
        h = 0xCBF29CE484222325
        for v in chunk:
            for byte in int(np.uint64(v)).to_bytes(8, "little"):
                h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        h = (h ^ band) & 0xFFFFFFFFFFFFFFFF
        keys.append(h - (1 << 64) if h >= (1 << 63) else h)
    return keys


def simhash64(text: str | None, k: int = 5) -> int:
    """64-bit SimHash over char shingles (Charikar): sign of per-bit sums."""
    if not text:
        return 0
    shingles = sorted(char_shingles(text, k))
    if not shingles:
        return 0
    hashes = _fnv1a64_np([s.encode("utf-8") for s in shingles])
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    sums = bits.astype(np.int64).sum(axis=0)
    sim = np.uint64(0)
    for bit_pos in range(64):
        if sums[bit_pos] * 2 >= len(shingles):
            sim |= np.uint64(1) << np.uint64(bit_pos)
    value = int(sim)
    return value - (1 << 64) if value >= (1 << 63) else value


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
