"""Partitioned URL-seen filter (north_rule core).

Two modes behind one interface:

* **exact** — a DataFrame of seen ``surt_key`` values; membership = left-anti
  join. Zero false positives; used for correctness tests and small scale.
* **bloom** — hash-partitioned Bloom filter built per partition with
  ``applyInPandas``; at 10^10 URLs an exact distinct set is ~1 TB of keys,
  while a 1%-fpp Bloom is ~12 GiB total, ~95 MiB per partition across 128
  partitions, each probe-able without shuffling the candidate side more than
  once by the same hash partitioning.

The Bloom variant stores (partition_id, bitmap bytes) rows — persisted to
parquet for resume (north_rule resumability). Candidates are filtered with a
broadcast-joined bitmap per partition inside ``applyInPandas``: candidate
rows are repartitioned by the same ``hash(surt_key) % P``, so each task
probes exactly one bitmap.

False-positive budget: configurable bits-per-key (default 16 → ~0.05% fpp);
correctness mode for tests is exact (SURVEY §7 hard-part (e)).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

_BLOOM_SCHEMA = StructType(
    [
        StructField("part_id", IntegerType(), False),
        StructField("n_keys", LongType(), False),
        StructField("bitmap", BinaryType(), False),
    ]
)

K_HASHES = 7  # optimal for ~16 bits/key


def _key_hashes(keys: pd.Series) -> np.ndarray:
    """Two independent 64-bit hashes per key via blake2b-16byte, vectorized
    double hashing h_i = h1 + i*h2 (Kirsch-Mitzenmacher)."""
    out = np.empty((len(keys), 2), dtype=np.uint64)
    for i, key in enumerate(keys):
        digest = hashlib.blake2b(str(key).encode("utf-8"), digest_size=16).digest()
        out[i, 0] = int.from_bytes(digest[:8], "little")
        out[i, 1] = int.from_bytes(digest[8:], "little")
    return out


def partition_of(col, num_partitions: int):
    """Deterministic partition id from xxhash64 (JVM-side, no UDF)."""
    return F.pmod(F.xxhash64(col), F.lit(num_partitions)).cast("int")


def build_bloom(
    seen: DataFrame,
    key_col: str = "surt_key",
    num_partitions: int = 32,
    bits_per_key: int = 16,
) -> DataFrame:
    """Seen keys → (part_id, n_keys, bitmap) rows; one bitmap per hash
    partition, built partition-locally with applyInPandas."""
    keyed = seen.select(
        F.col(key_col).alias("key"),
        partition_of(F.col(key_col), num_partitions).alias("part_id"),
    ).repartition(num_partitions, "part_id")

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        part_id = int(pdf["part_id"].iloc[0]) if len(pdf) else 0
        n = max(len(pdf), 1)
        m_bits = 1 << max(10, math.ceil(math.log2(n * bits_per_key)))
        bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
        hashes = _key_hashes(pdf["key"])
        mask = np.uint64(m_bits - 1)
        for i in range(K_HASHES):
            idx = (hashes[:, 0] + np.uint64(i) * hashes[:, 1]) & mask
            np.bitwise_or.at(bitmap, (idx >> np.uint64(3)).astype(np.int64),
                             (1 << (idx & np.uint64(7))).astype(np.uint8))
        return pd.DataFrame(
            {"part_id": [part_id], "n_keys": [len(pdf)], "bitmap": [bitmap.tobytes()]}
        )

    return keyed.groupBy("part_id").applyInPandas(build, _BLOOM_SCHEMA)


def probe_bloom(
    candidates: DataFrame,
    bloom: DataFrame,
    key_col: str = "surt_key",
    num_partitions: int = 32,
    keep: str = "miss",
) -> DataFrame:
    """Probe candidate keys against the partitioned filter.

    ``keep="miss"`` (default) returns rows whose key is NOT (probably) in
    the filter — the unseen frontier. Bloom false positives drop unseen URLs
    (never re-crawl a seen one): the crawl-safe direction.

    ``keep="hit"`` returns rows whose key IS (probably) in the filter — the
    rewrite path's direction (only re-point links to paths believed present).
    A false positive there rewrites a link to a path that won't exist, the
    same failure class the reference tolerates via ``missing_zim_paths``
    (rewriting.py:81).

    Implementation is a **cogrouped** applyInPandas on part_id: candidates
    hash to the same partition key as the bitmaps, so each task sees (its
    candidate batch, its single bitmap row) executor-side — no driver
    collect, no bitmap broadcast, no per-row duplication. This is the piece
    that must hold at 10^10 keys: total bitmap bytes stay sharded."""
    if keep not in ("miss", "hit"):
        raise ValueError(f"keep must be 'miss' or 'hit', got {keep!r}")
    keep_hits = keep == "hit"
    out_schema = candidates.schema
    with_part = candidates.withColumn(
        "_part_id", partition_of(F.col(key_col), num_partitions)
    )
    cols = [f.name for f in out_schema.fields]

    def probe(cand_pdf: pd.DataFrame, bloom_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return cand_pdf[cols]
        if bloom_pdf.empty or int(bloom_pdf["n_keys"].iloc[0]) == 0:
            # empty filter: nothing is a member
            return cand_pdf[cols].iloc[0:0] if keep_hits else cand_pdf[cols]
        bitmap = np.frombuffer(bloom_pdf["bitmap"].iloc[0], dtype=np.uint8)
        m_bits = len(bitmap) * 8
        mask = np.uint64(m_bits - 1)
        hashes = _key_hashes(cand_pdf[key_col])
        hit = np.ones(len(cand_pdf), dtype=bool)
        for i in range(K_HASHES):
            idx = (hashes[:, 0] + np.uint64(i) * hashes[:, 1]) & mask
            bits = (
                bitmap[(idx >> np.uint64(3)).astype(np.int64)]
                >> (idx & np.uint64(7)).astype(np.uint8)
            ) & 1
            hit &= bits.astype(bool)
        return cand_pdf[hit][cols] if keep_hits else cand_pdf[~hit][cols]

    return (
        with_part.groupBy("_part_id")
        .cogroup(bloom.groupBy("part_id"))
        .applyInPandas(probe, out_schema)
    )


def unseen_exact(candidates: DataFrame, seen: DataFrame, key_col: str = "surt_key") -> DataFrame:
    """Exact-mode membership: left-anti join (shuffles both sides by key)."""
    return candidates.join(
        seen.select(F.col(key_col)).distinct(), key_col, "left_anti"
    )
