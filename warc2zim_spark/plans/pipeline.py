"""The two-pass WARC→ZIM pipeline as two Spark jobs + parquet-table sinks.

Reference lifecycle (SURVEY §3.1, converter.py:279-461):
  pass 1 (gather)  → expected-item set, redirect edges + fixpoint, date
                     range, main page, warcinfo (converter.py:480-714)
  plan finalize    → driver-side metadata assembly (small DataFrames)
  pass 2 (execute) → item/redirect/alias tables (converter.py:942-1033,
                     439-457)

Sinks are parquet tables in an Iceberg-compatible layout (items, redirects,
aliases, metadata, metrics); the dataflow barrier between the passes is
inherent (rewriting depends on global set membership — SURVEY §4.1) and maps
to two jobs over the same record scan.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from warc2zim_spark.operators.gather import (
    expected_items,
    main_page_candidate,
)
from warc2zim_spark.operators.items import items_table, revisit_aliases
from warc2zim_spark.operators.records import content_records, load_records
from warc2zim_spark.operators.metadata import (
    items_with_static,
    static_asset_items,
    validate_metadata,
    zim_metadata,
)
from warc2zim_spark.operators.redirects import (
    expected_with_redirects,
    kept_redirects,
    redirect_edges,
)


def run_pipeline(
    spark: SparkSession,
    webdata_dir: str,
    out_dir: str,
    include_domains: list[str] | None = None,
    name: str = "warc2zim-spark-output",
    custom_css: bytes | None = None,
    metadata_args: dict | None = None,
    main_url: str | None = None,
    favicon_url: str | None = None,
    continue_on_error: bool = False,
    encoding_aliases: dict[str, str] | None = None,
    decode_options=None,
    disable_metadata_checks: bool = False,
    scraper_suffix: str | None = None,
    source: str | None = None,
    failed_items: str = "fails",
    progress_file: str | None = None,
) -> dict:
    """Full pass1 + pass2 → tables under ``out_dir``; returns run metrics.

    ``metadata_args``: keyword passthrough to ``zim_metadata`` (title,
    language, description, tags, ... — the reference's CLI flags).

    ``main_url``: the reference's ``--url`` (main.py:26): the user-chosen
    main page. Its canonical path is redirect-followed (J5,
    converter.py:586-606) and must land on an expected item, else the run
    aborts (converter.py:612-614). Without it, A4 auto-selection applies —
    and is redirect-followed the same way before Main-Path is written.

    ``favicon_url``: the reference's ``--favicon`` (main.py:40): overrides
    icon discovery; the illustration comes from that URL's captured record
    (converter.py:716-738 try user icon first).

    ``continue_on_error``: the reference's ``--continue-on-error``
    (main.py:92-103, converter.py:411-437). Failing records are captured
    into the ``fails`` sink either way (per-record isolation — a poisoned
    record never fails a task); False (reference default) aborts the run
    when any exist, True skips exactly the failing records.

    ``encoding_aliases``: the reference's ``--encoding-aliases``
    (main.py:144-158) — per-run {alias: encoding} rows consulted before the
    builtin table; mapping a record's unknown charset turns its would-be
    failure into a clean decode.

    ``decode_options``: a :class:`~warc2zim_spark.kernels.decode.DecodeOptions`
    — the rest of the decode-tuning CLI (``--charsets-to-try``,
    ``--ignore-content-header-charsets``, ``--ignore-http-header-charsets``,
    ``--content-header-bytes-length``, main.py:113-143).

    ``disable_metadata_checks``: the reference's flag of the same name
    (main.py:105-111, converter.py:279): skip openZIM-convention validation
    of user metadata.

    ``scraper_suffix``: appended to the Scraper metadata row
    (main.py:85-90, converter.py:365-376).

    ``source``: accepted for CLI parity with main.py:77; the reference sets
    ``self.source`` (converter.py:135) but never writes Source metadata —
    a write-only flag we mirror faithfully rather than invent behavior for.

    ``failed_items``: the reference's ``--failed-items`` (main.py:98-103):
    where the fails sink lands — absolute, or relative to ``out_dir``
    (default ``fails``, the reference's own default).

    ``progress_file``: the reference's ``--progress-file`` (main.py:80-84,
    converter.py:233-262): write ``{"written": N, "total": N}`` JSON —
    absolute, or relative to ``out_dir``. The reference updates it per
    record inside its sequential loop; a distributed batch engine has no
    meaningful mid-job record counter, so it is written at stage
    granularity: 0/0 at start (totals are unknown before the gather pass,
    exactly like the reference before its first scan), the item count when
    the item sink lands, and the final written total (items + redirects +
    aliases) at end — same file contract, coarser cadence."""
    del source  # parity: reference never consumes it (converter.py:135)
    # validate user metadata BEFORE any distributed work (converter.py:279-294
    # "so that we do not waste time doing operations for a scraper which will
    # fail anyway in the end")
    if not disable_metadata_checks:
        validate_metadata(
            **{
                k: v
                for k, v in (metadata_args or {}).items()
                if k in ("title", "description", "long_description", "language", "tags")
            }
        )
    t0 = time.time()
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    fails_dir = Path(failed_items)
    if not fails_dir.is_absolute():
        fails_dir = out / fails_dir
    progress_path = Path(progress_file) if progress_file else None
    if progress_path is not None and not progress_path.is_absolute():
        progress_path = out / progress_path

    def _progress(written: int, total: int) -> None:
        if progress_path is not None:
            progress_path.write_text(
                json.dumps({"written": written, "total": total})
            )

    _progress(0, 0)
    # the decode knobs drive EVERY decode, not only the quarantine probe —
    # a rescued/re-tuned record must decode the way the probe predicted;
    # --encoding-aliases rows merge into the downstream options the same
    # way quarantined_records merges them internally
    downstream_decode = decode_options
    if encoding_aliases:
        import dataclasses as _dc

        from warc2zim_spark.kernels.decode import DecodeOptions as _DO

        _base = decode_options if decode_options is not None else _DO()
        downstream_decode = _dc.replace(
            _base,
            extra_aliases={**(_base.extra_aliases or {}), **encoding_aliases},
        )
    records = load_records(spark, webdata_dir)
    content = content_records(records).cache()

    # ---- pass 1: gather --------------------------------------------------
    expected = expected_items(content).cache()
    edges = redirect_edges(content).cache()
    redirects = kept_redirects(edges, expected)
    full_expected = expected_with_redirects(edges, expected)

    # S10: per-record failure isolation — capture fails BEFORE the item sink
    # so the policy (abort vs skip-record) can act on them
    from warc2zim_spark.operators.quarantine import (
        exclude_failed_records,
        quarantined_records,
    )

    # head-only content stream: the probe reads the 1-KiB payload_head
    # column, never the full payload bytes — unless the decode config is
    # fallible past the head: a narrowed try-list makes tier (c) fallible
    # (two-phase probe: head classification, full payload for the tier-c
    # residue only), and a --content-header-bytes-length wider than the
    # 1-KiB ingest head means the charset sniff itself needs real payload
    narrowed = (
        decode_options is not None
        and getattr(decode_options, "charsets_to_try", None) is not None
    )
    wide_sniff = (
        decode_options is not None
        and getattr(decode_options, "header_bytes", 1024) > 1024
    )
    fails = quarantined_records(
        content_records(records, with_payload=narrowed or wide_sniff, with_head=True),
        encoding_aliases=encoding_aliases,
        decode_options=decode_options,
    ).cache()
    fails.write.mode("overwrite").parquet(str(fails_dir))
    n_fails = fails.count()  # cached: counts the written frame, no re-scan
    if n_fails and not continue_on_error:
        sample = [r.url for r in fails.limit(3).collect()]
        raise ValueError(
            f"{n_fails} record(s) failed processing (e.g. {sample}); "
            f"aborting — pass continue_on_error=True to skip them "
            f"(details in {fails_dir})"
        )

    # ---- pass 2: execute -------------------------------------------------
    # record-level exclusion BEFORE first-wins: a failing winner falls back
    # to the next record for the same path, like the reference's skip loop
    item_source = exclude_failed_records(content, fails) if n_fails else content
    items = items_table(item_source, include_domains).cache()
    aliases = revisit_aliases(content, items)

    # S8: static assets union into the item sink (converter.py:396-409)
    all_items = items_with_static(items, static_asset_items(spark, custom_css))

    # S9 progress stats via Spark-native Observation: each sink write carries
    # its own observed aggregates (converter.py's per-run counters), so the
    # metrics cost ZERO extra jobs — previously each count() re-ran a job.
    from pyspark.sql import Observation

    obs_items = Observation("items_sink")
    obs_redirects = Observation("redirects_sink")
    obs_aliases = Observation("aliases_sink")
    obs_expected = Observation("expected_sink")

    all_items.observe(
        obs_items,
        F.count(F.lit(1)).alias("rows"),
        F.sum("payload_len").alias("bytes"),
        # DISTINCT aggregates are disallowed in observed metrics — HLL sketch
        F.approx_count_distinct("mime").alias("mimes"),
    ).write.mode("overwrite").parquet(str(out / "items"))
    redirects.observe(
        obs_redirects, F.count(F.lit(1)).alias("rows")
    ).write.mode("overwrite").parquet(str(out / "redirects"))
    aliases.observe(
        obs_aliases, F.count(F.lit(1)).alias("rows")
    ).write.mode("overwrite").parquet(str(out / "aliases"))
    full_expected.observe(
        obs_expected, F.count(F.lit(1)).alias("rows")
    ).write.mode("overwrite").parquet(str(out / "expected"))

    n_all_items = obs_items.get["rows"]
    _progress(int(n_all_items), int(n_all_items))

    # main page: --url override or A4 auto-selection, then the J5 redirect
    # follow — Main-Path must point at the FINAL target when the landing
    # path is a redirect source (converter.py:586-606)
    from warc2zim_spark.kernels.surt import canonicalize
    from warc2zim_spark.operators.gather import main_page_resolved

    if main_url is not None:
        main_path = canonicalize(main_url)
        if main_path is None:
            raise ValueError(f"--url does not canonicalize: {main_url!r}")
        main_df = spark.createDataFrame(
            [(main_path, main_url)], "zim_path string, url string"
        )
    else:
        main_df = main_page_candidate(content)
    resolved_rows = main_page_resolved(content, main_df).limit(1).collect()
    if not resolved_rows:
        # converter.py:315-316: "Unable to find main path, aborting" — a ZIM
        # without a main page is unusable; fail rather than emit one
        raise ValueError("Unable to find main path, aborting")
    resolved_path = resolved_rows[0].zim_path
    if main_url is not None:
        # a user-specified main page must actually exist in the archive
        # (converter.py:612-614 "Unable to find main page")
        present = (
            full_expected.filter(F.col("zim_path") == resolved_path)
            .limit(1)
            .count()
        )
        if not present:
            raise ValueError(
                f"Unable to find main page {resolved_path!r} "
                "(resolved from --url) among expected items, aborting"
            )

    # illustration: --favicon override, else discovery off the main page
    # (J3 payload-capture join + A9 ranking); 0 captured rows → the
    # transparent fallback inside zim_metadata (converter.py:920-924)
    meta_args = dict(metadata_args or {})
    if scraper_suffix is not None:
        meta_args.setdefault("scraper_suffix", scraper_suffix)
    if disable_metadata_checks:
        meta_args["validate"] = False
    if meta_args.get("illustration") is None:
        from warc2zim_spark.operators.favicon import (
            best_illustration,
            illustration_from_url,
        )

        content_payload = content_records(records, with_payload=True)
        if favicon_url is not None:
            best = illustration_from_url(content_payload, favicon_url)
        else:
            best = best_illustration(
                content_payload,
                spark.createDataFrame(
                    [(resolved_path, resolved_rows[0].url)],
                    "zim_path string, url string",
                ),
                decode_options=downstream_decode,
            )
        illu_rows = best.select("illustration").limit(1).collect()
        if illu_rows:
            meta_args["illustration"] = bytes(illu_rows[0].illustration)

    # S7: the full metadata frame (validated fail-fast inside), plus the
    # engine's own operational entries — title/lang cascade off the SAME
    # main page the run selected (user --url or auto)
    meta = zim_metadata(content, records, name=name, main=main_df,
                        decode_options=downstream_decode, **meta_args)
    extra = spark.createDataFrame(
        [
            ("Main-Path", resolved_path),
            ("Counter-Items", str(n_all_items)),
        ],
        "name string, value string",
    )
    meta.unionByName(extra).write.mode("overwrite").parquet(str(out / "metadata"))

    n_static = static_asset_items(spark, custom_css).count()
    metrics = {
        "items": n_all_items - n_static,  # record-derived items
        "items_with_static": n_all_items,
        "payload_bytes": obs_items.get["bytes"],
        "distinct_mimes": obs_items.get["mimes"],
        "redirects": obs_redirects.get["rows"],
        "aliases": obs_aliases.get["rows"],
        "expected": obs_expected.get["rows"],
        "failed_records": n_fails,
        "wall_s": round(time.time() - t0, 2),
    }
    (out / "metrics.json").write_text(json.dumps(metrics))
    written = int(n_all_items) + int(metrics["redirects"]) + int(metrics["aliases"])
    _progress(written, written)
    fails.unpersist()
    content.unpersist()
    return metrics
