"""S10 full — per-record failure isolation (``--continue-on-error``).

Reference semantics (converter.py:411-437, main.py:92-103): every record
flows through a try/except; a failure logs the record URL, optionally dumps
the payload to a fails directory, and either skips just that record
(``--continue-on-error``) or aborts the whole run.

Engine shape: a poisoned record must NEVER fail a Spark task — one bad row
would kill a 10^10-record job and a retry would deterministically hit it
again. Kernels raise inside a per-row guard in the Arrow UDF; the captured
error becomes a quarantine row ``(zim_path, url, file_seq, rec_seq, stage,
reason)``; the abort-vs-continue policy is applied driver-side after the
fails sink is written (plans/pipeline.py). The concrete raising class in
this environment is a declared/HTTP charset naming an unknown codec —
``LookupError`` through the decode cascade, the same exception the
reference's errors=replace decode raises (utils.py:155-219).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from warc2zim_spark.functions.expressions import rewrite_mode_expr
from warc2zim_spark.kernels import decode as _decode


def _probe_decode_failure(
    payload: bytes,
    http_charset: str | None,
    mode: str,
    opts: "_decode.DecodeOptions | dict[str, str] | None" = None,
) -> str | None:
    """Would ``to_string(payload, ...)`` raise? Answered WITHOUT decoding
    the full payload on the common paths — at 100 TB a failure-detection
    pass that re-decodes every text payload doubles the decode bill.

    Tier (a)/(b) use ``errors=replace``: they can only fail on the CODEC
    itself (unknown name → LookupError, non-bytes codec → TypeError), which
    a header-bytes decode probes exactly. Tier (c) (no declared/header
    charset) strict-decodes the whole payload by definition — only that
    rare path pays full cost.

    ``opts``: a DecodeOptions, or (legacy shape) a bare extra-aliases dict
    or None for defaults."""
    if opts is None:
        opts = _decode.DecodeOptions()
    elif isinstance(opts, dict):
        opts = _decode.DecodeOptions(extra_aliases=opts)
    try:
        declared = (
            _decode.sniff_declared_charset(payload, opts.header_bytes)
            if mode == "html" and not opts.ignore_content_header_charsets
            else None
        )
        head = payload[: opts.header_bytes]
        if declared is not None:
            head.decode(
                _decode.resolve_encoding_alias(declared, opts.extra_aliases),
                errors="replace",
            )
            return None
        if http_charset and not opts.ignore_http_header_charsets:
            head.decode(
                _decode.resolve_encoding_alias(http_charset, opts.extra_aliases),
                errors="replace",
            )
            return None
        # tier (c): strict try-list over the full payload (the default list
        # ends in ISO-8859-1, which decodes any byte string, so this only
        # raises under a user-narrowed try-list)
        _decode.to_string(
            payload,
            None,
            opts.try_list(),
            opts.header_bytes,
            ignore_content_header_charsets=True,
            ignore_http_header_charsets=True,
            extra_aliases=opts.extra_aliases,
        )
        return None
    except Exception as exc:  # noqa: BLE001 — the guard IS the feature
        return f"{type(exc).__name__}: {exc}"[:200]


def make_decode_error_udf(
    extra_aliases: dict[str, str] | None = None,
    options: "_decode.DecodeOptions | None" = None,
):
    """Per-row failure capture for the decode stage: null on success, else
    ``ExceptionClass: message`` (truncated). ANY kernel failure must become
    data, not a task failure. ``extra_aliases`` is the per-run user alias
    table (``--encoding-aliases``, reference main.py:144-158): an alias the
    user maps turns a would-be failure into a successful decode.
    ``options`` carries the full decode-tuning surface (``--charsets-to-try``,
    ``--ignore-*-charsets``, ``--content-header-bytes-length``,
    main.py:113-143)."""
    opts = options if options is not None else _decode.DecodeOptions()
    if extra_aliases:
        import dataclasses as _dc

        opts = _dc.replace(
            opts, extra_aliases={**(opts.extra_aliases or {}), **extra_aliases}
        )

    @pandas_udf(StringType())
    def decode_error(
        payloads: pd.Series, http_charsets: pd.Series, modes: pd.Series
    ) -> pd.Series:
        out = []
        for payload, charset, mode in zip(payloads, http_charsets, modes):
            if payload is None:
                out.append(None)
                continue
            out.append(
                _probe_decode_failure(
                    bytes(payload),
                    charset if charset is not None else None,
                    mode,
                    opts,
                )
            )
        return pd.Series(out)

    return decode_error


decode_error = make_decode_error_udf()

_TIER_C = "\x00tierc"  # phase-A sentinel: record reaches the strict try-list


def make_head_phase_udf(options: "_decode.DecodeOptions"):
    """Phase A of the two-phase narrowed-try-list probe: classify each
    record from its FIRST-KiB head alone — tier (a)/(b) outcomes (ok or a
    codec failure) are fully decidable from the declaration window + codec
    name; records that fall through to tier (c) return the ``_TIER_C``
    sentinel so only THAT subset's full payloads are ever shipped."""
    opts = options

    @pandas_udf(StringType())
    def head_phase(
        heads: pd.Series, http_charsets: pd.Series, modes: pd.Series
    ) -> pd.Series:
        out = []
        for head, charset, mode in zip(heads, http_charsets, modes):
            if head is None:
                out.append(None)
                continue
            head = bytes(head)
            try:
                declared = (
                    _decode.sniff_declared_charset(head, opts.header_bytes)
                    if mode == "html" and not opts.ignore_content_header_charsets
                    else None
                )
                if declared is not None:
                    head.decode(
                        _decode.resolve_encoding_alias(declared, opts.extra_aliases),
                        errors="replace",
                    )
                    out.append(None)
                    continue
                if charset and not opts.ignore_http_header_charsets:
                    head.decode(
                        _decode.resolve_encoding_alias(charset, opts.extra_aliases),
                        errors="replace",
                    )
                    out.append(None)
                    continue
                out.append(_TIER_C)
            except Exception as exc:  # noqa: BLE001 — the guard IS the feature
                out.append(f"{type(exc).__name__}: {exc}"[:200])
        return pd.Series(out)

    return head_phase


def make_strict_decode_udf(options: "_decode.DecodeOptions"):
    """Phase B: strict try-list decode of the FULL payload — only tier-(c)
    rows reach this."""
    opts = options

    @pandas_udf(StringType())
    def strict_decode(payloads: pd.Series) -> pd.Series:
        out = []
        for payload in payloads:
            if payload is None:
                out.append(None)
                continue
            try:
                _decode.to_string(
                    bytes(payload),
                    None,
                    opts.try_list(),
                    opts.header_bytes,
                    ignore_content_header_charsets=True,
                    ignore_http_header_charsets=True,
                    extra_aliases=opts.extra_aliases,
                )
                out.append(None)
            except Exception as exc:  # noqa: BLE001
                out.append(f"{type(exc).__name__}: {exc}"[:200])
        return pd.Series(out)

    return strict_decode


def quarantined_records(
    content_with_payload: DataFrame,
    encoding_aliases: dict[str, str] | None = None,
    decode_options: "_decode.DecodeOptions | None" = None,
) -> DataFrame:
    """(zim_path, url, file_seq, rec_seq, stage, reason) — response records
    whose text-rewrite stage fails. ``stage`` is the C1 rewrite mode (only
    text modes decode; binary passthrough records cannot fail here).

    Prefers the ``payload_head`` ingest column (first KiB) over the full
    ``payload`` when the try-list is the default — the probe then only
    needs the declaration window plus the codec name (the default list ends
    in ISO-8859-1, so tier (c) cannot fail and head ≡ full for failure
    detection). A user-NARROWED ``--charsets-to-try`` makes tier (c)
    strict-decode fallible over the whole payload; when BOTH columns are
    present (and the sniff window fits the head column) that case runs
    TWO-PHASE: a head-only pass classifies every record (tier a/b outcomes
    are head-decidable), and only the tier-(c) residue — records with no
    declared and no usable HTTP charset, typically a small fraction of a
    real corpus — ships its full payload through Arrow for the strict
    decode. Only a frame carrying just ``payload`` falls back to the
    single-pass full-payload probe.

    ``decode_options`` is the reference's decode-tuning CLI surface
    (main.py:113-143); ``encoding_aliases`` rows merge over its aliases."""
    mode = rewrite_mode_expr(
        F.split(F.coalesce(F.col("mime"), F.lit("")), ";").getItem(0),
        F.col("resourcetype"),
        F.col("zim_path"),
        F.col("p_method"),
    )
    opts = decode_options if decode_options is not None else _decode.DecodeOptions()
    if encoding_aliases:
        import dataclasses as _dc

        opts = _dc.replace(
            opts, extra_aliases={**(opts.extra_aliases or {}), **encoding_aliases}
        )
    narrowed_try_list = opts.charsets_to_try is not None
    cols = content_with_payload.columns

    base = (
        content_with_payload.filter(F.col("rec_type") == "response")
        .withColumn("stage", mode)
        .filter(F.col("stage").isNotNull())
    )
    out_cols = [
        "zim_path",
        F.col("effective_url").alias("url"),
        F.col("file_seq"),
        F.col("rec_seq"),
        F.col("stage"),
        F.col("reason"),
    ]

    two_phase = (
        narrowed_try_list
        and "payload_head" in cols
        and "payload" in cols
        and opts.header_bytes <= 1024  # the ingest head column's width
    )
    if two_phase:
        # phase A: head-only scan (payload pruned from this projection)
        head_udf = make_head_phase_udf(opts)
        phase_a = base.select(
            "zim_path", "effective_url", "file_seq", "rec_seq", "stage",
            head_udf(
                F.col("payload_head"), F.col("http_charset"), F.col("stage")
            ).alias("reason"),
        ).persist()  # feeds BOTH fails_ab and tierc_keys: without this the
        # head-classification scan (the pass the two-phase design exists to
        # keep cheap) would evaluate twice
        fails_ab = phase_a.filter(
            F.col("reason").isNotNull() & (F.col("reason") != _TIER_C)
        ).select(*out_cols)
        tierc_keys = phase_a.filter(F.col("reason") == _TIER_C).select(
            "file_seq", "rec_seq"
        )
        # phase B: full payload only for the tier-(c) residue (broadcast
        # semi-join keys against a payload-bearing scan)
        strict_udf = make_strict_decode_udf(opts)
        fails_c = (
            base.join(F.broadcast(tierc_keys), ["file_seq", "rec_seq"], "left_semi")
            .withColumn("reason", strict_udf(F.col("payload")))
            .filter(F.col("reason").isNotNull())
            .select(*out_cols)
        )
        # materialize the (small) fails union so phase_a's cached head scan
        # feeds both legs exactly once, then release it deterministically —
        # the persist must not linger in executor storage after return
        result = fails_ab.unionByName(fails_c).localCheckpoint(eager=True)
        phase_a.unpersist()
        return result

    # payload_head is ingested at a fixed 1 KiB: a wider header-sniff window
    # (--content-header-bytes-length > 1024) over the truncated head would
    # miss charsets declared past 1 KiB that the actual full-payload decode
    # honors — records would quarantine (or pass) inconsistently with the
    # decode. Any config that sniffs past the head width needs the payload.
    head_usable = "payload_head" in cols and opts.header_bytes <= 1024
    if (narrowed_try_list or not head_usable) and "payload" not in cols:
        raise ValueError(
            "this decode configuration is fallible over the FULL payload "
            "(narrowed charsets_to_try, or header_bytes wider than the 1 KiB "
            "ingest head), but this frame carries only payload_head — pass a "
            "frame with the payload column (content_records(..., "
            "with_payload=True); add with_head=True to enable the two-phase "
            "probe)"
        )
    err_udf = (
        decode_error
        if encoding_aliases is None and decode_options is None
        else make_decode_error_udf(options=opts)
    )
    bytes_col = (
        F.col("payload_head")
        if head_usable and not narrowed_try_list
        else F.col("payload")
    )
    return (
        base.withColumn(
            "reason",
            err_udf(bytes_col, F.col("http_charset"), F.col("stage")),
        )
        .filter(F.col("reason").isNotNull())
        .select(*out_cols)
    )


def exclude_failed_records(content: DataFrame, fails: DataFrame) -> DataFrame:
    """Drop exactly the failing RECORDS from the content stream, BEFORE
    first-wins dedup — the reference's --continue-on-error skips only the
    failing record (converter.py:411-437): a later duplicate record for the
    same path was never marked indexed, so it gets processed and becomes the
    item. Record-keyed on (file_seq, rec_seq); the fails frame is tiny
    relative to content, so the anti-join broadcasts."""
    return content.join(
        fails.select("file_seq", "rec_seq"),
        ["file_seq", "rec_seq"],
        "left_anti",
    )


def items_excluding_fails(items: DataFrame, fails: DataFrame) -> DataFrame:
    """Coarser post-dedup form: drop items whose WINNING record is
    quarantined. NOTE this drops the zim_path entirely even when a later
    duplicate record for the path would have decoded cleanly — the pipeline
    uses :func:`exclude_failed_records` (pre-dedup, record-level) instead,
    which matches the reference's skip-one-record loop (advisor r03).
    Retained for callers that only have the post-dedup item table."""
    return items.join(
        fails.select("zim_path", "file_seq", "rec_seq"),
        ["zim_path", "file_seq", "rec_seq"],
        "left_anti",
    )
