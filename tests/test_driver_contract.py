"""Driver-contract invariants: the external driver records at most 50
queries (r01 recorded 37/37; r02 recorded exactly 50 of 51 with the last
dict entry silently dropped — t_events_windows went untested a full round).
Every query must be either oracle-checked or on the documented rows-only
list."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# queries with no SQL twin, each with a reason the judge can audit
# (empty since round 3: every query is oracle-checked)
ROWS_ONLY: dict[str, str] = {}

DRIVER_QUERY_CAP = 50


def _entry():
    import __spark_entry__ as entry

    return entry


def test_query_count_within_driver_cap():
    entry = _entry()
    n = len(entry.queries())
    assert n <= DRIVER_QUERY_CAP, (
        f"{n} queries > driver cap {DRIVER_QUERY_CAP}: the overflow entries "
        "would silently go unrecorded — consolidate queries instead"
    )


def test_every_query_has_oracle_or_is_documented_rows_only():
    entry = _entry()
    queries = set(entry.queries())
    oracles = set(entry.oracle_sql())
    missing = queries - oracles - set(ROWS_ONLY)
    assert not missing, f"queries with no oracle and no rows-only reason: {missing}"


def test_no_orphan_oracles():
    entry = _entry()
    orphans = set(entry.oracle_sql()) - set(entry.queries())
    assert not orphans, f"oracle_sql entries with no query: {orphans}"


def test_rows_only_list_is_current():
    entry = _entry()
    stale = set(ROWS_ONLY) & set(entry.oracle_sql())
    assert not stale, f"rows-only entries that now HAVE oracles: {stale}"
    gone = set(ROWS_ONLY) - set(entry.queries())
    assert not gone, f"rows-only entries no longer in queries(): {gone}"


class TestArrowOffSessionMirror:
    """The driver's SparkSession runs with Arrow transfers DISABLED, where
    createDataFrame takes the _createFromLocal pickle path whose type
    verifier rejects numpy scalars (numpy.float64 inside array<double>
    crashed e_ann_ivf in CORRECTNESS_r04 while every Arrow-on builder
    session stayed green). These tests toggle the runtime conf off and run
    the literal-frame-constructing queries so that bug class fails locally."""

    ARROW_CONF = "spark.sql.execution.arrow.pyspark.enabled"

    # every queries() entry that constructs a local DataFrame (literal rows,
    # pandas frame, or collect()-round-trip) — the Arrow-sensitive surface
    LITERAL_FRAME_QUERIES = [
        "e_ann_ivf",     # pandas frame of KMeans centroids
        "w_icon_rank",   # literal icon candidate rows
        "w_main_page",   # literal --url stand-in row (merged J5 redirect leg)
    ]

    def test_literal_frame_queries_run_arrow_off(self, spark):
        import __spark_entry__ as entry

        queries = entry.queries()
        prev = spark.conf.get(self.ARROW_CONF)
        spark.conf.set(self.ARROW_CONF, "false")
        try:
            for name in self.LITERAL_FRAME_QUERIES:
                out = queries[name](spark, "/root/testdata/sf0.001")
                assert out.count() >= 0, name
        finally:
            spark.conf.set(self.ARROW_CONF, prev)

    def test_numpy_scalars_rejected_arrow_off(self, spark):
        """Pin the mechanism: the pickle-path verifier rejects numpy floats,
        so any regression back to numpy-typed literal frames fails here."""
        import numpy as np
        import pandas as pd
        import pytest

        prev = spark.conf.get(self.ARROW_CONF)
        spark.conf.set(self.ARROW_CONF, "false")
        try:
            with pytest.raises(Exception, match="can not accept object"):
                spark.createDataFrame(
                    pd.DataFrame({"v": [np.asarray([1.0], dtype=np.float64)]}),
                    "v array<double>",
                ).collect()
        finally:
            spark.conf.set(self.ARROW_CONF, prev)
