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
