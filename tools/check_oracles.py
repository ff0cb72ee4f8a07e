"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 in Spark AND its oracle_sql() twin in DuckDB, compare
row-count + schema(names) + order-insensitive values.

Usage: python tools/check_oracles.py [--arrow-off] [query ...]

``--arrow-off`` re-runs with spark.sql.execution.arrow.pyspark.enabled=false —
the driver's own session runs Arrow-OFF, where createDataFrame takes the
_createFromLocal pickle path whose type verifier REJECTS numpy scalars (this
exact class crashed e_ann_ivf in CORRECTNESS_r04 while every builder-side
Arrow-ON session stayed green). Run both modes before each round's final
commit.
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
VIEWS = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def table_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], list]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    normed = sorted(tuple(norm_cell(r[i]) for i in order) for r in rows)
    return len(rows), sorted_cols, normed


def main() -> int:
    argv = sys.argv[1:]
    arrow_off = "--arrow-off" in argv
    only = {a for a in argv if not a.startswith("--")}
    from warc2zim_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    if arrow_off:
        # Mirror the driver's session: Arrow transfers disabled. pandas UDFs
        # still run (they require Arrow on the worker side regardless of this
        # conf); what changes is createDataFrame/collect taking the pickle
        # path, whose type verifier is stricter than Arrow's.
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
        print("mode: ARROW OFF (driver-session mirror)")
    con = duckdb.connect()
    for view in VIEWS:
        con.execute(
            f"CREATE VIEW {view} AS SELECT * FROM read_parquet('{SF_DIR}/{view}.parquet')"
        )
    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            spark_cols = sdf.columns
            spark_rows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            print(f"FAIL  {name}: spark error: {exc}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(spark_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.execute(oracles[name])
            duck_cols = [d[0] for d in rel.description]
            duck_rows = rel.fetchall()
        except Exception as exc:
            print(f"FAIL  {name}: duckdb error: {str(exc)[:300]}")
            failures.append(name)
            continue
        sn, scols, svals = table_fingerprint(spark_cols, spark_rows)
        dn, dcols, dvals = table_fingerprint(duck_cols, duck_rows)
        status = "OK  "
        detail = ""
        if scols != dcols:
            status = "FAIL"
            detail = f" schema {scols} vs {dcols}"
        elif sn != dn:
            status = "FAIL"
            detail = f" rows {sn} vs {dn}"
        elif svals != dvals:
            status = "FAIL"
            diffs = [
                (a, b) for a, b in zip(svals, dvals) if a != b
            ][:3]
            detail = f" values differ, e.g. {diffs}"
        print(f"{status}  {name}: {sn} rows [{time.time()-t0:.1f}s]{detail}")
        if status == "FAIL":
            failures.append(name)
    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
