"""warc2zim_spark — a PySpark-native crawl-frontier + WARC→ZIM analytics engine.

A from-scratch re-expression of openzim/warc2zim's query and data-processing
capabilities (reference at /root/reference, v2.3.0) as Spark DataFrame plans +
vectorized Arrow/pandas UDFs, extended with the frontier/scheduler operators of
BASELINE.json `north_rule` and large-scale training-data ops (dedup, similarity
search, text analysis, multimodal plumbing).

Layout:
  kernels/    pure-Python UDF cores (no Spark import) — unit-testable, frozen
  functions/  pandas-UDF + Column-expression wrappers over the kernels
  sources/    synthetic deterministic data generation (seed=42) + readers
  operators/  DataFrame-level operators (filters, dedup, pairing, redirects, ...)
  plans/      end-to-end pipeline assembly (pass1 gather, pass2 items)
  frontier/   URL-seen filter, politeness, priority queue, BFS wave loop
"""

__version__ = "0.1.0"
