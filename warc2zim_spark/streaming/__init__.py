"""Streaming — intentionally empty.

The reference is strictly batch: two passes over a finite input, no
watermarks, no event-time windows, no late data (SURVEY.md §2.8;
reference converter.py:303,411). The north-star frontier loop is *iterative
batch* — BFS waves with checkpoint/restart between waves
(frontier/crawl.py) — because every wave needs the COMPLETE previous wave's
seen-set before scheduling (a hard barrier), which Structured Streaming's
incremental model cannot express without abusing stateful operators for a
global synchronization they're not built for. Checkpoint-per-wave gives the
same resumability guarantee with none of the state-store cost.

If a record *tail* source ever appears (e.g. WARCs landing continuously),
the ingest stage (operators/records.py) is readStream-compatible as-is:
every transformation before the first-wins window is stateless, and the
dedup window maps to ``dropDuplicatesWithinWatermark`` on surt_key — that
is the one operator that would change.
"""
