"""HTTP status-code predicates.

Reference semantics (utils.py:60-122, pinned by
tests/test_warc_to_zim.py:653-715):

* processable ⇔ status ∈ {200, 201, 202, 203, 301, 302, 307, 308}
  (``can_process_status_code`` whitelists OK/CREATED/ACCEPTED/
  NON_AUTHORITATIVE_INFORMATION among 2xx and MOVED_PERMANENTLY/FOUND/
  TEMPORARY_REDIRECT/PERMANENT_REDIRECT among 3xx; all 1xx/4xx/5xx and
  non-HTTPStatus codes like 0/306 are rejected — the whitelist subsumes the
  isinstance(HTTPStatus) check since every whitelisted code is a valid
  HTTPStatus).
* processable redirect ⇔ status ∈ {301, 302, 307, 308}
  (utils.py:115-122).
* missing/empty status → None → not processable (utils.py:70-72).

These are plain frozensets so the Spark side can use a JVM-native
``col("status").isin(...)`` — no UDF in the hot filter path.
"""

from __future__ import annotations

PROCESSABLE_STATUSES = frozenset({200, 201, 202, 203, 301, 302, 307, 308})
REDIRECT_STATUSES = frozenset({301, 302, 307, 308})
# main-page redirect follow uses 301/302/307 only (converter.py:590-594)
MAIN_PAGE_REDIRECT_STATUSES = frozenset({301, 302, 307})


def can_process_status_code(status: int | None) -> bool:
    return status is not None and status in PROCESSABLE_STATUSES


def is_processable_redirect(status: int | None) -> bool:
    return status is not None and status in REDIRECT_STATUSES
