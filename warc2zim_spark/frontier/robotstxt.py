"""robots.txt text → the frontier's rule table (RFC 9309 subset).

The crawl operators consume a parsed (host, rule_type, path_prefix,
crawl_delay_ms) table; this module closes the text gap: raw robots.txt
bodies (one per host, e.g. captured as ``<host>/robots.txt`` records or a
(host, body) frame) parse into that table distributed-side.

Scope (RFC 9309 + the de-facto Crawl-delay extension):
* group = one or more ``User-agent:`` lines followed by rules; we keep the
  ``*`` group and a specific agent's group when ``agent`` is given (the
  specific group REPLACES ``*`` per §2.2.1 — most-specific group wins).
* ``Allow:`` / ``Disallow:`` with path prefixes; empty ``Disallow:`` means
  allow-all (emitted as no rule). ``$``/``*`` wildcards are NOT implemented
  (documented subset — the politeness gate is longest-prefix, RFC 9309
  §2.2.2 default matching).
* ``Crawl-delay: <seconds>`` (non-standard, honored by most crawlers) →
  crawl_delay_ms on every rule row of the group, and a delay-only row when
  the group has no path rules.
* comments (#), blank lines, unknown directives, case-insensitive keys.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROBOTS_RULES_SCHEMA = (
    "host string, rule_type string, path_prefix string, crawl_delay_ms int"
)


def parse_robots_txt(
    host: str, body: str | None, agent: str = "*"
) -> list[tuple[str, str, str, int | None]]:
    """One robots.txt body → rule rows (host, rule_type, path_prefix,
    crawl_delay_ms). Pure function; deterministic."""
    if not body:
        return []
    groups: list[dict] = []
    current: dict | None = None
    awaiting_agents = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if current is None or not awaiting_agents:
                current = {"agents": [], "rules": [], "delay": None}
                groups.append(current)
                awaiting_agents = True
            current["agents"].append(value.lower())
        elif current is not None:
            awaiting_agents = False
            if key in ("allow", "disallow"):
                if value:  # empty Disallow = allow everything = no rule
                    current["rules"].append((key, value))
            elif key == "crawl-delay":
                try:
                    current["delay"] = int(float(value) * 1000)
                except ValueError:
                    pass

    agent = agent.lower()
    specific = [g for g in groups if agent != "*" and agent in g["agents"]]
    chosen = specific if specific else [g for g in groups if "*" in g["agents"]]
    out: list[tuple[str, str, str, int | None]] = []
    for g in chosen:
        for rule_type, prefix in g["rules"]:
            out.append((host, rule_type, prefix, g["delay"]))
        if not g["rules"] and g["delay"] is not None:
            # delay-only group: politeness still applies host-wide
            out.append((host, "allow", "/", g["delay"]))
    return out


def robots_rules_from_text(robots_bodies: DataFrame, agent: str = "*") -> DataFrame:
    """(host, body) frame → the parsed rule table the politeness/robots
    operators consume. mapInPandas (a host's file parses in one row; files
    are KB-sized)."""
    def parse(batches):
        for pdf in batches:
            rows: list[tuple] = []
            for host, body in zip(pdf["host"], pdf["body"]):
                rows.extend(parse_robots_txt(host, body, agent))
            yield pd.DataFrame(
                rows, columns=["host", "rule_type", "path_prefix", "crawl_delay_ms"]
            )

    return robots_bodies.mapInPandas(parse, schema=ROBOTS_RULES_SCHEMA)
