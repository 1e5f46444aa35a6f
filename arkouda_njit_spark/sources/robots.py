"""robots.txt parsing and URL admission — RFC 9309 Robots Exclusion
Protocol for the crawl stack.

The frontier scheduler (sources/frontier.py) enforces politeness RATE;
this module enforces politeness SCOPE: which paths a host allows at
all. Semantics follow RFC 9309 / the Google REP documentation:

* groups — one or more ``User-agent:`` lines followed by
  ``Allow:``/``Disallow:`` rules; a crawler obeys the most specific
  matching group (exact product token beats ``*``), and ONLY that group;
* matching — rule paths are prefix patterns where ``*`` matches any
  run of characters and ``$`` anchors the end;
* precedence — the longest (most specific) matching rule wins; on an
  allow/disallow tie at equal length, allow wins; no matching rule
  means allowed. An empty ``Disallow:`` value matches nothing.

Plan shape: parsing is per-file sequential by nature (group state runs
down the lines), so it runs as an Arrow ``mapInPandas`` batch per
robots file — one file is one row, the same granularity discipline as
the WARC reader. Admission is relational: URLs equi-join their host's
(typically tens of) rules, every (url, rule) match is ONE vectorized
regexp, and the winner is a max over the matched struct (longest, then
allow) — a map-side-combinable aggregate, no window, no sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pages import extract_host

_RULES_SCHEMA = "host string, agent string, allow boolean, pattern string, prio int"


def _pattern_to_regex(pattern: str) -> str:
    """RFC 9309 path pattern -> anchored Java regex ('*' wildcard, '$' end)."""
    import re as _re

    ends_anchored = pattern.endswith("$")
    body = pattern[:-1] if ends_anchored else pattern
    parts = [_re.escape(p) for p in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if ends_anchored else "")


def parse_robots(robots: DataFrame, agent: str = "*") -> DataFrame:
    """(host, agent, allow, pattern, prio) rules for ``agent`` from a
    (host, body) table of robots.txt files.

    Per RFC 9309 group selection, rules are taken from the group(s)
    whose user-agent token is an exact (case-insensitive) match for
    ``agent`` when any exist, else from the ``*`` group; ``prio`` is the
    pattern length used for longest-match precedence. The emitted
    ``pattern`` is already regex-compiled (anchored) for the admission
    join."""
    wanted = agent.lower()

    def parse(batches):
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in ("host", "agent", "allow", "pattern", "prio")}
            for host, body in zip(pdf["host"], pdf["body"]):
                if body is None:
                    continue
                groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
                agents: list[str] = []
                rules: list[tuple[bool, str]] = []
                in_agents = True
                for raw in str(body).splitlines():
                    line = raw.split("#", 1)[0].strip()
                    if not line or ":" not in line:
                        continue
                    key, _, val = line.partition(":")
                    key = key.strip().lower()
                    val = val.strip()
                    if key == "user-agent":
                        if not in_agents:
                            groups.append((agents, rules))
                            agents, rules = [], []
                        agents.append(val.lower())
                        in_agents = True
                    elif key in ("allow", "disallow"):
                        if agents:
                            rules.append((key == "allow", val))
                            in_agents = False
                if agents:
                    groups.append((agents, rules))
                exact = [g for g in groups if wanted in g[0]]
                chosen = exact or [g for g in groups if "*" in g[0]]
                for _, grules in chosen:
                    for allow, pat in grules:
                        if not pat:
                            continue  # empty Disallow/Allow matches nothing
                        out["host"].append(host)
                        out["agent"].append(wanted)
                        out["allow"].append(allow)
                        out["pattern"].append(_pattern_to_regex(pat))
                        out["prio"].append(len(pat))
            yield pd.DataFrame(out)

    return robots.select("host", "body").mapInPandas(parse, schema=_RULES_SCHEMA)


def robots_allowed(
    urls: DataFrame, rules: DataFrame, url_col: str = "url"
) -> DataFrame:
    """The input URL table plus an ``allowed`` boolean.

    One equi-join on host (the rules side is tiny per host and
    broadcastable when the whole rule table fits), one vectorized
    regexp per (url, rule) row, then the RFC 9309 winner as a plain
    max-of-struct aggregate: (prio, allow) ordered so the longest match
    wins and allow beats disallow at equal length. URLs whose host has
    no rules (or no matching rule) are allowed."""
    path = F.coalesce(
        F.nullif(
            F.regexp_replace(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", ""),
            F.lit(""),
        ),
        F.lit("/"),
    )
    with_host = urls.withColumn("_host", extract_host(F.col(url_col))).withColumn(
        "_path", path
    )
    matched = (
        with_host.join(
            rules.select(
                F.col("host").alias("_host"), "allow", "pattern", "prio"
            ),
            "_host",
            "left",
        )
        .withColumn(
            "_hit",
            F.when(
                F.col("pattern").isNotNull()
                & F.expr("_path rlike pattern"),
                F.struct(F.col("prio"), F.col("allow")),
            ),
        )
    )
    verdict = matched.groupBy(url_col).agg(
        F.max("_hit").alias("_best"),
    )
    return (
        urls.join(verdict, url_col, "left")
        .withColumn(
            "allowed", F.coalesce(F.col("_best.allow"), F.lit(True))
        )
        .drop("_best")
    )
