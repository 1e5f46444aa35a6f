"""Streaming deduplication — drop duplicate documents as they arrive.

A crawl ingest sees the same document many times (re-fetches, mirror
hosts, URL variants); deduplicating at INGEST keeps everything
downstream (link extraction, quality scoring, the batch near-dup
passes) from paying for copies. Two published-semantics surfaces over
Structured Streaming's state store:

* ``stream_exact_dedup`` — exactly the batch `exact_duplicates`
  criterion (byte-identical text, via md5 digest) as unbounded
  ``dropDuplicates`` on the digest, or watermark-bounded
  ``dropDuplicatesWithinWatermark`` when an event-time column + horizon
  is given, so the per-key state is evicted once the duplicate horizon
  passes (at Common-Crawl scale state must be bounded — re-fetch storms
  cluster in time, so a horizon of days catches them without holding
  the corpus's digests forever).
* ``stream_simhash_dedup`` — the SimHash bucket criterion: a document
  is dropped if an earlier doc in the stream shared its ``bits``-wide
  SimHash (the batch pipeline's bucket key). Same state machinery, key
  = the simhash value; this is the aggressive "near-exact" ingest
  filter, with the batch pigeonhole pass remaining the precise one.

Only digests/fingerprints enter the state store — never text — the
same digests-only shuffle discipline as the batch dedup family
(functions/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dedup import simhash_column


def stream_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    event_time_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """The input stream minus rows whose ``text_col`` digest was already
    seen. With ``event_time_col`` and ``within`` (e.g. "7 days"), the
    seen-set is watermark-bounded; otherwise it grows with the distinct
    corpus (fine for bounded backfills, not for a perpetual crawl)."""
    digested = stream.withColumn("_digest", F.md5(F.col(text_col)))
    if within is not None:
        if event_time_col is None:
            raise ValueError("within requires event_time_col")
        out = digested.withWatermark(
            event_time_col, within
        ).dropDuplicatesWithinWatermark(["_digest"])
    else:
        out = digested.dropDuplicates(["_digest"])
    return out.drop("_digest")


def stream_simhash_dedup(
    stream: DataFrame,
    text_col: str = "text",
    bits: int = 32,
    event_time_col: str | None = None,
    within: str | None = None,
) -> DataFrame:
    """The input stream minus rows whose ``bits``-wide SimHash collides
    with an earlier row's — the near-exact ingest filter. Watermark
    bounding as in :func:`stream_exact_dedup`."""
    hashed = stream.withColumn("_sh", simhash_column(text_col, bits=bits))
    if within is not None:
        if event_time_col is None:
            raise ValueError("within requires event_time_col")
        out = hashed.withWatermark(
            event_time_col, within
        ).dropDuplicatesWithinWatermark(["_sh"])
    else:
        out = hashed.dropDuplicates(["_sh"])
    return out.drop("_sh")
