"""WARC (Web ARChive) source/sink: the on-disk format of Common Crawl.

A ``.warc.gz`` file is a CONCATENATION of independently-gzipped members,
one WARC record per member — that framing is what lets a reader split
records without a serial scan of the whole archive, and a writer compress
members in parallel. Everything here is stdlib ``zlib``/``gzip`` + Arrow
batches; no external warcio dependency.

* ``warc_encode(records)`` — fixture/writer primitive: WARC/1.0 response
  records (WARC-Target-URI / WARC-Date / Content-Length framing, HTTP
  envelope), each record its own gzip member.
* ``write_warc(pages, directory)`` — distributed sink: ``mapInPandas``
  writes one ``.warc.gz`` per Arrow batch from the executors and returns
  a manifest (path, n_records, n_bytes) DataFrame.
* ``read_warc(spark, path)`` — source: ``binaryFile`` scan (one task per
  archive — the standard Common-Crawl processing unit, ~1 GB gzip each),
  gzip-member split via ``zlib.decompressobj().unused_data`` walk, WARC
  header parse, HTTP header strip → the engine's canonical pages table
  ``(url, warc_ts, html, text, lang)`` per BASELINE.json.input_hint, with
  ``text`` from the same vectorized extractor as the generator path (so
  per-url text is byte-identical however the page arrived) and ``lang``
  from the n-gram language_id heuristic.

At 100 TB: archives are independent files — the scan parallelizes per
file, record parsing is executor-local CPU, and nothing shuffles until
the downstream graph build. Memory per task is one archive (bounded by
CC's ~1 GB convention), not the corpus.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)
_RAW_SCHEMA = "url string, warc_date string, html binary"
MANIFEST_SCHEMA = "path string, n_records long, n_bytes long"


# ---------------------------------------------------------------------------
# record framing
# ---------------------------------------------------------------------------


def _http_envelope(html: bytes) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
        + b"Content-Length: " + str(len(html)).encode() + _CRLF + _CRLF + html
    )


def warc_encode(records: list[tuple[str, str, bytes]]) -> bytes:
    """Encode (url, iso_date, html_bytes) records as a ``.warc.gz`` byte
    string — one WARC/1.0 response record per gzip member."""
    import gzip

    out = []
    for url, date, html in records:
        http = _http_envelope(html if html is not None else b"")
        headers = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + url.encode() + _CRLF
            + b"WARC-Date: " + date.encode() + _CRLF
            + b"Content-Type: application/http; msgtype=response\r\n"
            + b"Content-Length: " + str(len(http)).encode() + _CRLF + _CRLF
        )
        member = headers + http + _CRLF + _CRLF
        out.append(gzip.compress(member, compresslevel=6, mtime=0))
    return b"".join(out)


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Yield each gzip member of a multi-member stream, decompressed."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)  # 16+15: gzip wrapper
        chunk = d.decompress(data[pos:])
        while not d.eof and not d.unused_data:
            tail = d.decompress(b"")
            if not tail:
                break
            chunk += tail
        if not d.eof:
            raise ValueError(f"truncated gzip member at offset {pos}")
        yield chunk
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError(f"gzip member at offset {pos} consumed no bytes")
        pos += consumed


def _parse_record(raw: bytes) -> tuple[str, str, bytes] | None:
    """Parse one decompressed WARC record; return (url, date, html) for
    ``WARC-Type: response`` records, None for any other type."""
    split = raw.find(_CRLF + _CRLF)
    if split < 0 or not raw.startswith(b"WARC/"):
        raise ValueError("malformed WARC record (no header block)")
    headers: dict[str, str] = {}
    for line in raw[:split].split(_CRLF)[1:]:
        k, _, v = line.partition(b":")
        headers[k.decode().strip().lower()] = v.decode().strip()
    if headers.get("warc-type") != "response":
        return None
    length = int(headers["content-length"])
    body = raw[split + 4 : split + 4 + length]
    # strip the HTTP response envelope if present
    if body.startswith(b"HTTP/"):
        h = body.find(_CRLF + _CRLF)
        body = body[h + 4 :] if h >= 0 else b""
    return headers["warc-target-uri"], headers["warc-date"], body


# ---------------------------------------------------------------------------
# Spark sink / source
# ---------------------------------------------------------------------------


def write_warc(pages: DataFrame, directory: str, prefix: str = "part") -> DataFrame:
    """Distributed WARC sink: each Arrow batch of the (url, warc_ts, html)
    columns becomes one ``part-<partition>-<batch>.warc.gz`` under
    ``directory`` (executor-local write — at scale, point this at a
    shared filesystem mount). Returns the manifest as a DataFrame; the
    write happens when the manifest is materialized. Distinct ``prefix``
    values keep repeated writes into one directory from colliding."""
    import os

    os.makedirs(directory, exist_ok=True)

    def sink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        for i, pdf in enumerate(batches):
            recs = [
                (
                    u,
                    pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ"),
                    bytes(h) if h is not None else b"",
                )
                for u, ts, h in zip(pdf["url"], pdf["warc_ts"], pdf["html"])
            ]
            data = warc_encode(recs)
            path = os.path.join(directory, f"{prefix}-{pid:05d}-{i:03d}.warc.gz")
            with open(path, "wb") as f:
                f.write(data)
            yield pd.DataFrame(
                {"path": [path], "n_records": [len(recs)], "n_bytes": [len(data)]}
            )

    return pages.select("url", "warc_ts", "html").mapInPandas(
        sink, schema=MANIFEST_SCHEMA
    )


def _glob(path: str) -> str:
    return path if path.endswith(".warc.gz") else path.rstrip("/") + "/*.warc.gz"


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read ``.warc.gz`` archives into the canonical pages table
    ``(url, warc_ts, html, text, lang)``."""
    raw = spark.read.format("binaryFile").load(_glob(path))
    return _pages_from_archives(raw)


def stream_warc(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming variant of :func:`read_warc`: new ``.warc.gz`` archives
    landing under ``path`` become micro-batches of the same canonical
    pages table — feed the result to
    :func:`arkouda_njit_spark.streaming.streaming_page_ingest` for the
    re-crawl-aware link state. (File sources are exactly-once: each
    archive is processed in one micro-batch, tracked by the stream's
    checkpoint.)"""
    reader = spark.readStream.format("binaryFile")
    # streaming file sources require an explicit schema (binaryFile's is fixed)
    reader = reader.schema(
        "path string, modificationTime timestamp, length long, content binary"
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return _pages_from_archives(reader.load(_glob(path)))


def _pages_from_archives(raw: DataFrame) -> DataFrame:
    from ..functions.text import language_id
    from .pages import _extract_text_udf

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, dates, htmls = [], [], []
            for blob in pdf["content"]:
                for member in _gzip_members(bytes(blob)):
                    rec = _parse_record(member)
                    if rec is None:
                        continue
                    urls.append(rec[0])
                    dates.append(rec[1])
                    htmls.append(rec[2])
            yield pd.DataFrame({"url": urls, "warc_date": dates, "html": htmls})

    parsed = raw.select("content").mapInPandas(parse, schema=_RAW_SCHEMA)
    # WARC 1.1 allows fractional seconds in WARC-Date (present in real
    # Common Crawl archives); strip them before the second-resolution parse
    # rather than silently nulling the timestamp (round-4 ADVICE #3), and
    # raise on genuinely unparseable dates instead of yielding NaT.
    stripped = F.regexp_replace(F.col("warc_date"), r"\.\d+Z$", "Z")
    ts = F.to_timestamp(stripped, "yyyy-MM-dd'T'HH:mm:ss'Z'")
    pages = parsed.select(
        "url",
        F.when(F.col("warc_date").isNull() | ts.isNotNull(), ts)
        .otherwise(
            F.raise_error(
                F.concat(F.lit("unparseable WARC-Date: "), F.col("warc_date"))
            )
        )
        .alias("warc_ts"),
        "html",
    )
    pages = pages.withColumn("text", _extract_text_udf()(F.col("html")))
    return language_id(pages, "text", out="lang").select(
        "url", "warc_ts", "html", "text", "lang"
    )
