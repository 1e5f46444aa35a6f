"""PII detection and redaction for web-text training corpora.

Not in the reference (its scope is graph kernels — SURVEY.md §2.5); this
is the standard pre-training hygiene pass every public corpus pipeline
runs (C4 strips bad-word pages; Dolma/RefinedWeb mask emails, phone
numbers, and IP addresses before release). Everything here is pure
column expressions over Spark's JVM regex engine — one codegen stage,
zero shuffles, zero Python in the hot path — so at 100 TB the pass costs
exactly one scan fused into whatever else the pipeline computes.

The patterns are intentionally the simple, public, high-recall ones
(Dolma's release used the same shapes): a 100 TB corpus pass prefers a
cheap over-match (masking `999.999.999.999` as an "IP") to a
per-row-validated regex that breaks codegen. Every pattern is valid and
identical under BOTH Java regex (Spark) and Python ``re`` — the test
suite replays them with ``re`` as the differential oracle — and uses no
lookbehind/lookahead, no backreferences, and no engine-specific classes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# RFC-5322-lite: local part @ dotted domain with an alpha TLD. Public
# shape (same family as Dolma's email regex); \b anchors keep a trailing
# period out of the match.
EMAIL_RE = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"

# NANP-ish phone: optional +country code, optional (area), separators
# -. or space, 3-3-4 digits. Over-matches some numeric strings by
# design (recall over precision for a redaction pass). The word
# boundary lives INSIDE the digit-leading alternative: `\b(` never
# holds (no word char on either side), so a leading `\b` would reject
# every parenthesized area code.
PHONE_RE = r"(?:\+\d{1,3}[-. ]?)?(?:\(\d{3}\)[-. ]?|\b\d{3}[-. ])\d{3}[-. ]\d{4}\b"

# Dotted-quad IPv4 (unvalidated octets — see module docstring).
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

# ordered: emails first so a phone-ish local part is consumed by the
# email mask, ips before phones so `1.2.3.4` never half-matches.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "[EMAIL]"),
    ("ipv4", IPV4_RE, "[IP]"),
    ("phone", PHONE_RE, "[PHONE]"),
]


def pii_counts(df: DataFrame, col: str = "text") -> DataFrame:
    """Per-document PII hit counts: adds ``n_email``, ``n_ipv4``,
    ``n_phone`` (long) and ``pii_total``. Counts follow the same
    first-match-consumes order as :func:`pii_redact` (emails counted on
    the raw text, ipv4 on the email-masked text, phones on the
    ip-masked text) so ``pii_total`` equals the number of mask tokens
    redaction would emit."""
    c: Column = F.col(col)
    out = df
    total = F.lit(0).cast("long")
    for name, pattern, token in PII_PATTERNS:
        n = F.regexp_count(c, F.lit(pattern)).cast("long")
        out = out.withColumn(f"n_{name}", n)
        total = total + n
        c = F.regexp_replace(c, pattern, token)
    return out.withColumn("pii_total", total)


def pii_redact(
    df: DataFrame,
    col: str = "text",
    out: str = "text_redacted",
) -> DataFrame:
    """Mask emails → ``[EMAIL]``, IPv4s → ``[IP]``, phones → ``[PHONE]``
    in ``col``, in that order (each stage runs on the previous stage's
    output, so an already-masked span is never re-matched). Adds the
    redacted column; the original column is untouched — a release
    pipeline drops it explicitly."""
    c: Column = F.col(col)
    for _, pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return df.withColumn(out, c)


def pii_filter(
    df: DataFrame,
    col: str = "text",
    max_hits: int = 0,
) -> DataFrame:
    """Keep only documents with at most ``max_hits`` PII matches
    (default: zero — the strict split used for public release sets).
    Counting columns are not retained; the filter composes with
    :func:`pii_counts` when the caller wants both."""
    if max_hits < 0:
        raise ValueError("max_hits must be >= 0")
    c: Column = F.col(col)
    total = F.lit(0).cast("long")
    for _, pattern, token in PII_PATTERNS:
        total = total + F.regexp_count(c, F.lit(pattern)).cast("long")
        c = F.regexp_replace(c, pattern, token)
    return df.filter(total <= F.lit(max_hits))
