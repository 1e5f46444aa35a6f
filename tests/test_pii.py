"""PII detection/redaction with a pure-Python ``re`` differential oracle.

The module guarantees its patterns mean the same thing under Java regex
(Spark's engine) and Python ``re``; these tests enforce that by
replaying every pattern with ``re`` on the same documents — real corpus
rows from the driver's documents table plus adversarial synthetics —
and requiring byte-identical redacted text and identical counts.
"""

import re

import pytest

from arkouda_njit_spark.functions import pii_counts, pii_filter, pii_redact
from arkouda_njit_spark.functions.pii import PII_PATTERNS

SF_DIR = "/root/testdata/sf0.001"

# adversarial corners: boundary anchoring, ordering (email local parts
# that look phone-ish, IPs inside longer dotted runs), unicode, empties
SYNTHETIC = [
    "reach me at alice.bob+spam@example.co.uk or (555) 867-5309 today",
    "server 10.0.0.1 and 192.168.100.255 but not 1.2.3.4.5 fully",
    "+1 415-555-2671 vs bare 4155552671 vs 415.555.2671",
    "email-with-digits 555-867-5309@phones.example.com should be one EMAIL",
    "no pii here, just text. version 1.2 and section 3.4 stay",
    "",
    "unicode café München — contact müller@example.de maybe",
    "edge999.999.999.999edge and x@y.zz",
]


def _py_redact(text: str) -> str:
    for _, pattern, token in PII_PATTERNS:
        text = re.sub(pattern, token, text)
    return text


def _py_counts(text: str) -> dict:
    out = {}
    total = 0
    for name, pattern, token in PII_PATTERNS:
        n = len(re.findall(pattern, text))
        out[f"n_{name}"] = n
        total += n
        text = re.sub(pattern, token, text)
    out["pii_total"] = total
    return out


@pytest.fixture(scope="module")
def docs(spark):
    corpus = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    synth = spark.createDataFrame(
        [(10_000 + i, t) for i, t in enumerate(SYNTHETIC)],
        "doc_id long, text string",
    )
    return corpus.unionByName(synth).persist()


def test_redact_matches_python_re(docs):
    got = {r["doc_id"]: r["text_redacted"] for r in pii_redact(docs).collect()}
    want = {r["doc_id"]: _py_redact(r["text"]) for r in docs.collect()}
    assert got == want


def test_counts_match_python_re(docs):
    rows = pii_counts(docs).collect()
    for r in rows:
        want = _py_counts(r["text"])
        for k, v in want.items():
            assert r[k] == v, (r["doc_id"], k, r[k], v)


def test_counts_agree_with_redaction_token_count(docs):
    # pii_total must equal the number of mask tokens redaction emits
    joined = pii_counts(pii_redact(docs)).collect()
    for r in joined:
        emitted = sum(
            r["text_redacted"].count(token) for _, _, token in PII_PATTERNS
        )
        assert r["pii_total"] == emitted, r["doc_id"]


def test_synthetic_expectations(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SYNTHETIC)], "doc_id long, text string"
    )
    by_id = {r["doc_id"]: r for r in pii_counts(df).collect()}
    assert by_id[0]["n_email"] == 1 and by_id[0]["n_phone"] == 1
    assert by_id[1]["n_ipv4"] >= 2
    # phone-ish local part consumed by the email mask: exactly one EMAIL
    assert by_id[3]["n_email"] == 1 and by_id[3]["n_phone"] == 0
    assert by_id[4]["pii_total"] == 0
    assert by_id[5]["pii_total"] == 0


def test_filter_strict_and_relaxed(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(SYNTHETIC)], "doc_id long, text string"
    )
    clean_ids = {r["doc_id"] for r in pii_filter(df).select("doc_id").collect()}
    want_clean = {
        i for i, t in enumerate(SYNTHETIC) if _py_counts(t)["pii_total"] == 0
    }
    assert clean_ids == want_clean
    relaxed = {
        r["doc_id"] for r in pii_filter(df, max_hits=2).select("doc_id").collect()
    }
    assert clean_ids <= relaxed
    with pytest.raises(ValueError):
        pii_filter(df, max_hits=-1)


def test_pii_single_stage_no_exchange(spark):
    """Redaction+counts are per-document column expressions: any Exchange
    in the plan would mean the hygiene pass shuffles the corpus."""
    df = spark.createDataFrame(
        [(i, "a@b.co 1.2.3.4") for i in range(50)], "doc_id long, text string"
    )
    plan = pii_counts(pii_redact(df))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
