"""Main-content extraction (boilerplate removal) for web pages.

Training pipelines don't feed raw ``extract_text`` output to dedup/quality
scoring — nav bars, footers and sidebars repeat across a site and poison
near-dup clustering and n-gram stats. This implements the public
jusText-family heuristic (Pomikálek 2011; same family as Boilerpipe):

1. drop non-content subtrees outright (``script/style/nav/header/footer/
   aside/form/noscript`` plus comments),
2. segment the remaining HTML into blocks at block-level tag boundaries
   (``p/div/h1..h6/li/td/blockquote/article/section/pre/table/ul/ol``),
3. per block compute text length, LINK DENSITY (chars inside ``<a>`` over
   total chars) and STOPWORD DENSITY (fraction of words from a small
   built-in English function-word list),
4. context-free classify: high link density → bad; long + stopword-rich →
   good; everything else short/near — then one CONTEXT pass where
   near/short blocks inherit "good" only when a good block is adjacent
   (headings look like boilerplate context-free but belong to the article
   they precede).

Everything runs inside one ``mapInPandas`` Arrow batch — per-document
Python at the same granularity as the existing ``extract_links`` path, no
per-row UDF round trips, and the result is a pure function of the html
bytes (deterministic across partitionings, the input_hint invariant).

No reference analogue: the reference repo has no web-page path; this
belongs to the corpus-cleaning mandate of the training-data pipeline.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# small English function-word list (public/ubiquitous); jusText ships
# per-language lists — this is the en core, enough for the density signal
_STOPWORDS = frozenset(
    """a about above after again all also an and any are as at be because
    been before being below between both but by could did do does doing
    down during each few for from further had has have having he her here
    hers him his how i if in into is it its just me more most my no nor
    not now of off on once only or other our out over own same she so
    some such than that the their them then there these they this those
    through to too under until up very was we were what when where which
    while who whom why will with you your""".split()
)

#: subtrees removed outright before segmentation
_KILL = re.compile(
    r"<(script|style|nav|header|footer|aside|form|noscript)\b.*?</\1\s*>|<!--.*?-->",
    re.S | re.I,
)
#: block-level boundaries (open or close) that split the page into blocks
_BLOCK_SPLIT = re.compile(
    r"</?(?:p|div|h[1-6]|li|td|th|blockquote|article|section|pre|table|ul|ol|tr|br)\b[^>]*>",
    re.I,
)
_A_TEXT = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.S | re.I)
_TAG = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")
_WORD = re.compile(r"[a-z0-9']+")

# jusText's published context-free thresholds (defaults)
_LEN_LOW = 70          # chars: below this a block can't be good on its own
_LINK_HIGH = 0.33      # link density above this → bad, always
_STOP_HIGH = 0.30      # stopword density for "good" (jusText stopwords_high)
_LEN_SHORT = 10        # below this: too short to judge → context decides


def _classify_block(raw: str) -> tuple[str, str]:
    """(class, text) for one raw block; class in {good, bad, near, short}."""
    anchor_chars = sum(len(_WS.sub(" ", _TAG.sub(" ", m))) for m in _A_TEXT.findall(raw))
    text = _WS.sub(" ", _TAG.sub(" ", raw)).strip()
    n = len(text)
    if n == 0:
        return "bad", ""
    link_density = min(anchor_chars / n, 1.0)
    words = _WORD.findall(text.lower())
    stop_density = (
        sum(w in _STOPWORDS for w in words) / len(words) if words else 0.0
    )
    if link_density > _LINK_HIGH:
        return "bad", text
    if n < _LEN_SHORT:
        return "short", text
    if stop_density >= _STOP_HIGH:
        return ("good" if n >= _LEN_LOW else "near"), text
    return ("near" if n >= _LEN_LOW else "short"), text


def extract_main_content_one(html: bytes) -> tuple[str, int, int]:
    """(main_text, n_blocks, n_good) for one page — pure function of the
    bytes. Exposed separately so tests can replay it without Spark."""
    doc = html.decode("utf-8", errors="replace")
    doc = _KILL.sub(" ", doc)
    blocks = [b for b in _BLOCK_SPLIT.split(doc)]
    classified = [_classify_block(b) for b in blocks]
    classified = [(c, t) for c, t in classified if t]
    labels = [c for c, _ in classified]
    # context pass: near/short become good iff an adjacent block is good
    # (two sweeps so a near chain touching a good block is absorbed
    # one-step-per-side, like jusText's neighbour expansion)
    final = list(labels)
    for _ in range(2):
        nxt = list(final)
        for i, lab in enumerate(final):
            if lab in ("near", "short"):
                prev_good = i > 0 and final[i - 1] == "good"
                next_good = i + 1 < len(final) and final[i + 1] == "good"
                if prev_good or next_good:
                    nxt[i] = "good"
        if nxt == final:
            break
        final = nxt
    good = [t for lab, (_, t) in zip(final, classified) if lab == "good"]
    return "\n".join(good), len(classified), len(good)


_CONTENT_SCHEMA = "url string, text string, n_blocks int, n_good int"


def extract_main_content(pages: DataFrame) -> DataFrame:
    """(url, text, n_blocks, n_good): boilerplate-stripped main content per
    page. One Arrow batch per partition; per-document work only (the same
    granularity the html parse itself needs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                extract_main_content_one(bytes(b) if b is not None else b"")
                for b in pdf["html"]
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "text": [o[0] for o in out],
                    "n_blocks": [o[1] for o in out],
                    "n_good": [o[2] for o in out],
                }
            )

    return pages.select("url", "html").mapInPandas(run, schema=_CONTENT_SCHEMA)
