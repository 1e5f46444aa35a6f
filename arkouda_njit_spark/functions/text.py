"""Text analysis for large-scale training-data pipelines.

Not present in the reference (its string ops are suffix arrays/LCS in the
dev tree, out of scope — SURVEY.md §2.5); these are the operations a 100 TB
web-text corpus needs before training: token counting, quality scoring,
language ID, document fingerprinting. Everything is built-in column
expressions (JVM-side, whole-stage codegen) — no Python in the hot path.

All functions take/return DataFrames and are engine-agnostic enough that a
DuckDB oracle can replay them (driver correctness contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of trimmed text (empty text → empty array)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.length(F.trim(c)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(c), _WS)
    )


def token_count(df: DataFrame, col: str = "text", out: str = "n_tokens") -> DataFrame:
    return df.withColumn(out, F.size(tokens(col)))


def bpe_ish_token_count(df: DataFrame, col: str = "text", out: str = "n_bpe_tokens") -> DataFrame:
    """Sub-word-ish count: split on whitespace AND punctuation boundaries
    (a cheap regex stand-in for a BPE tokenizer's piece count)."""
    c = F.col(col)
    pieces = F.split(F.trim(c), r"\s+|(?=[^\w\s])|(?<=[^\w\s])")
    return df.withColumn(out, F.size(F.filter(pieces, lambda p: F.length(p) > 0)))


# small public stopword lists for the n-gram language heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "for", "with", "that", "this"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pour", "dans", "une", "que", "des"],
}


def language_id(df: DataFrame, col: str = "text", out: str = "lang_pred") -> DataFrame:
    """Stopword-hit language heuristic: the language whose stopword list
    intersects the token set most wins; 'und' (undetermined) on zero hits.
    Deterministic tie-break by language code order."""
    toks = F.array_distinct(F.transform(tokens(col), lambda t: F.lower(t)))
    hits = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in sorted(STOPWORDS.items())
    }
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        pred = F.when(hits[lang] == best, F.lit(lang)).otherwise(pred)
    return df.withColumn(out, F.when(best > 0, pred).otherwise(F.lit("und")))


def quality_score(df: DataFrame, col: str = "text", out: str = "quality") -> DataFrame:
    """Heuristic quality in [0,1]: length band, alpha ratio, punctuation
    ratio, mean word length band — the standard cheap pre-filters a web
    corpus applies before dedup (Gopher/C4-style rules, public)."""
    c = F.col(col)
    n_chars = F.length(c)
    n_tokens = F.size(tokens(col))
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    mean_word = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.when((n_chars >= 20) & (n_chars <= 100000), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(alpha_ratio >= 0.6, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(punct_ratio <= 0.1, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when((mean_word >= 3) & (mean_word <= 12), F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return df.withColumn(out, score)


def gopher_quality_flags(df: DataFrame, col: str = "text") -> DataFrame:
    """Gopher-style repetition/shape filters (Rae et al. 2021, public
    rules) as pure column expressions — the per-document flags a 100 TB
    corpus computes before dedup. Adds five boolean columns plus the
    combined keep flag:

      * ``flag_word_count``   — 50 <= words <= 100,000
      * ``flag_mean_word``    — 3 <= mean word length <= 10
      * ``flag_symbol_ratio`` — (# of '#' + ellipsis occurrences) / words <= 0.1
      * ``flag_bullet_lines`` — < 90% of lines start with a bullet
      * ``flag_alpha_words``  — >= 80% of words contain a letter
      * ``gopher_keep``       — all of the above
    """
    c = F.col(col)
    toks = tokens(col)
    n_words = F.size(toks)
    n_chars_in_words = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    mean_word = F.when(n_words > 0, n_chars_in_words / n_words).otherwise(F.lit(0.0))
    n_hash = F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
    n_ellipsis = F.size(F.split(c, r"\.\.\.", -1)) - 1
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellipsis) / n_words
    ).otherwise(F.lit(0.0))
    lines = F.split(c, r"\n", -1)
    n_lines = F.size(lines)
    bullet_lines = F.size(
        F.filter(lines, lambda ln: F.trim(ln).rlike(r"^[-*•]"))
    )
    bullet_ratio = F.when(n_lines > 0, bullet_lines / n_lines).otherwise(F.lit(0.0))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_ratio = F.when(n_words > 0, alpha_words / n_words).otherwise(F.lit(0.0))
    out = (
        df.withColumn("flag_word_count", (n_words >= 50) & (n_words <= 100000))
        .withColumn("flag_mean_word", (mean_word >= 3) & (mean_word <= 10))
        .withColumn("flag_symbol_ratio", symbol_ratio <= 0.1)
        .withColumn("flag_bullet_lines", bullet_ratio < 0.9)
        .withColumn("flag_alpha_words", alpha_ratio >= 0.8)
    )
    return out.withColumn(
        "gopher_keep",
        F.col("flag_word_count")
        & F.col("flag_mean_word")
        & F.col("flag_symbol_ratio")
        & F.col("flag_bullet_lines")
        & F.col("flag_alpha_words"),
    )


def _max_run(sorted_arr: Column) -> Column:
    """(most frequent element, its count) of a SORTED array via one fold —
    equal elements are adjacent, so the mode is the longest run. Pure
    higher-order-function expression: stays in whole-stage codegen."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit("").alias("best_el"),
    )

    def step(acc, x):
        cont = acc["prev"].isNotNull() & (x == acc["prev"])
        run = F.when(cont, acc["run"] + 1).otherwise(F.lit(1))
        better = run > acc["best"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(acc["best"]).alias("best"),
            F.when(better, x).otherwise(acc["best_el"]).alias("best_el"),
        )

    return F.aggregate(
        sorted_arr,
        init,
        step,
        lambda acc: F.struct(acc["best_el"].alias("el"), acc["best"].alias("n")),
    )


def _dup_run_chars(sorted_arr: Column) -> Column:
    """Total characters inside elements whose value occurs >= 2 times in a
    SORTED array (every occurrence counted), via one fold."""
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).cast("long").alias("dup_chars"),
    )

    def flush(acc):
        # on leaving a run: if it repeated, all its occurrences count
        return F.when(
            acc["run"] >= 2, acc["dup_chars"] + acc["run"] * F.length(acc["prev"])
        ).otherwise(acc["dup_chars"])

    def step(acc, x):
        cont = acc["prev"].isNotNull() & (x == acc["prev"])
        return F.struct(
            x.alias("prev"),
            F.when(cont, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.when(cont, acc["dup_chars"]).otherwise(flush(acc)).alias("dup_chars"),
        )

    return F.aggregate(sorted_arr, init, step, flush)


def repetition_signals(
    df: DataFrame, col: str = "text", ngram_sizes: tuple[int, ...] = (2, 3, 4)
) -> DataFrame:
    """Gopher-style WITHIN-document repetition signals (Rae et al. 2021
    §A1.1 — the other half of :func:`gopher_quality_flags`' shape rules),
    as pure column expressions (array sort + one fold each; no UDF, no
    shuffle):

      * ``dup_line_frac``      — duplicated (non-blank, trimmed) lines /
        lines: boilerplate lists and chat logs repeat lines verbatim
      * ``dup_line_char_frac`` — characters inside those duplicated lines /
        total line characters
      * ``top_{n}gram_char_frac`` (per n in ``ngram_sizes``) — characters
        covered by every occurrence of the single most frequent word
        n-gram / total characters, 0.0 when no n-gram repeats: catches
        "spam spam spam ..." pages that line-level signals miss

    Complements :func:`arkouda_njit_spark.functions.dedup.paragraph_dedup`
    (corpus-wide) with the per-document repetition view: this one is
    embarrassingly parallel and runs in the same codegen stage as the
    other quality expressions."""
    c = F.col(col)
    lines = F.filter(
        F.transform(F.split(c, r"\n", -1), lambda ln: F.trim(ln)),
        lambda ln: F.length(ln) > 0,
    )
    n_lines = F.size(lines)
    n_line_chars = F.aggregate(
        F.transform(lines, lambda ln: F.length(ln).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    sorted_lines = F.array_sort(lines)
    dup_lines = n_lines - F.size(F.array_distinct(lines))
    out = df.withColumn(
        "dup_line_frac",
        F.when(n_lines > 0, dup_lines / n_lines).otherwise(F.lit(0.0)),
    ).withColumn(
        "dup_line_char_frac",
        F.when(
            n_line_chars > 0, _dup_run_chars(sorted_lines) / n_line_chars
        ).otherwise(F.lit(0.0)),
    )
    n_chars = F.length(c).cast("long")
    for n in ngram_sizes:
        top = _max_run(F.array_sort(shingles(col, n)))
        covered = F.when(
            top["n"] >= 2, top["n"].cast("long") * F.length(top["el"])
        ).otherwise(F.lit(0))
        # overlapping shingle occurrences multi-count shared characters, so
        # clamp: the signal is an overlap-overcounting proxy and the raw
        # ratio can exceed 1.0 (e.g. 'a a a a a', n=2 → 12/9;
        # round-4 ADVICE #4)
        out = out.withColumn(
            f"top_{n}gram_char_frac",
            F.when(
                n_chars > 0, F.least(covered / n_chars, F.lit(1.0))
            ).otherwise(F.lit(0.0)),
        )
    return out


# Tiny public stand-in for C4's blocklist (the production list — "List of
# Dirty, Naughty, Obscene..." — is an external asset; pass your own via
# ``bad_words=``). Matching is word-boundary, case-insensitive.
C4_BAD_WORDS_DEFAULT = ("badword1", "badword2")


def c4_filters(
    df: DataFrame,
    col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    bad_words: tuple[str, ...] = C4_BAD_WORDS_DEFAULT,
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2, public) as pure column
    expressions — no UDF, no shuffle, one codegen stage alongside the
    Gopher flags.

    Line level (producing ``c4_text``): keep only lines that end in a
    terminal punctuation mark (``. ! ?`` or a closing quote), carry at
    least ``min_words_per_line`` words, and do not mention "javascript"
    (case-insensitive).

    Document level (flags over the CLEANED text, as in the original):

      * ``flag_c4_sentences`` — >= ``min_sentences`` sentences survive
      * ``flag_c4_lorem``     — no "lorem ipsum"
      * ``flag_c4_brace``     — no ``{`` (code, not prose)
      * ``flag_c4_badwords``  — no blocklisted word
      * ``c4_keep``           — all of the above

    The corpus-wide half of C4 (duplicate three-sentence spans) is
    :func:`c4_span_dedup` — it shuffles and therefore lives apart from
    these embarrassingly-parallel flags.
    """
    c = F.col(col)
    lines = F.transform(F.split(c, r"\n", -1), lambda ln: F.trim(ln))
    kept = F.filter(
        lines,
        lambda ln: ln.rlike(r'[.!?]["’”]?$')
        & (F.size(F.split(ln, _WS)) >= min_words_per_line)
        & ~F.lower(ln).contains("javascript"),
    )
    out = df.withColumn("c4_text", F.array_join(kept, "\n"))
    cleaned = F.col("c4_text")
    n_sent = F.when(
        F.length(cleaned) > 0,
        F.size(F.split(cleaned, r"(?<=[.!?])[\s\n]+", -1)),
    ).otherwise(F.lit(0))
    low = F.lower(cleaned)
    bad_re = r"(?i)\b(" + "|".join(bad_words) + r")\b"
    return (
        out.withColumn("c4_n_sentences", n_sent)
        .withColumn("flag_c4_sentences", n_sent >= min_sentences)
        .withColumn("flag_c4_lorem", ~low.contains("lorem ipsum"))
        .withColumn("flag_c4_brace", ~cleaned.contains("{"))
        .withColumn("flag_c4_badwords", ~cleaned.rlike(bad_re))
        .withColumn(
            "c4_keep",
            F.col("flag_c4_sentences")
            & F.col("flag_c4_lorem")
            & F.col("flag_c4_brace")
            & F.col("flag_c4_badwords"),
        )
    )


def c4_span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = 3,
    out: str = "text_dedup",
) -> DataFrame:
    """C4's corpus-wide dedup (Raffel et al. 2020 §2.2): any ``span``
    consecutive sentences occurring more than once in the corpus are
    removed from every document except the single earliest occurrence
    (smallest ``(doc_id, position)``). Overlapping spans are hashed like
    the original: a duplicated span marks all of its sentences for
    removal at the non-first sites; surviving sentences are reassembled
    in order.

    Returns the input rows plus ``out`` and ``n_sents_removed``.

    Scale shape (the :func:`paragraph_dedup` discipline): sentences
    explode narrowly; span DIGESTS alone ride the corpus-wide groupBy
    and the join back (md5, never sentence text); removal positions
    explode to ``span`` rows each; one groupBy(doc) reassembles. No
    windows over the corpus, no driver collect — every shuffle key is a
    digest or the doc id.
    """
    sent_re = r"(?<=[.!?])[\s\n]+"
    base = df.select(
        F.col(id_col).alias("_doc"),
        F.when(
            F.length(F.trim(F.col(text_col))) > 0,
            F.split(F.trim(F.col(text_col)), sent_re, -1),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("_sents"),
    )
    n = F.size(F.col("_sents"))
    # one digest per span start: md5 over the joined sentence window
    spans = base.select(
        "_doc",
        F.posexplode(
            F.when(
                n >= span,
                F.transform(
                    F.sequence(F.lit(0), n - span),
                    lambda i: F.md5(F.array_join(F.slice("_sents", i + 1, span), "\x1f")),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("_pos", "_digest"),
    )
    stats = spans.groupBy("_digest").agg(
        F.count("*").alias("_cnt"),
        F.min(F.struct("_doc", "_pos")).alias("_first"),
    )
    dup_sites = (
        spans.join(stats.filter(F.col("_cnt") >= 2), "_digest")
        .filter(
            (F.col("_doc") != F.col("_first._doc"))
            | (F.col("_pos") != F.col("_first._pos"))
        )
        .select(
            "_doc",
            F.explode(
                F.sequence(F.col("_pos"), F.col("_pos") + span - 1)
            ).alias("_kill"),
        )
        .distinct()
    )
    sents = base.select(
        "_doc", F.posexplode_outer("_sents").alias("_spos", "_sent")
    )
    survivors = sents.join(
        dup_sites,
        (sents["_doc"] == dup_sites["_doc"]) & (sents["_spos"] == dup_sites["_kill"]),
        "left_anti",
    )
    # reassembled with single spaces (the splitter consumed the original
    # inter-sentence whitespace)
    rebuilt = (
        survivors.filter(F.col("_sent").isNotNull())
        .groupBy("_doc")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_spos", "_sent"))),
                    lambda s: s["_sent"],
                ),
                " ",
            ).alias(out)
        )
    )
    n_sents = base.select(
        "_doc", F.size("_sents").alias("_n_orig")
    )
    surv_counts = survivors.filter(F.col("_sent").isNotNull()).groupBy("_doc").agg(
        F.count("*").alias("_n_surv")
    )
    return (
        df.join(rebuilt, F.col(id_col) == rebuilt["_doc"], "left")
        .drop("_doc")
        .join(n_sents, F.col(id_col) == n_sents["_doc"], "left")
        .drop("_doc")
        .join(surv_counts, F.col(id_col) == surv_counts["_doc"], "left")
        .drop("_doc")
        .withColumn(out, F.coalesce(F.col(out), F.lit("")))
        .withColumn(
            "n_sents_removed",
            F.coalesce(F.col("_n_orig"), F.lit(0))
            - F.coalesce(F.col("_n_surv"), F.lit(0)),
        )
        .drop("_n_orig", "_n_surv")
    )


def shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings (empty for docs shorter than n)."""
    t = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(-1)))
    return F.when(F.size(t) < n, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i + 1, n), " "))
    )


def fingerprint(
    df: DataFrame, col: str = "text", out: str = "fingerprint", n: int = 3
) -> DataFrame:
    """Document fingerprint: minimum md5 over word n-gram shingles (a
    winnowing-style rolling-hash selector; md5 keeps it engine-agnostic for
    the DuckDB oracle). Falls back to md5 of the trimmed text for short
    docs."""
    sh = shingles(col, n)
    min_sh = F.array_min(F.transform(sh, lambda s: F.md5(s)))
    return df.withColumn(out, F.coalesce(min_sh, F.md5(F.trim(F.col(col)))))
