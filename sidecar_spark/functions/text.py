"""Text-analysis column functions for large-scale training-data
pipelines: tokenization counts, quality scoring, language-ID heuristic,
document fingerprinting.

All functions return pure JVM-side Column expressions (no Python UDFs)
so they stay inside whole-stage codegen and scale linearly with the
scan — the design constraint for 100 TB corpora. Each has an exact
DuckDB-SQL equivalent used by the driver oracle (kept textually close
in queries/text_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small multilingual stopword lists for the language-ID heuristic.
# Deterministic and tiny by design — language ID at corpus scale is a
# per-row map-side operation.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "dans", "pour"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "en", "por"],
}

# words per language, used by quality scoring (generic stopword ratio)
ALL_STOPWORDS = sorted({w for ws in STOPWORDS.values() for w in ws})

# BPE-ish token pattern: word pieces, numbers, or single non-space symbols
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(col) -> Column:
    """Whitespace tokenization; empty string → empty array."""
    c = F.trim(col)
    return F.when(c == "", F.array().cast("array<string>")).otherwise(
        F.split(c, r"\s+"))


def token_count(col) -> Column:
    """Whitespace token count."""
    return F.size(words(col))


def bpe_token_count(col) -> Column:
    """BPE-ish token count: regex pieces (letters / digits / symbol)."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_TOKEN_RE), 0))


def alpha_chars(col) -> Column:
    return F.length(F.regexp_replace(col, r"[^A-Za-z]", ""))


def punct_chars(col) -> Column:
    return F.length(F.regexp_replace(col, r"[^.,;:!?'\"()\-]", ""))


def stopword_count(col, stopwords=None) -> Column:
    sw = F.array(*[F.lit(w) for w in (stopwords or ALL_STOPWORDS)])
    return F.size(F.filter(words(F.lower(col)), lambda x: F.array_contains(sw, x)))


def stopword_ratio(col) -> Column:
    n = token_count(col)
    return F.when(n == 0, F.lit(0.0)).otherwise(stopword_count(col) / n)


def mean_word_length(col) -> Column:
    n = token_count(col)
    total = F.aggregate(words(col), F.lit(0), lambda acc, w: acc + F.length(w))
    return F.when(n == 0, F.lit(0.0)).otherwise(total / n)


def quality_score(col) -> Column:
    """Heuristic document quality in [0,1]: favors texts with a sane
    length, low punctuation density and some stopword mass — the
    standard cheap pre-filter before expensive pipeline stages
    (cf. C4/Gopher-style rules)."""
    n_chars = F.length(col)
    alpha_ratio = F.when(n_chars == 0, 0.0).otherwise(alpha_chars(col) / n_chars)
    punct_ratio = F.when(n_chars == 0, 0.0).otherwise(punct_chars(col) / n_chars)
    length_norm = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    return F.round(
        0.4 * alpha_ratio + 0.3 * length_norm
        + 0.2 * F.least(stopword_ratio(col) * 5, F.lit(1.0))
        + 0.1 * (1 - F.least(punct_ratio * 10, F.lit(1.0))),
        6,
    )


def lang_hits(col, lang: str) -> Column:
    return stopword_count(col, STOPWORDS[lang])


def lang_hits_struct(col) -> Column:
    """All four languages' stopword hit counts in ONE fold over the
    word array (struct of counters). Four separate ``lang_hits``
    expressions each re-split the text — HOF subtrees are not CSE'd —
    so the fused fold is ~4× cheaper. Pair with a Generate barrier
    (``F.inline``) so downstream references read the struct fields
    instead of re-running the fold."""
    ws = words(F.lower(col))
    langs = list(STOPWORDS)
    arrs = {lg: F.array(*[F.lit(w) for w in STOPWORDS[lg]]) for lg in langs}
    zero = F.struct(*[F.lit(0).alias(lg) for lg in langs])

    def merge(acc, w):
        return F.struct(*[
            (acc[lg] + F.when(F.array_contains(arrs[lg], w), 1).otherwise(0))
            .alias(lg)
            for lg in langs
        ])

    return F.aggregate(ws, zero, merge)


def lang_id(col) -> Column:
    """n-gram/stopword language-ID heuristic: argmax of per-language
    stopword hits with a fixed preference order (en > de > fr > es >
    unknown) for determinism."""
    h = {lang: lang_hits(col, lang) for lang in STOPWORDS}
    best = F.greatest(*h.values())
    return (
        F.when(best == 0, F.lit("unknown"))
        .when(h["en"] == best, F.lit("en"))
        .when(h["de"] == best, F.lit("de"))
        .when(h["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def normalized_text(col) -> Column:
    """Lowercase + collapse whitespace — canonical form for hashing."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def fingerprint(col) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (The rolling-hash variant for shingle-level fingerprints lives in
    dedup.shingle_hashes.)"""
    return F.md5(normalized_text(col))


def bpe_train(vocab, iters: int = 3):
    """FULL BPE tokenizer training loop (Sennrich et al.) over a
    word-frequency DataFrame ``vocab`` (columns ``w``, ``cnt``):
    per iteration, count adjacent symbol pairs weighted by word
    frequency, pick the argmax pair (ties → lexicographic), and
    merge it greedily left-to-right in every word.  Returns a
    DataFrame (merge_rank, sym_a, sym_b, pair_count).

    Symbol sequences are strings of chr(1)-wrapped-chr(2) symbols;
    merging pair (a, b) is then one ``replace`` — string replace
    scans left-to-right non-overlapping, which IS greedy BPE merge
    order, and the wrappers make cross-symbol false matches
    impossible.  At 100 TB: the corpus is aggregated to the vocab
    table ONCE; iterations touch only vocab-sized frames, and the
    winning pair is a driver-size decision (like a k-means centroid
    fetch)."""
    c1, c2 = "\x01", "\x02"
    spark = vocab.sparkSession
    w = vocab.withColumn(
        "seq", F.regexp_replace("w", "(.)", f"{c1}$1{c2}")) \
        .localCheckpoint(eager=True)
    syms = F.transform(
        F.filter(F.split("seq", c2), lambda e: e != ""),
        lambda e: F.replace(e, F.lit(c1), F.lit("")))
    merges = []
    for i in range(1, iters + 1):
        pairs = (
            w.select("cnt", syms.alias("syms"))
            .where(F.size("syms") >= 2)
            .select("cnt", F.explode(F.transform(
                F.sequence(F.lit(2), F.size("syms")),
                lambda j: F.struct(
                    F.element_at("syms", j - 1).alias("a"),
                    F.element_at("syms", j).alias("b")))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pc")))
        best = pairs.orderBy(F.desc("pc"), "a", "b").limit(1).first()
        merges.append((i, best["a"], best["b"], int(best["pc"])))
        w = w.withColumn(
            "seq", F.replace(
                "seq", F.lit(f"{c1}{best['a']}{c2}{c1}{best['b']}{c2}"),
                F.lit(f"{c1}{best['a']}{best['b']}{c2}"))) \
            .localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "merge_rank int, sym_a string, sym_b string, pair_count bigint")
