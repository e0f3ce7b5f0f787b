"""Text-analysis query battery over the ``documents`` table.

Each entry pairs a JVM-side column-expression pipeline (functions/text.py)
with a textually parallel DuckDB oracle. Parity notes:

* DuckDB ``regexp_split_to_array(trim(x), '\\s+')`` on '' yields ['']
  — both sides guard the empty case explicitly;
* DuckDB ``regexp_replace`` needs the 'g' flag to match Spark's
  replace-all default;
* 60-bit md5 hash: Spark ``conv(substr(md5(x),1,15),16,10)::bigint`` ==
  DuckDB ``('0x' || substr(md5(x),1,15))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from sidecar_spark.functions import text as X
from sidecar_spark.functions.common import spread
from sidecar_spark.queries.registry import query, t

# SQL fragment: whitespace words of $expr (DuckDB)
# DuckDB twin of functions/dedup.py::hash60 over a SQL expression
_H60_TP = "('0x' || substr(md5({e}), 1, 15))::BIGINT"

_SQL_WORDS = (
    "CASE WHEN trim({e}) = '' THEN []::VARCHAR[] "
    "ELSE regexp_split_to_array(trim({e}), '\\s+') END"
)
_SQL_NWORDS = f"len({_SQL_WORDS})"


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           {_SQL_NWORDS.format(e='text')} AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
           length(text) AS n_chars_actual,
           round(CASE WHEN {_SQL_NWORDS.format(e='text')} = 0 THEN 0.0
                 ELSE list_sum(list_transform({_SQL_WORDS.format(e='text')},
                                              w -> length(w))) * 1.0
                      / {_SQL_NWORDS.format(e='text')} END, 6) AS mean_word_len
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    """Token counting: whitespace + BPE-ish regex — per-row map-side
    column math, scales with the scan."""
    d = spread(t(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        X.token_count(F.col("text")).alias("n_tokens"),
        X.bpe_token_count(F.col("text")).alias("n_bpe_tokens"),
        F.length("text").alias("n_chars_actual"),
        F.round(X.mean_word_length(F.col("text")), 6).alias("mean_word_len"),
    )


_SQL_STOPS = "['" + "','".join(X.ALL_STOPWORDS) + "']"


@query(
    "text_quality_score",
    oracle=f"""
    WITH base AS (
      SELECT doc_id,
             length(text) AS n_chars,
             length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(text, '[^.,;:!?''"()\\-]', '', 'g')) AS n_punct,
             {_SQL_NWORDS.format(e='text')} AS n_tokens,
             len(list_filter({_SQL_WORDS.format(e='lower(text)')},
                             x -> list_contains({_SQL_STOPS}, x))) AS n_stop
      FROM documents)
    SELECT doc_id,
           round(CASE WHEN n_chars = 0 THEN 0.0 ELSE n_alpha * 1.0 / n_chars END, 6) AS alpha_ratio,
           round(CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_stop * 1.0 / n_tokens END, 6) AS stop_ratio,
           round(0.4 * (CASE WHEN n_chars = 0 THEN 0.0 ELSE n_alpha * 1.0 / n_chars END)
               + 0.3 * least(n_chars / 500.0, 1.0)
               + 0.2 * least((CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_stop * 1.0 / n_tokens END) * 5, 1.0)
               + 0.1 * (1 - least((CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct * 1.0 / n_chars END) * 10, 1.0)),
             6) AS quality
    FROM base
    """,
)
def text_quality_score(spark, sf_dir):
    """Quality scoring with all text passes fused: one regex pass per
    character class, ONE word split + stopword fold, materialized
    through a Generate barrier (F.inline) — the naive composition
    re-split the text ~6× via projection collapse."""
    d = spread(t(spark, sf_dir, "documents"))
    ws = X.words(F.lower(F.col("text")))
    sw = F.array(*[F.lit(w) for w in X.ALL_STOPWORDS])
    base = d.select(
        "doc_id",
        F.inline(F.array(F.struct(
            F.length("text").alias("n_chars"),
            X.alpha_chars(F.col("text")).alias("n_alpha"),
            X.punct_chars(F.col("text")).alias("n_punct"),
            F.size(ws).alias("n_tokens"),
            F.aggregate(
                ws, F.lit(0),
                lambda acc, w: acc
                + F.when(F.array_contains(sw, w), 1).otherwise(0)).alias("n_stop"),
        ))))
    alpha_ratio = F.when(F.col("n_chars") == 0, 0.0) \
        .otherwise(F.col("n_alpha") / F.col("n_chars"))
    stop_ratio = F.when(F.col("n_tokens") == 0, 0.0) \
        .otherwise(F.col("n_stop") / F.col("n_tokens"))
    punct_ratio = F.when(F.col("n_chars") == 0, 0.0) \
        .otherwise(F.col("n_punct") / F.col("n_chars"))
    return base.select(
        "doc_id",
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(
            0.4 * alpha_ratio
            + 0.3 * F.least(F.col("n_chars") / F.lit(500.0), F.lit(1.0))
            + 0.2 * F.least(stop_ratio * 5, F.lit(1.0))
            + 0.1 * (1 - F.least(punct_ratio * 10, F.lit(1.0))),
            6).alias("quality"),
    )


def _sql_lang_hits(lang: str) -> str:
    stops = "['" + "','".join(X.STOPWORDS[lang]) + "']"
    return (f"len(list_filter({_SQL_WORDS.format(e='lower(text)')}, "
            f"x -> list_contains({stops}, x)))")


@query(
    "text_lang_id",
    oracle=f"""
    WITH hits AS (
      SELECT doc_id,
             {_sql_lang_hits('en')} AS hits_en,
             {_sql_lang_hits('de')} AS hits_de,
             {_sql_lang_hits('fr')} AS hits_fr,
             {_sql_lang_hits('es')} AS hits_es
      FROM documents)
    SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
           CASE WHEN greatest(hits_en, hits_de, hits_fr, hits_es) = 0 THEN 'unknown'
                WHEN hits_en = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'en'
                WHEN hits_de = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'de'
                WHEN hits_fr = greatest(hits_en, hits_de, hits_fr, hits_es) THEN 'fr'
                ELSE 'es' END AS lang_pred
    FROM hits
    """,
)
def text_lang_id(spark, sf_dir):
    """Stopword-hit language ID (deterministic argmax with preference
    order en > de > fr > es). All four hit counts come from one fold
    over one word split; F.inline is a Generate barrier, so the
    argmax below reads struct fields instead of re-running the fold
    (projection collapse would otherwise inline it 9×)."""
    d = spread(t(spark, sf_dir, "documents"))
    hits = d.select(
        "doc_id", F.inline(F.array(X.lang_hits_struct(F.col("text")))))
    best = F.greatest("en", "de", "fr", "es")
    return hits.select(
        "doc_id",
        F.col("en").alias("hits_en"),
        F.col("de").alias("hits_de"),
        F.col("fr").alias("hits_fr"),
        F.col("es").alias("hits_es"),
        F.when(best == 0, F.lit("unknown"))
        .when(F.col("en") == best, F.lit("en"))
        .when(F.col("de") == best, F.lit("de"))
        .when(F.col("fr") == best, F.lit("fr"))
        .otherwise(F.lit("es")).alias("lang_pred"),
    )


@query(
    "text_vocab_topk",
    oracle=f"""
    SELECT w AS word, count(*) AS freq
    FROM (SELECT unnest({_SQL_WORDS.format(e='lower(text)')}) AS w
          FROM documents)
    GROUP BY w
    ORDER BY freq DESC, word
    LIMIT 100
    """,
)
def text_vocab_topk(spark, sf_dir):
    """Corpus vocabulary building: explode → count → top-k. The
    100 TB shape: partial aggregation absorbs the explode blowup
    map-side; only (word, partial_count) pairs shuffle, and the top-k
    is TakeOrdered, not a global sort."""
    d = spread(t(spark, sf_dir, "documents"))
    return (
        d.select(F.explode(X.words(F.lower(F.col("text")))).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("word"))
        .limit(100)
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           substr(md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))), 1, 8) AS fp_prefix
    FROM documents
    """,
)
def text_fingerprint(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        X.fingerprint(F.col("text")).alias("fp"),
        F.substring(X.fingerprint(F.col("text")), 1, 8).alias("fp_prefix"),
    )


@query(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
    FROM events
    GROUP BY event_type
    """,
)
def events_json_extract(spark, sf_dir):
    """Semi-structured extraction: JSON props column → typed field."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(k).alias("sum_k"),
            F.round(F.avg(k), 6).alias("avg_k"),
        )
    )


@query(
    "string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           substr(p_name, 1, 12) AS name12,
           length(p_name) AS name_len,
           CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass,
           concat(p_brand, '#', p_type) AS brand_type
    FROM part
    """,
)
def string_functions(spark, sf_dir):
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 12).alias("name12"),
        F.length("p_name").alias("name_len"),
        F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0).alias("is_brass"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_type")).alias("brand_type"),
    )


@query(
    "date_functions",
    oracle="""
    SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
           count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY year(o_orderdate), month(o_orderdate)
    """,
)
def date_functions(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("y"),
                  F.month("o_orderdate").alias("m"))
        .agg(F.count(F.lit(1)).alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@query(
    "text_tfidf_topterms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_WORDS.format(e='lower(text)')}) AS word
      FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
    ), dfq AS (
      SELECT word, count(*) AS df FROM tf GROUP BY word
    ), n AS (SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT doc_id, word, tf,
             round(tf * ln((n_docs + 1.0) / (df + 1.0)), 6) AS tfidf
      FROM tf JOIN dfq USING (word) CROSS JOIN n)
    SELECT doc_id, word, tf, tfidf, rk FROM (
      SELECT doc_id, word, tf, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, word) AS rk
      FROM scored)
    WHERE rk <= 3
    """,
)
def text_tfidf_topterms(spark, sf_dir):
    """TF-IDF keyword extraction: top-3 terms per document. The
    100 TB plan: explode absorbs into map-side partial counts; the
    document-frequency table is (word, df) — tiny relative to the
    corpus — joined back on word (AQE picks broadcast when it fits);
    the corpus size N is a 1-row broadcast; ranking partitions by
    doc_id (never global). Ranking on the ROUNDED score keeps the
    window order identical across engines (ties then break on the
    word itself)."""
    d = spread(t(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(X.words(F.lower(F.col("text")))).alias("word"))
    tf = toks.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    dfq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(dfq, "word").join(F.broadcast(n))
        .select("doc_id", "word", "tf",
                F.round(F.col("tf") * F.log((F.col("n_docs") + 1.0)
                                            / (F.col("df") + 1.0)), 6)
                .alias("tfidf"))
    )
    from pyspark.sql import Window as W
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("doc_id", "word", "tf", "tfidf", "rk")
    )


@query(
    "text_stopword_removal",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_WORDS.format(e='lower(text)')} AS ws
      FROM documents
    ), cleaned AS (
      SELECT doc_id, ws,
             list_filter(ws, w -> NOT list_contains({_SQL_STOPS}, w)) AS kept
      FROM toks)
    SELECT doc_id,
           md5(array_to_string(kept, ' ')) AS clean_fp,
           len(ws) AS n_tokens_before,
           len(kept) AS n_tokens_after
    FROM cleaned
    """,
)
def text_stopword_removal(spark, sf_dir):
    """Stopword removal — the token-filtering cleanup pass a training
    pipeline runs before counting/shingling. One split, one filter,
    one re-join per row, all JVM-side; the cleaned text is checked by
    fingerprint so the oracle verifies the exact output string, not
    just the counts."""
    d = spread(t(spark, sf_dir, "documents"))
    sw = F.array(*[F.lit(w) for w in X.ALL_STOPWORDS])
    ws = X.words(F.lower(F.col("text")))
    base = d.select(
        "doc_id",
        F.inline(F.array(F.struct(
            F.size(ws).alias("n_before"),
            F.filter(ws, lambda w: ~F.array_contains(sw, w)).alias("kept"),
        ))))
    return base.select(
        "doc_id",
        F.md5(F.array_join("kept", " ")).alias("clean_fp"),
        F.col("n_before").alias("n_tokens_before"),
        F.size("kept").alias("n_tokens_after"),
    )


@query(
    "text_bigrams",
    oracle=f"""
    WITH ws AS (SELECT {_SQL_WORDS.format(e='lower(text)')} AS w
                FROM documents)
    SELECT bg AS bigram, count(*) AS freq
    FROM (SELECT unnest(list_transform(range(1, greatest(len(w), 1)),
                                       i -> w[i] || ' ' || w[i + 1])) AS bg
          FROM ws)
    GROUP BY bg
    ORDER BY freq DESC, bigram
    LIMIT 20
    """,
)
def text_bigrams(spark, sf_dir):
    """Corpus bigram counts (language-model n-gram statistics): words
    zipped with their own tail, exploded, counted, top-20. Same 100 TB
    shape as the vocabulary build — map-side partial aggregation
    absorbs the explode blowup, TakeOrdered replaces a global sort."""
    d = spread(t(spark, sf_dir, "documents"))
    ws = X.words(F.lower(F.col("text")))
    n = F.size(ws)
    bigrams = F.zip_with(
        ws, F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b))
    bigrams = F.slice(bigrams, 1, F.greatest(n - 1, F.lit(0)))
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram").agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("bigram"))
        .limit(20)
    )


# BM25 retrieval constants (Robertson et al. defaults)
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TERMS = ("spark", "join", "window")


def _term_eq(term):
    """One-arg HOF predicate for F.filter. (A two-parameter lambda —
    e.g. capturing the term via a default arg — flips PySpark into
    (element, index) mode and binds the term to the index column.)"""
    return lambda w: w == F.lit(term)


@query(
    "bm25_doc_search",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_SQL_WORDS.format(e='lower(text)')} AS ws
      FROM documents
    ), dl AS (
      SELECT doc_id, ws, len(ws) AS dl,
             {', '.join(f"len(list_filter(ws, w -> w = '{q}')) AS tf_{q}"
                        for q in _BM25_TERMS)}
      FROM base
    ), corpus AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl,
             {', '.join(f'count(*) FILTER (WHERE tf_{q} > 0) AS df_{q}'
                        for q in _BM25_TERMS)}
      FROM dl
    ), scored AS (
      SELECT doc_id, dl,
             round({' + '.join(
                 f"ln(1 + (n_docs - df_{q} + 0.5) / (df_{q} + 0.5))"
                 f" * tf_{q} * ({_BM25_K1} + 1)"
                 f" / (tf_{q} + {_BM25_K1} * (1 - {_BM25_B}"
                 f" + {_BM25_B} * dl / avgdl))"
                 for q in _BM25_TERMS)}, 6) AS bm25
      FROM dl CROSS JOIN corpus)
    SELECT doc_id, dl AS doc_len, bm25
    FROM scored
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def bm25_doc_search(spark, sf_dir):
    """BM25 full-text ranking for a fixed term set — the retrieval /
    quality-filter scorer of a training-data pipeline. 100 TB plan:
    one tokenize pass per doc computes (dl, tf per term) map-side;
    corpus stats (N, avgdl, per-term df) collapse to a ONE-ROW
    aggregate broadcast back over the scan; top-k is TakeOrdered, not
    a global sort. Ranking on the ROUNDED score keeps the LIMIT
    frontier identical across engines (ties break on doc_id)."""
    d = spread(t(spark, sf_dir, "documents"))
    ws = X.words(F.lower(F.col("text")))
    # base (the per-doc tokenize pass: dl + per-term tf) feeds BOTH the
    # corpus-stats aggregate and the scoring join — branches are not
    # CSE'd, so unpersisted the tokenize ran twice.  Persisting makes
    # the docstring's "one tokenize pass per doc" literally true; the
    # cached rows are (doc_id, 5 ints), not text.
    base = d.select(
        "doc_id",
        F.inline(F.array(F.struct(
            F.size(ws).alias("dl"),
            *[F.size(F.filter(ws, _term_eq(q))).alias(f"tf_{q}")
              for q in _BM25_TERMS])))).persist()
    corpus = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[F.count_if(F.col(f"tf_{q}") > 0).alias(f"df_{q}")
          for q in _BM25_TERMS])
    score = None
    for q in _BM25_TERMS:
        tf, df = F.col(f"tf_{q}"), F.col(f"df_{q}")
        idf = F.log(1 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        part = (idf * tf * (_BM25_K1 + 1)
                / (tf + _BM25_K1 * (1 - _BM25_B
                                    + _BM25_B * F.col("dl") / F.col("avgdl"))))
        score = part if score is None else score + part
    return (
        base.join(F.broadcast(corpus))
        .select("doc_id", F.col("dl").alias("doc_len"),
                F.round(score, 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(20)
    )


@query(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, {_SQL_NWORDS.format(e='text')} AS n_tokens
      FROM documents
    ), packed AS (
      SELECT source, doc_id, n_tokens,
             CAST(floor((sum(n_tokens) OVER (PARTITION BY source
                                             ORDER BY doc_id) - n_tokens)
                        / 256.0) AS BIGINT) AS seq_id
      FROM toks)
    SELECT source, seq_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM packed
    GROUP BY source, seq_id
    """,
)
def pack_sequences(spark, sf_dir):
    """Sequence packing: concatenate documents in order into
    fixed-budget (256-token) training sequences — the standard LLM
    pretraining packing step. A doc belongs to the sequence its
    running-sum START offset falls in (greedy fill, overflow allowed
    at boundaries). The running sum partitions by source shard so no
    single global window serializes the corpus — exactly how packing
    parallelizes at 100 TB (pack within shards, never across)."""
    d = spread(t(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", "source", X.token_count(F.col("text")).alias("n_tokens"))
    w = W.partitionBy("source").orderBy("doc_id")
    packed = toks.withColumn(
        "seq_id",
        F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens")) / 256.0))
    return packed.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("seq_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


_REDACT_RE = r"\b(spark|vector)\b"


@query(
    "text_redact_terms",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{_REDACT_RE}')) AS n_redacted,
           md5(regexp_replace(lower(text), '{_REDACT_RE}', '<ENT>', 'g'))
               AS redacted_fp,
           length(regexp_replace(lower(text), '{_REDACT_RE}', '<ENT>', 'g'))
               AS redacted_len
    FROM documents
    """,
)
def text_redact_terms(spark, sf_dir):
    """Term redaction / entity masking — the scrubbing pass a
    training pipeline runs to mask sensitive or held-out terms before
    release. Pure per-row regex column math (one extract + one
    replace), verified exactly via fingerprint of the redacted text.
    Spark regexp_replace replaces all matches by default; DuckDB
    needs the explicit 'g' flag."""
    d = spread(t(spark, sf_dir, "documents"))
    low = F.lower(F.col("text"))
    red = F.regexp_replace(low, _REDACT_RE, "<ENT>")
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(low, F.lit(_REDACT_RE), 0))
        .alias("n_redacted"),
        F.md5(red).alias("redacted_fp"),
        F.length(red).alias("redacted_len"),
    )


@query(
    "inverted_index_build",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, unnest({_SQL_WORDS.format(e='lower(text)')}) AS term
      FROM documents
    ), postings AS (
      SELECT term, count(*) AS df,
             md5(array_to_string(list_sort(list(doc_id)), ' ')) AS posting_fp
      FROM toks GROUP BY term)
    SELECT term, df, posting_fp
    FROM postings
    ORDER BY df DESC, term
    LIMIT 50
    """,
)
def inverted_index_build(spark, sf_dir):
    """Inverted-index construction: term → (document frequency,
    fingerprint of the sorted doc_id posting list) for the 50 most
    frequent terms. The retrieval-side dual of BM25: explode to
    (doc_id, term), distinct, then a posting-list aggregate. At
    100 TB posting lists are the classic skew hazard — stopword terms
    own millions of doc_ids — so production splits postings into
    fixed-size blocks per term; here df is bounded by the corpus and
    the fingerprint keeps the driver-returned payload tiny either
    way. Sorting INSIDE the aggregate (sort_array(collect_set))
    makes the fingerprint order-insensitive to shuffle arrival."""
    d = spread(t(spark, sf_dir, "documents"))
    toks = (d.select("doc_id",
                     F.explode(X.words(F.lower(F.col("text")))).alias("term"))
            .distinct())
    postings = toks.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.md5(F.array_join(
            F.transform(F.sort_array(F.collect_set("doc_id")),
                        lambda x: x.cast("string")), " ")).alias("posting_fp"))
    return postings.orderBy(F.desc("df"), F.asc("term")).limit(50)


# ---------------------------------------------------------------------------
# Python UDTF (lateral table function) + VARIANT semi-structured type
# ---------------------------------------------------------------------------

@query(
    "udtf_token_explode",
    oracle="""
    WITH toks AS (
      SELECT lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS tl
      FROM documents),
    exploded AS (
      SELECT lang,
             unnest(tl) AS tok,
             unnest(range(1, len(tl) + 1)) AS pos
      FROM toks)
    SELECT lang,
           count(*) AS n_tokens,
           count(DISTINCT tok) AS n_distinct,
           round(avg(length(tok)), 6) AS avg_tok_len,
           CAST(sum(pos * length(tok)) AS BIGINT) AS pos_checksum
    FROM exploded
    GROUP BY lang
    """,
)
def udtf_token_explode(spark, sf_dir):
    """Python UDTF (user-defined TABLE function, Spark 3.5+/4.x API)
    exercised through a LATERAL join: `tokenize(text)` yields one
    (pos, tok) row per token, then per-language stats aggregate the
    exploded table. The positional checksum pins row-multiplicity AND
    ordinal correctness, not just token counts; the oracle replicates
    the explosion with DuckDB's zipped unnest/generate_subscripts.

    The UDTF runs Arrow-batched (spark.sql.execution.pythonUDTF.arrow
    .enabled) and is partition-parallel — each task streams its
    document batch through Python once, so at 100 TB this is the same
    shape as any scan->explode->partial-agg pipeline; the only
    shuffle is the final tiny per-language aggregate."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, tok string")
    class Tokenize:
        def eval(self, text: str):
            for i, tok in enumerate(
                    re.findall(r"[a-z0-9]+", (text or "").lower()), 1):
                yield i, tok

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("sidecar_tokenize", Tokenize)
    # The sf0.1 corpus is a single parquet file -> one scan partition,
    # which would serialize the Python stage; spread the CPU-dense
    # tokenization across workers (at real scale the scan has many
    # splits and this repartition is unnecessary).
    docs = t(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism)
    docs.createOrReplaceTempView("docs_for_udtf")
    exploded = spark.sql(
        "SELECT d.lang, tk.pos, tk.tok "
        "FROM docs_for_udtf d, LATERAL sidecar_tokenize(d.text) tk")
    return (
        exploded.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_tokens"),
             F.countDistinct("tok").alias("n_distinct"),
             F.round(F.avg(F.length("tok")), 6).alias("avg_tok_len"),
             F.sum(F.col("pos") * F.length("tok")).alias("pos_checksum"))
    )


@query(
    "variant_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           round(sum(value), 2) AS sum_value,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events
    GROUP BY k_bucket
    """,
)
def variant_extract(spark, sf_dir):
    """Semi-structured VARIANT type (Spark 4.x): parse the JSON props
    column into a VARIANT with `parse_json`, extract a typed field
    with `variant_get`, and aggregate on it — the open-schema
    ingestion path (vs events_json_extract's per-field string
    extraction). VARIANT keeps a parsed binary form, so repeated
    field accesses don't re-parse the JSON text; at 100 TB the
    parse cost is paid once per row in the scan projection and the
    aggregation is an ordinary tiny-key shuffle."""
    e = t(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        e.groupBy((k % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.sum("value"), 2).alias("sum_value"),
             F.round(F.min("value"), 2).alias("min_value"),
             F.round(F.max("value"), 2).alias("max_value"))
    )


@query(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents),
    freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
    total AS (SELECT sum(cnt) AS n FROM freq),
    doc_lp AS (
      SELECT t.doc_id, t.lang,
             sum(ln(f.cnt / (SELECT n FROM total))) AS logprob,
             count(*) AS n_tok
      FROM toks t JOIN freq f ON t.tok = f.tok
      GROUP BY t.doc_id, t.lang)
    SELECT lang,
           count(*) AS n_docs,
           round(avg(logprob / n_tok), 6) AS avg_per_tok_lp,
           round(min(logprob / n_tok), 6) AS min_per_tok_lp,
           round(max(logprob / n_tok), 6) AS max_per_tok_lp
    FROM doc_lp GROUP BY lang
    """,
)
def text_unigram_logprob(spark, sf_dir):
    """Unigram language-model scoring — the classic corpus-level
    quality/perplexity signal for training-data filtering: pass 1
    builds the corpus unigram distribution, pass 2 scores every
    document by mean per-token log-probability. The frequency table
    is vocabulary-sized, so it broadcasts; the scoring join is
    therefore map-side over the exploded corpus and the per-document
    sum is a partial aggregate — two scans, one tiny shuffle, no
    driver state. Per-token normalization makes scores comparable
    across document lengths (low = surprising/garbled text)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang",
        F.explode(F.split("text", " ")).alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = freq.agg(F.sum("cnt").alias("n"))
    doc_lp = (
        toks.join(F.broadcast(freq), "tok")
        .join(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.log(F.col("cnt") / F.col("n"))).alias("logprob"),
             F.count(F.lit(1)).alias("n_tok"))
    )
    per_tok = F.col("logprob") / F.col("n_tok")
    return (
        doc_lp.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg(per_tok), 6).alias("avg_per_tok_lp"),
             F.round(F.min(per_tok), 6).alias("min_per_tok_lp"),
             F.round(F.max(per_tok), 6).alias("max_per_tok_lp"))
    )


@query(
    "quality_filter_funnel",
    oracle="""
    WITH flags AS (
      SELECT
        n_chars >= 100 AS ok_len,
        length(regexp_replace(text, '[^0-9]', '', 'g'))
            <= 0.2 * length(text) AS ok_digits,
        length(regexp_replace(text, '[^A-Z]', '', 'g'))
            <= 0.3 * length(text) AS ok_caps,
        right(trim(text), 1) IN ('.', '!', '?') AS ok_terminal
      FROM documents
    )
    SELECT count(*) AS n_total,
           count(CASE WHEN ok_len THEN 1 END) AS n_after_len,
           count(CASE WHEN ok_len AND ok_digits THEN 1 END)
               AS n_after_digits,
           count(CASE WHEN ok_len AND ok_digits AND ok_caps THEN 1 END)
               AS n_after_caps,
           count(CASE WHEN ok_len AND ok_digits AND ok_caps
                       AND ok_terminal THEN 1 END) AS n_after_terminal
    FROM flags
    """,
)
def quality_filter_funnel(spark, sf_dir):
    """C4/RefinedWeb-style staged quality funnel: length floor →
    digit-ratio cap → uppercase-ratio cap → terminal-punctuation
    check, with the survivor count after EVERY stage reported from
    ONE pass (conjunctive counts, no re-scans). This is the
    filter-design loop of a corpus pipeline: at 100 TB you cannot
    afford one scan per candidate rule, so all rules evaluate as
    boolean columns in a single projection and every cumulative
    count is a conditional aggregate of the same pass."""
    d = t(spark, sf_dir, "documents")
    txt = F.col("text")
    flags = d.select(
        (F.col("n_chars") >= 100).alias("ok_len"),
        (F.length(F.regexp_replace(txt, "[^0-9]", ""))
         <= 0.2 * F.length(txt)).alias("ok_digits"),
        (F.length(F.regexp_replace(txt, "[^A-Z]", ""))
         <= 0.3 * F.length(txt)).alias("ok_caps"),
        F.substring(F.trim(txt), -1, 1).isin(".", "!", "?")
        .alias("ok_terminal"),
    )
    c = F.count
    return flags.agg(
        c(F.lit(1)).alias("n_total"),
        c(F.when(F.col("ok_len"), 1)).alias("n_after_len"),
        c(F.when(F.col("ok_len") & F.col("ok_digits"), 1))
        .alias("n_after_digits"),
        c(F.when(F.col("ok_len") & F.col("ok_digits") & F.col("ok_caps"),
                 1)).alias("n_after_caps"),
        c(F.when(F.col("ok_len") & F.col("ok_digits") & F.col("ok_caps")
                 & F.col("ok_terminal"), 1)).alias("n_after_terminal"),
    )


@query(
    "datetime_functions_extended",
    oracle="""
    SELECT quarter(o_orderdate) AS q,
           count(*) AS n,
           count(CASE WHEN dayofweek(o_orderdate) IN (0, 6) THEN 1 END)
               AS n_weekend,
           count(CASE WHEN o_orderdate = last_day(o_orderdate)
                      THEN 1 END) AS n_month_end,
           CAST(sum(CAST(weekofyear(o_orderdate) AS BIGINT)) AS BIGINT) AS sum_iso_week,
           CAST(sum(date_diff('day', o_orderdate, o_orderdate + INTERVAL 3 MONTH)) AS BIGINT) AS sum_q_span,
           count(DISTINCT strftime(o_orderdate + INTERVAL 45 DAY,
                                   '%Y-%m')) AS n_shifted_months
    FROM orders
    GROUP BY quarter(o_orderdate)
    ORDER BY q
    """,
)
def datetime_functions_extended(spark, sf_dir):
    """Extended temporal family beyond date_functions: quarter,
    day-of-week (normalized to DuckDB's 0=Sunday), last_day
    month-end detection, ISO week numbers, interval arithmetic
    (add_months honors end-of-month clamping in both engines), and
    day-difference spans. All codegen expressions evaluated in the
    scan projection — at 100 TB these fold into the same pass as the
    grouping, no extra stage."""
    o = t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return (
        o.groupBy(F.quarter(d).alias("q"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            # Spark dayofweek: 1=Sunday..7 ; DuckDB dayofweek: 0=Sunday..6
            F.count(F.when((F.dayofweek(d) - 1).isin(0, 6), 1))
            .alias("n_weekend"),
            F.count(F.when(d.cast("date") == F.last_day(d), 1))
            .alias("n_month_end"),
            F.sum(F.weekofyear(d).cast("long")).alias("sum_iso_week"),
            F.sum(F.datediff(F.add_months(d, 3), d)).alias("sum_q_span"),
            F.countDistinct(
                F.date_format(F.date_add(d.cast("date"), 45), "yyyy-MM"))
            .alias("n_shifted_months"),
        )
        .orderBy("q")
    )


@query(
    "repetition_ratio_audit",
    oracle=f"""
    WITH per_doc AS (
      SELECT doc_id,
             len({_SQL_WORDS.format(e='text')}) AS n_tokens,
             len(list_distinct({_SQL_WORDS.format(e='text')}))
                 AS n_distinct
      FROM documents
    )
    SELECT CAST(floor(10 * (1 - n_distinct * 1.0 / n_tokens)) AS BIGINT)
               AS rep_bucket,
           count(*) AS n_docs,
           round(avg(1 - n_distinct * 1.0 / n_tokens), 6) AS avg_rep
    FROM per_doc
    WHERE n_tokens > 0
    GROUP BY rep_bucket
    ORDER BY rep_bucket
    """,
)
def repetition_ratio_audit(spark, sf_dir):
    """Repetition filtering (the C4/Gopher 'duplicate fraction' rule):
    per-document duplicate-token fraction 1 − distinct/total,
    histogrammed in 10% buckets — the signal that catches boilerplate
    and degenerate generations before training.  Token and distinct
    counts come from ONE array expression per row (no explode, no
    shuffle until the final tiny histogram) — at corpus scale this is
    a pure map over the text column."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.trim("text"), r"\s+")
    per = d.select(
        F.size(words).alias("n_tokens"),
        F.size(F.array_distinct(words)).alias("n_distinct"))
    rep = 1 - F.col("n_distinct") / F.col("n_tokens")
    return (
        per.where(F.col("n_tokens") > 0)
        .groupBy(F.floor(10 * rep).cast("long").alias("rep_bucket"))
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg(rep), 6).alias("avg_rep"))
        .orderBy("rep_bucket")
    )


@query(
    "bpe_pair_counts",
    oracle=f"""
    WITH words AS (
      SELECT unnest({_SQL_WORDS.format(e='text')}) AS w FROM documents
    ), pairs AS (
      SELECT substring(w, i, 2) AS pair
      FROM words CROSS JOIN generate_series(1, 20) t(i)
      WHERE i <= length(w) - 1
    ), counted AS (
      SELECT pair, count(*) AS cnt FROM pairs GROUP BY pair
    )
    SELECT pair, cnt, rk FROM (
      SELECT pair, cnt,
             row_number() OVER (ORDER BY cnt DESC, pair) AS rk
      FROM counted)
    WHERE rk <= 20
    """,
)
def bpe_pair_counts(spark, sf_dir):
    """The BPE-training inner loop: count adjacent symbol pairs across
    the corpus (here the character-level first merge scan) and rank
    the top candidates.  Spark shape: tokenize → per-word pair
    expansion via transform(sequence(...)) — an array expression, NOT
    a per-character explode of the corpus — then explode only the
    short pair arrays into a map-side-combined count.  Each merge
    iteration of a full BPE trainer is exactly this job with a
    symbol-remap broadcast joined in; count-then-rank is one shuffle
    plus a driver-size top-k."""
    d = t(spark, sf_dir, "documents")
    words = d.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
    pairs = words.where(F.length("w") >= 2).select(
        F.explode(F.expr(
            "transform(sequence(1, char_length(w) - 1), "
            "i -> substring(w, i, 2))")).alias("pair"))
    counted = pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window as W

    rk = F.row_number().over(W.orderBy(F.desc("cnt"), "pair"))
    return (
        counted.select("pair", "cnt", rk.alias("rk"))
        .where(F.col("rk") <= 20)
    )


@query(
    "string_functions_extended",
    oracle="""
    SELECT p_partkey,
           split_part(p_name, ' ', 1) AS first_word,
           translate(p_brand, '#', '-') AS brand_tr,
           lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_pad,
           reverse(split_part(p_name, ' ', 1)) AS word_rev,
           repeat(substring(p_type, 1, 2), 2) AS type_rep,
           CASE WHEN p_retailprice < 900 THEN 0
                WHEN p_retailprice >= 2000 THEN 11
                ELSE CAST(1 + floor((p_retailprice - 900) * 10
                                    / (2000 - 900)) AS BIGINT) END
               AS price_bucket
    FROM part
    WHERE p_partkey % 97 = 0
    ORDER BY p_partkey
    """,
)
def string_functions_extended(spark, sf_dir):
    """Second string family: split_part, translate, lpad, reverse,
    repeat — plus width_bucket equal-width binning (the SQL-standard
    histogram primitive; the oracle emulates it since this DuckDB
    build lacks it, pinning Spark's edge semantics: bucket 0 below
    the range, n+1 at/above the top). All codegen scalar expressions
    in the scan projection."""
    p = t(spark, sf_dir, "part").where(F.col("p_partkey") % 97 == 0)
    first_word = F.split_part(F.col("p_name"), F.lit(" "), F.lit(1))
    return (
        p.select(
            "p_partkey",
            first_word.alias("first_word"),
            F.translate("p_brand", "#", "-").alias("brand_tr"),
            F.lpad(F.col("p_size").cast("string"), 3, "0")
            .alias("size_pad"),
            F.reverse(first_word).alias("word_rev"),
            F.repeat(F.substring("p_type", 1, 2), 2).alias("type_rep"),
            F.width_bucket("p_retailprice", F.lit(900.0), F.lit(2000.0),
                           F.lit(10)).alias("price_bucket"),
        )
        .orderBy("p_partkey")
    )


@query(
    "doc_chunk_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_WORDS.format(e='text')} AS ws FROM documents
    ), chunks AS (
      SELECT doc_id, CAST(s.start AS BIGINT) AS chunk_start,
             list_slice(ws, s.start, least(s.start + 15, len(ws)))
                 AS chunk
      FROM toks CROSS JOIN generate_series(1, 200, 8) s(start)
      WHERE s.start <= len(ws)
    )
    SELECT doc_id, chunk_start,
           len(chunk) AS n_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM chunks
    WHERE doc_id < 40
    ORDER BY doc_id, chunk_start
    """,
)
def doc_chunk_overlap(spark, sf_dir):
    """Sliding-window document chunking (window 16 tokens, stride 8 —
    50% overlap): the unit-of-embedding preparation step for
    retrieval corpora.  Chunk starts come from a sequence() array —
    the whole operation is array slicing inside the row (explode only
    the per-doc start list, never the token stream), so at corpus
    scale it is a pure map with output ≈ 2× input tokens, no shuffle.
    Chunk content is pinned by md5 of the joined window."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    toks = d.select("doc_id", F.split(F.trim("text"), r"\s+").alias("ws"))
    starts = F.sequence(F.lit(1), F.least(F.size("ws"), F.lit(200)),
                        F.lit(8))
    chunks = toks.select(
        "doc_id", F.explode(starts).alias("chunk_start"), "ws")
    # slice(ws, start, length): length = min(start+15, size) - start + 1
    chunk = F.slice(
        "ws", F.col("chunk_start"),
        F.least(F.col("chunk_start") + 15, F.size("ws"))
        - F.col("chunk_start") + 1)
    return (
        chunks.select(
            "doc_id", F.col("chunk_start").cast("long").alias("chunk_start"),
            F.size(chunk).alias("n_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"))
        .orderBy("doc_id", "chunk_start")
    )


@query(
    "domain_upsample_mix",
    oracle="""
    WITH weighted AS (
      SELECT source, n_chars,
             CASE WHEN source IN ('src0', 'src1') THEN 4
                  WHEN source IN ('src2', 'src3', 'src4') THEN 2
                  ELSE 1 END AS w
      FROM documents
    ), expanded AS (
      SELECT source, n_chars, e.epoch
      FROM weighted CROSS JOIN generate_series(1, 4) e(epoch)
      WHERE e.epoch <= w
    )
    SELECT source, count(*) AS n_rows, CAST(sum(n_chars) AS BIGINT) AS total_chars,
           max(epoch) AS max_epoch
    FROM expanded
    GROUP BY source
    ORDER BY source
    """,
)
def domain_upsample_mix(spark, sf_dir):
    """Domain-mix upsampling: high-value sources repeat 4×/2×, the
    tail 1× — the epoch-weighting step of training-data composition
    (the 'how many epochs of each domain' knob).  Expressed as
    explode(sequence(1, w)) — a narrow, shuffle-free row expansion
    whose output size is exactly the mix budget; the audit counts
    rows and chars per source so a wrong weight anywhere changes the
    hash."""
    d = t(spark, sf_dir, "documents")
    w = (F.when(F.col("source").isin("src0", "src1"), 4)
         .when(F.col("source").isin("src2", "src3", "src4"), 2)
         .otherwise(1))
    expanded = d.select(
        "source", "n_chars",
        F.explode(F.sequence(F.lit(1), w)).alias("epoch"))
    return (
        expanded.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_rows"),
             F.sum("n_chars").alias("total_chars"),
             F.max("epoch").alias("max_epoch"))
        .orderBy("source")
    )


@query(
    "binary_functions",
    oracle="""
    SELECT doc_id,
           base64(encode(substring(text, 1, 24))) AS b64,
           substring(text, 1, 24) AS back,
           hex(encode(substring(text, 1, 8))) AS hx,
           octet_length(encode(text)) AS n_bytes,
           octet_length(encode(text)) * 8 AS n_bits
    FROM documents
    WHERE doc_id % 101 = 0
    ORDER BY doc_id
    """,
)
def binary_functions(spark, sf_dir):
    """Binary-column family: utf-8 encode → base64/hex render,
    base64 → decode round trip (the ``back`` column must equal the
    source slice — a transport-integrity audit), octet/bit lengths.
    This is the plumbing under every blob-carrying pipeline (the
    multimodal entries store payloads exactly this way); all JVM
    codegen expressions."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") % 101 == 0)
    head24 = F.substring("text", 1, 24)
    return (
        d.select(
            "doc_id",
            F.base64(F.encode(head24, "utf-8")).alias("b64"),
            F.decode(F.unbase64(F.base64(F.encode(head24, "utf-8"))),
                     "utf-8").alias("back"),
            F.hex(F.encode(F.substring("text", 1, 8), "utf-8")).alias("hx"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
            (F.octet_length(F.encode("text", "utf-8")) * 8).alias("n_bits"),
        )
        .orderBy("doc_id")
    )


@query(
    "prompt_template_render",
    oracle="""
    SELECT lang,
           count(*) AS n,
           CAST(sum(length(printf('### Instruction (%s)\n%s\n### Response\n', lang, substring(text, 1, 64)))) AS BIGINT) AS total_len,
           min(md5(printf('### Instruction (%s)\n%s\n### Response\n',
                          lang, substring(text, 1, 64)))) AS min_hash
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def prompt_template_render(spark, sf_dir):
    """Prompt-template rendering at corpus scale: ``format_string``
    stamps each document into an instruction-tuning template; the
    audit pins total rendered length and a content hash per language.
    Template expansion is a map-only projection — the step that turns
    a curated corpus into trainable text — and printf-style
    formatting matches DuckDB's printf byte for byte."""
    d = t(spark, sf_dir, "documents")
    rendered = F.format_string(
        "### Instruction (%s)\n%s\n### Response\n",
        F.col("lang"), F.substring("text", 1, 64))
    return (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.length(rendered)).alias("total_len"),
             F.min(F.md5(rendered)).alias("min_hash"))
        .orderBy("lang")
    )


@query(
    "regexp_functions_extended",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+a[a-z]*')) AS n_a_words,
           regexp_extract_all(text, '[a-z]+a[a-z]*')[1] AS first_a_word,
           len(regexp_extract_all(text, 'ba[a-z]+')) AS n_ba,
           CASE WHEN regexp_matches(text, 'stream|spark') THEN 1 ELSE 0
                END AS mentions_engine
    FROM documents
    WHERE doc_id % 151 = 0
    ORDER BY doc_id
    """,
)
def regexp_functions_extended(spark, sf_dir):
    """Extended regexp family: regexp_extract_all (all matches as an
    array), match counting via the extracted array, and boolean
    rlike — beyond the split/replace/extract already exercised by
    the tokenizer entries.  Regex evaluation stays JVM-side
    (codegen'd java.util.regex); at corpus scale pre-compile-once
    semantics make this the cheap path vs any Python UDF."""
    d = t(spark, sf_dir, "documents").where(F.col("doc_id") % 151 == 0)
    a_words = F.regexp_extract_all("text", F.lit("[a-z]+a[a-z]*"),
                                   F.lit(0))
    return (
        d.select(
            "doc_id",
            F.size(a_words).alias("n_a_words"),
            F.element_at(a_words, 1).alias("first_a_word"),
            F.size(F.regexp_extract_all("text", F.lit("ba[a-z]+"),
                                        F.lit(0)))
            .alias("n_ba"),
            F.when(F.col("text").rlike("stream|spark"), 1).otherwise(0)
            .alias("mentions_engine"))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# polymorphic Python UDTF: output schema computed by analyze()
# ---------------------------------------------------------------------------

@query(
    "udtf_polymorphic_split",
    oracle="""
    SELECT split_part(o_orderpriority, '-', 1) AS c0,
           split_part(o_orderpriority, '-', 2) AS c1,
           count(*) AS n
    FROM orders
    GROUP BY c0, c1
    ORDER BY c0, c1
    """,
)
def udtf_polymorphic_split(spark, sf_dir):
    """POLYMORPHIC Python UDTF (Spark 4 static analyze()): the output
    schema is not declared — it is COMPUTED at plan time from the
    literal n_cols argument (c0..c{n-1}), the compile-time
    polymorphism that lets one UDTF serve any arity. Splitting the
    priority code '1-URGENT' with n_cols=2 yields (c0, c1); the
    LATERAL join + aggregate checks both the computed schema and the
    row contents against DuckDB's split_part."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (StringType, StructField, StructType)
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitCols:
        @staticmethod
        def analyze(s: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            return AnalyzeResult(schema=StructType(
                [StructField(f"c{i}", StringType())
                 for i in range(int(n.value))]))

        def eval(self, s, n):
            parts = (s or "").split("-", n - 1)
            parts += [None] * (n - len(parts))
            yield tuple(parts[:n])

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
    spark.udtf.register("sidecar_splitcols", udtf(SplitCols))
    # single-file scan -> one partition would serialize the Python
    # stage; spread it (same rationale as udtf_token_explode)
    t(spark, sf_dir, "orders").select("o_orderpriority").repartition(
        spark.sparkContext.defaultParallelism
    ).createOrReplaceTempView("orders_udtf_v")
    return spark.sql("""
        SELECT t.c0, t.c1, count(*) AS n
        FROM orders_udtf_v,
             LATERAL sidecar_splitcols(o_orderpriority, 2) t
        GROUP BY t.c0, t.c1
        ORDER BY t.c0, t.c1
    """)


# ---------------------------------------------------------------------------
# PII detection / redaction audit (regex machinery over synthesized PII)
# ---------------------------------------------------------------------------

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


@query(
    "pii_detection_audit",
    oracle=f"""
    WITH notes AS (
      SELECT c_mktsegment,
             c_name || ' contact ' ||
             CASE WHEN c_custkey % 7 = 0
                  THEN 'user' || CAST(c_custkey AS VARCHAR) || '@example.com '
                  ELSE '' END ||
             CASE WHEN c_custkey % 11 = 0
                  THEN '555-' || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0')
                       || '-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END AS note
      FROM customer)
    SELECT c_mktsegment,
           count(*) AS n_notes,
           CAST(sum(len(regexp_extract_all(note, '{_EMAIL_RE}'))) AS BIGINT)
               AS n_emails,
           CAST(sum(len(regexp_extract_all(note, '{_PHONE_RE}'))) AS BIGINT)
               AS n_phones,
           CAST(sum(CASE WHEN regexp_matches(note, '{_EMAIL_RE}')
                           OR regexp_matches(note, '{_PHONE_RE}')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(sum(len(regexp_replace(note, '{_EMAIL_RE}', '<EMAIL>', 'g'))
                    - len(note)) AS BIGINT) AS redaction_len_delta
    FROM notes
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def pii_detection_audit(spark, sf_dir):
    """PII detection + redaction — the privacy pass a training-data
    pipeline runs before anything ships: count email/phone-shaped
    spans, flag documents containing either, and measure the length
    delta of a redaction rewrite.  The corpus is word-salad with no
    real PII, so PII-shaped spans are synthesized DETERMINISTICALLY
    from customer keys (every 7th gets an email, every 11th a phone) —
    the audit then verifies the actual regex machinery (regexp_count /
    rlike / regexp_replace vs DuckDB regexp_extract_all / matches /
    replace) on both engines, not a lucky all-zeros.  All map-side
    expressions; one tiny aggregate shuffle — at 100 TB the scan
    dominates exactly as it should."""
    c = t(spark, sf_dir, "customer")
    note = F.concat(
        F.col("c_name"), F.lit(" contact "),
        F.when(F.col("c_custkey") % 7 == 0,
               F.concat(F.lit("user"), F.col("c_custkey").cast("string"),
                        F.lit("@example.com ")))
        .otherwise(F.lit("")),
        F.when(F.col("c_custkey") % 11 == 0,
               F.concat(F.lit("555-"),
                        F.lpad((F.col("c_custkey") % 1000).cast("string"),
                               3, "0"),
                        F.lit("-"),
                        F.lpad((F.col("c_custkey") % 10000).cast("string"),
                               4, "0")))
        .otherwise(F.lit("")))
    notes = c.select("c_mktsegment", note.alias("note"))
    email, phone = _EMAIL_RE, _PHONE_RE
    return (
        notes.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_notes"),
             F.sum(F.expr(f"regexp_count(note, '{email}')"))
             .alias("n_emails"),
             F.sum(F.expr(f"regexp_count(note, '{phone}')"))
             .alias("n_phones"),
             F.sum(F.when(F.col("note").rlike(email)
                          | F.col("note").rlike(phone), 1).otherwise(0))
             .alias("n_flagged"),
             F.sum(F.length(F.regexp_replace("note", email, "<EMAIL>"))
                   - F.length("note")).alias("redaction_len_delta"))
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# C4-style segment-level dedup: fixed word-window spans deduped corpus-wide
# ---------------------------------------------------------------------------

@query(
    "segment_dedup_c4",
    oracle="""
    WITH w AS (
      SELECT doc_id, source, string_split(text, ' ') AS ws
      FROM documents),
    seg AS (
      SELECT doc_id, source,
             array_to_string(ws[k.k*10+1 : k.k*10+10], ' ') AS seg
      FROM w, LATERAL (
        SELECT unnest(generate_series(
          0, CAST(ceil(len(ws)/10.0) AS INT) - 1)) AS k) k),
    d AS (
      SELECT seg, count(DISTINCT doc_id) AS nd, count(*) AS cnt
      FROM seg GROUP BY seg)
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(CASE WHEN d.nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_occurrences,
           CAST(sum(CASE WHEN d.nd > 1 THEN length(s.seg) ELSE 0 END)
                AS BIGINT) AS chars_flagged,
           CAST(count(DISTINCT CASE WHEN d.nd > 1 THEN s.doc_id END)
                AS BIGINT) AS docs_with_dup
    FROM seg s JOIN d USING (seg)
    GROUP BY s.source ORDER BY s.source
    """,
)
def segment_dedup_c4(spark, sf_dir):
    """C4-style span dedup (the step between exact-doc and MinHash
    dedup in a training-data pipeline): cut every document into
    fixed 10-word segments, count each segment's distinct-document
    support corpus-wide, and flag occurrences whose segment appears
    in more than one document.  Two shuffles at scale — explode is
    map-side, support count groups on the segment text (bounded key:
    ≤10 words), and the occurrence→support join is an equi-join on
    the same key, so partitioning is reused.  Per-source report:
    occurrences flagged, chars that would be cut, docs touched."""
    d = t(spark, sf_dir, "documents")
    seg = (
        d.select(
            "doc_id", "source",
            F.explode(F.expr(
                "transform(sequence(0, cast(ceil(size(split(text, ' '))/10.0)"
                " as int) - 1),"
                " k -> array_join(slice(split(text, ' '), k*10+1, 10), ' '))"
            )).alias("seg")))
    support = (seg.groupBy("seg")
               .agg(F.countDistinct("doc_id").alias("nd")))
    joined = seg.join(support, "seg")
    dup = F.col("nd") > 1
    return (
        joined.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_segments"),
             F.sum(F.when(dup, 1).otherwise(0)).alias("n_dup_occurrences"),
             F.sum(F.when(dup, F.length("seg")).otherwise(0))
             .alias("chars_flagged"),
             F.countDistinct(F.when(dup, F.col("doc_id")))
             .alias("docs_with_dup"))
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Gopher-style rule battery: hard quality gates as pure column expressions
# ---------------------------------------------------------------------------

@query(
    "gopher_rules_filter",
    oracle="""
    WITH f AS (
      SELECT doc_id, lang,
             len(string_split(text, ' ')) AS n_words,
             length(replace(text, ' ', '')) * 1.0
               / len(string_split(text, ' ')) AS mean_wlen,
             len(list_filter(string_split(text, ' '),
                             w -> w IN ('the', 'a'))) * 1.0
               / len(string_split(text, ' ')) AS stop_frac,
             len(list_filter(string_split(text, ' '),
                             w -> regexp_matches(w, '^[0-9]+$'))) * 1.0
               / len(string_split(text, ' ')) AS digit_frac
      FROM documents),
    r AS (
      SELECT lang,
             CASE WHEN n_words BETWEEN 15 AND 200 THEN 1 ELSE 0 END AS r_len,
             CASE WHEN mean_wlen BETWEEN 2.0 AND 10.0 THEN 1 ELSE 0 END
               AS r_wlen,
             CASE WHEN stop_frac >= 0.01 THEN 1 ELSE 0 END AS r_stop,
             CASE WHEN digit_frac <= 0.2 THEN 1 ELSE 0 END AS r_digit
      FROM f)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(r_len) AS BIGINT) AS pass_len,
           CAST(sum(r_wlen) AS BIGINT) AS pass_wlen,
           CAST(sum(r_stop) AS BIGINT) AS pass_stop,
           CAST(sum(r_digit) AS BIGINT) AS pass_digit,
           CAST(sum(r_len * r_wlen * r_stop * r_digit) AS BIGINT)
             AS pass_all
    FROM r GROUP BY lang ORDER BY lang
    """,
)
def gopher_rules_filter(spark, sf_dir):
    """Gopher-style hard quality gates (word-count bounds, mean word
    length band, minimum stopword mass, digit-token ceiling) as pure
    JVM column expressions — one map-side pass plus a tiny groupBy
    on lang.  Each rule is reported separately and as the conjunctive
    pass count, the shape a curation pipeline uses to tune thresholds
    before committing to a cut.  No UDFs anywhere; at 100 TB this is
    a single scan."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_words = F.size(words)
    mean_wlen = (F.length(F.regexp_replace("text", " ", ""))
                 .cast("double") / n_words)
    stop_frac = (F.size(F.filter(words, lambda w: w.isin("the", "a")))
                 .cast("double") / n_words)
    digit_frac = (F.size(F.filter(words, lambda w: w.rlike("^[0-9]+$")))
                  .cast("double") / n_words)
    f = d.select(
        "lang",
        n_words.alias("n_words"), mean_wlen.alias("mean_wlen"),
        stop_frac.alias("stop_frac"), digit_frac.alias("digit_frac"))
    r_len = F.when(F.col("n_words").between(15, 200), 1).otherwise(0)
    r_wlen = F.when(F.col("mean_wlen").between(2.0, 10.0), 1).otherwise(0)
    r_stop = F.when(F.col("stop_frac") >= 0.01, 1).otherwise(0)
    r_digit = F.when(F.col("digit_frac") <= 0.2, 1).otherwise(0)
    r = f.select("lang", r_len.alias("r_len"), r_wlen.alias("r_wlen"),
                 r_stop.alias("r_stop"), r_digit.alias("r_digit"))
    return (
        r.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("r_len").alias("pass_len"),
             F.sum("r_wlen").alias("pass_wlen"),
             F.sum("r_stop").alias("pass_stop"),
             F.sum("r_digit").alias("pass_digit"),
             F.sum(F.col("r_len") * F.col("r_wlen") * F.col("r_stop")
                   * F.col("r_digit")).alias("pass_all"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# Length-bucketed inference batching: padding-waste accounting
# ---------------------------------------------------------------------------

@query(
    "length_bucketed_batching",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok
      FROM documents),
    b AS (
      SELECT doc_id, n_tok,
             CAST(least(floor(n_tok / 64.0), 7) AS BIGINT) AS bucket
      FROM d),
    agg AS (
      SELECT bucket, count(*) AS n_docs,
             max(n_tok) AS max_tok, sum(n_tok) AS sum_tok
      FROM b GROUP BY bucket)
    SELECT bucket,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(max_tok AS BIGINT) AS pad_to,
           CAST(sum_tok AS BIGINT) AS real_tokens,
           CAST(n_docs * max_tok - sum_tok AS BIGINT) AS padding_tokens,
           round(CAST(n_docs * max_tok - sum_tok AS DOUBLE)
                 / (n_docs * max_tok), 6) AS padding_frac
    FROM agg ORDER BY bucket
    """,
)
def length_bucketed_batching(spark, sf_dir):
    """Length-bucketed batching for inference/training: assign each
    document to a 64-token-wide length bucket (capped tail), pad
    every batch member to the bucket's max length, and account the
    padding waste per bucket — the statistic that decides bucket
    widths for a GPU-batch scheduler.  Pure map + one small groupBy;
    the whole-corpus padding fraction falls out of the same 8-row
    aggregate at any scale."""
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(F.split(F.col("text"), " "))
    b = d.select(
        n_tok.alias("n_tok"),
        F.least(F.floor(n_tok / 64.0), F.lit(7)).cast("bigint")
        .alias("bucket"))
    agg = (b.groupBy("bucket")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.max("n_tok").alias("pad_to"),
                F.sum("n_tok").alias("real_tokens")))
    padding = F.col("n_docs") * F.col("pad_to") - F.col("real_tokens")
    return (agg.select(
        "bucket", "n_docs",
        F.col("pad_to").cast("bigint").alias("pad_to"),
        F.col("real_tokens").cast("bigint").alias("real_tokens"),
        padding.cast("bigint").alias("padding_tokens"),
        F.round(padding.cast("double")
                / (F.col("n_docs") * F.col("pad_to")), 6)
        .alias("padding_frac"))
        .orderBy("bucket"))


@query(
    "text_readability_flesch",
    oracle=f"""
    WITH feat AS (
      SELECT lang,
             {_SQL_NWORDS.format(e='text')} AS n_words,
             greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
               AS n_sents,
             list_sum(list_transform({_SQL_WORDS.format(e='text')},
               w -> greatest(len(regexp_extract_all(lower(w),
                                                    '[aeiouy]+')), 1)))
               AS n_syll
      FROM documents
      WHERE {_SQL_NWORDS.format(e='text')} > 0
    ), scored AS (
      SELECT lang,
             206.835 - 1.015 * (n_words * 1.0 / n_sents)
                     - 84.6 * (n_syll * 1.0 / n_words) AS flesch
      FROM feat)
    SELECT lang, count(*) AS n_docs,
           round(avg(flesch), 6) AS avg_flesch,
           count(*) FILTER (WHERE flesch < 30) AS n_hard,
           count(*) FILTER (WHERE flesch >= 70) AS n_easy
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def text_readability_flesch(spark, sf_dir):
    """Flesch reading-ease scoring — the classic readability gate in
    curation stacks (a complexity prior next to the quality funnel):
    206.835 − 1.015·(words/sentences) − 84.6·(syllables/words), with
    sentences counted as terminal-punctuation runs and syllables
    approximated by vowel-group runs per word (the standard
    dictionary-free proxy).  All three counts are regexp/array column
    expressions — one map pass, one lang-sized aggregate; no Python,
    no shuffle of text."""
    d = t(spark, sf_dir, "documents")
    ws = F.when(F.trim("text") == "", F.array().cast("array<string>")) \
        .otherwise(F.split(F.trim("text"), r"\s+"))
    n_words = F.size(ws)
    n_sents = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit(r"[.!?]+"), F.lit(0))),
        F.lit(1))
    n_syll = F.aggregate(
        F.transform(ws, lambda w: F.greatest(
            F.size(F.regexp_extract_all(F.lower(w), F.lit("[aeiouy]+"),
                                        F.lit(0))),
            F.lit(1))),
        F.lit(0), lambda acc, x: acc + x)
    feat = (d.where(n_words > 0)
            .select("lang", n_words.alias("n_words"),
                    n_sents.alias("n_sents"), n_syll.alias("n_syll")))
    flesch = (F.lit(206.835)
              - 1.015 * (F.col("n_words") / F.col("n_sents"))
              - 84.6 * (F.col("n_syll") / F.col("n_words")))
    return (
        feat.select("lang", flesch.alias("flesch"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg("flesch"), 6).alias("avg_flesch"),
             F.count(F.when(F.col("flesch") < 30, 1)).alias("n_hard"),
             F.count(F.when(F.col("flesch") >= 70, 1)).alias("n_easy"))
        .orderBy("lang")
    )


@query(
    "text_bigram_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
    uni AS (
      SELECT doc_id, lang, unnest(ws) AS tok FROM toks),
    ufreq AS (SELECT tok, count(*) AS c1 FROM uni GROUP BY tok),
    total AS (SELECT sum(c1) AS n FROM ufreq),
    bgs AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(2, len(ws) + 1),
                    i -> ws[i-1] || chr(31) || ws[i])) AS bg
      FROM toks),
    bfreq AS (SELECT bg, count(*) AS c2 FROM bgs GROUP BY bg),
    doc_lp AS (
      SELECT b.doc_id, b.lang,
             sum(ln(0.75 * f2.c2 / f_ctx.c1
                    + 0.25 * f_cur.c1 / (SELECT n FROM total)))
               AS logprob,
             count(*) AS n_bg
      FROM bgs b
      JOIN bfreq f2 ON f2.bg = b.bg
      JOIN ufreq f_ctx ON f_ctx.tok = split_part(b.bg, chr(31), 1)
      JOIN ufreq f_cur ON f_cur.tok = split_part(b.bg, chr(31), 2)
      GROUP BY b.doc_id, b.lang)
    SELECT lang, count(*) AS n_docs,
           round(avg(logprob / n_bg), 6) AS avg_per_bg_lp,
           round(min(logprob / n_bg), 6) AS min_per_bg_lp,
           round(max(logprob / n_bg), 6) AS max_per_bg_lp
    FROM doc_lp GROUP BY lang ORDER BY lang
    """,
)
def text_bigram_logprob(spark, sf_dir):
    """Interpolated bigram language-model scoring — one order up from
    ``text_unigram_logprob`` and the standard cheap perplexity proxy
    (KenLM-style filtering without the external model): p(w|ctx) =
    0.75·c(ctx,w)/c(ctx) + 0.25·c(w)/N, scored as mean log-prob per
    bigram per document, summarized per language.  Count tables are
    vocabulary/bigram-vocabulary sized and broadcast; the scoring
    join is map-side over the exploded corpus — two count passes +
    one scoring pass, the same 100 TB shape as every n-gram LM
    build."""
    sep = "\x1f"
    d = spread(t(spark, sf_dir, "documents"))
    toks = d.select("doc_id", "lang", F.split("text", " ").alias("ws"))
    uni = toks.select("doc_id", "lang", F.explode("ws").alias("tok"))
    # ufreq feeds two broadcasts + the grand total: persist so the
    # unigram explode+aggregate runs once (no cross-branch CSE)
    ufreq = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c1")).persist()
    total = ufreq.agg(F.sum("c1").alias("n"))
    bg_list = F.transform(
        F.sequence(F.lit(2), F.size("ws")),
        lambda i: F.concat(F.element_at("ws", i - 1), F.lit(sep),
                           F.element_at("ws", i)))
    bgs = (toks.where(F.size("ws") >= 2)
           .select("doc_id", "lang", F.explode(bg_list).alias("bg")))
    bfreq = bgs.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    ctx = F.split_part(F.col("bg"), F.lit(sep), F.lit(1))
    cur = F.split_part(F.col("bg"), F.lit(sep), F.lit(2))
    doc_lp = (
        # NO broadcast hint on bfreq: the bigram vocabulary grows with
        # the corpus (unlike the unigram vocab) — at sf0.1 it is
        # already ~1M rows and forcing the broadcast cost 8s of
        # driver collect; the sort-merge/AQE choice is the 100 TB plan
        bgs.join(bfreq, "bg")
        .join(F.broadcast(ufreq.select(F.col("tok").alias("__ctx"),
                                       F.col("c1").alias("c_ctx"))),
              ctx == F.col("__ctx"))
        .join(F.broadcast(ufreq.select(F.col("tok").alias("__cur"),
                                       F.col("c1").alias("c_cur"))),
              cur == F.col("__cur"))
        .join(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.log(0.75 * F.col("c2") / F.col("c_ctx")
                         + 0.25 * F.col("c_cur") / F.col("n")))
             .alias("logprob"),
             F.count(F.lit(1)).alias("n_bg")))
    per_bg = F.col("logprob") / F.col("n_bg")
    return (
        doc_lp.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg(per_bg), 6).alias("avg_per_bg_lp"),
             F.round(F.min(per_bg), 6).alias("min_per_bg_lp"),
             F.round(F.max(per_bg), 6).alias("max_per_bg_lp"))
        .orderBy("lang")
    )


# --- full BPE merge loop -----------------------------------------------------
# Symbol sequences are strings of chr(1)-wrapped-chr(2) symbols:
# "\x01a\x02\x01b\x02...".  Merging pair (a,b) is then one
# replace("\x01a\x02\x01b\x02" -> "\x01ab\x02") — both engines scan
# left-to-right non-overlapping, which IS greedy BPE merge order, and
# the wrappers make cross-symbol false matches impossible.
_BPE_ITERS = 3
_BPE_VOCAB = 200

_SQL_BPE_SYMS = ("list_transform(list_filter(string_split({s}, chr(2)), "
                 "e -> e <> ''), e -> replace(e, chr(1), ''))")


def _sql_bpe_step(i: int) -> str:
    prev = f"bw{i - 1}"
    return f"""
    p{i} AS (
      SELECT a, b, CAST(sum(cnt) AS BIGINT) AS pc FROM (
        SELECT cnt, syms[j-1] AS a, syms[j] AS b FROM (
          SELECT cnt, {_SQL_BPE_SYMS.format(s='seq')} AS syms FROM {prev})
        CROSS JOIN generate_series(2, 40) t(j)
        WHERE j <= len(syms))
      GROUP BY a, b
    ), b{i} AS (
      SELECT a, b, pc FROM p{i} ORDER BY pc DESC, a, b LIMIT 1
    ), bw{i} AS (
      SELECT w, cnt,
             replace(seq, chr(1) || a || chr(2) || chr(1) || b || chr(2),
                     chr(1) || a || b || chr(2)) AS seq
      FROM {prev} CROSS JOIN b{i}
    )"""


@query(
    "bpe_merge_iterations",
    oracle=f"""
    WITH vocab AS (
      SELECT w, count(*) AS cnt FROM (
        SELECT unnest({_SQL_WORDS.format(e='lower(text)')}) AS w
        FROM documents) WHERE w <> ''
      GROUP BY w ORDER BY cnt DESC, w LIMIT {_BPE_VOCAB}
    ), bw0 AS (
      SELECT w, cnt,
             regexp_replace(w, '(.)', chr(1) || '\\1' || chr(2), 'g') AS seq
      FROM vocab
    ),
    {','.join(_sql_bpe_step(i) for i in range(1, _BPE_ITERS + 1))}
    SELECT * FROM (
      {' UNION ALL '.join(
          f"SELECT {i} AS merge_rank, a AS sym_a, b AS sym_b, pc AS pair_count FROM b{i}"
          for i in range(1, _BPE_ITERS + 1))})
    ORDER BY merge_rank
    """,
)
def bpe_merge_iterations(spark, sf_dir):
    """FULL BPE tokenizer training loop (3 merges over the top-200
    word vocabulary): per iteration, count adjacent symbol pairs
    weighted by word frequency, pick the argmax (ties → lexicographic),
    and merge it greedily left-to-right in every word — the exact
    Sennrich et al. algorithm.  Spark shape per iteration: pair counts
    are an array-expression explode + one map-side-combined aggregate;
    the winning pair is a driver-size decision (like the k-means
    centroid fetch); the merge itself is one ``replace`` map pass.
    The vocabulary table is corpus-aggregated ONCE; iterations never
    rescan the corpus — at 100 TB this is the standard two-phase BPE
    trainer (word-count pass, then vocab-sized iterations)."""
    d = t(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+"))
                 .alias("w"))
        .where(F.col("w") != "")
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "w").limit(_BPE_VOCAB))
    return X.bpe_train(vocab, iters=_BPE_ITERS)


@query(
    "naive_bayes_langid",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang, text,
             {_H60_TP.format(e="CAST(doc_id AS VARCHAR) || ':nb'")} % 100 < 80
               AS is_train
      FROM documents
    ), toks AS (
      SELECT doc_id, lang, is_train, unnest(string_split(text, ' ')) AS tok
      FROM docs
    ), cls AS (
      SELECT lang AS c, count(DISTINCT doc_id) AS n_docs,
             count(*) AS n_tok
      FROM toks WHERE is_train GROUP BY lang
    ), prior AS (
      SELECT c, n_docs, n_tok,
             ln(n_docs * 1.0 / (SELECT sum(n_docs) FROM cls)) AS lp
      FROM cls
    ), wl AS (
      SELECT tok, lang AS c, count(*) AS cnt
      FROM toks WHERE is_train GROUP BY tok, lang
    ), vocab AS (SELECT count(DISTINCT tok) AS v FROM toks WHERE is_train),
    scored AS (
      SELECT t.doc_id, t.lang AS true_lang, p.c AS cand,
             round(p.lp
                   + sum(ln((coalesce(w.cnt, 0) + 1.0)
                            / (p.n_tok + vocab.v))),
                   6) AS score
      FROM toks t
      CROSS JOIN prior p
      CROSS JOIN vocab
      LEFT JOIN wl w ON w.tok = t.tok AND w.c = p.c
      WHERE NOT t.is_train
      GROUP BY t.doc_id, t.lang, p.c, p.lp
    ), pred AS (
      SELECT doc_id, true_lang, cand AS pred_lang FROM (
        SELECT doc_id, true_lang, cand,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, cand) AS rk
        FROM scored) WHERE rk = 1
    )
    SELECT true_lang, pred_lang, count(*) AS n_docs
    FROM pred GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """,
)
def naive_bayes_langid(spark, sf_dir):
    """Multinomial Naive Bayes language classifier, trained and
    evaluated fully in-plan: deterministic 80/20 hash split, add-one
    smoothed per-(word, lang) likelihoods, argmax of the rounded
    log-posterior (round 6 before the argmax makes the decision
    portable; ties → lexicographic), reported as a confusion matrix.
    The 100 TB shape of every count-based classifier: two count
    passes build vocabulary-sized tables that broadcast; scoring is
    a map-side join over the exploded test corpus ×|classes| and one
    per-doc aggregate — no driver state, no iteration."""
    d = t(spark, sf_dir, "documents")
    from sidecar_spark.functions.dedup import hash60

    is_train = (hash60(F.concat(F.col("doc_id").cast("string"),
                                F.lit(":nb"))) % 100 < 80)
    # toks feeds FIVE consumers (class counts, the total-docs action,
    # word likelihoods, the vocab-size action, and test scoring) —
    # separate actions and plan branches are not CSE'd, so unpersisted
    # the corpus explode ran five times.  (doc_id, lang, flag, tok)
    # rows only — the persisted set is the token stream every
    # count-based classifier materializes once.
    toks = d.select(
        "doc_id", "lang", is_train.alias("is_train"),
        F.explode(F.split("text", " ")).alias("tok")).persist()
    train = toks.where("is_train")
    cls = train.groupBy(F.col("lang").alias("c")).agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tok"))
    total_docs = cls.agg(F.sum("n_docs")).first()[0]
    prior = cls.select(
        "c", "n_tok",
        F.log(F.col("n_docs") / F.lit(float(total_docs))).alias("lp"))
    wl = train.groupBy("tok", F.col("lang").alias("c")).agg(
        F.count(F.lit(1)).alias("cnt"))
    v = train.select("tok").distinct().count()
    test = toks.where(~F.col("is_train"))
    scored = (
        test.crossJoin(F.broadcast(prior))
        .join(F.broadcast(wl), ["tok", "c"], "left")
        .groupBy(F.col("doc_id"), F.col("lang").alias("true_lang"),
                 F.col("c").alias("cand"))
        .agg(F.round(
            F.first("lp")
            + F.sum(F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                          / (F.col("n_tok") + F.lit(float(v))))),
            6).alias("score")))
    rk = F.row_number().over(
        W.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cand")))
    pred = (scored.withColumn("rk", rk).where(F.col("rk") == 1)
            .select("true_lang", F.col("cand").alias("pred_lang")))
    return (pred.groupBy("true_lang", "pred_lang")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("true_lang", "pred_lang"))


@query(
    "feature_hashing_trick",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      FROM documents WHERE doc_id < 8
    ), hashed AS (
      SELECT doc_id,
             {_H60_TP.format(e='tok')} % 256 AS bucket,
             CASE WHEN ({_H60_TP.format(e="tok || ':sgn'")}) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM toks)
    SELECT doc_id, bucket,
           CAST(sum(sgn) AS BIGINT) AS feature_val,
           count(*) AS n_tokens
    FROM hashed GROUP BY doc_id, bucket
    HAVING sum(sgn) <> 0
    ORDER BY doc_id, bucket
    """,
)
def feature_hashing_trick(spark, sf_dir):
    """The hashing trick (Weinberger et al.): words → 256 feature
    buckets via hash, with a second hash choosing the sign (the
    signed variant that makes collisions cancel in expectation) — the
    standard way to featurize unbounded vocabularies with a FIXED
    schema and zero vocabulary state.  Sparse long-form output (one
    row per non-zero bucket).  At 100 TB this is exactly why the
    trick exists: no vocab table to build, broadcast, or version —
    featurization is one stateless map pass."""
    from sidecar_spark.functions.dedup import hash60

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 8)
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    hashed = toks.select(
        "doc_id",
        (hash60(F.col("tok")) % 256).alias("bucket"),
        F.when(hash60(F.concat(F.col("tok"), F.lit(":sgn"))) % 2 == 0, 1)
        .otherwise(-1).alias("sgn"))
    return (hashed.groupBy("doc_id", "bucket")
            .agg(F.sum("sgn").cast("bigint").alias("feature_val"),
                 F.count(F.lit(1)).alias("n_tokens"))
            .where(F.col("feature_val") != 0)
            .orderBy("doc_id", "bucket"))


@query(
    "bpe_encode_corpus",
    oracle=f"""
    WITH vocab AS (
      SELECT w, count(*) AS cnt FROM (
        SELECT unnest({_SQL_WORDS.format(e='lower(text)')}) AS w
        FROM documents) WHERE w <> ''
      GROUP BY w ORDER BY cnt DESC, w LIMIT {_BPE_VOCAB}
    ), bw0 AS (
      SELECT w, cnt,
             regexp_replace(w, '(.)', chr(1) || '\\1' || chr(2), 'g') AS seq
      FROM vocab
    ),
    {','.join(_sql_bpe_step(i) for i in range(1, _BPE_ITERS + 1))},
    encoded AS (
      SELECT d.lang,
             length(regexp_replace(lower(d.text), '\\s', '', 'g'))
               AS n_chars,
             replace(replace(replace(
               regexp_replace(lower(d.text), '([^\\s])',
                              chr(1) || '\\1' || chr(2), 'g'),
               chr(1) || b1.a || chr(2) || chr(1) || b1.b || chr(2),
               chr(1) || b1.a || b1.b || chr(2)),
               chr(1) || b2.a || chr(2) || chr(1) || b2.b || chr(2),
               chr(1) || b2.a || b2.b || chr(2)),
               chr(1) || b3.a || chr(2) || chr(1) || b3.b || chr(2),
               chr(1) || b3.a || b3.b || chr(2)) AS seq
      FROM documents d CROSS JOIN b1 CROSS JOIN b2 CROSS JOIN b3
    )
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(length(seq) - length(replace(seq, chr(1), '')))
                AS BIGINT) AS total_tokens,
           round(sum(n_chars) * 1.0
                 / sum(length(seq) - length(replace(seq, chr(1), ''))), 6)
             AS chars_per_token
    FROM encoded GROUP BY lang ORDER BY lang
    """,
)
def bpe_encode_corpus(spark, sf_dir):
    """TOKENIZER APPLICATION at corpus scale — the other half of the
    BPE story (``bpe_merge_iterations`` trains; this encodes): apply
    the 3 learned merges IN TRAINING ORDER to every document and
    report per-language token counts and chars-per-token compression.
    Spark shape: training happens on the vocab aggregate, the learned
    merge table is collected (driver-size, like a tokenizer file) and
    applied as a chain of ``replace`` map expressions — encoding at
    100 TB is a pure stateless map pass, which is exactly why
    production tokenizers are shippable artifacts.  Spaces are never
    wrapped, so merges cannot cross word boundaries; token count =
    count of symbol-open markers."""
    c1, c2 = "\x01", "\x02"
    d = t(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+"))
                 .alias("w"))
        .where(F.col("w") != "")
        .groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "w").limit(_BPE_VOCAB))
    merges = X.bpe_train(vocab, iters=_BPE_ITERS) \
        .orderBy("merge_rank").collect()
    seq = F.regexp_replace(F.lower("text"), r"([^\s])", f"{c1}$1{c2}")
    for m in merges:
        seq = F.replace(
            seq, F.lit(f"{c1}{m['sym_a']}{c2}{c1}{m['sym_b']}{c2}"),
            F.lit(f"{c1}{m['sym_a']}{m['sym_b']}{c2}"))
    n_chars = F.length(F.regexp_replace(F.lower("text"), r"\s", ""))
    n_tokens = F.length(seq) - F.length(F.replace(seq, F.lit(c1), F.lit("")))
    enc = d.select("lang", n_chars.alias("n_chars"),
                   n_tokens.alias("n_tokens"))
    return (enc.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("total_chars"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                 F.round(F.sum("n_chars") / F.sum("n_tokens"), 6)
                 .alias("chars_per_token"))
            .orderBy("lang"))


@query(
    "text_ngram_novelty",
    oracle=f"""
    WITH grams AS (
      SELECT doc_id,
             unnest(list_distinct(CASE WHEN len(ws) < 3
               THEN [array_to_string(ws, ' ')]
               ELSE list_transform(range(1, len(ws) - 1),
                    i -> array_to_string(ws[i:i+2], ' ')) END)) AS g
      FROM (SELECT doc_id,
                   {_SQL_WORDS.format(e='lower(text)')} AS ws
            FROM documents)
    ), first_seen AS (
      SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
    ), totals AS (
      SELECT doc_id, count(*) AS n_grams FROM grams GROUP BY doc_id
    ), novel AS (
      SELECT first_doc AS doc_id, count(*) AS n_novel
      FROM first_seen GROUP BY first_doc
    ), per_doc AS (
      SELECT t.doc_id, t.n_grams,
             CAST(coalesce(v.n_novel, 0) AS BIGINT) AS n_novel
      FROM totals t LEFT JOIN novel v USING (doc_id)
    )
    SELECT CAST(doc_id / 1000 AS BIGINT) AS doc_bucket,
           count(*) AS n_docs,
           CAST(sum(n_grams) AS BIGINT) AS total_grams,
           round(sum(n_novel) * 1.0 / sum(n_grams), 6) AS novelty_rate
    FROM per_doc GROUP BY doc_bucket ORDER BY doc_bucket
    """,
)
def text_ngram_novelty(spark, sf_dir):
    """Corpus novelty curve: per ingestion bucket (doc_id / 1000),
    the fraction of a document's distinct word 3-grams whose FIRST
    corpus occurrence is that document — the diminishing-returns
    signal crawls monitor to decide when a source is mined out.
    One gram explode feeds per-gram min(doc_id); per-doc gram totals
    never explode at all (size(array_distinct(...)) is a map-side
    column), and both sides roll up to bucket granularity BEFORE the
    join, so the only join is |buckets|×|buckets| — no doc-keyed
    shuffle, no per-doc frame ever materializes (the naive
    grams⋈first_seen formulation cost 21 s at sf0.1; this shape
    stays linear at 100 TB with exactly one corpus-scale shuffle,
    the groupBy-gram).  The scan is spread: a single-file corpus
    otherwise runs the whole explode on one core."""
    d = spread(t(spark, sf_dir, "documents"))
    # materialize the whitespace split as its own projection: the gram
    # transform below is a higher-order function (CodegenFallback —
    # interpreted, no common-subexpression elimination), so an INLINE
    # split expression captured by the lambda would re-split the
    # document at every element_at site — 3 regex splits PER GRAM
    # (measured 10-40x on this query whenever the JIT had deoptimized
    # the split path).  As a bound attribute it is one split per row.
    ws_expr = F.when(F.trim(F.lower("text")) == "",
                     F.array().cast("array<string>")) \
        .otherwise(F.split(F.trim(F.lower("text")), r"\s+"))
    dw = d.select("doc_id", ws_expr.alias("ws"))
    ws = F.col("ws")
    grams3 = F.when(
        F.size(ws) < 3, F.array(F.array_join(ws, " "))).otherwise(
        F.transform(F.sequence(F.lit(1), F.size(ws) - 2),
                    lambda i: F.concat_ws(
                        " ", F.element_at(ws, i),
                        F.element_at(ws, i + 1),
                        F.element_at(ws, i + 2))))
    bucket = F.floor(F.col("doc_id") / 1000).cast("bigint") \
        .alias("doc_bucket")
    totals_b = (dw.select("doc_id",
                          F.size(F.array_distinct(grams3)).alias("ng"))
                .groupBy(bucket)
                .agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum("ng").cast("bigint").alias("total_grams")))
    novel_b = (dw.select("doc_id",
                         F.explode(F.array_distinct(grams3)).alias("g"))
               .groupBy("g").agg(F.min("doc_id").alias("first_doc"))
               .groupBy(F.floor(F.col("first_doc") / 1000).cast("bigint")
                        .alias("doc_bucket"))
               .agg(F.count(F.lit(1)).alias("n_novel")))
    return (totals_b.join(novel_b, "doc_bucket", "left")
            .select("doc_bucket", "n_docs", "total_grams",
                    F.round(F.coalesce("n_novel", F.lit(0))
                            / F.col("total_grams"), 6)
                    .alias("novelty_rate"))
            .orderBy("doc_bucket"))


@query(
    "dup_quality_interaction",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
               AS h
      FROM documents
    ), dup AS (
      SELECT doc_id,
             count(*) OVER (PARTITION BY h) > 1 AS is_dup
      FROM hashed
    ), quality AS (
      SELECT doc_id,
             CASE WHEN length(text) >= 100 THEN 'long' ELSE 'short' END
               AS len_bucket
      FROM documents
    )
    SELECT q.len_bucket, d.is_dup, count(*) AS n_docs
    FROM dup d JOIN quality q USING (doc_id)
    GROUP BY q.len_bucket, d.is_dup
    ORDER BY q.len_bucket, d.is_dup
    """,
)
def dup_quality_interaction(spark, sf_dir):
    """Duplication × quality cross-tab: are exact duplicates
    concentrated in short (low-effort) documents?  The audit that
    tells a curation team whether dedup and quality filtering are
    redundant or complementary passes.  One content-hash window +
    one join + one tiny rollup."""
    d = t(spark, sf_dir, "documents")
    from sidecar_spark.functions import text as X
    h = F.md5(X.normalized_text(F.col("text")))
    dup = d.select(
        "doc_id",
        (F.count(F.lit(1)).over(
            W.partitionBy(h)) > 1).alias("is_dup"))
    quality = d.select(
        "doc_id",
        F.when(F.length("text") >= 100, "long").otherwise("short")
        .alias("len_bucket"))
    return (dup.join(quality, "doc_id")
            .groupBy("len_bucket", "is_dup")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .orderBy("len_bucket", "is_dup"))


@query(
    "grouped_ols_fit",
    oracle="""
    SELECT lang,
           count(*) AS n_docs,
           round(regr_slope(n_chars, n_tokens), 6) AS slope,
           round(regr_intercept(n_chars, n_tokens), 6) AS intercept,
           round(regr_r2(n_chars, n_tokens), 6) AS r2
    FROM (
      SELECT lang, n_chars,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
               AS n_tokens
      FROM documents)
    GROUP BY lang ORDER BY lang
    """,
)
def grouped_ols_fit(spark, sf_dir):
    """Per-group model fitting via ``applyInPandas`` — one OLS fit
    (chars ~ tokens) PER LANGUAGE with numpy inside the grouped UDF,
    cross-checked against DuckDB's closed-form ``regr_*`` aggregates:
    the two paradigms (imperative per-group solver vs SQL moment
    aggregates) must agree to 6 decimals, which pins both the group
    routing and the math.  This is the canonical grouped-training
    shape (per-entity forecasting models, per-domain calibration) —
    each group fits on one executor, groups run in parallel, and the
    shuffle carries only the fit inputs."""
    import numpy as np
    import pandas as pd

    d = spread(t(spark, sf_dir, "documents"))
    ws = F.when(F.trim("text") == "", 0).otherwise(
        F.size(F.split(F.trim("text"), r"\s+")))
    inputs = d.select("lang", "n_chars", ws.alias("n_tokens"))

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["n_tokens"].to_numpy(dtype=float)
        y = pdf["n_chars"].to_numpy(dtype=float)
        xm, ym = x.mean(), y.mean()
        sxx = ((x - xm) ** 2).sum()
        sxy = ((x - xm) * (y - ym)).sum()
        slope = sxy / sxx
        intercept = ym - slope * xm
        ss_res = ((y - (intercept + slope * x)) ** 2).sum()
        ss_tot = ((y - ym) ** 2).sum()
        return pd.DataFrame({
            "lang": [pdf["lang"].iloc[0]],
            "n_docs": [len(pdf)],
            "slope": [round(slope, 6)],
            "intercept": [round(intercept, 6)],
            "r2": [round(1 - ss_res / ss_tot, 6)],
        })

    return (inputs.groupBy("lang")
            .applyInPandas(fit, "lang string, n_docs long, slope double,"
                                " intercept double, r2 double")
            .orderBy("lang"))


@query(
    "eval_exact_match_f1",
    oracle=f"""
    WITH pairs AS (
      SELECT doc_id, lang, text AS ref,
             CASE doc_id % 4
               WHEN 0 THEN text
               WHEN 1 THEN array_to_string(
                 ({_SQL_WORDS.format(e='text')})[
                   1 : greatest(len({_SQL_WORDS.format(e='text')}) * 4 // 5,
                                1)], ' ')
               WHEN 2 THEN array_to_string(
                 list_reverse({_SQL_WORDS.format(e='text')}), ' ')
               ELSE 'no answer' END AS hyp
      FROM documents
    ), rtok AS (
      SELECT doc_id, unnest({_SQL_WORDS.format(e='ref')}) AS tok FROM pairs
    ), htok AS (
      SELECT doc_id, unnest({_SQL_WORDS.format(e='hyp')}) AS tok FROM pairs
    ), rcnt AS (
      SELECT doc_id, tok, count(*) AS cr FROM rtok GROUP BY doc_id, tok
    ), hcnt AS (
      SELECT doc_id, tok, count(*) AS ch FROM htok GROUP BY doc_id, tok
    ), ov AS (
      SELECT r.doc_id, CAST(sum(least(r.cr, h.ch)) AS BIGINT) AS n_overlap
      FROM rcnt r JOIN hcnt h ON r.doc_id = h.doc_id AND r.tok = h.tok
      GROUP BY r.doc_id
    ), scored AS (
      SELECT p.doc_id, p.lang,
             CASE WHEN p.ref = p.hyp THEN 1 ELSE 0 END AS em,
             CASE WHEN len({_SQL_WORDS.format(e='p.ref')})
                       + len({_SQL_WORDS.format(e='p.hyp')}) = 0 THEN 0.0
                  ELSE 2.0 * coalesce(o.n_overlap, 0)
                       / (len({_SQL_WORDS.format(e='p.ref')})
                          + len({_SQL_WORDS.format(e='p.hyp')})) END AS f1
      FROM pairs p LEFT JOIN ov o ON o.doc_id = p.doc_id
    )
    SELECT lang, count(*) AS n_examples,
           round(avg(em), 6) AS exact_match,
           round(avg(f1), 6) AS token_f1
    FROM scored GROUP BY lang ORDER BY lang
    """,
)
def eval_exact_match_f1(spark, sf_dir):
    """SQuAD-style eval scoring at corpus scale: exact-match and
    token-multiset F1 between references and (deterministically
    mutated) hypotheses — identity, truncation, reordering (F1=1 but
    EM=0: the multiset metric is order-blind by design), and total
    miss.  The multiset overlap is the per-(doc, token) min-count
    join — grouped count tables, never a quadratic token pairing.
    This is the scoring half of every eval harness, runnable where
    the predictions live instead of collecting them to a driver."""
    d = spread(t(spark, sf_dir, "documents"))
    ws = lambda c: F.when(  # noqa: E731
        F.trim(c) == "", F.array().cast("array<string>")) \
        .otherwise(F.split(F.trim(c), r"\s+"))
    w = ws(F.col("text"))
    hyp = (F.when(F.col("doc_id") % 4 == 0, F.col("text"))
           .when(F.col("doc_id") % 4 == 1,
                 F.array_join(F.slice(
                     w, 1, F.greatest(F.floor(F.size(w) * 4 / 5),
                                      F.lit(1)).cast("int")), " "))
           .when(F.col("doc_id") % 4 == 2,
                 F.array_join(F.reverse(w), " "))
           .otherwise(F.lit("no answer")))
    pairs = d.select("doc_id", "lang", F.col("text").alias("ref"),
                     hyp.alias("hyp")).localCheckpoint(eager=True)
    rcnt = (pairs.select("doc_id", F.explode(ws(F.col("ref"))).alias("tok"))
            .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("cr")))
    hcnt = (pairs.select("doc_id", F.explode(ws(F.col("hyp"))).alias("tok"))
            .groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("ch")))
    ov = (rcnt.join(hcnt, ["doc_id", "tok"])
          .groupBy("doc_id")
          .agg(F.sum(F.least("cr", "ch")).cast("bigint")
               .alias("n_overlap")))
    denom = F.size(ws(F.col("ref"))) + F.size(ws(F.col("hyp")))
    scored = (
        pairs.join(ov, "doc_id", "left")
        .select("lang",
                F.when(F.col("ref") == F.col("hyp"), 1).otherwise(0)
                .alias("em"),
                F.when(denom == 0, 0.0)
                .otherwise(2.0 * F.coalesce("n_overlap", F.lit(0)) / denom)
                .alias("f1")))
    return (scored.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_examples"),
                 F.round(F.avg("em"), 6).alias("exact_match"),
                 F.round(F.avg("f1"), 6).alias("token_f1"))
            .orderBy("lang"))


@query(
    "pass_at_k_estimator",
    oracle=f"""
    WITH tasks AS (
      SELECT o_orderkey AS task_id,
             o_orderkey % 4 AS difficulty
      FROM orders WHERE o_orderkey < 4000
    ), attempts AS (
      SELECT task_id, difficulty, g.i AS attempt,
             ({_H60_TP.format(
                 e="CAST(task_id AS VARCHAR) || ':att' || CAST(g.i AS VARCHAR)")}
              % 100) < (80 - difficulty * 20) AS ok
      FROM tasks CROSS JOIN generate_series(0, 9) g(i)
    ), per_task AS (
      SELECT task_id, difficulty,
             CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS c
      FROM attempts GROUP BY task_id, difficulty
    ), est AS (
      SELECT task_id, difficulty, c,
             1.0 - list_product(list_transform(range(0, 1),
                     j -> (10 - c - j) * 1.0 / (10 - j))) AS pass1,
             1.0 - list_product(list_transform(range(0, 5),
                     j -> greatest(10 - c - j, 0) * 1.0 / (10 - j))) AS pass5,
             CASE WHEN c > 0 THEN 1.0 ELSE 0.0 END AS pass10
      FROM per_task
    )
    SELECT difficulty,
           count(*) AS n_tasks,
           round(avg(c) / 10, 6) AS mean_attempt_rate,
           round(avg(pass1), 6) AS pass_at_1,
           round(avg(pass5), 6) AS pass_at_5,
           round(avg(pass10), 6) AS pass_at_10
    FROM est GROUP BY difficulty ORDER BY difficulty
    """,
)
def pass_at_k_estimator(spark, sf_dir):
    """The unbiased pass@k estimator (Chen et al., Codex):
    1 − C(n−c, k)/C(n, k) computed as the stable telescoping product
    ∏ⱼ (n−c−j)/(n−j) — over n=10 deterministic hash-seeded attempts
    per task, with success rates varying by task difficulty bucket.
    Per bucket: mean attempt rate vs pass@1/5/10 — the eval-harness
    aggregation that runs where the attempt logs live.  One explode
    (tasks × attempts), one per-task count, one bucket rollup."""
    from sidecar_spark.functions.dedup import hash60

    o = t(spark, sf_dir, "orders").where(F.col("o_orderkey") < 4000)
    tasks = o.select(F.col("o_orderkey").alias("task_id"),
                     (F.col("o_orderkey") % 4).alias("difficulty"))
    att = tasks.select(
        "task_id", "difficulty",
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("i"))
    ok = ((hash60(F.concat(F.col("task_id").cast("string"), F.lit(":att"),
                           F.col("i").cast("string"))) % 100)
          < (80 - F.col("difficulty") * 20))
    per_task = (att.select("task_id", "difficulty",
                           F.when(ok, 1).otherwise(0).alias("s"))
                .groupBy("task_id", "difficulty")
                .agg(F.sum("s").cast("bigint").alias("c")))

    def pass_k(k: int):
        prod = F.lit(1.0)
        for j in range(k):
            prod = prod * (F.greatest(F.lit(10) - F.col("c") - j, F.lit(0))
                           / F.lit(10 - j))
        return 1.0 - prod

    est = per_task.select(
        "difficulty", "c",
        pass_k(1).alias("pass1"), pass_k(5).alias("pass5"),
        F.when(F.col("c") > 0, 1.0).otherwise(0.0).alias("pass10"))
    return (est.groupBy("difficulty")
            .agg(F.count(F.lit(1)).alias("n_tasks"),
                 F.round(F.avg("c") / 10, 6).alias("mean_attempt_rate"),
                 F.round(F.avg("pass1"), 6).alias("pass_at_1"),
                 F.round(F.avg("pass5"), 6).alias("pass_at_5"),
                 F.round(F.avg("pass10"), 6).alias("pass_at_10"))
            .orderBy("difficulty"))


@query(
    "corpus_datasheet",
    oracle=f"""
    WITH flags AS (
      SELECT lang, source, n_chars,
             {_SQL_NWORDS.format(e='text')} AS n_tokens,
             CASE WHEN count(*) OVER (PARTITION BY
                    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
                  > 1 THEN 1 ELSE 0 END AS is_dup,
             CASE WHEN n_chars >= 100
                   AND length(regexp_replace(text, '[^0-9]', '', 'g'))
                       <= 0.2 * length(text) THEN 1 ELSE 0 END AS passes_gate
      FROM documents
    )
    SELECT coalesce(lang, 'ALL') AS lang,
           coalesce(source, 'ALL') AS source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           round(avg(is_dup), 6) AS dup_rate,
           round(avg(passes_gate), 6) AS gate_pass_rate
    FROM flags
    GROUP BY GROUPING SETS ((lang, source), (lang), ())
    ORDER BY lang, source
    """,
)
def corpus_datasheet(spark, sf_dir):
    """The 'datasheet for the dataset' rollup — the one-page corpus
    report every dataset release ships: per (language, source), per
    language, and overall totals of document/char/token counts,
    exact-duplicate rate, and quality-gate pass rate, in a SINGLE
    scan via GROUPING SETS (the flags are window/column expressions
    computed once; ROLLUP(lang, source) IS those three grouping
    sets and all levels share the pass).
    At 100 TB this replaces three separate report jobs with one."""
    d = t(spark, sf_dir, "documents")
    ws_n = F.when(F.trim("text") == "", 0).otherwise(
        F.size(F.split(F.trim("text"), r"\s+")))
    h = F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
    digits = F.length(F.regexp_replace("text", "[^0-9]", ""))
    flags = d.select(
        "lang", "source", "n_chars", ws_n.alias("n_tokens"),
        F.when(F.count(F.lit(1)).over(W.partitionBy(h)) > 1, 1)
        .otherwise(0).alias("is_dup"),
        F.when((F.col("n_chars") >= 100)
               & (digits <= 0.2 * F.length("text")), 1)
        .otherwise(0).alias("passes_gate"))
    return (flags.rollup("lang", "source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").cast("bigint").alias("total_chars"),
                 F.sum("n_tokens").cast("bigint").alias("total_tokens"),
                 F.round(F.avg("is_dup"), 6).alias("dup_rate"),
                 F.round(F.avg("passes_gate"), 6).alias("gate_pass_rate"))
            .select(F.coalesce("lang", F.lit("ALL")).alias("lang"),
                    F.coalesce("source", F.lit("ALL")).alias("source"),
                    "n_docs", "total_chars", "total_tokens",
                    "dup_rate", "gate_pass_rate")
            .orderBy("lang", "source"))


@query(
    "rake_keyphrases",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, u.w AS w, u.i AS i,
             list_contains({_SQL_STOPS}, u.w) AS is_stop
      FROM (SELECT doc_id,
                   {_SQL_WORDS.format(e='lower(text)')} AS ws
            FROM documents WHERE doc_id < 200) d,
      LATERAL (SELECT unnest(d.ws) AS w,
                      generate_subscripts(d.ws, 1) AS i) u
    ), islands AS (
      SELECT doc_id, w, i,
             i - row_number() OVER (PARTITION BY doc_id ORDER BY i)
               AS island
      FROM toks WHERE NOT is_stop AND w <> ''
    ), phrases AS (
      SELECT doc_id, island,
             string_agg(w, ' ' ORDER BY i) AS phrase,
             count(*) AS plen
      FROM islands GROUP BY doc_id, island
      HAVING count(*) BETWEEN 1 AND 3
    ), pwords AS (
      SELECT unnest(string_split(phrase, ' ')) AS w, plen FROM phrases
    ), wscore AS (
      SELECT w, sum(plen) * 1.0 / count(*) AS score FROM pwords GROUP BY w
    ), pscore AS (
      SELECT p.phrase,
             count(*) AS n_occur,
             round(any_value(sc.s), 6) AS score
      FROM phrases p
      JOIN (SELECT phrase AS ph, sum(ws.score) AS s FROM (
              SELECT DISTINCT phrase FROM phrases) q,
            LATERAL (SELECT unnest(string_split(q.phrase, ' ')) AS w) t
            JOIN wscore ws ON ws.w = t.w
            GROUP BY ph) sc ON sc.ph = p.phrase
      GROUP BY p.phrase
    )
    SELECT phrase, n_occur, score, rk FROM (
      SELECT phrase, n_occur, score,
             row_number() OVER (ORDER BY score DESC, phrase) AS rk
      FROM pscore)
    WHERE rk <= 15
    """,
)
def rake_keyphrases(spark, sf_dir):
    """RAKE keyphrase extraction (Rose et al.): candidate phrases are
    maximal stopword-free word runs (gaps-and-islands over token
    positions — island id = pos − row_number), scored by the summed
    word degree/frequency ratio, top-15 corpus-wide.  Every stage is
    relational: one explode with positions, one window, two
    vocabulary-sized aggregates — the keyword extractor that needs no
    model artifact, over a 200-doc sample (RAKE is per-corpus; the
    sample bounds the oracle).  Tie-breaks (score rounded, then
    phrase) make the top-k portable."""
    from pyspark.sql import Window as W

    d = (t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
         .select("doc_id",
                 F.when(F.trim(F.lower("text")) == "",
                        F.array().cast("array<string>"))
                 .otherwise(F.split(F.trim(F.lower("text")), r"\s+"))
                 .alias("ws")))
    stops = F.array(*[F.lit(w) for w in X.ALL_STOPWORDS])
    toks = d.select(
        "doc_id", F.posexplode("ws").alias("i", "w")) \
        .withColumn("is_stop", F.array_contains(stops, F.col("w")))
    islands = (toks.where(~F.col("is_stop") & (F.col("w") != ""))
               .withColumn("island",
                           F.col("i") - F.row_number().over(
                               W.partitionBy("doc_id").orderBy("i"))))
    phrases = (islands.groupBy("doc_id", "island")
               .agg(F.array_join(F.transform(F.array_sort(F.collect_list(
                   F.struct("i", "w"))), lambda s: s["w"]), " ")
                   .alias("phrase"),
                    F.count(F.lit(1)).alias("plen"))
               .where(F.col("plen").between(1, 3))
               .localCheckpoint(eager=True))
    pwords = phrases.select(F.explode(F.split("phrase", " ")).alias("w"),
                            "plen")
    wscore = pwords.groupBy("w").agg(
        (F.sum("plen") / F.count(F.lit(1))).alias("score"))
    uniq = phrases.select("phrase").distinct()
    ph_score = (uniq.select("phrase",
                            F.explode(F.split("phrase", " ")).alias("w"))
                .join(F.broadcast(wscore), "w")
                .groupBy("phrase").agg(F.sum("score").alias("s")))
    pscore = (phrases.groupBy("phrase")
              .agg(F.count(F.lit(1)).alias("n_occur"))
              .join(F.broadcast(ph_score), "phrase")
              .select("phrase", "n_occur", F.round("s", 6).alias("score")))
    rk = F.row_number().over(W.orderBy(F.desc("score"), "phrase"))
    return (pscore.withColumn("rk", rk).where(F.col("rk") <= 15)
            .select("phrase", "n_occur", "score", "rk"))


@query(
    "text_unicode_normalize",
    oracle="""
    WITH decomp AS (
      SELECT doc_id,
             regexp_replace(text, 'e', 'e' || chr(769), 'g') AS raw
      FROM documents WHERE doc_id < 200
    ), norm AS (
      SELECT doc_id, length(raw) AS n_raw,
             length(nfc_normalize(raw)) AS n_nfc
      FROM decomp)
    SELECT doc_id, n_raw, n_nfc,
           n_raw - n_nfc AS n_composed,
           CASE WHEN n_raw <> n_nfc THEN 1 ELSE 0 END AS changed
    FROM norm
    """,
)
def text_unicode_normalize(spark, sf_dir):
    """Unicode NFC normalization — the canonicalization step every
    text-dedup pipeline runs first (decomposed e+U+0301 and composed
    U+00E9 must hash identically).  Inputs are made adversarial by
    decomposing every 'e'; the engine then NFC-composes them back.

    Spark has no normalization builtin, so this is the sanctioned
    Python seam: an Arrow-batched pandas UDF over
    ``unicodedata.normalize`` (vectorized transfer, never per-row
    Python).  The oracle cross-checks against DuckDB's independent
    ``nfc_normalize`` implementation — cross-library agreement on
    the Unicode tables, not a replayed formula."""
    from pyspark.sql.functions import pandas_udf

    def _nfc_batch(s):
        import unicodedata
        return s.map(lambda v: None if v is None
                     else unicodedata.normalize("NFC", v))

    # lambda-style registration: the module uses postponed annotation
    # evaluation, under which hint-style pandas UDFs can't resolve
    # the stringified pd.Series signature.
    nfc = pandas_udf(_nfc_batch, "string")

    d = t(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    raw = F.regexp_replace("text", "e", "é")
    n = d.select("doc_id", F.length(raw).alias("n_raw"),
                 F.length(nfc(raw)).alias("n_nfc"))
    return n.select(
        "doc_id", "n_raw", "n_nfc",
        (F.col("n_raw") - F.col("n_nfc")).alias("n_composed"),
        F.when(F.col("n_raw") != F.col("n_nfc"), 1).otherwise(0)
        .alias("changed"))


@query(
    "html_boilerplate_strip",
    oracle="""
    WITH page AS (
      SELECT doc_id,
             '<html><head><title>' || source || '</title></head>'
             || '<body><nav>home | about | contact</nav><p>' || text
             || '</p><footer>&copy; corp</footer></body></html>' AS html
      FROM documents
    ), stripped AS (
      SELECT doc_id, length(html) AS n_html,
             trim(regexp_replace(regexp_replace(html, '<[^>]*>', ' ', 'g'),
                                 '\\s+', ' ', 'g')) AS clean
      FROM page)
    SELECT doc_id, n_html, length(clean) AS n_clean,
           round(length(clean) * 1.0 / n_html, 6) AS text_density,
           CASE WHEN length(clean) * 1.0 / n_html >= 0.5
                THEN 1 ELSE 0 END AS keep
    FROM stripped
    """,
)
def html_boilerplate_strip(spark, sf_dir):
    """Boilerplate removal for web-crawl curation: strip markup,
    collapse whitespace, and score text density (clean/raw chars) —
    the jusText/trafilatura-style keep signal (density >= 0.5).
    Pages are synthesized by wrapping each document in a fixed
    nav/footer chrome so the expected density is data-dependent.

    Pure map-side regexp column math — scales with the scan, no
    shuffle, no Python."""
    d = spread(t(spark, sf_dir, "documents"))
    html = F.concat(
        F.lit("<html><head><title>"), F.col("source"),
        F.lit("</title></head><body><nav>home | about | contact</nav><p>"),
        F.col("text"), F.lit("</p><footer>&copy; corp</footer></body></html>"))
    clean = F.trim(F.regexp_replace(
        F.regexp_replace(html, "<[^>]*>", " "), r"\s+", " "))
    dens = F.length(clean) * 1.0 / F.length(html)
    return d.select(
        "doc_id", F.length(html).alias("n_html"),
        F.length(clean).alias("n_clean"),
        F.round(dens, 6).alias("text_density"),
        F.when(dens >= 0.5, 1).otherwise(0).alias("keep"))


@query(
    "ccnet_perplexity_buckets",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
    uni AS (
      SELECT doc_id, lang, unnest(ws) AS tok FROM toks),
    ufreq AS (SELECT tok, count(*) AS c1 FROM uni GROUP BY tok),
    total AS (SELECT sum(c1) AS n FROM ufreq),
    bgs AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(2, len(ws) + 1),
                    i -> ws[i-1] || chr(31) || ws[i])) AS bg
      FROM toks),
    bfreq AS (SELECT bg, count(*) AS c2 FROM bgs GROUP BY bg),
    doc_lp AS (
      SELECT b.doc_id, b.lang,
             -sum(ln(0.75 * f2.c2 / f_ctx.c1
                     + 0.25 * f_cur.c1 / (SELECT n FROM total)))
               / count(*) AS ppx
      FROM bgs b
      JOIN bfreq f2 ON f2.bg = b.bg
      JOIN ufreq f_ctx ON f_ctx.tok = split_part(b.bg, chr(31), 1)
      JOIN ufreq f_cur ON f_cur.tok = split_part(b.bg, chr(31), 2)
      GROUP BY b.doc_id, b.lang),
    thr AS (
      SELECT quantile_cont(ppx, 0.25) AS q1,
             quantile_cont(ppx, 0.75) AS q3
      FROM doc_lp)
    SELECT lang,
           CASE WHEN ppx <= q1 THEN 'head'
                WHEN ppx <= q3 THEN 'middle'
                ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           round(avg(ppx), 6) AS avg_ppx
    FROM doc_lp CROSS JOIN thr
    GROUP BY lang, bucket
    """,
)
def ccnet_perplexity_buckets(spark, sf_dir):
    """CCNet-style perplexity bucketing: score every document with
    the interpolated bigram LM (mean negative log-prob per bigram as
    the perplexity proxy), cut the corpus at the exact 25th/75th
    percentiles, and report head/middle/tail counts per language —
    the standard head-only / head+middle selection gate for web
    crawl curation.

    100 TB plan: identical to ``text_bigram_logprob`` (two count
    passes + one broadcast-scored pass); the quantile thresholds are
    a ONE-ROW aggregate broadcast back over the per-doc scores, so
    bucketing adds zero extra shuffles of the corpus."""
    sep = "\x1f"
    d = spread(t(spark, sf_dir, "documents"))
    toks = d.select("doc_id", "lang", F.split("text", " ").alias("ws"))
    uni = toks.select(F.explode("ws").alias("tok"))
    # ufreq feeds two broadcasts and the grand total; doc_lp feeds the
    # quantile aggregate AND the final bucketing join — persist both so
    # the unigram pass runs once and the per-doc scoring pass runs once
    # (branches of one plan are not CSE'd)
    ufreq = uni.groupBy("tok").agg(F.count(F.lit(1)).alias("c1")).persist()
    total = ufreq.agg(F.sum("c1").alias("n"))
    bg_list = F.transform(
        F.sequence(F.lit(2), F.size("ws")),
        lambda i: F.concat(F.element_at("ws", i - 1), F.lit(sep),
                           F.element_at("ws", i)))
    bgs = (toks.where(F.size("ws") >= 2)
           .select("doc_id", "lang", F.explode(bg_list).alias("bg")))
    bfreq = bgs.groupBy("bg").agg(F.count(F.lit(1)).alias("c2"))
    ctx = F.split_part(F.col("bg"), F.lit(sep), F.lit(1))
    cur = F.split_part(F.col("bg"), F.lit(sep), F.lit(2))
    doc_lp = (
        bgs.join(bfreq, "bg")
        .join(F.broadcast(ufreq.select(F.col("tok").alias("__ctx"),
                                       F.col("c1").alias("c_ctx"))),
              ctx == F.col("__ctx"))
        .join(F.broadcast(ufreq.select(F.col("tok").alias("__cur"),
                                       F.col("c1").alias("c_cur"))),
              cur == F.col("__cur"))
        .join(F.broadcast(total))
        .groupBy("doc_id", "lang")
        .agg((-F.sum(F.log(0.75 * F.col("c2") / F.col("c_ctx")
                           + 0.25 * F.col("c_cur") / F.col("n")))
              / F.count(F.lit(1))).alias("ppx")).persist())
    thr = doc_lp.agg(
        F.expr("percentile(ppx, 0.25)").alias("q1"),
        F.expr("percentile(ppx, 0.75)").alias("q3"))
    bucket = (F.when(F.col("ppx") <= F.col("q1"), "head")
              .when(F.col("ppx") <= F.col("q3"), "middle")
              .otherwise("tail"))
    return (doc_lp.join(F.broadcast(thr))
            .groupBy("lang", bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.round(F.avg("ppx"), 6).alias("avg_ppx")))


@query(
    "zipf_law_fit",
    oracle="""
    WITH uni AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents),
    freq AS (SELECT w, count(*) AS c FROM uni WHERE w <> '' GROUP BY w),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w) AS rnk
      FROM freq QUALIFY rnk <= 200)
    SELECT (SELECT count(*) FROM freq) AS n_vocab,
           round(regr_slope(ln(c), ln(rnk)), 6) AS zipf_slope,
           round(regr_intercept(ln(c), ln(rnk)), 6) AS zipf_intercept,
           round(regr_r2(ln(c), ln(rnk)), 6) AS r2
    FROM ranked
    """,
)
def zipf_law_fit(spark, sf_dir):
    """Zipf's-law fit over the corpus vocabulary: log-log OLS of
    frequency on rank for the top-200 words (slope ~ -1 on natural
    text) — the standard sanity check that a scraped corpus has
    natural token statistics rather than boilerplate spam.

    100 TB plan: one explode + count shuffle builds the frequency
    table; the rank window runs on the vocabulary (already tiny
    after the top-k cut), and the regression is Spark's built-in
    ``regr_*`` aggregate family — a one-row result with no second
    corpus pass."""
    from pyspark.sql import Window as W

    d = spread(t(spark, sf_dir, "documents"))
    uni = d.select(F.explode(F.split("text", " ")).alias("w"))
    # persist: the vocabulary count (a separate driver action) and the
    # rank window otherwise each re-run the corpus explode+aggregate
    freq = (uni.where(F.col("w") != "")
            .groupBy("w").agg(F.count(F.lit(1)).alias("c")).persist())
    n_vocab = freq.count()
    ranked = (freq.select(
        "c", F.row_number().over(W.orderBy(F.desc("c"), F.asc("w")))
        .alias("rnk")).where(F.col("rnk") <= 200))
    lc, lr = F.log("c"), F.log("rnk")
    return ranked.agg(
        F.lit(n_vocab).cast("bigint").alias("n_vocab"),
        F.round(F.regr_slope(lc, lr), 6).alias("zipf_slope"),
        F.round(F.regr_intercept(lc, lr), 6).alias("zipf_intercept"),
        F.round(F.regr_r2(lc, lr), 6).alias("r2"))


@query(
    "tokenizer_fertility_audit",
    oracle=f"""
    WITH base AS (
      SELECT lang,
             {_SQL_NWORDS.format(e='text')} AS n_ws,
             len(regexp_extract_all(text,
                 '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe,
             strlen(text) AS n_bytes
      FROM documents)
    SELECT lang, count(*) AS n_docs,
           CAST(sum(n_ws) AS BIGINT) AS ws_tokens,
           CAST(sum(n_bpe) AS BIGINT) AS bpe_tokens,
           round(sum(n_bpe) * 1.0 / sum(n_ws), 6) AS fertility,
           round(sum(n_bytes) * 1.0 / sum(n_bpe), 6) AS bytes_per_token
    FROM base GROUP BY lang ORDER BY lang
    """,
)
def tokenizer_fertility_audit(spark, sf_dir):
    """Tokenizer fertility per language: subword(BPE-ish regex)
    tokens per whitespace word and bytes per subword token — the
    audit that decides whether a tokenizer under-serves a language
    (high fertility = more compute per content) when mixing a
    multilingual corpus.

    Pure map-side column math + one tiny per-lang aggregate; scales
    with the scan."""
    d = spread(t(spark, sf_dir, "documents"))
    ws = X.token_count(F.col("text"))
    bpe = X.bpe_token_count(F.col("text"))
    base = d.select("lang", ws.alias("n_ws"), bpe.alias("n_bpe"),
                    F.octet_length("text").alias("n_bytes"))
    return (base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_ws").cast("bigint").alias("ws_tokens"),
        F.sum("n_bpe").cast("bigint").alias("bpe_tokens"),
        F.round(F.sum("n_bpe") * 1.0 / F.sum("n_ws"), 6)
        .alias("fertility"),
        F.round(F.sum("n_bytes") * 1.0 / F.sum("n_bpe"), 6)
        .alias("bytes_per_token"))
        .orderBy("lang"))


@query(
    "tfidf_cosine_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_WORDS.format(e='lower(text)')}) AS w
      FROM documents
    ), tf AS (
      SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w
    ), df AS (
      SELECT w, count(*) AS df FROM tf GROUP BY w
    ), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM tf),
    wgt AS (
      SELECT tf.doc_id, tf.w, tf.tf * ln(n_docs * 1.0 / df.df) AS wt
      FROM tf JOIN df ON df.w = tf.w CROSS JOIN n
      WHERE df.df <= 50 AND df.df > 1
    ), nrm AS (
      SELECT doc_id, sqrt(sum(wt * wt)) AS nm FROM wgt GROUP BY doc_id
    ), dots AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             sum(a.wt * b.wt) AS dot
      FROM wgt a JOIN wgt b ON a.w = b.w AND a.doc_id < b.doc_id
      GROUP BY doc_a, doc_b
    ), scored AS (
      SELECT doc_a, doc_b,
             round(dot / (na.nm * nb.nm), 6) AS cosine
      FROM dots JOIN nrm na ON na.doc_id = doc_a
                JOIN nrm nb ON nb.doc_id = doc_b)
    SELECT doc_a, doc_b, cosine,
           row_number() OVER (ORDER BY cosine DESC, doc_a, doc_b) AS rk
    FROM scored
    QUALIFY rk <= 20
    """,
)
def tfidf_cosine_pairs(spark, sf_dir):
    """Sparse TF-IDF cosine similarity join through an inverted
    index: per-term postings (df-pruned: drop hapax terms and terms
    in > 50 docs — the posting-list cap that kills the quadratic
    head of the index) join on the term, partial dot-products
    aggregate per pair, and norms divide at the end — the sparse
    complement of the dense-embedding similarity family, and the
    textbook document-similarity plan at scale (term join, never
    doc x doc).

    Cosine is defined in the pruned term space on BOTH engines, so
    the rounded scores agree exactly; top-k is TakeOrdered."""
    from pyspark.sql import Window as W

    d = spread(t(spark, sf_dir, "documents"))
    toks = (d.where(F.trim(F.col("text")) != "")
            .select("doc_id",
                    F.explode(X.words(F.lower(F.col("text")))).alias("w")))
    # tf feeds the df table, the n_docs driver action, and the weight
    # table (used by norms + both join sides): persist so the corpus
    # tokenize+aggregate runs once instead of once per consumer
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf")) \
        .persist()
    df = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = tf.select("doc_id").distinct().count()
    wgt = (tf.join(F.broadcast(df.where((F.col("df") <= 50)
                                        & (F.col("df") > 1))), "w")
           .select("doc_id", "w",
                   (F.col("tf") * F.log(n_docs / F.col("df")))
                   .alias("wt")))
    nrm = wgt.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nm"))
    a = wgt.select(F.col("doc_id").alias("doc_a"), "w",
                   F.col("wt").alias("wa"))
    b = wgt.select(F.col("doc_id").alias("doc_b"), "w",
                   F.col("wt").alias("wb"))
    dots = (a.join(b, "w").where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot")))
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nm").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nm").alias("nb"))
    scored = (dots.join(F.broadcast(na), "doc_a")
              .join(F.broadcast(nb), "doc_b")
              .select("doc_a", "doc_b",
                      F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6)
                      .alias("cosine")))
    return (scored.orderBy(F.desc("cosine"), "doc_a", "doc_b").limit(20)
            .select("doc_a", "doc_b", "cosine",
                    F.row_number().over(
                        W.orderBy(F.desc("cosine"), "doc_a", "doc_b"))
                    .cast("bigint").alias("rk")))


@query(
    "pmi_collocations",
    oracle=f"""
    WITH inc AS (
      SELECT DISTINCT doc_id, w FROM (
        SELECT doc_id,
               unnest({_SQL_WORDS.format(e='lower(text)')}) AS w
        FROM documents)
      WHERE length(w) >= 4
    ), df AS (
      SELECT w, count(*) AS df FROM inc GROUP BY w
      HAVING count(*) >= 50
    ), finc AS (
      SELECT i.doc_id, i.w, d.df FROM inc i JOIN df d ON d.w = i.w
    ), n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
    co AS (
      SELECT a.w AS w1, b.w AS w2, a.df AS df1, b.df AS df2,
             count(*) AS c12
      FROM finc a JOIN finc b
        ON a.doc_id = b.doc_id AND a.w < b.w
      GROUP BY w1, w2, df1, df2
      HAVING count(*) >= 20
    )
    SELECT w1, w2, c12,
           round(ln(c12 * 1.0 * n_docs / (df1 * df2)), 6) AS pmi,
           row_number() OVER (
             ORDER BY round(ln(c12 * 1.0 * n_docs / (df1 * df2)), 6)
                      DESC, w1, w2) AS rk
    FROM co CROSS JOIN n
    QUALIFY rk <= 20
    """,
)
def pmi_collocations(spark, sf_dir):
    """Collocation mining by document-level pointwise mutual
    information: PMI(x,y) = ln(P(x,y)/(P(x)P(y))) over doc-incidence
    counts for terms with df >= 50 and length >= 4 (the synthetic
    vocabulary is small and saturated, so the support floor replaces
    the usual mid-frequency band), co-occurrence count >= 20; top-20
    collocations.

    100 TB plan: the co-occurrence self-join is per-document over
    the df-BANDED vocabulary (the band bounds per-doc fan-out), the
    df table is a broadcast, and ranking on the ROUNDED score keeps
    the frontier identical across engines."""
    from pyspark.sql import Window as W

    d = spread(t(spark, sf_dir, "documents"))
    # inc feeds the df table and BOTH sides of the co-occurrence
    # self-join: persist so the corpus explode+distinct runs once
    inc = (d.where(F.trim(F.col("text")) != "")
           .select("doc_id",
                   F.explode(X.words(F.lower(F.col("text")))).alias("w"))
           .where(F.length("w") >= 4)
           .distinct().persist())
    df = (inc.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
          .where(F.col("df") >= 50))
    finc = inc.join(F.broadcast(df), "w")
    n_docs = t(spark, sf_dir, "documents").count()
    a = finc.select("doc_id", F.col("w").alias("w1"),
                    F.col("df").alias("df1"))
    b = finc.select("doc_id", F.col("w").alias("w2"),
                    F.col("df").alias("df2"))
    co = (a.join(b, "doc_id").where(F.col("w1") < F.col("w2"))
          .groupBy("w1", "w2", "df1", "df2")
          .agg(F.count(F.lit(1)).alias("c12"))
          .where(F.col("c12") >= 20))
    pmi = F.round(F.log(F.col("c12") * float(n_docs)
                        / (F.col("df1") * F.col("df2"))), 6)
    return (co.select("w1", "w2", "c12", pmi.alias("pmi"))
            .orderBy(F.desc("pmi"), "w1", "w2").limit(20)
            .select("w1", "w2", "c12", "pmi",
                    F.row_number().over(
                        W.orderBy(F.desc("pmi"), "w1", "w2"))
                    .cast("bigint").alias("rk")))


@query(
    "text_kneser_ney_logprob",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
    bgs AS (
      SELECT doc_id, lang,
             unnest(list_transform(range(2, len(ws) + 1),
                    i -> ws[i-1] || chr(31) || ws[i])) AS bg
      FROM toks),
    bfreq AS (SELECT bg, count(*) AS c2 FROM bgs GROUP BY bg),
    ctxagg AS (
      SELECT split_part(bg, chr(31), 1) AS ctx,
             CAST(sum(c2) AS BIGINT) AS c_ctx,
             count(*) AS n_follow
      FROM bfreq GROUP BY ctx),
    contagg AS (
      SELECT split_part(bg, chr(31), 2) AS cur, count(*) AS n_prec
      FROM bfreq GROUP BY cur),
    types AS (SELECT count(*) AS n_types FROM bfreq),
    doc_lp AS (
      SELECT b.doc_id, b.lang,
             sum(ln((f2.c2 - 0.75) / cx.c_ctx
                    + 0.75 * cx.n_follow / cx.c_ctx
                      * cn.n_prec / (SELECT n_types FROM types)))
               AS logprob,
             count(*) AS n_bg
      FROM bgs b
      JOIN bfreq f2 ON f2.bg = b.bg
      JOIN ctxagg cx ON cx.ctx = split_part(b.bg, chr(31), 1)
      JOIN contagg cn ON cn.cur = split_part(b.bg, chr(31), 2)
      GROUP BY b.doc_id, b.lang)
    SELECT lang, count(*) AS n_docs,
           round(avg(logprob / n_bg), 6) AS avg_kn_lp,
           round(min(logprob / n_bg), 6) AS min_kn_lp,
           round(max(logprob / n_bg), 6) AS max_kn_lp
    FROM doc_lp GROUP BY lang ORDER BY lang
    """,
)
def text_kneser_ney_logprob(spark, sf_dir):
    """Interpolated Kneser-Ney bigram scoring (D=0.75) — the standard
    smoothing for n-gram LM quality filters, one notch above the
    plain interpolated model in ``text_bigram_logprob``.  The KN twist
    is the CONTINUATION distribution: p_cont(w) = N1+(.w)/N1+(..)
    (distinct-context counts), so low-frequency-but-promiscuous words
    score higher than burstily repeated ones:

        p(w|ctx) = (c(ctx,w)-D)/c(ctx) + D*N1+(ctx.)/c(ctx) * p_cont(w)

    (observed bigrams only, so the discounted term stays positive).

    100 TB plan: every model table (bigram counts, per-context
    totals + fan-out, per-word continuation counts) derives from ONE
    bigram aggregate — three shuffles over bigram-vocab-sized data,
    none over the corpus; the scoring pass joins the exploded corpus
    against those tables (bigram-vocab side too big to broadcast, so
    the AQE sort-merge/shuffle-hash choice is the right cluster
    plan), and the 1-row type count broadcasts."""
    sep = "\x1f"
    d = spread(t(spark, sf_dir, "documents"))
    toks = d.select("doc_id", "lang", F.split("text", " ").alias("ws"))
    bg_list = F.transform(
        F.sequence(F.lit(2), F.size("ws")),
        lambda i: F.concat(F.element_at("ws", i - 1), F.lit(sep),
                           F.element_at("ws", i)))
    bgs = (toks.where(F.size("ws") >= 2)
           .select("doc_id", "lang", F.explode(bg_list).alias("bg")))
    # ONE bigram aggregate feeds four model tables (bfreq itself,
    # ctxagg, contagg, types) plus the scoring join — persist it so
    # the corpus explode+aggregate runs once, exactly the "every model
    # table derives from ONE bigram aggregate" plan the docstring
    # promises (branches are not CSE'd without it)
    bfreq = bgs.groupBy("bg").agg(F.count(F.lit(1)).alias("c2")).persist()
    ctx_of = F.split_part(F.col("bg"), F.lit(sep), F.lit(1))
    cur_of = F.split_part(F.col("bg"), F.lit(sep), F.lit(2))
    ctxagg = (bfreq.groupBy(ctx_of.alias("ctx"))
              .agg(F.sum("c2").alias("c_ctx"),
                   F.count(F.lit(1)).alias("n_follow")))
    contagg = (bfreq.groupBy(cur_of.alias("cur"))
               .agg(F.count(F.lit(1)).alias("n_prec")))
    types = bfreq.agg(F.count(F.lit(1)).alias("n_types"))
    p_kn = ((F.col("c2") - 0.75) / F.col("c_ctx")
            + 0.75 * F.col("n_follow") / F.col("c_ctx")
            * F.col("n_prec") / F.col("n_types"))
    doc_lp = (
        bgs.join(bfreq, "bg")
        .join(ctxagg, ctx_of == F.col("ctx"))
        .join(contagg, cur_of == F.col("cur"))
        .join(F.broadcast(types))
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.log(p_kn)).alias("logprob"),
             F.count(F.lit(1)).alias("n_bg")))
    per_bg = F.col("logprob") / F.col("n_bg")
    return (
        doc_lp.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(F.avg(per_bg), 6).alias("avg_kn_lp"),
             F.round(F.min(per_bg), 6).alias("min_kn_lp"),
             F.round(F.max(per_bg), 6).alias("max_kn_lp"))
        .orderBy("lang")
    )


@query(
    "calibration_reliability_audit",
    oracle="""
    WITH scored AS (
      SELECT CASE WHEN length(text) >= 400 THEN 1 ELSE 0 END AS y,
             1.0 / (1.0 + exp(-((len(string_split_regex(trim(text), '\\s+'))
                                 - 70.0) / 25.0))) AS p
      FROM documents WHERE trim(text) <> '')
    SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS bin_id,
           count(*) AS n,
           round(avg(p), 6) AS avg_pred,
           round(avg(y), 6) AS frac_pos,
           round(avg((p - y) * (p - y)), 6) AS bin_brier,
           round(abs(avg(p) - avg(y)), 6) AS bin_gap
    FROM scored GROUP BY bin_id ORDER BY bin_id
    """,
)
def calibration_reliability_audit(spark, sf_dir):
    """Calibration / reliability-diagram audit — the eval-side staple
    for any learned filter (quality classifiers, toxicity gates,
    dedup scorers): bucket a probability into 10 equal-width bins and
    compare predicted confidence against empirical frequency, with
    the per-bin Brier term and |avg_pred - frac_pos| gap (the ECE
    summand).  The "model" is a deterministic logistic of token
    count predicting the long-document label (length >= 400 chars),
    so both engines score identical (p, y) pairs.

    100 TB plan: one map pass computes (p, y) per row, one 10-group
    aggregate folds the corpus — map-side partial aggregation makes
    this scan-bound at any scale."""
    d = spread(t(spark, sf_dir, "documents"))
    n_tok = F.size(F.split(F.trim("text"), r"\s+"))
    scored = (d.where(F.trim(F.col("text")) != "")
              .select(
                  F.when(F.length("text") >= 400, 1).otherwise(0)
                  .alias("y"),
                  (F.lit(1.0) /
                   (F.lit(1.0) + F.exp(-((n_tok - F.lit(70.0))
                                         / F.lit(25.0))))).alias("p")))
    bin_id = F.least(F.floor(F.col("p") * 10), F.lit(9)).cast("bigint")
    return (
        scored.groupBy(bin_id.alias("bin_id"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.round(F.avg("p"), 6).alias("avg_pred"),
             F.round(F.avg("y"), 6).alias("frac_pos"),
             F.round(F.avg((F.col("p") - F.col("y"))
                           * (F.col("p") - F.col("y"))), 6)
             .alias("bin_brier"),
             F.round(F.abs(F.avg("p") - F.avg("y")), 6).alias("bin_gap"))
        .orderBy("bin_id")
    )


@query(
    "eval_rouge_ngram",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS ws
      FROM documents WHERE trim(text) <> ''),
    pairs AS (
      SELECT c.doc_id AS cand_id, r.doc_id AS ref_id, c.lang
      FROM toks c JOIN toks r
        ON r.doc_id = c.doc_id + 1 AND r.lang = c.lang),
    grams AS (
      SELECT doc_id, g, n, count(*) AS c FROM (
        SELECT doc_id, unnest(ws) AS g, 1 AS n FROM toks
        UNION ALL
        SELECT doc_id,
               unnest(list_transform(range(2, len(ws) + 1),
                      i -> ws[i-1] || chr(31) || ws[i])) AS g, 2 AS n
        FROM toks)
      GROUP BY doc_id, g, n),
    overlap AS (
      SELECT p.cand_id, p.lang, gc.n,
             CAST(sum(least(gc.c, gr.c)) AS BIGINT) AS hit,
             (SELECT CAST(sum(c) AS BIGINT) FROM grams
              WHERE doc_id = p.cand_id AND n = gc.n) AS cand_total,
             (SELECT CAST(sum(c) AS BIGINT) FROM grams
              WHERE doc_id = p.ref_id AND n = gc.n) AS ref_total
      FROM pairs p
      JOIN grams gc ON gc.doc_id = p.cand_id
      JOIN grams gr ON gr.doc_id = p.ref_id
                   AND gr.g = gc.g AND gr.n = gc.n
      GROUP BY p.cand_id, p.ref_id, p.lang, gc.n),
    f1s AS (
      SELECT cand_id, lang, n,
             2.0 * (hit * 1.0 / cand_total) * (hit * 1.0 / ref_total)
               / ((hit * 1.0 / cand_total) + (hit * 1.0 / ref_total))
               AS f1
      FROM overlap WHERE hit > 0)
    SELECT lang, n AS gram_n, count(*) AS n_pairs,
           round(avg(f1), 6) AS avg_f1,
           round(max(f1), 6) AS max_f1
    FROM f1s GROUP BY lang, gram_n ORDER BY lang, gram_n
    """,
)
def eval_rouge_ngram(spark, sf_dir):
    """ROUGE-1/ROUGE-2 F1 scoring over candidate/reference pairs —
    the n-gram-overlap eval used for summarization/generation QA on
    training pipelines.  Clipped bag overlap: hit = sum over shared
    grams of min(count_cand, count_ref); F1 from bag precision
    (hit/|cand|) and recall (hit/|ref|).  Pairing is deterministic
    (each doc scored against doc_id+1 in the same language) so both
    engines grade identical pairs; pairs with zero overlap drop (F1
    undefined at 0/0 — the WHERE hit > 0 contract is explicit on
    both sides).

    100 TB plan: per-doc n-gram bags are one explode + aggregate
    (corpus-linear); the overlap join is per (pair, gram) — an
    equi-join on doc-adjacent pairs, never all-pairs; per-doc totals
    re-join from the same bag table rather than rescanning text."""
    sep = "\x1f"
    d = spread(t(spark, sf_dir, "documents"))
    toks = (d.where(F.trim(F.col("text")) != "")
            .select("doc_id", "lang", F.split("text", " ").alias("ws")))
    bg_list = F.transform(
        F.sequence(F.lit(2), F.size("ws")),
        lambda i: F.concat(F.element_at("ws", i - 1), F.lit(sep),
                           F.element_at("ws", i)))
    # the per-doc gram bag is the model table of this query and feeds
    # THREE consumers (cand side, ref side, per-doc totals); without a
    # persist each reference re-tokenizes and re-aggregates the corpus
    # (no cross-branch CSE in one plan) — 3 corpus passes instead of 1
    grams = (
        toks.select("doc_id", F.explode("ws").alias("g"),
                    F.lit(1).alias("n"))
        .unionAll(
            toks.where(F.size("ws") >= 2)
            .select("doc_id", F.explode(bg_list).alias("g"),
                    F.lit(2).alias("n")))
        .groupBy("doc_id", "g", "n")
        .agg(F.count(F.lit(1)).alias("c")).persist())
    totals = grams.groupBy("doc_id", "n").agg(F.sum("c").alias("total"))
    pairs = (toks.alias("c").join(
        toks.alias("r"),
        (F.col("r.doc_id") == F.col("c.doc_id") + 1)
        & (F.col("r.lang") == F.col("c.lang")))
        .select(F.col("c.doc_id").alias("cand_id"),
                F.col("r.doc_id").alias("ref_id"), F.col("c.lang")))
    gc = grams.select(F.col("doc_id").alias("cand_id"),
                      "g", "n", F.col("c").alias("cc"))
    gr = grams.select(F.col("doc_id").alias("ref_id"),
                      "g", "n", F.col("c").alias("cr"))
    overlap = (pairs.join(gc, "cand_id")
               .join(gr, ["ref_id", "g", "n"])
               .groupBy("cand_id", "ref_id", "lang", "n")
               .agg(F.sum(F.least("cc", "cr")).alias("hit")))
    withtot = (overlap
               .join(totals.select(F.col("doc_id").alias("cand_id"),
                                   "n", F.col("total").alias("cand_total")),
                     ["cand_id", "n"])
               .join(totals.select(F.col("doc_id").alias("ref_id"),
                                   "n", F.col("total").alias("ref_total")),
                     ["ref_id", "n"])
               .where(F.col("hit") > 0))
    prec = F.col("hit") / F.col("cand_total")
    rec = F.col("hit") / F.col("ref_total")
    f1 = 2.0 * prec * rec / (prec + rec)
    return (
        withtot.select("lang", F.col("n").alias("gram_n"),
                       f1.alias("f1"))
        .groupBy("lang", "gram_n")
        .agg(F.count(F.lit(1)).alias("n_pairs"),
             F.round(F.avg("f1"), 6).alias("avg_f1"),
             F.round(F.max("f1"), 6).alias("max_f1"))
        .orderBy("lang", "gram_n")
    )
