"""Sampling / split operators for training-data pipelines.

A training pipeline needs reproducible, cluster-scale sampling:
random splits must be deterministic (same row → same split on every
run, every executor, every engine) and stratified sampling must hold
per-stratum rates exactly. Both are expressed as pure column math on
a portable 60-bit md5 hash — no rand(), no sampleBy() (whose
Bernoulli draw is seed- and partitioning-dependent and therefore not
oracle-checkable), no shuffle beyond the final aggregation.

At 100 TB: the hash-mod predicate is map-side only and pushes the
split decision into the scan projection; no state, no skew (md5 is
uniform), and adding a split column costs one expression per row.

Hash parity (see functions/dedup.py::hash60): Spark
``conv(substr(md5(x),1,15),16,10)::bigint`` == DuckDB
``('0x' || substr(md5(x),1,15))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from sidecar_spark.functions.dedup import hash60
from sidecar_spark.queries.registry import query, t

# DuckDB twin of hash60 over an expression
_H60 = "('0x' || substr(md5({e}), 1, 15))::BIGINT"


def split_bucket(col, n_buckets: int = 100):
    """Deterministic sampling bucket in [0, n_buckets): 60-bit md5 of
    the key's string form, mod n_buckets. Salting the key string (e.g.
    ``concat(id, ':v2')``) re-draws the assignment when a new split is
    needed."""
    return hash60(col.cast("string")) % F.lit(n_buckets)


@query(
    "train_val_split",
    oracle=f"""
    SELECT CASE WHEN {_H60.format(e='CAST(doc_id AS VARCHAR)')} % 100 < 80
                THEN 'train'
                WHEN {_H60.format(e='CAST(doc_id AS VARCHAR)')} % 100 < 90
                THEN 'val' ELSE 'test' END AS split,
           lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY split, lang
    """,
)
def train_val_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split of the corpus by
    hashed doc_id — the reproducible-split primitive every training
    pipeline needs (same row lands in the same split on any engine,
    any run, any partitioning). Summarized per split × language."""
    d = t(spark, sf_dir, "documents")
    b = split_bucket(F.col("doc_id"))
    split = (F.when(b < 80, "train").when(b < 90, "val").otherwise("test"))
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").alias("total_chars"))
    )


@query(
    "stratified_sample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_H60.format(e="CAST(doc_id AS VARCHAR) || ':strat'")} % 1000 < 100
    """,
)
def stratified_sample(spark, sf_dir):
    """10% deterministic sample: the ':strat' salt decorrelates the
    draw from the train/val split above (independent hash streams from
    one md5 family). Because md5 is uniform WITHIN each stratum too,
    the per-language rate self-stratifies; the WHERE is map-side and
    combines with predicate pushdown (no sampleBy() driver state, no
    per-stratum shuffle)."""
    d = t(spark, sf_dir, "documents")
    keep = (hash60(F.concat(F.col("doc_id").cast("string"), F.lit(":strat")))
            % 1000 < 100)
    return d.where(keep).select("doc_id", "lang", "source")


@query(
    "sample_rate_check",
    oracle=f"""
    SELECT lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN {_H60.format(e="CAST(doc_id AS VARCHAR) || ':strat'")} % 1000 < 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
    FROM documents
    GROUP BY lang
    """,
)
def sample_rate_check(spark, sf_dir):
    """Audit query for the sampler: per-stratum population vs sampled
    counts in one pass (the conditional-count shape), showing the
    realized rate tracks the nominal 10% in every language."""
    d = t(spark, sf_dir, "documents")
    keep = (hash60(F.concat(F.col("doc_id").cast("string"), F.lit(":strat")))
            % 1000 < 100)
    return (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_total"),
             F.sum(F.when(keep, 1).otherwise(0)).alias("n_sampled"))
    )


@query(
    "weighted_sample_topk",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang, n_chars,
             round(pow(({_H60.format(e="CAST(doc_id AS VARCHAR) || ':wsamp'")}
                        % 1000000) / 1000000.0,
                       1.0 / n_chars), 6) AS skey
      FROM documents WHERE n_chars > 0)
    SELECT doc_id, lang, n_chars, skey FROM (
      SELECT doc_id, lang, n_chars, skey,
             row_number() OVER (ORDER BY skey DESC, doc_id) AS rn
      FROM keyed)
    WHERE rn <= 100
    """,
)
def weighted_sample_topk(spark, sf_dir):
    """Weighted sampling without replacement at cluster scale — the
    Efraimidis–Spirakis A-ES scheme: each row draws u ~ U(0,1) from
    the portable hash (deterministic, engine-independent) and ranks
    by u^(1/weight); the global top-k IS a weighted sample. Longer
    documents are proportionally more likely to be drawn — the
    standard corpus-curation sampler when you want char-budget-
    proportional representation.

    Scale shape: the sort key is map-side column math; top-100 is
    TakeOrdered (per-partition heaps + driver merge), never a global
    sort. Rounding the key to 6 dp before ranking (with doc_id
    tie-break) makes the order libm-difference-proof across
    engines."""
    d = t(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (hash60(F.concat(F.col("doc_id").cast("string"), F.lit(":wsamp")))
         % 1000000) / F.lit(1000000.0)
    skey = F.round(F.pow(u, 1.0 / F.col("n_chars")), 6)
    keyed = d.select("doc_id", "lang", "n_chars", skey.alias("skey"))
    return (keyed.orderBy(F.desc("skey"), F.asc("doc_id")).limit(100))


@query(
    "training_shard_export",
    oracle=f"""
    WITH sharded AS (
      SELECT doc_id, n_chars,
             {_H60.format(e="CAST(doc_id AS VARCHAR) || ':shard'")} % 8
                 AS shard
      FROM documents
    )
    SELECT shard, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc
    FROM sharded GROUP BY shard ORDER BY shard
    """,
)
def training_shard_export(spark, sf_dir):
    """Deterministic training-shard export: every document lands in a
    stable shard (salted 60-bit md5 % 8), the dataset is written
    partitioned by shard with bounded file sizes
    (``maxRecordsPerFile``), and the audit re-reads the EXPORTED files
    — so the oracle checks the full write→read round trip, not just
    the assignment. At 100 TB: ``repartition(shard)`` gives one
    shuffle with uniform md5 fan-out (no skew), writers stream each
    shard without buffering, and maxRecordsPerFile bounds memory and
    downstream task granularity; the same job shape exports any
    shard count by changing two literals."""
    import shutil
    import tempfile

    d = t(spark, sf_dir, "documents")
    shard = (hash60(F.concat(F.col("doc_id").cast("string"),
                             F.lit(":shard"))) % 8).alias("shard")
    out = tempfile.mkdtemp(prefix="sidecar-shards-")
    try:
        (d.select("doc_id", "n_chars", shard)
         .repartition("shard")
         .write.mode("overwrite")
         .option("maxRecordsPerFile", 50000)
         .partitionBy("shard")
         .parquet(out))
        rows = (
            spark.read.parquet(out)
            .groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_chars").alias("total_chars"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc"))
            .orderBy("shard")
            .collect())
        return spark.createDataFrame(
            rows, "shard bigint, n_docs bigint, total_chars bigint, "
                  "min_doc bigint, max_doc bigint")
    finally:
        shutil.rmtree(out, ignore_errors=True)


# ---------------------------------------------------------------------------
# temperature-scaled mixture weights (multilingual/domain alpha-sampling)
# ---------------------------------------------------------------------------

@query(
    "temperature_mix_weights",
    oracle="""
    WITH counts AS (
      SELECT lang, source, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY lang, source
    ), probs AS (
      SELECT *, n_chars * 1.0 / sum(n_chars) OVER () AS p
      FROM counts
    ), scaled AS (
      SELECT *, pow(p, 0.3) AS p_alpha FROM probs
    )
    SELECT lang, source, n_docs, n_chars,
           round(p, 6) AS p_natural,
           round(p_alpha / sum(p_alpha) OVER (), 6) AS p_sample,
           CAST(round(p_alpha / sum(p_alpha) OVER () * 100000, 0) AS BIGINT)
               AS budget_docs
    FROM scaled
    ORDER BY lang, source
    """,
)
def temperature_mix_weights(spark, sf_dir):
    """Temperature-scaled mixture sampling (the multilingual alpha-
    sampling rule, p_i^alpha / sum p^alpha with alpha=0.3): flattens the
    natural char-count distribution across (lang, source) cells so
    low-resource cells are upsampled in the training mix, then
    allocates a 100k-document budget per cell.  Two tiny window sums
    over the per-cell aggregate — the fact scan is the only
    data-scale stage; the mixture math runs on a cells-sized frame
    that would broadcast at any corpus size."""
    d = t(spark, sf_dir, "documents")
    counts = (d.groupBy("lang", "source")
              .agg(F.count(F.lit(1)).alias("n_docs"),
                   F.sum("n_chars").cast("bigint").alias("n_chars")))
    w = Window.partitionBy()
    probs = counts.withColumn(
        "p", F.col("n_chars") / F.sum("n_chars").over(w))
    scaled = probs.withColumn("p_alpha", F.pow("p", F.lit(0.3)))
    z = F.sum("p_alpha").over(w)
    return (
        scaled.select(
            "lang", "source", "n_docs", "n_chars",
            F.round("p", 6).alias("p_natural"),
            F.round(F.col("p_alpha") / z, 6).alias("p_sample"),
            F.round(F.col("p_alpha") / z * 100000, 0).cast("bigint")
            .alias("budget_docs"))
        .orderBy("lang", "source")
    )


# Poisson(1) inverse-CDF thresholds over a uniform 0..999999 integer
# draw (cumulative pmf * 1e6, floored): k = #thresholds below u.
# Integer compares only — bit-identical on both engines.
_POIS_T = (367879, 735758, 919698, 981011, 996340)


@query(
    "poisson_bootstrap_estimate",
    oracle=f"""
    WITH draws AS (
      SELECT o_totalprice, rep,
             {_H60.format(e="CAST(o_orderkey AS VARCHAR) || ':b' || CAST(rep AS VARCHAR)")}
               % 1000000 AS u
      FROM orders CROSS JOIN generate_series(0, 2) g(rep)
    ), weighted AS (
      SELECT rep, o_totalprice,
             {' + '.join(f'CASE WHEN u >= {t} THEN 1 ELSE 0 END'
                         for t in _POIS_T)} AS k
      FROM draws)
    SELECT rep AS replicate,
           CAST(sum(k) AS BIGINT) AS n_resampled,
           round(sum(k * o_totalprice) / sum(k), 2) AS boot_mean,
           round((SELECT avg(o_totalprice) FROM orders), 2) AS true_mean
    FROM weighted GROUP BY rep ORDER BY rep
    """,
)
def poisson_bootstrap_estimate(spark, sf_dir):
    """Poisson bootstrap (Chamandy et al.): each row draws a
    Poisson(1) replicate weight from a DETERMINISTIC per-(row,
    replicate) hash-uniform, so resampling the corpus never
    materializes copies and never needs driver coordination — the
    only way to bootstrap 100 TB (classic bootstrap's n-out-of-n
    draw needs global coordination; Poisson weights are pure row
    math).  3 replicates of the mean order price vs the true mean;
    the inverse-CDF thresholds are integer compares, so every weight
    matches the oracle exactly."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    reps = F.explode(F.sequence(F.lit(0), F.lit(2))).alias("rep")
    d = o.select("o_orderkey", "o_totalprice", reps)
    u = hash60(F.concat(F.col("o_orderkey").cast("string"),
                        F.lit(":b"), F.col("rep").cast("string"))) % 1000000
    k = sum((u >= F.lit(th)).cast("int") for th in _POIS_T)
    true_mean = o.agg(F.avg("o_totalprice")).first()[0]
    return (
        d.select(F.col("rep").alias("replicate"),
                 "o_totalprice", k.alias("k"))
        .groupBy("replicate")
        .agg(F.sum("k").cast("bigint").alias("n_resampled"),
             F.round(F.sum(F.col("k") * F.col("o_totalprice"))
                     / F.sum("k"), 2).alias("boot_mean"))
        .withColumn("true_mean", F.round(F.lit(true_mean), 2))
        .orderBy("replicate")
    )


@query(
    "kfold_assignment",
    oracle=f"""
    WITH folds AS (
      SELECT {_H60.format(e="CAST(o_orderkey AS VARCHAR) || ':fold'")} % 5
               AS fold,
             o_totalprice
      FROM orders)
    SELECT fold,
           count(*) AS n_eval,
           (SELECT count(*) FROM orders) - count(*) AS n_train,
           round(avg(o_totalprice), 2) AS eval_mean_price
    FROM folds GROUP BY fold ORDER BY fold
    """,
)
def kfold_assignment(spark, sf_dir):
    """Deterministic 5-fold cross-validation assignment by salted
    hash — every engine and every run agrees on each row's fold, so
    fold membership needs no persisted assignment table.  Per fold:
    eval size, complementary train size, and the held-out mean.  The
    assignment is one map-side expression; the summary is one
    |folds|-row aggregate."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    total = o.count()
    fold = (hash60(F.concat(F.col("o_orderkey").cast("string"),
                            F.lit(":fold"))) % 5).alias("fold")
    return (
        o.select(fold, "o_totalprice")
        .groupBy("fold")
        .agg(F.count(F.lit(1)).alias("n_eval"),
             F.round(F.avg("o_totalprice"), 2).alias("eval_mean_price"))
        .select("fold", "n_eval",
                (F.lit(total) - F.col("n_eval")).alias("n_train"),
                "eval_mean_price")
        .orderBy("fold")
    )


@query(
    "coreset_farthest_points",
    oracle="""
    WITH mean_vec AS (
      SELECT list(m ORDER BY pos) AS mv FROM (
        SELECT t.pos, avg(embedding[t.pos]::DOUBLE) AS m
        FROM embeddings CROSS JOIN generate_series(1, 64) t(pos)
        GROUP BY t.pos)
    ), dist AS (
      SELECT vec_id, label,
             round(sqrt(list_sum(list_transform(range(1, 65),
               i -> (embedding[i]::DOUBLE - mv[i])
                    * (embedding[i]::DOUBLE - mv[i])))), 6) AS d_centroid
      FROM embeddings CROSS JOIN mean_vec)
    SELECT vec_id, label, d_centroid
    FROM dist
    ORDER BY d_centroid DESC, vec_id
    LIMIT 20
    """,
)
def coreset_farthest_points(spark, sf_dir):
    """Coreset seeding: the 20 embeddings farthest from the corpus
    centroid — the outlier-first pick that seeds kmeans++ /
    greedy-coreset construction and flags distributional edge cases
    for curation review.  The centroid is a 64-double aggregate
    (driver-size, inlined as literals exactly like the k-means
    centroid broadcast); distance is then a pure map expression and
    top-20 is TakeOrdered — one aggregate pass + one map pass at any
    corpus size."""
    e = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label",
        F.col("embedding").cast("array<double>").alias("v"))
    mean_row = (e.select(F.posexplode("v").alias("pos", "val"))
                .groupBy("pos").agg(F.avg("val").alias("m"))
                .orderBy("pos").collect())
    mv = F.array(*[F.lit(float(r["m"])) for r in mean_row])
    d = F.round(F.sqrt(F.aggregate(
        F.zip_with("v", mv, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0), lambda acc, x: acc + x)), 6)
    return (e.select("vec_id", "label", d.alias("d_centroid"))
            .orderBy(F.desc("d_centroid"), "vec_id")
            .limit(20))


# --- distributed logistic-regression training --------------------------------
_LR_ITERS = 3
_LR_RATE = 1.0

_SQL_LR_FEAT = """
    feat AS (
      SELECT CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
             1.0 AS x0,
             o_totalprice / 100000.0 AS x1,
             (year(o_orderdate) - 1995) / 3.0 AS x2
      FROM orders
    )"""


def _sql_lr_step(i: int) -> str:
    prev = f"lw{i - 1}"
    return f"""
    g{i} AS (
      SELECT avg(x0 * d) AS g0, avg(x1 * d) AS g1, avg(x2 * d) AS g2,
             avg(-(y * ln(p) + (1 - y) * ln(1 - p))) AS loss
      FROM (
        SELECT y, x0, x1, x2, p, p - y AS d FROM (
          SELECT y, x0, x1, x2,
                 1 / (1 + exp(-(w0 * x0 + w1 * x1 + w2 * x2))) AS p
          FROM feat CROSS JOIN {prev}))
    ), lw{i} AS (
      SELECT w0 - {_LR_RATE} * g0 AS w0,
             w1 - {_LR_RATE} * g1 AS w1,
             w2 - {_LR_RATE} * g2 AS w2
      FROM {prev} CROSS JOIN g{i}
    )"""


@query(
    "logreg_training_iterations",
    oracle=f"""
    WITH {_SQL_LR_FEAT},
    lw0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2),
    {','.join(_sql_lr_step(i) for i in range(1, _LR_ITERS + 1))}
    SELECT * FROM (
      {' UNION ALL '.join(
          f"SELECT {i} AS iteration, round(lw{i}.w0, 6) AS w0,"
          f" round(lw{i}.w1, 6) AS w1, round(lw{i}.w2, 6) AS w2,"
          f" round(g{i}.loss, 6) AS loss_before"
          f" FROM lw{i} CROSS JOIN g{i}"
          for i in range(1, _LR_ITERS + 1))})
    ORDER BY iteration
    """,
)
def logreg_training_iterations(spark, sf_dir):
    """Distributed logistic-regression training (3 full-batch gradient
    steps): learn P(order is fulfilled) from bias + scaled price +
    scaled order year.  The MLlib template for any GLM at 100 TB:
    per iteration ONE aggregate pass computes the gradient
    avg(x·(σ(w·x)−y)) with map-side partial sums (weights enter as
    plan literals — the driver-size broadcast), and the update is
    driver math on 3 doubles.  Reported per iteration: updated
    weights and the pre-update log-loss, so the oracle checks every
    gradient decision of the full training trajectory."""
    o = t(spark, sf_dir, "orders")
    feat = o.select(
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0).alias("y"),
        F.lit(1.0).alias("x0"),
        (F.col("o_totalprice") / 100000.0).alias("x1"),
        ((F.year("o_orderdate") - 1995) / 3.0).alias("x2"),
    ).localCheckpoint(eager=True)
    w = [0.0, 0.0, 0.0]
    rows = []
    for i in range(1, _LR_ITERS + 1):
        z = (F.lit(w[0]) * F.col("x0") + F.lit(w[1]) * F.col("x1")
             + F.lit(w[2]) * F.col("x2"))
        p = 1 / (1 + F.exp(-z))
        d = p - F.col("y")
        g = feat.agg(
            F.avg(F.col("x0") * d).alias("g0"),
            F.avg(F.col("x1") * d).alias("g1"),
            F.avg(F.col("x2") * d).alias("g2"),
            F.avg(-(F.col("y") * F.log(p)
                    + (1 - F.col("y")) * F.log(1 - p))).alias("loss"),
        ).first()
        w = [w[j] - _LR_RATE * g[f"g{j}"] for j in range(3)]
        rows.append((i, round(w[0], 6), round(w[1], 6), round(w[2], 6),
                     round(g["loss"], 6)))
    return spark.createDataFrame(
        rows, "iteration int, w0 double, w1 double, w2 double,"
              " loss_before double")


# binary entropy H(p) with 0·ln0 = 0, as a SQL fragment over {p}
_SQL_ENT = ("CASE WHEN {p} <= 0 OR {p} >= 1 THEN 0.0 "
            "ELSE -({p}) * ln({p}) - (1 - ({p})) * ln(1 - ({p})) END")


@query(
    "decision_stump_split",
    oracle=f"""
    WITH lab AS (
      SELECT o_totalprice AS x,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
      FROM orders
    ), split AS (
      SELECT CAST(50000.0 * g.i AS DOUBLE) AS thr,
             count(*) AS n,
             CAST(sum(y) AS BIGINT) AS pos,
             count(*) FILTER (WHERE x <= 50000.0 * g.i) AS nl,
             CAST(coalesce(sum(y) FILTER (WHERE x <= 50000.0 * g.i), 0)
                  AS BIGINT) AS pl
      FROM lab CROSS JOIN generate_series(1, 9) g(i)
      GROUP BY thr
    ), gains AS (
      SELECT thr, nl, pl,
             round({_SQL_ENT.format(p='pos * 1.0 / n')}
                   - CASE WHEN nl = 0 THEN 0.0 ELSE nl * 1.0 / n *
                       ({_SQL_ENT.format(p='pl * 1.0 / nl')}) END
                   - CASE WHEN n - nl = 0 THEN 0.0 ELSE (n - nl) * 1.0 / n *
                       ({_SQL_ENT.format(p='(pos - pl) * 1.0 / (n - nl)')}) END,
                   6) AS info_gain
      FROM split)
    SELECT thr, nl, pl, info_gain,
           row_number() OVER (ORDER BY info_gain DESC, thr) AS rk
    FROM gains ORDER BY thr
    """,
)
def decision_stump_split(spark, sf_dir):
    """Decision-stump training: exhaustive information-gain search
    over a fixed threshold grid for predicting order fulfillment from
    total price — the inner loop of every distributed tree learner
    (and of feature-importance audits on training data).  Spark
    shape: ONE pass computes all 9 candidate splits' class histograms
    simultaneously (explode the grid, conditional aggregation — not 9
    scans), entropy math then runs on the 9-row result.  The same
    plan at 100 TB: histogram building is the only data-scale stage,
    exactly how tree libraries (XGBoost/LightGBM histogram mode)
    distribute split finding."""
    o = t(spark, sf_dir, "orders")
    lab = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"))
    grid = lab.select(
        "x", "y",
        F.explode(F.sequence(F.lit(1), F.lit(9))).alias("i")) \
        .withColumn("thr", F.col("i") * 50000.0)
    left = F.col("x") <= F.col("thr")
    split = (grid.groupBy("thr")
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum("y").cast("bigint").alias("pos"),
                  F.count(F.when(left, 1)).alias("nl"),
                  F.coalesce(F.sum(F.when(left, F.col("y"))), F.lit(0))
                  .cast("bigint").alias("pl")))

    def ent(p):
        return (F.when((p <= 0) | (p >= 1), 0.0)
                .otherwise(-p * F.log(p) - (1 - p) * F.log(1 - p)))

    n, pos, nl, pl = (F.col("n"), F.col("pos"), F.col("nl"), F.col("pl"))
    gain = F.round(
        ent(pos / n)
        - F.when(nl == 0, 0.0).otherwise(nl / n * ent(pl / nl))
        - F.when(n - nl == 0, 0.0)
        .otherwise((n - nl) / n * ent((pos - pl) / (n - nl))), 6)
    gains = split.select("thr", "nl", "pl", gain.alias("info_gain"))
    rk = F.row_number().over(Window.orderBy(F.desc("info_gain"), "thr"))
    return gains.select("thr", "nl", "pl", "info_gain", rk.alias("rk")) \
        .orderBy("thr")


@query(
    "target_encoding_loo",
    oracle="""
    WITH lab AS (
      SELECT o_orderpriority AS cat,
             CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y
      FROM orders
    ), agg AS (
      SELECT cat, count(*) AS n_cat, sum(y) AS sum_y FROM lab GROUP BY cat
    ), prior AS (SELECT avg(y) AS mu FROM lab),
    enc AS (
      SELECT l.cat, l.y,
             ((a.sum_y - l.y) + 20 * p.mu)
               / ((a.n_cat - 1) + 20) AS loo_enc
      FROM lab l JOIN agg a USING (cat) CROSS JOIN prior p
    )
    SELECT cat,
           CAST(count(*) AS BIGINT) AS n_rows,
           round(avg(y), 6) AS cat_rate,
           round(avg(loo_enc), 6) AS mean_encoding,
           round(min(loo_enc), 6) AS min_encoding,
           round(max(loo_enc), 6) AS max_encoding
    FROM enc GROUP BY cat ORDER BY cat
    """,
)
def target_encoding_loo(spark, sf_dir):
    """Leave-one-out target encoding with additive smoothing (the
    leakage-safe categorical feature every tabular pipeline needs):
    each row's encoding excludes ITS OWN label —
    (Σy − yᵢ + m·μ)/(n − 1 + m), m=20 — so the feature never leaks
    the row's target.  One category aggregate (broadcast back) + one
    map pass; the per-category summary proves every row's exclusion
    arithmetic."""
    o = t(spark, sf_dir, "orders")
    lab = o.select(
        F.col("o_orderpriority").alias("cat"),
        F.when(F.col("o_orderstatus") == "F", 1.0).otherwise(0.0)
        .alias("y"))
    agg = lab.groupBy("cat").agg(F.count(F.lit(1)).alias("n_cat"),
                                 F.sum("y").alias("sum_y"))
    mu = lab.agg(F.avg("y")).first()[0]
    enc = (lab.join(F.broadcast(agg), "cat")
           .select("cat", "y",
                   ((F.col("sum_y") - F.col("y") + 20 * F.lit(mu))
                    / (F.col("n_cat") - 1 + 20)).alias("loo_enc")))
    return (enc.groupBy("cat")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.round(F.avg("y"), 6).alias("cat_rate"),
                 F.round(F.avg("loo_enc"), 6).alias("mean_encoding"),
                 F.round(F.min("loo_enc"), 6).alias("min_encoding"),
                 F.round(F.max("loo_enc"), 6).alias("max_encoding"))
            .orderBy("cat"))


@query(
    "k_anonymity_audit",
    oracle="""
    WITH qid AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS INT) AS bal_bucket
      FROM customer
    ), classes AS (
      SELECT c_nationkey, c_mktsegment, bal_bucket,
             count(*) AS class_size
      FROM qid GROUP BY ALL
    )
    SELECT count(*) AS n_classes,
           CAST(sum(class_size) AS BIGINT) AS n_rows,
           min(class_size) AS min_class_size,
           CAST(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
                AS BIGINT) AS n_rows_below_k5,
           round(sum(CASE WHEN class_size < 5 THEN class_size ELSE 0 END)
                 * 1.0 / sum(class_size), 6) AS frac_below_k5
    FROM classes
    """,
)
def k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit over quasi-identifiers (nation, market
    segment, coarse balance bucket): equivalence-class sizes, the
    smallest class, and the re-identifiable fraction below k=5 — the
    privacy gate run before releasing curated data.  One GROUP BY on
    the quasi-identifier tuple + one summary pass; generalization
    (coarser buckets) is the knob when the audit fails."""
    c = t(spark, sf_dir, "customer")
    qid = c.select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("int").alias("bal_bucket"))
    classes = qid.groupBy("c_nationkey", "c_mktsegment", "bal_bucket") \
        .agg(F.count(F.lit(1)).alias("class_size"))
    below = F.when(F.col("class_size") < 5, F.col("class_size")).otherwise(0)
    return classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
        F.min("class_size").alias("min_class_size"),
        F.sum(below).cast("bigint").alias("n_rows_below_k5"),
        F.round(F.sum(below) / F.sum("class_size"), 6)
        .alias("frac_below_k5"))


@query(
    "dp_noisy_counts",
    oracle=f"""
    WITH true_counts AS (
      SELECT o_orderpriority AS cat, count(*) AS true_n
      FROM orders GROUP BY cat
    ), noised AS (
      SELECT cat, true_n,
             -- seeded Laplace(b=1/eps, eps=0.5): inverse-CDF transform
             -- of a hash-uniform u in (0,1)
             true_n + (CASE WHEN u < 0.5 THEN 1.0 ELSE -1.0 END)
                      * 2.0 * ln(2 * least(u, 1 - u)) * -1.0 AS noisy_n
      FROM (
        SELECT cat, true_n,
               (({_H60.format(e="cat || ':dp'")}) % 999983 + 0.5)
                 / 999983.0 AS u
        FROM true_counts)
    )
    SELECT cat, true_n,
           round(noisy_n, 6) AS noisy_n,
           round(abs(noisy_n - true_n), 6) AS abs_error
    FROM noised ORDER BY cat
    """,
)
def dp_noisy_counts(spark, sf_dir):
    """The Laplace mechanism for ε-differentially-private counts
    (ε=0.5, sensitivity 1 → b=2): noise drawn by inverse-CDF
    transform of a uniform — SEEDED from a salted hash so the release
    is reproducible and oracle-checkable (a production release uses a
    secret seed or true randomness; the mechanism math is
    identical).  Per-category noisy counts with their realized error;
    noise addition is per-GROUP, i.e. O(|categories|) work after the
    count."""
    from sidecar_spark.functions.dedup import hash60

    o = t(spark, sf_dir, "orders")
    tc = o.groupBy(F.col("o_orderpriority").alias("cat")) \
        .agg(F.count(F.lit(1)).alias("true_n"))
    u = ((hash60(F.concat(F.col("cat"), F.lit(":dp"))) % 999983 + 0.5)
         / 999983.0)
    noise = (F.when(u < 0.5, 1.0).otherwise(-1.0)
             * 2.0 * F.log(2 * F.least(u, 1 - u)) * -1.0)
    noisy = tc.select("cat", "true_n",
                      (F.col("true_n") + noise).alias("noisy_n"))
    return (noisy.select(
        "cat", "true_n",
        F.round("noisy_n", 6).alias("noisy_n"),
        F.round(F.abs(F.col("noisy_n") - F.col("true_n")), 6)
        .alias("abs_error"))
        .orderBy("cat"))


# weighted stump search over the 9-threshold grid: returns (thr, err)
# of the minimum WEIGHTED error stump h(x) = sign(x <= thr ? +1 : -1)
# against labels y in {-1, +1}, from weight table {src}(x, y, w)
def _sql_ada_stump(src: str, name: str) -> str:
    return f"""
    {name} AS (
      SELECT thr, err, pol FROM (
        SELECT CAST(50000.0 * g.i AS DOUBLE) AS thr,
               least(
                 sum(CASE WHEN (CASE WHEN x <= 50000.0 * g.i THEN 1
                                ELSE -1 END) <> y THEN w ELSE 0 END),
                 sum(CASE WHEN (CASE WHEN x <= 50000.0 * g.i THEN -1
                                ELSE 1 END) <> y THEN w ELSE 0 END))
                 AS err,
               CASE WHEN
                 sum(CASE WHEN (CASE WHEN x <= 50000.0 * g.i THEN 1
                                ELSE -1 END) <> y THEN w ELSE 0 END)
                 <= sum(CASE WHEN (CASE WHEN x <= 50000.0 * g.i THEN -1
                                   ELSE 1 END) <> y THEN w ELSE 0 END)
                 THEN 1 ELSE -1 END AS pol
        FROM {src} CROSS JOIN generate_series(1, 9) g(i)
        GROUP BY thr)
      ORDER BY round(err, 10), thr LIMIT 1
    )"""


@query(
    "adaboost_stumps",
    oracle=f"""
    WITH lab AS (
      SELECT o_totalprice AS x,
             CASE WHEN o_orderstatus = 'F' THEN 1 ELSE -1 END AS y,
             1.0 / (SELECT count(*) FROM orders) AS w
      FROM orders
    ),
    {_sql_ada_stump('lab', 's1')},
    a1 AS (SELECT thr, pol, err,
                  0.5 * ln((1 - err) / err) AS alpha FROM s1),
    w2 AS (
      SELECT l.x, l.y,
             l.w * exp(-a1.alpha * l.y
                       * (CASE WHEN l.x <= a1.thr THEN a1.pol
                          ELSE -a1.pol END))
               / (SELECT sum(l2.w * exp(-a.alpha * l2.y
                       * (CASE WHEN l2.x <= a.thr THEN a.pol
                          ELSE -a.pol END)))
                  FROM lab l2 CROSS JOIN a1 a) AS w
      FROM lab l CROSS JOIN a1
    ),
    {_sql_ada_stump('w2', 's2')},
    a2 AS (SELECT thr, pol, err,
                  0.5 * ln((1 - err) / err) AS alpha FROM s2)
    SELECT 1 AS round_idx, thr, pol, round(err, 6) AS weighted_err,
           round(alpha, 6) AS alpha
    FROM a1
    UNION ALL
    SELECT 2, thr, pol, round(err, 6), round(alpha, 6) FROM a2
    ORDER BY round_idx
    """,
)
def adaboost_stumps(spark, sf_dir):
    """AdaBoost (2 rounds of polarity-aware decision stumps on order
    price predicting fulfillment): per round, ONE aggregation pass
    computes every candidate stump's WEIGHTED error in both
    polarities, the driver takes the argmin (tie → smallest
    threshold, on error rounded to 10 dp so the argmin is portable)
    and its α = ½ln((1−ε)/ε), and the re-weighting
    w·exp(−α·y·h(x))/Z is a map expression + one normalization
    aggregate.  The boosting loop is the gradient-descent shape with
    DATA-dependent state (weights) instead of model state — weights
    live in the dataflow, never on the driver; the oracle replays
    both rounds including the weight renormalization."""
    o = t(spark, sf_dir, "orders")
    n = o.count()
    lab = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(-1).alias("y"),
        F.lit(1.0 / n).alias("w")).localCheckpoint(eager=True)

    def stump(df):
        g = df.select(
            "x", "y", "w",
            F.explode(F.sequence(F.lit(1), F.lit(9))).alias("i")) \
            .withColumn("thr", F.col("i") * 50000.0)
        h_pos = F.when(F.col("x") <= F.col("thr"), 1).otherwise(-1)
        errs = (g.groupBy("thr")
                .agg(F.sum(F.when(h_pos != F.col("y"), F.col("w"))
                           .otherwise(0.0)).alias("err_pos"),
                     F.sum(F.when(-h_pos != F.col("y"), F.col("w"))
                           .otherwise(0.0)).alias("err_neg")))
        best = (errs.select(
            "thr",
            F.least("err_pos", "err_neg").alias("err"),
            F.when(F.col("err_pos") <= F.col("err_neg"), 1).otherwise(-1)
            .alias("pol"))
            .orderBy(F.round("err", 10), "thr").limit(1).first())
        import math
        return (float(best["thr"]), int(best["pol"]), float(best["err"]),
                0.5 * math.log((1 - best["err"]) / best["err"]))

    rows = []
    cur = lab
    for r in (1, 2):
        thr, pol, err, alpha = stump(cur)
        rows.append((r, thr, pol, round(err, 6), round(alpha, 6)))
        h = F.when(F.col("x") <= thr, pol).otherwise(-pol)
        unnorm = cur.withColumn(
            "wu", F.col("w") * F.exp(-alpha * F.col("y") * h))
        z = unnorm.agg(F.sum("wu")).first()[0]
        cur = unnorm.select("x", "y",
                            (F.col("wu") / z).alias("w")) \
            .localCheckpoint(eager=True)
    return spark.createDataFrame(
        rows, "round_idx int, thr double, pol int, weighted_err double,"
              " alpha double").orderBy("round_idx")


# --- 1-D Gaussian-mixture EM -------------------------------------------------
_GMM_ITERS = 2

_SQL_GMM_FEAT = """
    gx AS (SELECT ln(value) AS x FROM events),
    gi AS (SELECT avg(x) - stddev_samp(x) AS mu_a,
                  avg(x) + stddev_samp(x) AS mu_b,
                  stddev_samp(x) * stddev_samp(x) AS s2_a,
                  stddev_samp(x) * stddev_samp(x) AS s2_b,
                  0.5 AS w_b
           FROM gx)"""


def _sql_gmm_step(i: int) -> str:
    prev = "gi" if i == 1 else f"gp{i - 1}"
    return f"""
    gr{i} AS (
      SELECT x, pb / (pa + pb) AS rb,
             ln(pa + pb) AS ll
      FROM (
        SELECT x,
               (1 - w_b) * exp(-(x - mu_a) * (x - mu_a) / (2 * s2_a))
                   / sqrt(2 * pi() * s2_a) AS pa,
               w_b * exp(-(x - mu_b) * (x - mu_b) / (2 * s2_b))
                   / sqrt(2 * pi() * s2_b) AS pb
        FROM gx CROSS JOIN {prev})
    ), gp{i} AS (
      SELECT sum(rb) / count(*) AS w_b,
             sum((1 - rb) * x) / sum(1 - rb) AS mu_a,
             sum(rb * x) / sum(rb) AS mu_b,
             sum((1 - rb) * x * x) / sum(1 - rb)
               - (sum((1 - rb) * x) / sum(1 - rb))
                 * (sum((1 - rb) * x) / sum(1 - rb)) AS s2_a,
             sum(rb * x * x) / sum(rb)
               - (sum(rb * x) / sum(rb)) * (sum(rb * x) / sum(rb)) AS s2_b,
             sum(ll) AS loglik
      FROM gr{i}
    )"""


@query(
    "gmm_em_iterations",
    oracle=f"""
    WITH {_SQL_GMM_FEAT},
    {','.join(_sql_gmm_step(i) for i in range(1, _GMM_ITERS + 1))}
    SELECT * FROM (
      {' UNION ALL '.join(
          f"SELECT {i} AS iteration, round(w_b, 5) AS w_b,"
          f" round(mu_a, 5) AS mu_a, round(mu_b, 5) AS mu_b,"
          f" round(s2_a, 5) AS s2_a, round(s2_b, 5) AS s2_b,"
          f" round(loglik, 4) AS loglik FROM gp{i}"
          for i in range(1, _GMM_ITERS + 1))})
    ORDER BY iteration
    """,
)
def gmm_em_iterations(spark, sf_dir):
    """2-component 1-D Gaussian-mixture EM on ln(event value), two
    full EM iterations from a moment-based deterministic init
    (mu = mean -/+ std, shared variance, weight 0.5).

    The 100 TB EM template: the E-step is a PURE MAP expression
    (current parameters are a 1-row broadcast), and the M-step
    collapses to ONE aggregate pass producing 6 numbers — per
    iteration the only cluster cost is map + combine-collapsed
    aggregate; driver state is O(k).  The oracle replays both
    iterations in chained CTEs; matching weights/means/variances to
    5 decimals and the pre-update log-likelihood to 4 proves every
    responsibility matched."""
    ev = t(spark, sf_dir, "events").select(F.log("value").alias("x"))
    init = ev.agg(
        (F.avg("x") - F.stddev_samp("x")).alias("mu_a"),
        (F.avg("x") + F.stddev_samp("x")).alias("mu_b"),
        (F.stddev_samp("x") * F.stddev_samp("x")).alias("s2_a"),
        (F.stddev_samp("x") * F.stddev_samp("x")).alias("s2_b"),
        F.lit(0.5).alias("w_b")).first()

    import math

    params = dict(init.asDict())
    out = []
    for it in range(1, _GMM_ITERS + 1):
        mu_a, mu_b = F.lit(params["mu_a"]), F.lit(params["mu_b"])
        s2_a, s2_b = F.lit(params["s2_a"]), F.lit(params["s2_b"])
        w_b = F.lit(params["w_b"])
        x = F.col("x")
        pa = ((1 - w_b) * F.exp(-(x - mu_a) * (x - mu_a) / (2 * s2_a))
              / F.sqrt(2 * math.pi * s2_a))
        pb = (w_b * F.exp(-(x - mu_b) * (x - mu_b) / (2 * s2_b))
              / F.sqrt(2 * math.pi * s2_b))
        r = ev.select(x.alias("x"), (pb / (pa + pb)).alias("rb"),
                      F.log(pa + pb).alias("ll"))
        agg = r.agg(
            (F.sum("rb") / F.count(F.lit(1))).alias("w_b"),
            (F.sum((1 - F.col("rb")) * F.col("x"))
             / F.sum(1 - F.col("rb"))).alias("mu_a"),
            (F.sum(F.col("rb") * F.col("x")) / F.sum("rb")).alias("mu_b"),
            (F.sum((1 - F.col("rb")) * F.col("x") * F.col("x"))
             / F.sum(1 - F.col("rb"))).alias("ex2_a"),
            (F.sum(F.col("rb") * F.col("x") * F.col("x"))
             / F.sum("rb")).alias("ex2_b"),
            F.sum("ll").alias("loglik")).first()
        params = {
            "w_b": agg["w_b"], "mu_a": agg["mu_a"], "mu_b": agg["mu_b"],
            "s2_a": agg["ex2_a"] - agg["mu_a"] * agg["mu_a"],
            "s2_b": agg["ex2_b"] - agg["mu_b"] * agg["mu_b"],
        }
        out.append((it, round(params["w_b"], 5), round(params["mu_a"], 5),
                    round(params["mu_b"], 5), round(params["s2_a"], 5),
                    round(params["s2_b"], 5), round(agg["loglik"], 4)))
    return spark.createDataFrame(
        out, "iteration int, w_b double, mu_a double, mu_b double,"
             " s2_a double, s2_b double, loglik double").orderBy("iteration")


# --- off-policy evaluation (IPS / SNIPS) -------------------------------------


@query(
    "ips_policy_eval",
    oracle="""
    WITH logged AS (
      SELECT event_id, user_id, value AS reward,
             CASE WHEN h < 1 THEN 0 WHEN h < 3 THEN 1 ELSE 2 END AS a,
             CASE WHEN h < 1 THEN 1.0 / 6 WHEN h < 3 THEN 2.0 / 6
                  ELSE 3.0 / 6 END AS propensity
      FROM (SELECT *, ('0x' || substr(md5('act:' || event_id::VARCHAR),
                                      1, 15))::BIGINT % 6 AS h
            FROM events WHERE event_type = 'purchase')
    ), weighted AS (
      SELECT reward,
             CASE WHEN a = user_id % 3 THEN 1.0 / propensity
                  ELSE 0.0 END AS w
      FROM logged)
    SELECT count(*) AS n,
           count(*) FILTER (WHERE w > 0) AS n_matched,
           round(avg(w * reward), 5) AS ips,
           round(sum(w * reward) / sum(w), 5) AS snips,
           round(sum(w) * sum(w) / sum(w * w), 4) AS ess
    FROM weighted
    """,
)
def ips_policy_eval(spark, sf_dir):
    """Off-policy evaluation of a target policy from logged bandit
    feedback: purchases are re-read as (context=user, action=hash-
    drawn discount level with propensities 1/6, 2/6, 3/6, reward=
    value); the target policy picks user_id % 3.  Reports the IPS
    estimate, the self-normalized SNIPS estimate, and the effective
    sample size (sum w)^2 / sum w^2.

    100 TB plan: the importance weight is a pure map expression on
    the scan (the hash replays the logged action — no action log
    join), and everything collapses into ONE aggregate pass."""
    ev = t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    h = hash60(F.concat(F.lit("act:"), F.col("event_id"))) % 6
    a = (F.when(h < 1, 0).when(h < 3, 1).otherwise(2))
    prop = (F.when(h < 1, 1.0 / 6).when(h < 3, 2.0 / 6)
            .otherwise(3.0 / 6))
    logged = ev.select(
        F.col("value").alias("reward"),
        F.when(a == F.col("user_id") % 3, 1.0 / prop)
        .otherwise(0.0).alias("w"))
    return logged.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("w") > 0).alias("n_matched"),
        F.round(F.avg(F.col("w") * F.col("reward")), 5).alias("ips"),
        F.round(F.sum(F.col("w") * F.col("reward")) / F.sum("w"), 5)
        .alias("snips"),
        F.round(F.sum("w") * F.sum("w") / F.sum(F.col("w") * F.col("w")), 4)
        .alias("ess"))


# --- inter-annotator agreement ----------------------------------------------


@query(
    "cohens_kappa_agreement",
    oracle="""
    WITH rated AS (
      SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS r1,
             CASE WHEN len(CASE WHEN trim(text) = '' THEN []::VARCHAR[]
                           ELSE regexp_split_to_array(trim(text), '\\s+')
                           END) >= 40 THEN 1 ELSE 0 END AS r2
      FROM documents
    ), m AS (
      SELECT count(*) AS n,
             avg(CASE WHEN r1 = r2 THEN 1.0 ELSE 0.0 END) AS po,
             avg(r1) AS p1, avg(r2) AS p2
      FROM rated)
    SELECT n, round(po, 6) AS po,
           round(p1 * p2 + (1 - p1) * (1 - p2), 6) AS pe,
           round((po - (p1 * p2 + (1 - p1) * (1 - p2)))
                 / (1 - (p1 * p2 + (1 - p1) * (1 - p2))), 6) AS kappa
    FROM m
    """,
)
def cohens_kappa_agreement(spark, sf_dir):
    """Cohen's kappa between two deterministic raters of document
    quality (rater 1: >= 250 chars; rater 2: >= 40 whitespace
    tokens) — the chance-corrected agreement statistic every
    labeling pipeline reports before trusting annotations.

    One aggregate pass: observed agreement and both marginals come
    out of the same map-side-combined scan; kappa is driver-side
    arithmetic on 3 numbers."""
    d = t(spark, sf_dir, "documents")
    words = F.split(F.trim(F.col("text")), r"\s+")
    ntok = F.when(F.trim(F.col("text")) == "", 0).otherwise(F.size(words))
    rated = d.select(
        F.when(F.col("n_chars") >= 250, 1).otherwise(0).alias("r1"),
        F.when(ntok >= 40, 1).otherwise(0).alias("r2"))
    m = rated.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(F.when(F.col("r1") == F.col("r2"), 1.0).otherwise(0.0))
        .alias("po"),
        F.avg("r1").alias("p1"), F.avg("r2").alias("p2"))
    pe = (F.col("p1") * F.col("p2")
          + (1 - F.col("p1")) * (1 - F.col("p2")))
    return m.select(
        "n", F.round("po", 6).alias("po"), F.round(pe, 6).alias("pe"),
        F.round((F.col("po") - pe) / (1 - pe), 6).alias("kappa"))


# --- rejection sampling to a target distribution -----------------------------


@query(
    "rejection_sample_distribution_match",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             least(3, n_chars // 150) AS bucket,
             (('0x' || substr(md5('rej:' || doc_id::VARCHAR), 1, 15))
              ::BIGINT % 1000000) / 1000000.0 AS u
      FROM documents
    ), shares AS (
      SELECT bucket, count(*) AS n_orig,
             count(*) * 1.0 / (SELECT count(*) FROM base) AS share
      FROM base GROUP BY bucket
    ), ratio AS (
      SELECT bucket, n_orig, share, 0.25 / share AS r FROM shares
    ), big_m AS (SELECT max(r) AS m FROM ratio),
    kept AS (
      SELECT b.bucket, r.n_orig, r.share,
             count(*) FILTER (WHERE b.u < r.r / g.m) AS n_kept
      FROM base b JOIN ratio r ON b.bucket = r.bucket CROSS JOIN big_m g
      GROUP BY b.bucket, r.n_orig, r.share)
    SELECT bucket, n_orig, round(share, 6) AS share_orig, n_kept,
           round(n_kept * 1.0 / (SELECT sum(n_kept) FROM kept), 6)
             AS share_kept
    FROM kept
    """,
)
def rejection_sample_distribution_match(spark, sf_dir):
    """Deterministic rejection sampling that reshapes a skewed
    length-bucket distribution into the uniform target (0.25 per
    bucket): accept doc with probability (target/empirical)/M where
    M is the max ratio — the standard distribution-matching resample
    for over-represented domains, made replayable by a hash-uniform
    instead of rand().

    100 TB plan: bucket shares are ONE tiny aggregate broadcast back
    over the scan; the accept test is pure map math — one pass, no
    resampling shuffle."""
    d = t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        F.least(F.lit(3), (F.col("n_chars") / 150).cast("bigint"))
        .alias("bucket"),
        ((hash60(F.concat(F.lit("rej:"), F.col("doc_id"))) % 1000000)
         / 1000000.0).alias("u"))
    n_total = base.count()
    shares = base.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orig"),
        (F.count(F.lit(1)) * 1.0 / n_total).alias("share"))
    ratio = shares.withColumn("r", 0.25 / F.col("share"))
    big_m = ratio.agg(F.max("r").alias("m"))
    kept = (base.join(F.broadcast(ratio), "bucket")
            .join(F.broadcast(big_m))
            .groupBy("bucket", "n_orig", "share")
            .agg(F.count_if(F.col("u") < F.col("r") / F.col("m"))
                 .alias("n_kept")))
    tot_kept = kept.agg(F.sum("n_kept").alias("tk"))
    return (kept.join(F.broadcast(tot_kept))
            .select("bucket", "n_orig",
                    F.round("share", 6).alias("share_orig"), "n_kept",
                    F.round(F.col("n_kept") * 1.0 / F.col("tk"), 6)
                    .alias("share_kept")))


# --- split-conformal prediction ----------------------------------------------


@query(
    "conformal_prediction_interval",
    oracle="""
    WITH split AS (
      SELECT event_id, event_type, value,
             ('0x' || substr(md5('cp:' || event_id::VARCHAR), 1, 15))
               ::BIGINT % 10 AS s
      FROM events
    ), model AS (
      SELECT event_type, avg(value) AS pred
      FROM split WHERE s <= 5 GROUP BY event_type
    ), calib AS (
      SELECT abs(value - pred) AS score,
             row_number() OVER (ORDER BY abs(value - pred), event_id)
               AS rnk,
             count(*) OVER () AS n_cal
      FROM split JOIN model USING (event_type) WHERE s IN (6, 7)
    ), qhat AS (
      SELECT score AS q, n_cal,
             CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT) AS k
      FROM calib WHERE rnk = CAST(ceil(0.9 * (n_cal + 1)) AS BIGINT)
    )
    SELECT n_cal, k, round(q, 6) AS qhat,
           count(*) AS n_test,
           round(avg(CASE WHEN abs(value - pred) <= q
                          THEN 1.0 ELSE 0.0 END), 6) AS coverage
    FROM split JOIN model USING (event_type) CROSS JOIN qhat
    WHERE s >= 8
    GROUP BY n_cal, k, q
    """,
)
def conformal_prediction_interval(spark, sf_dir):
    """Split-conformal prediction: fit a per-event-type mean
    predictor on the train split (hash 0-5), take the
    ceil(0.9*(n+1))-th smallest absolute residual on the calibration
    split (6-7) as the interval half-width, and verify ~90% coverage
    on the test split (8-9) — the distribution-free uncertainty
    wrapper a model-serving pipeline ships with its predictions.

    100 TB plan: the model and the one-row q-hat are broadcast; the
    calibration order statistic is a window over the calibration
    SUBSET only (never the full table); coverage is one aggregate
    pass.  The order statistic ranks on (score, event_id) so both
    engines pick the identical row."""
    ev = t(spark, sf_dir, "events")
    split = ev.select(
        "event_id", "event_type", "value",
        (hash60(F.concat(F.lit("cp:"), F.col("event_id"))) % 10)
        .alias("s"))
    model = (split.where(F.col("s") <= 5)
             .groupBy("event_type").agg(F.avg("value").alias("pred")))
    calib = (split.where(F.col("s").isin(6, 7))
             .join(F.broadcast(model), "event_type")
             .select(F.abs(F.col("value") - F.col("pred")).alias("score"),
                     "event_id"))
    wn = Window.orderBy("score", "event_id")
    ranked = calib.select(
        "score", F.row_number().over(wn).alias("rnk"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding,
                               Window.unboundedFollowing)).alias("n_cal"))
    qhat = (ranked
            .withColumn("k", F.ceil(0.9 * (F.col("n_cal") + 1))
                        .cast("bigint"))
            .where(F.col("rnk") == F.col("k"))
            .select(F.col("score").alias("q"), "n_cal", "k"))
    test = (split.where(F.col("s") >= 8)
            .join(F.broadcast(model), "event_type")
            .join(F.broadcast(qhat)))
    return test.groupBy("n_cal", "k", F.col("q")).agg(
        F.count(F.lit(1)).alias("n_test"),
        F.round(F.avg(F.when(F.abs(F.col("value") - F.col("pred"))
                             <= F.col("q"), 1.0).otherwise(0.0)), 6)
        .alias("coverage")).select(
        "n_cal", "k", F.round("q", 6).alias("qhat"), "n_test", "coverage")


# --- ridge regression via normal equations -----------------------------------


@query(
    "ridge_regression_normal_equations",
    oracle="""
    WITH feat AS (
      SELECT 1.0 AS x0, l_quantity AS x1, l_discount * 10 AS x2,
             l_extendedprice / 1000 AS y
      FROM lineitem
    ), m AS (
      SELECT count(*)::DOUBLE + 1.0 AS a00,
             sum(x1) AS a01, sum(x2) AS a02,
             sum(x1 * x1) + 1.0 AS a11, sum(x1 * x2) AS a12,
             sum(x2 * x2) + 1.0 AS a22,
             sum(y) AS b0, sum(x1 * y) AS b1, sum(x2 * y) AS b2,
             sum(y * y) AS syy, count(*) AS n
      FROM feat
    ), det AS (
      SELECT *,
             a00 * (a11 * a22 - a12 * a12)
             - a01 * (a01 * a22 - a12 * a02)
             + a02 * (a01 * a12 - a11 * a02) AS d
      FROM m
    ), w AS (
      SELECT n, b0, b1, b2, syy,
             ((a11 * a22 - a12 * a12) * b0
              + (a02 * a12 - a01 * a22) * b1
              + (a01 * a12 - a02 * a11) * b2) / d AS w0,
             ((a12 * a02 - a01 * a22) * b0
              + (a00 * a22 - a02 * a02) * b1
              + (a01 * a02 - a00 * a12) * b2) / d AS w1,
             ((a01 * a12 - a02 * a11) * b0
              + (a02 * a01 - a00 * a12) * b1
              + (a00 * a11 - a01 * a01) * b2) / d AS w2
      FROM det)
    SELECT n, round(w0, 6) AS w0, round(w1, 6) AS w1,
           round(w2, 6) AS w2,
           round(1 - (SELECT sum((y - (w0 + w1 * x1 + w2 * x2))
                                 * (y - (w0 + w1 * x1 + w2 * x2)))
                      FROM feat CROSS JOIN w)
                     / (syy - b0 * b0 / n), 6) AS r2
    FROM w
    """,
)
def ridge_regression_normal_equations(spark, sf_dir):
    """Closed-form ridge regression (lambda=1) of scaled line-item
    price on quantity and discount: accumulate the 3x3 Gram matrix
    and moment vector in ONE aggregate pass, solve by adjugate
    driver-side, then one more pass scores R^2.

    This is the exact-solve counterpart of the iterative trainers
    (logreg GD, ALS): at 100 TB the Gram matrix is still 9 numbers —
    map-side partial sums collapse the whole fit into two scans.
    Both engines evaluate the identical cofactor expressions, so the
    solve agrees to 6 decimals."""
    li = t(spark, sf_dir, "lineitem")
    feat = li.select(
        F.col("l_quantity").alias("x1"),
        (F.col("l_discount") * 10).alias("x2"),
        (F.col("l_extendedprice") / 1000).alias("y"))
    m = feat.agg(
        (F.count(F.lit(1)).cast("double") + 1.0).alias("a00"),
        F.sum("x1").alias("a01"), F.sum("x2").alias("a02"),
        (F.sum(F.col("x1") * F.col("x1")) + 1.0).alias("a11"),
        F.sum(F.col("x1") * F.col("x2")).alias("a12"),
        (F.sum(F.col("x2") * F.col("x2")) + 1.0).alias("a22"),
        F.sum("y").alias("b0"),
        F.sum(F.col("x1") * F.col("y")).alias("b1"),
        F.sum(F.col("x2") * F.col("y")).alias("b2"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.count(F.lit(1)).alias("n")).first()
    a00, a01, a02 = m["a00"], m["a01"], m["a02"]
    a11, a12, a22 = m["a11"], m["a12"], m["a22"]
    b0, b1, b2 = m["b0"], m["b1"], m["b2"]
    d = (a00 * (a11 * a22 - a12 * a12)
         - a01 * (a01 * a22 - a12 * a02)
         + a02 * (a01 * a12 - a11 * a02))
    w0 = ((a11 * a22 - a12 * a12) * b0
          + (a02 * a12 - a01 * a22) * b1
          + (a01 * a12 - a02 * a11) * b2) / d
    w1 = ((a12 * a02 - a01 * a22) * b0
          + (a00 * a22 - a02 * a02) * b1
          + (a01 * a02 - a00 * a12) * b2) / d
    w2 = ((a01 * a12 - a02 * a11) * b0
          + (a02 * a01 - a00 * a12) * b1
          + (a00 * a11 - a01 * a01) * b2) / d
    resid = (F.col("y")
             - (F.lit(w0) + F.lit(w1) * F.col("x1")
                + F.lit(w2) * F.col("x2")))
    sse = feat.agg(F.sum(resid * resid).alias("sse")).first()["sse"]
    r2 = 1 - sse / (m["syy"] - b0 * b0 / m["n"])
    return spark.createDataFrame(
        [(m["n"], round(w0, 6), round(w1, 6), round(w2, 6),
          round(r2, 6))],
        "n bigint, w0 double, w1 double, w2 double, r2 double")


# --- Kaplan-Meier survival ---------------------------------------------------


@query(
    "kaplan_meier_survival",
    oracle="""
    WITH horizon AS (SELECT max(ts) AS mx FROM events),
    users AS (
      SELECT user_id,
             CAST(floor((floor(epoch(max(ts))) - floor(epoch(min(ts))))
                        / 86400) AS BIGINT) AS dur,
             CASE WHEN max(ts) >= (SELECT mx FROM horizon)
                                  - INTERVAL 12 HOUR
                  THEN 0 ELSE 1 END AS died
      FROM events GROUP BY user_id
    ), per_t AS (
      SELECT dur AS t_days, count(*) AS n_at_t,
             CAST(sum(died) AS BIGINT) AS n_deaths
      FROM users GROUP BY dur
    ), risk AS (
      SELECT t_days, n_deaths,
             CAST(sum(n_at_t) OVER (ORDER BY t_days DESC) AS BIGINT)
               AS n_risk
      FROM per_t)
    SELECT t_days, n_risk, n_deaths,
           round(exp(sum(ln(1 - n_deaths * 1.0 / n_risk))
                     OVER (ORDER BY t_days)), 6) AS survival
    FROM risk
    WHERE n_deaths > 0
    """,
)
def kaplan_meier_survival(spark, sf_dir):
    """Kaplan-Meier survival estimate of user lifetime (days between
    first and last event), right-censoring users still active in the
    final 3 days of the window — the product-limit estimator every
    retention team runs, with the cumulative product expressed as
    exp of a windowed ln-sum so it stays a single window pass.

    100 TB plan: one groupBy(user) collapses the event stream; the
    per-duration table is ~max-lifetime rows (tiny), so the two
    ordered windows cost nothing; no self-joins."""
    ev = t(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx")).first()["mx"]
    users = ev.groupBy("user_id").agg(
        F.floor((F.unix_timestamp(F.max("ts"))
                 - F.unix_timestamp(F.min("ts"))) / 86400)
        .cast("bigint").alias("dur"),
        F.when(F.max("ts") >= F.lit(mx) - F.expr("INTERVAL 12 HOURS"), 0)
        .otherwise(1).alias("died"))
    per_t = users.groupBy(F.col("dur").alias("t_days")).agg(
        F.count(F.lit(1)).alias("n_at_t"),
        F.sum("died").cast("bigint").alias("n_deaths"))
    w_desc = Window.orderBy(F.desc("t_days")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    risk = per_t.select(
        "t_days", "n_deaths",
        F.sum("n_at_t").over(w_desc).cast("bigint").alias("n_risk"))
    w_asc = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    surv = F.exp(F.sum(
        F.log(1 - F.col("n_deaths") * 1.0 / F.col("n_risk"))).over(w_asc))
    return (risk.withColumn("survival", F.round(surv, 6))
            .where(F.col("n_deaths") > 0)
            .select("t_days", "n_risk", "n_deaths", "survival"))


# --- gradient-boosted residual stumps ----------------------------------------
_GBRT_THRS = list(range(5, 50, 5))


def _sql_gbrt_round(i: int) -> str:
    # residual after previous rounds is carried in resid{i-1}.r
    return f"""
    st{i} AS (
      SELECT t.thr,
             sum(CASE WHEN x <= t.thr THEN r ELSE 0 END) AS sl,
             count(*) FILTER (WHERE x <= t.thr) AS nl,
             sum(CASE WHEN x > t.thr THEN r ELSE 0 END) AS sr,
             count(*) FILTER (WHERE x > t.thr) AS nr,
             sum(r * r) AS srr
      FROM resid{i - 1} CROSS JOIN
           (SELECT unnest([{', '.join(str(v) for v in _GBRT_THRS)}]) AS thr) t
      GROUP BY t.thr
    ), pick{i} AS (
      SELECT thr, sl / nl AS lm, sr / nr AS rm,
             srr - (sl * sl / nl + sr * sr / nr) AS sse
      FROM st{i} ORDER BY sse, thr LIMIT 1
    ), resid{i} AS (
      SELECT x, r - CASE WHEN x <= p.thr THEN p.lm ELSE p.rm END AS r
      FROM resid{i - 1} CROSS JOIN pick{i} p
    )"""


@query(
    "gbrt_residual_stumps",
    oracle=f"""
    WITH feat AS (
      SELECT l_quantity AS x, l_extendedprice / 1000 AS y FROM lineitem),
    f0 AS (SELECT avg(y) AS f FROM feat),
    resid0 AS (SELECT x, y - f AS r FROM feat CROSS JOIN f0),
    {','.join(_sql_gbrt_round(i) for i in range(1, 3))}
    SELECT * FROM (
      {' UNION ALL '.join(
          f"SELECT {i} AS round_idx, thr, round(lm, 6) AS left_mean,"
          f" round(rm, 6) AS right_mean, round(sse, 2) AS sse"
          f" FROM pick{i}" for i in range(1, 3))})
    ORDER BY round_idx
    """,
)
def gbrt_residual_stumps(spark, sf_dir):
    """Gradient boosting with depth-1 trees (squared loss, rate 1):
    start from the global mean, then twice fit the best threshold
    stump on the CURRENT residuals over a fixed quantity grid
    (5..45) and subtract its prediction — the core GBM loop.

    100 TB plan: one aggregate pass per round evaluates ALL 9
    candidate splits at once (conditional partial sums — the
    histogram trick of every distributed GBDT); driver state is one
    (threshold, two means) triple per round.  The oracle replays
    both rounds in chained CTEs."""
    li = t(spark, sf_dir, "lineitem")
    feat = li.select(F.col("l_quantity").alias("x"),
                     (F.col("l_extendedprice") / 1000).alias("y"))
    f0 = feat.agg(F.avg("y")).first()[0]
    resid = feat.select("x", (F.col("y") - f0).alias("r"))
    out = []
    for rnd in (1, 2):
        aggs = []
        for thr in _GBRT_THRS:
            le = F.col("x") <= thr
            aggs += [
                F.sum(F.when(le, F.col("r")).otherwise(0.0))
                .alias(f"sl_{thr}"),
                F.count_if(le).alias(f"nl_{thr}"),
                F.sum(F.when(~le, F.col("r")).otherwise(0.0))
                .alias(f"sr_{thr}"),
                F.count_if(~le).alias(f"nr_{thr}"),
            ]
        aggs.append(F.sum(F.col("r") * F.col("r")).alias("srr"))
        st = resid.agg(*aggs).first()
        best = None
        for thr in _GBRT_THRS:
            sl, nl = st[f"sl_{thr}"], st[f"nl_{thr}"]
            sr, nr = st[f"sr_{thr}"], st[f"nr_{thr}"]
            sse = st["srr"] - (sl * sl / nl + sr * sr / nr)
            if best is None or sse < best[3]:
                best = (thr, sl / nl, sr / nr, sse)
        thr, lm, rm, sse = best
        out.append((rnd, thr, round(lm, 6), round(rm, 6), round(sse, 2)))
        resid = resid.select(
            "x",
            (F.col("r") - F.when(F.col("x") <= thr, lm).otherwise(rm))
            .alias("r")).localCheckpoint(eager=True)
    return spark.createDataFrame(
        out, "round_idx int, thr int, left_mean double,"
             " right_mean double, sse double").orderBy("round_idx")


# --- Neyman allocation -------------------------------------------------------


@query(
    "neyman_allocation",
    oracle="""
    WITH strata AS (
      SELECT event_type, count(*) AS n_h,
             stddev_samp(value) AS s_h
      FROM events GROUP BY event_type
    ), tot AS (SELECT sum(n_h * s_h) AS z FROM strata)
    SELECT event_type, n_h, round(s_h, 6) AS s_h,
           CAST(round(1000 * n_h * s_h / z) AS BIGINT) AS alloc,
           round((1000 * n_h * s_h / z) / n_h, 6) AS sampling_rate
    FROM strata CROSS JOIN tot
    ORDER BY event_type
    """,
)
def neyman_allocation(spark, sf_dir):
    """Neyman-optimal stratified sample allocation: given a budget of
    1000 rows, allocate to each event-type stratum proportionally to
    N_h * S_h (stratum size x stddev) — the variance-minimizing
    design every survey/eval-set sampler should use instead of
    proportional allocation.

    One aggregate pass computes all stratum moments; the normalizer
    is a one-row broadcast. The allocation itself is column math."""
    ev = t(spark, sf_dir, "events")
    strata = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.stddev_samp("value").alias("s_h"))
    tot = strata.agg(F.sum(F.col("n_h") * F.col("s_h")).alias("z"))
    alloc = 1000 * F.col("n_h") * F.col("s_h") / F.col("z")
    return (strata.join(F.broadcast(tot))
            .select("event_type", "n_h",
                    F.round("s_h", 6).alias("s_h"),
                    F.round(alloc, 0).cast("bigint").alias("alloc"),
                    F.round(alloc / F.col("n_h"), 6)
                    .alias("sampling_rate"))
            .orderBy("event_type"))


# --- two-sample power analysis -----------------------------------------------


@query(
    "power_analysis_mde",
    oracle="""
    WITH g AS (
      SELECT event_type, count(*) AS n, avg(value) AS mean,
             stddev_samp(value) AS sd
      FROM events GROUP BY event_type)
    SELECT event_type, n, round(mean, 5) AS mean, round(sd, 5) AS sd,
           round((1.959964 + 0.841621) * sqrt(2 * sd * sd / (n / 2)), 5)
             AS mde_abs,
           round((1.959964 + 0.841621) * sqrt(2 * sd * sd / (n / 2))
                 / mean, 6) AS mde_rel
    FROM g ORDER BY event_type
    """,
)
def power_analysis_mde(spark, sf_dir):
    """Experiment power analysis: the minimum detectable effect at
    alpha=0.05 / power=0.8 for a 50/50 split of each event-type's
    traffic — MDE = (z_0.975 + z_0.8) * sqrt(2*s^2/(n/2)), the
    pre-experiment sizing check run before every A/B test.

    One aggregate pass; the z-quantiles are constants."""
    ev = t(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.avg("value").alias("mean"),
        F.stddev_samp("value").alias("sd"))
    z = 1.959964 + 0.841621
    mde = z * F.sqrt(2 * F.col("sd") * F.col("sd") / (F.col("n") / 2))
    return g.select(
        "event_type", "n", F.round("mean", 5).alias("mean"),
        F.round("sd", 5).alias("sd"),
        F.round(mde, 5).alias("mde_abs"),
        F.round(mde / F.col("mean"), 6).alias("mde_rel")).orderBy("event_type")
