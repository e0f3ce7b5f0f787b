"""Round-11 optimization value pins.

Every rewrite this round is evaluation-count plumbing (let1 bindings,
pre-bound norms, persist/observe placement) — values must be
bit-identical to the naive formulation.  These tests pin that:

* pq cell struct (bound sub/dists) == unbound reference
* int8 quantization mse (bound v/lo/hi) == unbound reference
* argmin-over-dists binding == unbound reference (kmeans/semdedup shape)
* pre-bound-norm cosine == functions.similarity.cosine per pair
* connected components via the observe-fused signature gate
  (chain / clique / isolated / empty) — exercised through the public
  entry point, which now folds the fixpoint signature into the
  checkpoint job
"""

import math

import pytest
from pyspark.sql import functions as F

from sidecar_spark.functions import similarity as S
from sidecar_spark.functions.dedup import connected_components_star, let1


@pytest.fixture(scope="module")
def vec_df(spark):
    rows = [
        (0, [float((i * 7 + 3) % 13) - 6.0 for i in range(16)]),
        (1, [float((i * 5 + 1) % 11) - 5.0 for i in range(16)]),
        (2, [0.25 * i for i in range(16)]),
        (3, [0.0] * 16),                      # constant vector: hi == lo
        (4, [-1.5] * 8 + [2.5] * 8),
    ]
    return spark.createDataFrame(rows, "vec_id bigint, v array<double>")


class TestLet1SweepR11:
    def test_pq_cell_binding_identity(self, vec_df):
        cb = [[float((c * 3 + i) % 5) - 2.0 for i in range(16)]
              for c in range(4)]

        def dists_unbound(sub):
            return F.array(*[
                F.aggregate(
                    F.zip_with(sub, F.array(*[F.lit(cv[i]) for i in range(8)]),
                               lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, x: acc + x)
                for cv in cb])

        def cell_unbound(s):
            sub = F.slice("v", s * 8 + 1, 8)
            dists = dists_unbound(sub)
            code = F.array_position(dists, F.array_min(dists)) - 1
            return F.struct(F.lit(s).alias("subspace"),
                            code.cast("bigint").alias("code"),
                            F.element_at(dists, code.cast("int") + 1)
                            .alias("sqd"))

        def cell_bound(s):
            def pick(dists):
                code = F.array_position(dists, F.array_min(dists)) - 1
                return F.struct(F.lit(s).alias("subspace"),
                                code.cast("bigint").alias("code"),
                                F.element_at(dists, code.cast("int") + 1)
                                .alias("sqd"))
            return let1(let1(F.slice("v", s * 8 + 1, 8), dists_unbound),
                        pick)

        got = vec_df.select(
            "vec_id", *[cell_bound(s).alias(f"c{s}") for s in range(2)]
        ).orderBy("vec_id").collect()
        want = vec_df.select(
            "vec_id", *[cell_unbound(s).alias(f"c{s}") for s in range(2)]
        ).orderBy("vec_id").collect()
        assert got == want

    def test_int8_mse_binding_identity(self, vec_df):
        dim = 16

        def mse_unbound():
            v = F.col("v")
            lo, hi = F.array_min(v), F.array_max(v)
            scale = (hi - lo) / 255.0
            dq = F.transform(
                v, lambda x: lo + F.round((x - lo) / (hi - lo) * 255.0)
                * scale)
            err2 = F.when(hi == lo, F.lit(0.0)).otherwise(
                F.aggregate(F.zip_with(dq, v, lambda a, b: (a - b) * (a - b)),
                            F.lit(0.0), lambda acc, e: acc + e))
            return err2 / dim

        def mse_bound():
            def of_v(vv):
                def with_range(mm):
                    lo, hi = mm["lo"], mm["hi"]
                    scale = (hi - lo) / 255.0
                    dq = F.transform(
                        vv, lambda x: lo + F.round((x - lo) / (hi - lo)
                                                   * 255.0) * scale)
                    err2 = F.when(hi == lo, F.lit(0.0)).otherwise(
                        F.aggregate(
                            F.zip_with(dq, vv, lambda a, b: (a - b) * (a - b)),
                            F.lit(0.0), lambda acc, e: acc + e))
                    return err2 / dim
                return let1(F.struct(F.array_min(vv).alias("lo"),
                                     F.array_max(vv).alias("hi")),
                            with_range)
            return let1(F.col("v"), of_v)

        got = vec_df.select("vec_id", mse_bound().alias("m")) \
            .orderBy("vec_id").collect()
        want = vec_df.select("vec_id", mse_unbound().alias("m")) \
            .orderBy("vec_id").collect()
        assert got == want
        # the constant vector must hit the hi == lo branch exactly
        assert got[3]["m"] == 0.0

    def test_argmin_dists_binding_identity(self, vec_df):
        cents = [[float((c + i) % 7) for i in range(16)] for c in range(4)]

        def sqd(cv):
            return F.aggregate(
                F.zip_with("v", F.array(*[F.lit(x) for x in cv]),
                           lambda x, y: (x - y) * (x - y)),
                F.lit(0.0), lambda acc, x: acc + x)

        dists = F.array(*[sqd(c) for c in cents])
        unbound = (F.array_position(dists, F.array_min(dists)) - 1
                   ).cast("int")
        bound = let1(dists, lambda dd: (
            F.array_position(dd, F.array_min(dd)) - 1).cast("int"))
        got = vec_df.select("vec_id", bound.alias("cid")) \
            .orderBy("vec_id").collect()
        want = vec_df.select("vec_id", unbound.alias("cid")) \
            .orderBy("vec_id").collect()
        assert got == want


class TestPreboundNormCosine:
    def test_cosine_identity(self, spark, vec_df):
        a = vec_df.select(F.col("vec_id").alias("ia"),
                          F.col("v").alias("va"))
        b = vec_df.select(F.col("vec_id").alias("ib"),
                          F.col("v").alias("vb"))
        pairs = a.crossJoin(b)
        naive = pairs.select(
            "ia", "ib", S.cosine(F.col("va"), F.col("vb")).alias("c")) \
            .orderBy("ia", "ib").collect()
        prebound = (
            pairs
            .withColumn("na", S.norm(F.col("va")))
            .withColumn("nb", S.norm(F.col("vb"))))
        denom = F.col("na") * F.col("nb")
        cos = F.when(denom == 0, F.lit(0.0)).otherwise(
            S.dot(F.col("va"), F.col("vb")) / denom)
        got = prebound.select("ia", "ib", cos.alias("c")) \
            .orderBy("ia", "ib").collect()
        assert got == naive
        # zero-norm row must hit the guard in both forms
        zrow = [r for r in got if r["ia"] == 3]
        assert all(r["c"] == 0.0 for r in zrow)

    def test_literal_query_norm_matches_fold(self, spark):
        # hybrid_search_rrf precomputes the query norm driver-side with
        # math.fsum-free sequential accumulation; must equal the JVM fold
        q = [float((i * 7 + 3) % 13) - 6.0 for i in range(16)]
        acc = 0.0
        for x in q:
            acc += x * x
        py_norm = math.sqrt(acc)
        df = spark.range(1).select(
            S.norm(F.array(*[F.lit(x) for x in q])).alias("n"))
        assert df.first()["n"] == py_norm


class TestConnectedComponentsObserveGate:
    def _cc(self, spark, edges, node_ids):
        e = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint") \
            if edges else spark.createDataFrame([], "doc_a bigint, doc_b bigint")
        n = spark.createDataFrame([(i,) for i in node_ids], "doc_id bigint")
        out = connected_components_star(e, n)
        return {r["doc_id"]: r["cluster_id"] for r in out.collect()}

    def test_chain(self, spark):
        got = self._cc(spark, [(i, i + 1) for i in range(20)], range(21))
        assert got == {i: 0 for i in range(21)}

    def test_clique_plus_isolated(self, spark):
        edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
        got = self._cc(spark, edges, list(range(5)) + [99])
        want = {i: 0 for i in range(5)}
        want[99] = 99
        assert got == want

    def test_two_components(self, spark):
        got = self._cc(spark, [(1, 2), (2, 3), (10, 11)],
                       [1, 2, 3, 10, 11])
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_empty_edges(self, spark):
        got = self._cc(spark, [], [7, 8])
        assert got == {7: 7, 8: 8}
