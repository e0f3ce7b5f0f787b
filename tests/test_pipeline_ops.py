"""Known-answer tests for the reusable pipeline operators
(functions/graph.py, functions/text.py::bpe_train,
functions/similarity.py::mips_topk) on hand-built fixtures — the
battery checks these against DuckDB at corpus scale; here the expected
output is computed BY HAND, so a matched pair of Spark/DuckDB bugs
cannot hide."""

from __future__ import annotations


class TestGraphOps:
    def test_pagerank_two_cycle_is_uniform(self, spark):
        from sidecar_spark.functions import graph as G

        edges = spark.createDataFrame(
            [(0, 1, 1), (1, 0, 1)], "src int, dst int, w long")
        pr = {r["node"]: r["pr"]
              for r in G.pagerank(edges, iters=4).collect()}
        # the uniform vector is the fixed point of a symmetric cycle
        assert abs(pr[0] - 0.5) < 1e-12
        assert abs(pr[1] - 0.5) < 1e-12

    def test_label_propagation_respects_weak_bridge(self, spark):
        from sidecar_spark.functions import graph as G

        # two weight-10 triangles joined by a weight-1 bridge (2-3):
        # labels must never cross the bridge (within-clique incident
        # weight 20 always beats the bridge's 1)
        tri1 = [(0, 1, 10), (0, 2, 10), (1, 2, 10)]
        tri2 = [(3, 4, 10), (3, 5, 10), (4, 5, 10)]
        edges = spark.createDataFrame(
            tri1 + tri2 + [(2, 3, 1)], "u int, v int, w long")
        labels = {r["node"]: r["lbl"]
                  for r in G.label_propagation(edges, iters=3).collect()}
        left = {labels[n] for n in (0, 1, 2)}
        right = {labels[n] for n in (3, 4, 5)}
        assert left.isdisjoint(right)
        # deterministic: a second run reproduces the exact labels
        again = {r["node"]: r["lbl"]
                 for r in G.label_propagation(edges, iters=3).collect()}
        assert again == labels


class TestBpeTrain:
    def test_hand_computed_merges(self, spark):
        from sidecar_spark.functions.text import bpe_train

        # vocab {aaab:3, ab:2}:
        #   iter1 pairs: (a,a) 3*2=6 beats (a,b) 3+2=5 -> merge (a,a)
        #     greedy left-to-right: aaab -> [aa, a, b]  (NOT [a, aa, b])
        #   iter2: (aa,a) 3 vs (a,b) 5 -> merge (a,b)
        #   iter3: (aa,ab) 3
        vocab = spark.createDataFrame(
            [("aaab", 3), ("ab", 2)], "w string, cnt long")
        got = [(r["merge_rank"], r["sym_a"], r["sym_b"], r["pair_count"])
               for r in bpe_train(vocab, iters=3)
               .orderBy("merge_rank").collect()]
        assert got == [(1, "a", "a", 6), (2, "a", "b", 5),
                       (3, "aa", "ab", 3)]


class TestMipsTopk:
    def test_ranks_by_dot_not_cosine(self, spark):
        from sidecar_spark.functions.similarity import mips_topk

        # v1=[1,1]: dot=1.0, cos~0.707; v2=[0.9,0]: dot=0.9, cos=1.0
        # cosine would rank v2 first; MIPS must rank v1 first
        corpus = spark.createDataFrame(
            [(1, [1.0, 1.0]), (2, [0.9, 0.0])],
            "vec_id long, embedding array<double>")
        queries = spark.createDataFrame(
            [(100, [1.0, 0.0])],
            "query_id long, embedding array<double>")
        got = [(r["rk"], r["vec_id"], r["dot_score"])
               for r in mips_topk(corpus, queries, k=2).collect()]
        assert got == [(1, 1, 1.0), (2, 2, 0.9)]


class TestSimhashBands:
    def test_band_candidates_cover_all_close_pairs(self, spark):
        """Pigeonhole: any pair within hamming distance 3 of a 32-bit
        simhash differs in <=3 of the 4 bytes, so at least one byte
        band matches — the band equi-join may not MISS such a pair."""
        from pyspark.sql import functions as F

        from sidecar_spark.functions import dedup as D

        texts = [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "the quick brown fox leaps over the lazy dog",
            "completely different content about spark engines",
            "completely different content about spark engine",
            "unrelated third topic entirely separate words",
        ]
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(texts)], "doc_id long, text string")
        sigs = df.select("doc_id",
                         D.simhash(F.col("text"), bits=32).alias("sh"))
        rows = {r["doc_id"]: r["sh"] for r in sigs.collect()}
        close = {(a, b) for a in rows for b in rows if a < b
                 and bin(rows[a] ^ rows[b]).count("1") <= 3}
        banded = sigs.select(
            "doc_id", "sh",
            F.posexplode(F.array(*[
                F.shiftright("sh", 8 * b).bitwiseAND(F.lit(255))
                for b in range(4)])).alias("band_idx", "bv"))
        a, b = banded.alias("a"), banded.alias("b")
        cands = {(r["doc_a"], r["doc_b"]) for r in (
            a.join(b, (F.col("a.band_idx") == F.col("b.band_idx"))
                   & (F.col("a.bv") == F.col("b.bv"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct().collect())}
        assert close, "fixture should contain at least one close pair"
        assert close <= cands
