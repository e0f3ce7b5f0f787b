"""Generate sf1 testdata (10x sf0.1) for scaling validation.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md, read-only); the
100 TB design claims in the heavy pipelines' docstrings predict ~linear
scaling, and this tool produces the 10x dataset those claims are
measured against (tools/bench_scaling.py, results in BASELINE.md).

Each table is sf0.1 replicated 10x with STRUCTURE-PRESERVING
perturbations, so per-shard characteristics (duplicate clusters,
neighborhoods, join fan-outs) are exactly those of sf0.1 while the
corpus extent grows 10x — i.e. "more data", not "denser data":

* documents — doc_id offset per replica; every token of replica k>0
  gets an ``_rk`` suffix: intra-replica duplicate/overlap structure is
  bit-exact, cross-replica shingle overlap is exactly zero (vocabulary
  grows with the corpus, the Heaps-law direction), n_chars recomputed.
* embeddings — vec_id offset; replica k>0 applies a seeded PERMUTATION
  of the 64 dimensions: an isometry, so all intra-replica distances
  and neighborhoods are exactly preserved while cross-replica
  similarity collapses to chance.
* TPC-H-ish tables — bigint keys offset by replica*10^9 with join
  relationships preserved (o_custkey moves with c_custkey, lineitem
  keys with orders/part/supplier); name-ish columns get a replica
  suffix so string-match queries don't see 10 artificial twins.
  region/nation are fixed dimensions (sf-independent in TPC-H).
* events — event_id/user_id offset; timestamps kept (same window,
  10x the traffic).

Deterministic: seed 42 throughout. Output: <repo>/.testdata/sf1/.
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".testdata", "sf1")
REPLICAS = 10
OFF = 10**9  # used as {k}::BIGINT * OFF in SQL  # bigint key offset per replica
SEED = 42

ALL_TABLES = ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings")


def _union(con: duckdb.DuckDBPyConnection, per_replica_sql: str,
           out: str) -> None:
    parts = " UNION ALL ".join(
        per_replica_sql.format(k=k) for k in range(REPLICAS))
    con.sql(f"COPY ({parts}) TO '{out}' (FORMAT PARQUET)")


def gen_relational(con: duckdb.DuckDBPyConnection) -> None:
    for tbl in ("region", "nation"):
        con.sql(f"COPY (SELECT * FROM '{SRC}/{tbl}.parquet') "
                f"TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)")

    sfx = "CASE WHEN {k} = 0 THEN '' ELSE '_r{k}' END"
    _union(con, f"""
        SELECT c_custkey + {{k}}::BIGINT * {OFF} AS c_custkey,
               c_name || {sfx} AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM '{SRC}/customer.parquet'""", f"{DST}/customer.parquet")
    _union(con, f"""
        SELECT s_suppkey + {{k}}::BIGINT * {OFF} AS s_suppkey,
               s_name || {sfx} AS s_name, s_nationkey, s_acctbal
        FROM '{SRC}/supplier.parquet'""", f"{DST}/supplier.parquet")
    _union(con, f"""
        SELECT p_partkey + {{k}}::BIGINT * {OFF} AS p_partkey,
               p_name || {sfx} AS p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM '{SRC}/part.parquet'""", f"{DST}/part.parquet")
    _union(con, f"""
        SELECT o_orderkey + {{k}}::BIGINT * {OFF} AS o_orderkey,
               o_custkey + {{k}}::BIGINT * {OFF} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{SRC}/orders.parquet'""", f"{DST}/orders.parquet")
    _union(con, f"""
        SELECT l_orderkey + {{k}}::BIGINT * {OFF} AS l_orderkey,
               l_partkey + {{k}}::BIGINT * {OFF} AS l_partkey,
               l_suppkey + {{k}}::BIGINT * {OFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{SRC}/lineitem.parquet'""", f"{DST}/lineitem.parquet")
    _union(con, f"""
        SELECT event_id + {{k}}::BIGINT * {OFF} AS event_id, ts,
               user_id + {{k}}::BIGINT * {OFF} AS user_id,
               event_type, value, props
        FROM '{SRC}/events.parquet'""", f"{DST}/events.parquet")


def gen_documents(con: duckdb.DuckDBPyConnection) -> None:
    # token suffix per replica: '\S+' -> '\0_rk' (replica 0 unchanged)
    parts = []
    for k in range(REPLICAS):
        if k == 0:
            parts.append(f"SELECT doc_id, text, lang, source, n_chars "
                         f"FROM '{SRC}/documents.parquet'")
        else:
            parts.append(f"""
                SELECT doc_id + {k}::BIGINT * {OFF} AS doc_id,
                       regexp_replace(text, '(\\S+)', '\\1_r{k}', 'g')
                           AS text,
                       lang, source,
                       length(regexp_replace(text, '(\\S+)',
                              '\\1_r{k}', 'g'))::BIGINT AS n_chars
                FROM '{SRC}/documents.parquet'""")
    con.sql(f"COPY ({' UNION ALL '.join(parts)}) "
            f"TO '{DST}/documents.parquet' (FORMAT PARQUET)")


def gen_embeddings() -> None:
    src = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = src.column("vec_id").to_numpy()
    label = src.column("label").to_numpy()
    emb = np.asarray(src.column("embedding").to_pylist(), dtype=np.float32)
    dim = emb.shape[1]
    rng = np.random.default_rng(SEED)
    out_ids, out_lab, out_emb = [], [], []
    for k in range(REPLICAS):
        perm = np.arange(dim) if k == 0 else rng.permutation(dim)
        out_ids.append(vec_id + k * OFF)
        out_lab.append(label)
        out_emb.append(emb[:, perm])
    ids = np.concatenate(out_ids)
    labs = np.concatenate(out_lab)
    vecs = np.concatenate(out_emb)
    table = pa.table({
        "vec_id": pa.array(ids, type=pa.int64()),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
        "label": pa.array(labs, type=pa.int32()),
    })
    pq.write_table(table, f"{DST}/embeddings.parquet")


def main() -> None:
    # parameterized (VERDICT r3 item 7): --replicas 30 --dst .testdata/sf3
    # --tables documents generates the 30x documents corpus the sf3
    # scaling rows of the two data-bound pipelines are measured on,
    # with the same structure-preserving perturbation scheme
    global REPLICAS, DST
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=REPLICAS)
    ap.add_argument("--dst", default=DST)
    ap.add_argument("--tables", default=",".join(ALL_TABLES),
                    help="comma-separated subset to generate")
    args = ap.parse_args()
    REPLICAS = args.replicas
    DST = args.dst
    tables = [t for t in args.tables.split(",") if t]
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    if any(t in tables for t in ALL_TABLES[:8]):
        gen_relational(con)
    if "documents" in tables:
        gen_documents(con)
    if "embeddings" in tables:
        gen_embeddings()
    for tbl in tables:
        p = f"{DST}/{tbl}.parquet"
        if os.path.exists(p):
            n = con.sql(f"SELECT count(*) FROM '{p}'").fetchone()[0]
            print(f"{tbl}: {n}")
    print(f"{REPLICAS}x replica data written to {DST}")


if __name__ == "__main__":
    sys.exit(main())
