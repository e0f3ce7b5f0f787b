"""Scale-validate the round-9/10 raw-file paths (VERDICT r9 #5):

* a GZIPPED text corpus (codec decompression in the cached text
  source) at 1x and 10x file count — scan time should scale with
  BYTES across fixed parallelism (ratio ~<= 10), since each member is
  one task and members decompress independently;
* a PACKED small-file tree (round-9 bin-packing) at 1x and 10x file
  count — planned task count must stay ~parallelism-sized (NOT file
  count), and scan time must scale with bytes, not per-file
  scheduling overhead.

Builds its fixtures under a temp dir, prints one JSON line, paste
table to stderr. Runs cold (fresh cache dir per scale) then warm.
"""

from __future__ import annotations

import gzip
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_gz_corpus(root: str, n_files: int, lines_per_file: int):
    os.makedirs(root, exist_ok=True)
    for i in range(n_files):
        body = b"".join(b"doc-%d-%d some tokenized text payload\n"
                        % (i, j) for j in range(lines_per_file))
        with open(os.path.join(root, f"part-{i:05d}.txt.gz"),
                  "wb") as f:
            f.write(gzip.compress(body, compresslevel=1))


def build_small_tree(root: str, n_files: int, size: int):
    os.makedirs(root, exist_ok=True)
    blob = b"\x89PNG-ish" + b"\xab" * (size - 8)
    for i in range(n_files):
        with open(os.path.join(root, f"obj-{i:06d}.bin"), "wb") as f:
            f.write(blob)


def main() -> int:
    import pyspark.sql.functions as F
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("sidecar-rawfile-scaling")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from sidecar_spark.config import SidecarConfig
    from sidecar_spark.engine import Engine

    base = tempfile.mkdtemp(prefix="rawscale-")
    out = {}
    try:
        # warmup: absorb JVM + Python-source first-use latency so the
        # 1x cold numbers measure the scan, not session spin-up
        wroot = os.path.join(base, "warm", "a")
        build_gz_corpus(wroot, 2, 100)
        build_small_tree(os.path.join(base, "warm", "b"), 4, 256)
        weng = Engine(spark, conf=SidecarConfig.create(
            cache_dir=os.path.join(base, "cache_warm"),
            data_cache_type="file", cache_persistent=False,
            resolve_mode="executor"))
        weng.read_format(wroot, "text").count()
        weng.read_format(os.path.join(base, "warm", "b"),
                         "binaryFile").count()
        # --- gz corpus: 40 -> 400 members, same member size
        for label, n in (("gz_1x", 40), ("gz_10x", 400)):
            root = os.path.join(base, label)
            build_gz_corpus(root, n, 20000)
            eng = Engine(spark, conf=SidecarConfig.create(
                cache_dir=os.path.join(base, "cache_" + label),
                data_cache_type="file", cache_persistent=False,
                resolve_mode="executor"))
            df = eng.read_format(root, "text")
            t0 = time.monotonic()
            rows = df.agg(F.count(F.lit(1)),
                          F.sum(F.length("value"))).collect()
            cold = time.monotonic() - t0
            t0 = time.monotonic()
            df.agg(F.count(F.lit(1))).collect()
            warm = time.monotonic() - t0
            out[label] = {"files": n, "cold_s": round(cold, 2),
                          "warm_s": round(warm, 2),
                          "tasks": df.rdd.getNumPartitions(),
                          "rows": rows[0][0]}
            print(f"{label}: files={n} cold={cold:.2f}s "
                  f"warm={warm:.2f}s tasks={out[label]['tasks']}",
                  file=sys.stderr)
        out["gz_ratio_cold"] = round(
            out["gz_10x"]["cold_s"] / out["gz_1x"]["cold_s"], 2)

        # --- packed small files: 2k -> 20k objects of 1 KiB
        for label, n in (("pack_1x", 2000), ("pack_10x", 20000)):
            root = os.path.join(base, label)
            build_small_tree(root, n, 1024)
            eng = Engine(spark, conf=SidecarConfig.create(
                cache_dir=os.path.join(base, "cache_" + label),
                data_cache_type="file", cache_persistent=False,
                resolve_mode="executor"))
            df = eng.read_format(root, "binaryFile")
            t0 = time.monotonic()
            rows = df.agg(F.count(F.lit(1)),
                          F.sum(F.length("content"))).collect()
            cold = time.monotonic() - t0
            t0 = time.monotonic()
            df.agg(F.sum(F.length("content"))).collect()
            warm = time.monotonic() - t0
            out[label] = {"files": n, "cold_s": round(cold, 2),
                          "warm_s": round(warm, 2),
                          "tasks": df.rdd.getNumPartitions(),
                          "rows": rows[0][0]}
            print(f"{label}: files={n} cold={cold:.2f}s "
                  f"warm={warm:.2f}s tasks={out[label]['tasks']}",
                  file=sys.stderr)
        out["pack_ratio_cold"] = round(
            out["pack_10x"]["cold_s"] / out["pack_1x"]["cold_s"], 2)
        out["pack_tasks_flat"] = (
            out["pack_10x"]["tasks"]
            <= max(64, 4 * out["pack_1x"]["tasks"]))
        print(json.dumps({"metric": "rawfile_scaling", **out}))
        return 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
