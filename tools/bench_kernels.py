#!/usr/bin/env python
"""Micro-bench: JVM higher-order-function folds vs numpy-over-Arrow kernels.

Anchors the measured numbers cited in colly_spark/functions/dedup.py — the
SimHash majority-vote bit pack (and the MinHash lane fold) are the only
Python kernels in the dedup family, kept because a pure-JVM higher-order
aggregate evaluates ~64 interpreted ops per array element:

    $ python tools/bench_kernels.py           # uses $SPARK_GRAFT_SF_DIR
      simhash_jvm_fold      3.1s   <- one F.aggregate, 64-wide accumulator
      simhash_numpy_pack    0.6s   <- JVM xxhash64 + numpy bit-count pack

Numbers vary with host conditions (see BENCH/BASELINE.md on steal); the
RATIO is the stable finding.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def simhash_jvm_fold(docs, text_col="text"):
    """The all-JVM form replaced in round 3 (kept here for comparison)."""
    from pyspark.sql import functions as F

    toks = F.array_distinct(
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
            lambda t: t != "",
        )
    )
    hashed = F.transform(toks, lambda t: F.xxhash64(t))
    counts = F.aggregate(
        hashed,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(*[F.shiftrightunsigned(h, i).bitwiseAND(F.lit(1)) for i in range(64)]),
            lambda a, b: a + b,
        ),
    )
    n = F.size(hashed)
    row = docs.select("doc_id", counts.alias("__c"), n.alias("__n"))
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig.bitwiseOR(
            F.when(
                F.element_at("__c", i + 1) * 2 >= F.col("__n"),
                F.lit(1 << i if i < 63 else -(1 << 63)).cast("long"),
            ).otherwise(F.lit(0).cast("long"))
        )
    return row.select("doc_id", sig.alias("simhash"))


def minhash_jvm_fold(docs, text_col="text", num_hashes=32, k=3):
    """Round-3's all-JVM minhash: xxhash64(lit(i), s) per lane per shingle
    (replaced in round 4 by one base hash + numpy multiply-shift lanes)."""
    from pyspark.sql import functions as F

    from colly_spark.functions.dedup import shingles

    shingled = docs.select("doc_id", shingles(F.col(text_col), k).alias("__sh"))
    lanes = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    sig = F.aggregate(
        "__sh",
        F.array_repeat(F.lit((1 << 63) - 1).cast("long"), num_hashes),
        lambda acc, s: F.zip_with(
            acc,
            F.transform(lanes, lambda i: F.xxhash64(i, s)),
            lambda a, b: F.least(a, b),
        ),
    )
    return shingled.select("doc_id", sig.alias("sig"))


def main() -> None:
    from colly_spark.functions.dedup import minhash_signature, simhash64
    from colly_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session("kernel-bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).persist()
    docs.count()

    def timed(name, df):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        print(f"{name:28s} {time.time() - t0:6.2f}s")

    # warm the Python-worker pool outside the timed region (first pandas_udf
    # of a session pays ~3.5s worker startup)
    simhash64(docs.limit(8)).write.format("noop").mode("overwrite").save()

    timed("simhash_jvm_fold", simhash_jvm_fold(docs))
    timed("simhash_numpy_pack", simhash64(docs))
    timed("minhash_jvm_fold", minhash_jvm_fold(docs))
    timed("minhash_numpy_lanes", minhash_signature(docs))
    spark.stop()


if __name__ == "__main__":
    main()
