"""Deduplication family for training-data pipelines.

- exact: hash-groupBy (one shuffle on the fingerprint; map-side partial agg)
- MinHash + LSH: shingle -> minhash signature -> band buckets -> bucket
  self-join. Candidate generation is linear-ish (shuffle on band keys), never
  an O(n^2) cross join — the only shape that survives 100 TB.
- SimHash: 64-bit near-dup signature; hamming-ball check on band-bucketed
  candidates.
- n-gram Jaccard: exact verify step over LSH candidate pairs only.

All signature math runs inside built-in expressions (xxhash64 + aggregate
over shingle arrays) or vectorized numpy in a pandas UDF for simhash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

from colly_spark.functions.text import fingerprint


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One survivor (min doc_id) per exact-normalized-text group."""
    return (
        docs.select("doc_id", fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("group_size"))
    )


def shingles(text_col, k: int = 3):
    """k-word shingle array (lowercased, whitespace-normalized)."""
    w = F.split(F.regexp_replace(F.lower(F.trim(text_col)), r"\s+", " "), " ")
    n = F.size(w)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n < k, F.array(F.concat_ws(" ", w))).otherwise(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)))
    )


def minhash_signature(docs: DataFrame, text_col: str = "text",
                      num_hashes: int = 32, k: int = 3) -> DataFrame:
    """doc_id -> array of num_hashes minhash values.

    h_i(s) = xxhash64(s, seed_i) via xxhash64(lit(i), shingle) — all JVM-side:
    for each permutation i, min over the shingle array (F.array_min of
    F.transform). No Python, no explode: signatures computed in one
    projection over the shingle array column.
    """
    sh = shingles(F.col(text_col), k)
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s, i=i: F.xxhash64(F.lit(i), s)))
            for i in range(num_hashes)
        ]
    )
    return docs.select("doc_id", sig.alias("sig"))


def minhash_lsh_pairs(
    docs: DataFrame,
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    k: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs (a < b) whose estimated Jaccard >= threshold.

    banding: signature split into ``bands`` rows of ``num_hashes/bands``;
    docs sharing any band-hash land in a bucket; bucket self-join yields
    candidates; estimated Jaccard = matching signature positions / total.
    """
    r = num_hashes // bands
    sigs = minhash_signature(docs, text_col, num_hashes, k).cache()
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.concat_ws(",", *[
                            F.element_at("sig", b * r + j + 1).cast("string")
                            for j in range(r)
                        ])).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .dropDuplicates(["a", "b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.lit(float(num_hashes))
    return cand.select("a", "b", est.alias("est_jaccard")).where(
        F.col("est_jaccard") >= jaccard_threshold
    )


def exact_jaccard_pairs(docs: DataFrame, pairs: DataFrame,
                        text_col: str = "text", k: int = 3) -> DataFrame:
    """Exact k-shingle Jaccard for given candidate (a,b) pairs — the verify
    step after LSH candidate generation."""
    sh = docs.select("doc_id", F.array_distinct(shingles(F.col(text_col), k)).alias("sh"))
    out = (
        pairs.join(sh.withColumnRenamed("doc_id", "a").withColumnRenamed("sh", "sh_a"), "a")
        .join(sh.withColumnRenamed("doc_id", "b").withColumnRenamed("sh", "sh_b"), "b")
        .select(
            "a", "b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).cast("double").alias("jaccard"),
        )
    )
    return out


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc: sign of per-bit sums of token hashes,
    vectorized in numpy over Arrow batches."""

    def sim_pd(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            toks = (t or "").lower().split()
            if not toks:
                continue
            import hashlib

            hs = np.frombuffer(
                b"".join(
                    hashlib.blake2b(w.encode(), digest_size=8).digest() for w in set(toks)
                ),
                dtype=np.uint64,
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
            v = np.where(bits.sum(axis=0) * 2 >= len(hs), 1, 0).astype(np.uint64)
            h = np.uint64(0)
            for b in range(64):
                h |= v[b] << np.uint64(b)
            out[i] = np.int64(h.astype(np.int64))
        return pd.Series(out)

    udf = F.pandas_udf(sim_pd, LongType())
    return docs.select("doc_id", udf(F.col(text_col)).alias("simhash"))


def embedding_neardup_pairs(emb: DataFrame, threshold: float = 0.97,
                            bits: int = 12) -> DataFrame:
    """Embedding-cosine near-dup via sign-bit LSH bucketing: docs sharing the
    sign pattern of the first ``bits`` dimensions are candidates; exact
    cosine verifies. Linear shuffle on the bucket key."""
    sig = F.aggregate(
        F.slice("embedding", 1, bits),
        F.lit(0).cast("long"),
        lambda acc, v: acc * 2 + F.when(v >= 0, 1).otherwise(0),
    )
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x))
    e = emb.select("vec_id", "embedding", sig.alias("bucket"), norm.alias("norm"))
    # single-bit multi-probe on the left side: vectors near a quantizer
    # boundary still meet their neighbors (linear (bits+1)x blowup, no O(n^2))
    flips = [0] + [1 << i for i in range(bits)]
    left = e.select(
        "vec_id", "embedding", "norm",
        F.explode(F.array(*[F.lit(x).cast("long") for x in flips])).alias("__flip"),
        F.col("bucket").alias("__b0"),
    ).select(
        F.col("vec_id").alias("a"), F.col("embedding").alias("emb_a"),
        F.col("norm").alias("norm_a"),
        F.col("__b0").bitwiseXOR(F.col("__flip")).alias("bucket"),
    )
    right = e.select(
        F.col("vec_id").alias("b"), F.col("embedding").alias("emb_b"),
        F.col("norm").alias("norm_b"), "bucket",
    )
    dot = F.aggregate(
        F.zip_with("emb_a", "emb_b", lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v
    )
    return (
        left.join(right, ["bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b", (dot / (F.col("norm_a") * F.col("norm_b"))).alias("cosine"))
        .where(F.col("cosine") >= threshold)
        .dropDuplicates(["a", "b"])
    )
