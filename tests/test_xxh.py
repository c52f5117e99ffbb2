"""colly_spark.xxh must match Spark's F.xxhash64 bit-for-bit — the simulator
and the golden oracles derive engine-equal hashes from it."""

import random

from pyspark.sql import functions as F

from colly_spark import xxh


def test_matches_spark_strings_binaries_longs(spark):
    rng = random.Random(7)
    rows = []
    for i in range(64):
        s = "".join(chr(rng.randrange(32, 0x2FF)) for _ in range(rng.randrange(0, 40)))
        b = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 64)))
        l = rng.randrange(-(2**63), 2**63)
        rows.append((i, s, b, l))
    df = spark.createDataFrame(rows, "i int, s string, b binary, l long")
    got = {
        r["i"]: (r["hs"], r["hb"], r["hl"], r["hc"])
        for r in df.select(
            "i",
            F.xxhash64("s").alias("hs"),
            F.xxhash64("b").alias("hb"),
            F.xxhash64("l").alias("hl"),
            F.xxhash64("s", "b", "l").alias("hc"),
        ).collect()
    }
    for i, s, b, l in rows:
        assert got[i][0] == xxh.spark_xxhash64(s), f"string lane i={i}"
        assert got[i][1] == xxh.spark_xxhash64(b), f"binary lane i={i}"
        assert got[i][2] == xxh.spark_xxhash64(l), f"long lane i={i}"
        assert got[i][3] == xxh.spark_xxhash64(s, b, l), f"folded i={i}"


def test_null_lanes_and_int_lanes(spark):
    """IntegerType lanes hash via hashInt (I32 marker), null lanes are
    skipped — exactly Catalyst's HashExpression behavior."""
    df = spark.createDataFrame([(1, None, 7), (2, "x", None)], "i long, s string, n int")
    rows = {r["i"]: r["h"] for r in df.select("i", F.xxhash64("s", "n").alias("h")).collect()}
    assert rows[1] == xxh.spark_xxhash64(None, xxh.I32(7))
    assert rows[2] == xxh.spark_xxhash64("x", None)
    lit = df.select(F.xxhash64(F.lit(42), F.col("i").cast("long")).alias("h"), "i").collect()
    for r in lit:
        assert r["h"] == xxh.spark_xxhash64(xxh.I32(42), r["i"])


def test_request_hash_matches_engine_formula(spark):
    cases = [("http://a.test/", None), ("http://a.test/p?q=1", b"name=x")]
    df = spark.createDataFrame(cases, "u string, b binary").select(
        "u",
        F.xxhash64(F.coalesce("u", F.lit("")), F.coalesce("b", F.lit(b""))).alias("h"),
    )
    got = {r["u"]: r["h"] for r in df.collect()}
    for u, b in cases:
        assert got[u] == xxh.request_hash(u, b)
