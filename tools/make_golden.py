"""Golden-parquet oracles for the two seeded-hash queries DuckDB cannot
express (q_minhash_neardup, q_simhash).

Computed by an INDEPENDENT pure-Python implementation: parquet read via
pyarrow, hashing via colly_spark.xxh (a from-spec xxHash64 reimplementation
validated against Spark in tests/test_xxh.py), signature/banding math in
plain Python — no SparkSession anywhere in this file, so a Spark-side bug
cannot leak into its own oracle. The driver's DuckDB then reads the golden
file (oracle_sql uses read_parquet) and hash-compares it against the Spark
result, closing the `no_oracle` gap from round 1.

Run:  python tools/make_golden.py [sf_dir ...]   (default /root/testdata/sf0.01)
Writes golden/q_minhash_neardup.<sfname>.parquet and
       golden/q_simhash.<sfname>.parquet under the repo root.

Must mirror colly_spark/functions/dedup.py exactly:
- simhash_col: distinct lowercase whitespace tokens, one xxhash64 per
  token, per-bit majority vote (2*cnt >= n), empty -> 0;
- minhash_lsh_pairs: 3-word shingles over whitespace-normalized lowercase
  text, sig_i = min_s xxhash64(lit(i), s) (signed min), 8 bands x 4 rows,
  bucket = xxhash64(comma-joined signed decimal strings), buckets > 256
  dropped, est_jaccard = matching positions / 32 >= 0.8.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from colly_spark import xxh  # noqa: E402

NUM_HASHES = 32
BANDS = 8
K = 3
THRESHOLD = 0.8
MAX_BUCKET = 256
MASK64 = (1 << 64) - 1


def to_signed(u: int) -> int:
    u &= MASK64
    return u - (1 << 64) if u >= (1 << 63) else u


def simhash(text: str | None) -> int:
    toks = [t for t in re.split(r"\s+", (text or "").lower()) if t != ""]
    toks = list(dict.fromkeys(toks))  # array_distinct
    if not toks:
        return 0
    hs = [xxh.spark_xxhash64(t) & MASK64 for t in toks]
    n = len(hs)
    sim = 0
    for i in range(64):
        cnt = sum((h >> i) & 1 for h in hs)
        if 2 * cnt >= n:
            sim |= 1 << i
    return to_signed(sim)


def shingles(text: str | None, k: int = K) -> list[str]:
    w = re.sub(r"\s+", " ", (text or "").strip().lower()).split(" ")
    if len(w) < k:
        return [" ".join(w)]
    return [" ".join(w[i:i + k]) for i in range(len(w) - k + 1)]


def minhash_sig(text: str | None) -> list[int]:
    sh = shingles(text)
    # seed lane folds left exactly like F.xxhash64(lit(i), s): int lane
    # first, then the shingle's string lane with the running hash as seed
    sig = []
    for i in range(NUM_HASHES):
        # F.lit(i) is an IntegerType literal -> hashInt lane
        seed_i = xxh.hash_int(i, xxh.SPARK_SEED)
        sig.append(min(to_signed(xxh.hash_bytes(s.encode("utf-8"), seed_i)) for s in sh))
    return sig


def minhash_pairs(docs: list[tuple[int, str]]) -> list[tuple[int, int, float]]:
    r = NUM_HASHES // BANDS
    sigs = {d: minhash_sig(t) for d, t in docs}
    buckets: dict[tuple[int, int], list[int]] = {}
    for d, _ in docs:
        sig = sigs[d]
        for b in range(BANDS):
            key_str = ",".join(str(sig[b * r + j]) for j in range(r))
            bucket = xxh.spark_xxhash64(key_str)
            buckets.setdefault((b, bucket), []).append(d)
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if MAX_BUCKET and len(members) > MAX_BUCKET:
            continue  # mega-bucket cap, same rule as the Spark side
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cand.add((ms[i], ms[j]))
    out = []
    for a, b in sorted(cand):
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / float(NUM_HASHES)
        if est >= THRESHOLD:
            out.append((a, b, est))
    return out


def main(sf_dirs: list[str]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    outdir = os.path.join(repo, "golden")
    os.makedirs(outdir, exist_ok=True)
    for sf_dir in sf_dirs:
        sfname = os.path.basename(sf_dir.rstrip("/"))
        tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                            columns=["doc_id", "text"])
        docs = sorted(zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()))

        sim_rows = [(d, simhash(t)) for d, t in docs]
        pq.write_table(
            pa.table(
                {"doc_id": [r[0] for r in sim_rows],
                 "simhash": [r[1] for r in sim_rows]},
                schema=pa.schema([("doc_id", pa.int64()), ("simhash", pa.int64())]),
            ),
            os.path.join(outdir, f"q_simhash.{sfname}.parquet"),
        )

        pairs = minhash_pairs(docs)
        pq.write_table(
            pa.table(
                {"a": [p[0] for p in pairs], "b": [p[1] for p in pairs],
                 "est_jaccard": [p[2] for p in pairs]},
                schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                  ("est_jaccard", pa.float64())]),
            ),
            os.path.join(outdir, f"q_minhash_neardup.{sfname}.parquet"),
        )
        print(f"{sfname}: {len(sim_rows)} simhash rows, {len(pairs)} minhash pairs")


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    main(dirs)
