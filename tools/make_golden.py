"""Golden-parquet oracles for the queries DuckDB cannot express
(q_minhash_neardup, q_simhash, q_video_features, q_audio_features).

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
- minhash_lsh_pairs: words = whitespace-normalized lowercase tokens, one
  xxhash64 per TOKEN; the 3-token shingle hash is the polynomial window
  combine s_j = ((h_j*A + h_{j+1})*A + h_{j+2}) mod 2^64 with the odd
  golden-ratio constant A (dedup.SHINGLE_POLY_A; <3 tokens -> one window
  over all); lane i = min_j (a_i * s_j + b_i) mod 2^64 (UNSIGNED min,
  stored signed) with the splitmix64-derived multiply-shift constants of
  dedup.minhash_lane_constants (re-derived here from the spec, not
  imported); 8 bands x 4 rows, bucket = xxhash64(comma-joined signed
  decimal strings), buckets > 256 dropped, est_jaccard = matching
  positions / 32 >= 0.8.
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


def _splitmix64(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & MASK64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK64
    return x ^ (x >> 31)


# multiply-shift lane constants per the spec in dedup.minhash_lane_constants
# (derived here independently — this file imports no dedup code)
LANE_A = [_splitmix64(2 * i) | 1 for i in range(NUM_HASHES)]
LANE_B = [_splitmix64(2 * i + 1) for i in range(NUM_HASHES)]
POLY_A = 0x9E3779B97F4A7C15  # dedup.SHINGLE_POLY_A (odd golden ratio)


def minhash_sig(text: str | None) -> list[int]:
    # one xxhash64 per TOKEN; k-token shingle hash = polynomial window
    # combine; per lane the unsigned min of the multiply-shift mix,
    # stored as Spark's signed long
    w = re.sub(r"\s+", " ", (text or "").strip().lower()).split(" ")
    hs = [xxh.spark_xxhash64(t) & MASK64 for t in w]
    m = min(K, len(hs))
    windows = []
    for j in range(len(hs) - m + 1):
        s = 0
        for x in hs[j:j + m]:
            s = (s * POLY_A + x) & MASK64
        windows.append(s)
    return [
        to_signed(min(((LANE_A[i] * s) + LANE_B[i]) & MASK64 for s in windows))
        for i in range(NUM_HASHES)
    ]


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


# ---------------------------------------------------------------------------
# q_video_features / q_audio_features goldens (VERDICT r4 item 3).
#
# The driver-gate payloads are PURE functions of doc_id
# (__spark_entry__.q_video_features / q_audio_features synthesize them
# deterministically), so the expected feature rows are computable here
# without Spark and without importing colly_spark.functions: re-synthesize
# the same Y4M/WAV streams from the spec and decode them with independent
# numpy code (BT.601 limited-range YUV->RGB; wave-format PCM scaling). The
# float expressions mirror the engine's documented formulas — identical
# numpy dtypes/ops so the round(x, 6) results match bit-for-bit.
# ---------------------------------------------------------------------------


def video_feature_row(doc_id: int) -> tuple:
    import zlib

    import numpy as np

    h = zlib.crc32(str(doc_id).encode())
    w, ht, n = 8, 6, 1 + h % 5
    # BT.601 limited-range, neutral chroma (U=V=128): R=G=B=clip(1.164*(Y-16));
    # array (not scalar) float32 math so numpy promotion matches the decoder
    yplane = np.full((ht, w), h % 200, dtype=np.uint8)
    c = np.clip(1.164 * (yplane.astype(np.float32) - 16.0), 0, 255).astype(np.uint8)
    frame = np.stack([c, c, c], axis=-1)
    luma = float(
        (0.299 * frame[..., 0] + 0.587 * frame[..., 1] + 0.114 * frame[..., 2]).mean()
    )
    n_sampled = (n + 1) // 2  # sample_every=2: frames 0,2,4,...
    fps = 25.0
    return (
        f"vid-{doc_id}", True, w, ht, round(fps, 6), n,
        round(n / fps, 6), n_sampled,
        round(float(np.mean([luma] * n_sampled)), 6),
    )


def audio_feature_row(doc_id: int) -> tuple:
    import zlib

    import numpy as np

    h = zlib.crc32(str(doc_id).encode())
    n, amp = 400 + h % 400, 0.1 + (h % 8) / 10.0
    t = np.arange(n)
    pcm = (amp * 32767 * np.sin(t / (3 + h % 7))).astype("<i2")
    samples = (pcm.astype(np.float32) / 32768.0).reshape(-1, 1)
    return (
        f"aud-{doc_id}", True, 8000, 1, n,
        round(n / 8000, 6),
        round(float(np.sqrt((samples ** 2).mean())), 6),
        round(float(np.abs(samples).max()), 6),
    )


def write_multimodal_goldens(outdir: str, sfname: str, doc_ids: list[int]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = sorted(doc_ids)[:64]  # the driver queries take the first 64 by doc_id
    vrows = [video_feature_row(d) for d in ids]
    pq.write_table(
        pa.table(
            {k: [r[i] for r in vrows] for i, k in enumerate(
                ["video_id", "decode_ok", "w", "h", "fps", "n_frames",
                 "duration_s", "n_sampled", "mean_luma"])},
            schema=pa.schema([
                ("video_id", pa.string()), ("decode_ok", pa.bool_()),
                ("w", pa.int32()), ("h", pa.int32()), ("fps", pa.float64()),
                ("n_frames", pa.int64()), ("duration_s", pa.float64()),
                ("n_sampled", pa.int64()), ("mean_luma", pa.float64()),
            ]),
        ),
        os.path.join(outdir, f"q_video_features.{sfname}.parquet"),
    )
    arows = [audio_feature_row(d) for d in ids]
    pq.write_table(
        pa.table(
            {k: [r[i] for r in arows] for i, k in enumerate(
                ["audio_id", "decode_ok", "sample_rate", "channels",
                 "n_frames", "duration_s", "rms", "peak"])},
            schema=pa.schema([
                ("audio_id", pa.string()), ("decode_ok", pa.bool_()),
                ("sample_rate", pa.int32()), ("channels", pa.int32()),
                ("n_frames", pa.int64()), ("duration_s", pa.float64()),
                ("rms", pa.float64()), ("peak", pa.float64()),
            ]),
        ),
        os.path.join(outdir, f"q_audio_features.{sfname}.parquet"),
    )


# ---------------------------------------------------------------------------
# q_crawl_visits golden (VERDICT r4 item 4): the flagship crawl's expected
# (fetch_seq, url, depth) rows, emitted by the SERIAL golden simulator
# (colly_spark/simulator.py — a from-scratch pure-Python crawler that shares
# no code with the Spark engine), on the pinned fixture of
# __spark_entry__.CRAWL_FIXTURE. This turns visit-order equality — the
# strongest crawl-correctness property — into a driver-gate row.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# q_image_validate golden: the BASELINE input_hint invariant (decoded-pixel
# PSNR>=40dB for lossy / exact for lossless + phash recompute + caption
# equality) over the deterministic image+caption table the driver query
# synthesizes from doc_id. Everything below is an INDEPENDENT numpy
# re-implementation of the codec spec (colly_spark.imagecodec docstring) —
# no colly_spark import: reference pixels are gradient+seeded-noise from a
# blake2b(image_id) seed; 'jpeg' is 4-level quantization (>>2, dequant to
# bin centers, clip 255); PSNR is 20*log10(255)-10*log10(mse) in float64.
# ---------------------------------------------------------------------------


def _img_pixels(image_id: str, w: int, h: int):
    import hashlib

    import numpy as np

    seed = int.from_bytes(hashlib.blake2b(image_id.encode(), digest_size=8).digest(), "big")
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.int16)
    noise = rng.integers(-16, 17, size=(h, w, 3), dtype=np.int16)
    return np.clip(base + noise, 0, 255).astype(np.uint8)


def image_validate_row(doc_id: int) -> tuple:
    import zlib

    import numpy as np

    hh = zlib.crc32(str(doc_id).encode())
    iid = f"img-{doc_id}"
    w, ht = 16 + hh % 17, 16 + (hh >> 8) % 13
    fmt = "png" if hh % 2 == 0 else "jpeg"
    caption_ok = hh % 7 != 0
    if hh % 11 == 0:  # truncated payload: zlib stream undecodable
        return (iid, fmt, w, ht, False, "0.0", caption_ok, False)
    px = _img_pixels(iid, w, ht)
    if fmt == "png":
        # lossless roundtrip: exact pixels, phash recompute trivially matches
        return (iid, fmt, w, ht, True, "inf", caption_ok, caption_ok)
    dec = np.minimum(((px >> 2).astype(np.int16) << 2) + 2, 255).astype(np.uint8)
    mse = np.mean((dec.astype(np.float64) - px.astype(np.float64)) ** 2)
    p = 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
    img_ok = bool(p >= 40.0)
    return (iid, fmt, w, ht, img_ok, f"{p:.2f}", caption_ok, img_ok and caption_ok)


def write_image_golden(outdir: str, sfname: str, doc_ids: list[int]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    ids = sorted(doc_ids)[:64]
    rows = [image_validate_row(d) for d in ids]
    pq.write_table(
        pa.table(
            {k: [r[i] for r in rows] for i, k in enumerate(
                ["image_id", "fmt", "w", "h", "img_ok", "psnr_db",
                 "caption_ok", "payload_ok"])},
            schema=pa.schema([
                ("image_id", pa.string()), ("fmt", pa.string()),
                ("w", pa.int32()), ("h", pa.int32()),
                ("img_ok", pa.bool_()), ("psnr_db", pa.string()),
                ("caption_ok", pa.bool_()), ("payload_ok", pa.bool_()),
            ]),
        ),
        os.path.join(outdir, f"q_image_validate.{sfname}.parquet"),
    )


def write_crawl_golden(outdir: str) -> int:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from colly_spark.config import CrawlConfig, LimitRule
    from colly_spark.fixtures import (
        CRAWL_GOLDEN_CFG,
        CRAWL_GOLDEN_LIMITS,
        CRAWL_GOLDEN_MAX_ROUNDS,
        CRAWL_GOLDEN_SEEDS,
        CRAWL_GOLDEN_SPEC,
        SiteSpec,
        build_site,
        make_seeds,
    )
    from colly_spark.simulator import simulate

    # the ONE fixture definition shared with __spark_entry__.q_crawl_visits
    # (colly_spark/fixtures.py) — the golden and the gate query cannot
    # silently desync
    site = build_site(SiteSpec(**CRAWL_GOLDEN_SPEC))
    cfg = CrawlConfig(
        limit_rules=tuple(LimitRule(**d) for d in CRAWL_GOLDEN_LIMITS),
        **CRAWL_GOLDEN_CFG,
    )
    sim = simulate(site, make_seeds(list(CRAWL_GOLDEN_SEEDS)),
                   cfg, max_rounds=CRAWL_GOLDEN_MAX_ROUNDS)
    visits = sorted(sim.visits, key=lambda v: v["fetch_seq"])
    pq.write_table(
        pa.table(
            {"fetch_seq": [v["fetch_seq"] for v in visits],
             "url": [v["url"] for v in visits],
             "depth": [v["depth"] for v in visits]},
            schema=pa.schema([("fetch_seq", pa.int64()), ("url", pa.string()),
                              ("depth", pa.int32())]),
        ),
        os.path.join(outdir, "q_crawl_visits.parquet"),
    )
    return len(visits)


def incremental_neardup_rows(
    docs: list[tuple[int, str]],
) -> list[tuple[int, int]]:
    """Mirror of functions/incremental.IncrementalNearDeduper admission
    semantics (same constants as minhash_pairs: 32 lanes, 8 bands,
    threshold 0.8, bucket cap 256) over the driver gate's two batches
    (batch 1 = even doc_ids, batch 2 = the whole corpus). Per batch:

    1. intra-batch: batch buckets over cap generate no candidates; for
       every candidate pair (a < b) with lane-agreement >= threshold, b
       loses (greedy first-wins);
    2. cross-batch: a doc probing a bucket whose PRE-batch occupancy
       exceeds the cap skips that bucket; any verified match against an
       admitted signature drops the doc;
    3. survivors' band keys / signatures / occupancy deltas are admitted.
    """
    r = NUM_HASHES // BANDS
    sigs = {d: minhash_sig(t) for d, t in docs}

    def keys_of(d: int) -> list[tuple[int, int]]:
        sig = sigs[d]
        return [
            (b, xxh.spark_xxhash64(",".join(str(sig[b * r + j]) for j in range(r))))
            for b in range(BANDS)
        ]

    def est(a: list[int], b: list[int]) -> float:
        return sum(x == y for x, y in zip(a, b)) / float(NUM_HASHES)

    store: dict[tuple[int, int], list[int]] = {}
    occupancy: dict[tuple[int, int], int] = {}
    admitted: dict[int, list[int]] = {}
    rows: list[tuple[int, int]] = []
    batches = [[(d, t) for d, t in docs if d % 2 == 0], list(docs)]
    for bno, batch in enumerate(batches, start=1):
        # id guard first (mirror of the Spark anti-join on seen_sigs):
        # an id admitted by any earlier round never re-enters the batch
        ids = [d for d, _ in batch if d not in admitted]
        bkeys = {d: keys_of(d) for d in ids}
        buckets: dict[tuple[int, int], list[int]] = {}
        for d in ids:
            for kk in bkeys[d]:
                buckets.setdefault(kk, []).append(d)
        losers: set[int] = set()
        cand: set[tuple[int, int]] = set()
        for members in buckets.values():
            if MAX_BUCKET and len(members) > MAX_BUCKET:
                continue
            ms = sorted(set(members))
            for i in range(len(ms)):
                for j in range(i + 1, len(ms)):
                    cand.add((ms[i], ms[j]))
        for a, b in cand:
            if est(sigs[a], sigs[b]) >= THRESHOLD:
                losers.add(b)
        for d in ids:
            if any(
                est(sigs[d], admitted[old]) >= THRESHOLD
                for kk in bkeys[d]
                if occupancy.get(kk, 0) <= MAX_BUCKET
                for old in store.get(kk, [])
            ):
                losers.add(d)
        for d in ids:
            if d in losers:
                continue
            rows.append((bno, d))
            admitted[d] = sigs[d]
            for kk in bkeys[d]:
                store.setdefault(kk, []).append(d)
                occupancy[kk] = occupancy.get(kk, 0) + 1
    return rows


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
        nd_rows = incremental_neardup_rows(docs)
        pq.write_table(
            pa.table(
                {"batch": [r[0] for r in nd_rows],
                 "doc_id": [r[1] for r in nd_rows]},
                schema=pa.schema([("batch", pa.int32()), ("doc_id", pa.int64())]),
            ),
            os.path.join(outdir, f"q_incremental_neardup.{sfname}.parquet"),
        )
        write_multimodal_goldens(outdir, sfname, [d for d, _ in docs])
        write_image_golden(outdir, sfname, [d for d, _ in docs])
        print(f"{sfname}: {len(sim_rows)} simhash rows, {len(pairs)} minhash pairs, "
              f"{min(64, len(docs))} video/audio feature rows, "
              f"{min(64, len(docs))} image validate rows")
    nv = write_crawl_golden(outdir)
    print(f"q_crawl_visits: {nv} simulator visit rows")


if __name__ == "__main__":
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    main(dirs)
