"""Text analysis over a documents table: token counting, quality scoring,
language-ID heuristic, document fingerprinting.

Everything is built-in ``pyspark.sql.functions`` (JVM-side, codegen'd) — no
Python in the hot path — except :func:`winnow_fingerprints`, whose
char-level rolling hash has no JVM builtin and runs as an Arrow-batched
numpy kernel. Each op has an exact ANSI-SQL oracle (DuckDB) wired in
``__spark_entry__.py`` (winnowing's recomputes the modular rolling hash
relationally with list lambdas + HUGEINT arithmetic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# small English function-word list for the stopword-ratio heuristic
EN_STOPWORDS = (
    "the a an and or of to in is are was were be been it this that for on as",
)
STOPWORD_LIST = EN_STOPWORDS[0].split()


def words(text: Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex split)."""
    return F.split(F.trim(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(words(text))
    )


# GPT-2-style pre-tokenizer regex (contractions, space-prefixed letter runs,
# digit runs, punctuation runs, residual whitespace) — the 'BPE-ish regex'
# token counter. No lookarounds, so Java (Spark) and RE2 (DuckDB) agree.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+"


def bpe_tokens(text: Column) -> Column:
    """BPE-ish pre-tokenization (JVM regexp_extract_all, codegen'd)."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text))


def stopword_ratio(text: Column) -> Column:
    w = words(text)
    hits = F.size(F.filter(w, lambda x: x.isin(STOPWORD_LIST)))
    return (hits / F.greatest(F.size(w), F.lit(1))).cast("double")


def punct_ratio(text: Column) -> Column:
    no_punct = F.regexp_replace(text, r"[^\w\s]", "")
    return (
        (F.length(text) - F.length(no_punct))
        / F.greatest(F.length(text), F.lit(1))
    ).cast("double")


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation +
    function-word presence (the standard cheap pre-filter for LM corpora)."""
    n = token_count(text)
    len_ok = F.when((n >= 10) & (n <= 5000), 1.0).otherwise(0.3)
    p = punct_ratio(text)
    punct_ok = F.when(p < 0.2, 1.0).otherwise(0.5)
    sw = stopword_ratio(text)
    sw_ok = F.when(sw > 0.05, 1.0).otherwise(0.4)
    return ((len_ok + punct_ok + sw_ok) / F.lit(3.0)).cast("double")


def lang_id(text: Column) -> Column:
    """Stopword-hit language heuristic (en vs unknown — the fixture corpus is
    synthetic English-like; the shape generalizes to per-language lists)."""
    return F.when(stopword_ratio(text) > 0.02, F.lit("en")).otherwise(F.lit("und"))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the case/whitespace
    normalized text (portable across engines, unlike xxhash seeds)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(text)), r"\s+", " "))


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 8,
    window: int = 4,
) -> DataFrame:
    """Rolling-hash document fingerprinting by winnowing (the MOSS scheme,
    Schleimer/Wilkerson/Aiken SIGMOD'03): normalize (lowercase, strip
    non-alphanumerics), polynomial rolling hash over every k-char shingle
    (base 1000003, modulus 2^64 — uint64 wraparound IS the modulus, exact
    and portable), then keep the minimum hash of each length-``window``
    hash window, distinct per document. Guarantee: two documents sharing
    any normalized substring of length >= window+k-1 share at least one
    fingerprint.

    Char-level rolling hashes are not expressible in built-in JVM
    functions, so this is an Arrow-batched mapInPandas numpy kernel (two
    sliding-window passes per doc, no per-char Python). Fingerprints are
    deduped INSIDE the kernel — doc_ids are unique per input row — so the
    output needs no JVM distinct: zero shuffles at any scale. Returns
    (doc_id, fp) with fp as signed int64 (two's-complement of the u64).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType([
        StructField("doc_id", LongType()),
        StructField("fp", LongType()),
    ])

    def gen(batches):
        for pdf in batches:
            ids: list[int] = []
            fps: list = []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                u = winnow_doc(text, k=k, window=window)
                if len(u):
                    ids.extend([int(did)] * len(u))
                    fps.append(u)
            yield pd.DataFrame({
                "doc_id": np.asarray(ids, dtype=np.int64),
                "fp": (np.concatenate(fps)
                       if fps else np.empty(0, dtype=np.int64)),
            })

    return docs.select("doc_id", text_col).mapInPandas(gen, schema=out_schema)


_WINNOW_STRIP = None  # compiled lazily; workers each compile once


def winnow_doc(text: str | None, k: int = 8, window: int = 4):
    """The per-document winnowing kernel (numpy, two sliding-window
    passes): distinct selected fingerprints as a signed-int64 array.
    Exposed at module level so property tests can drive it directly."""
    global _WINNOW_STRIP
    import re as _re

    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    if _WINNOW_STRIP is None:
        _WINNOW_STRIP = _re.compile(r"[^a-z0-9]")
    s = _WINNOW_STRIP.sub("", (text or "").lower())
    if len(s) < k:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(s.encode("ascii"), dtype=np.uint8)
    grams = sliding_window_view(b, k).astype(np.uint64)
    h = np.zeros(len(grams), dtype=np.uint64)
    base = np.uint64(1000003)
    for j in range(k):  # k vector ops, wraps mod 2^64
        h = h * base + grams[:, j]
    if len(h) <= window:
        sel = h.min(keepdims=True)
    else:
        sel = sliding_window_view(h, window).min(axis=1)
    return np.unique(sel).view(np.int64)


def analyze(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        bpe_token_count(t).alias("n_bpe_tokens"),
        F.length(t).alias("n_chars_actual"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(quality_score(t), 6).alias("quality"),
        lang_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )
