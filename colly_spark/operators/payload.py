"""U5: image+caption payload validation (BASELINE input_hint invariant).

Arrow-batched pandas UDF over **distinct image_ids** (the engine dedups refs
before decoding — pages share logos/thumbnails heavily, so decoding per
*reference* would redo identical work hundreds of times; decode-once-per-id
is the content-addressed-store shape that survives 100× scale): decode
``bytes`` per ``fmt``, check dims == (w,h), PSNR >= 40 dB vs the reference
pixels for lossy formats / exact for lossless, phash recompute match. The
caption-equality half of the invariant is a plain JVM column comparison
(parsed <figcaption> text == payload table caption) — no reason to pay
Python for a string equality. Real image libs are stubbed behind the
deterministic codec (see colly_spark.imagecodec docstring).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

from colly_spark.imagecodec import validate_payload

VALIDATE_SCHEMA = StructType(
    [
        StructField("img_ok", BooleanType()),
        StructField("psnr_db", StringType()),
    ]
)


def validate_pd(
    data: pd.Series,
    image_id: pd.Series,
    w: pd.Series,
    h: pd.Series,
    fmt: pd.Series,
    phash: pd.Series,
) -> pd.DataFrame:
    oks, psnrs = [], []
    for d, iid, ww, hh, fm, ph in zip(data, image_id, w, h, fmt, phash):
        if d is None or iid is None:
            oks.append(False)
            psnrs.append("0.0")
            continue
        ok, psnr = validate_payload(d, iid, int(ww), int(hh), fm, int(ph))
        oks.append(bool(ok))
        psnrs.append(psnr)
    return pd.DataFrame({"img_ok": oks, "psnr_db": psnrs})


def make_validate_udf():
    return F.pandas_udf(validate_pd, VALIDATE_SCHEMA)


def payload_ok_col(img_ok: Column, caption_parsed: Column, caption_ref: Column) -> Column:
    """Full per-row invariant: pixels/phash valid AND the parsed caption
    exists and equals the reference caption (null-safe: a missing parsed
    caption is a failure, matching the serial simulator)."""
    return (
        F.coalesce(img_ok, F.lit(False))
        & caption_parsed.isNotNull()
        # null-safe: a NULL caption_ref must yield False, not SQL NULL
        & F.coalesce(caption_parsed == caption_ref, F.lit(False))
    )
