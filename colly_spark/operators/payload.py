"""U5: image+caption payload validation (BASELINE input_hint invariant).

Arrow-batched pandas UDF over the joined (extracted-ref x images) rows:
decode ``bytes`` per ``fmt``, check dims == (w,h), PSNR >= 40 dB vs the
reference pixels for lossy formats / exact for lossless, phash recompute
match, and caption equality between the parsed <figcaption> text and the
payload table's caption column. Real image libs are stubbed behind the
deterministic codec (see colly_spark.imagecodec docstring).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType, StructField, StructType

from colly_spark.imagecodec import validate_payload

VALIDATE_SCHEMA = StructType(
    [
        StructField("payload_ok", BooleanType()),
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
    caption_parsed: pd.Series,
    caption_ref: pd.Series,
) -> pd.DataFrame:
    oks, psnrs = [], []
    for d, iid, ww, hh, fm, ph, cp, cr in zip(
        data, image_id, w, h, fmt, phash, caption_parsed, caption_ref
    ):
        if d is None or iid is None:
            oks.append(False)
            psnrs.append("0.0")
            continue
        ok, psnr = validate_payload(d, iid, int(ww), int(hh), fm, int(ph))
        ok = ok and (cp is not None) and (cp == cr)
        oks.append(bool(ok))
        psnrs.append(psnr)
    return pd.DataFrame({"payload_ok": oks, "psnr_db": psnrs})


def make_validate_udf():
    return F.pandas_udf(validate_pd, VALIDATE_SCHEMA)
