"""Corpus ingestion sources beyond the parquet fixtures (WARC, ...)."""

from colly_spark.sources.warc import (  # noqa: F401
    iter_warc_records,
    read_warc,
    warc_record_bytes,
)
