"""Corpus ingestion sources beyond the parquet fixtures (WARC, sitemaps)."""

from colly_spark.sources.sitemap import (  # noqa: F401
    parse_sitemap,
    sitemap_entries,
)

from colly_spark.sources.warc import (  # noqa: F401
    iter_warc_records,
    read_warc,
    warc_record_bytes,
)
