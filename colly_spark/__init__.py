"""colly_spark — a from-scratch PySpark-native batch-iterative crawl scheduler.

Re-expresses the semantics of gocolly/colly (callback-driven, single-process,
goroutine-concurrent crawler) as a set-oriented, round-based dataflow over
checkpointed state tables:

- every colly struct (Request/Response/HTMLElement) is a row schema
  (:mod:`colly_spark.schemas`),
- every per-request code path is a whole-column transformation
  (:mod:`colly_spark.operators`),
- the recursive ``OnHTML -> Request.Visit`` callback loop is a breadth-first
  driver round loop over a frontier table (:mod:`colly_spark.engine`),
- URL-seen dedup is a partitioned anti-join with optional per-partition Bloom
  pre-filters sized for 10^10 URLs (:mod:`colly_spark.operators.dedup`).

This is NOT a port: no code is translated from the Go reference; reference
``file:line`` citations in docstrings identify the *behavior* each operator
reproduces so parity can be audited.
"""

__all__ = ["CrawlConfig", "LimitRule", "Crawler"]
__version__ = "0.1.0"


def __getattr__(name):  # lazy: keep pure-Python kernels importable w/o Spark
    if name in ("CrawlConfig", "LimitRule"):
        from colly_spark import config

        return getattr(config, name)
    if name == "Crawler":
        from colly_spark.engine import Crawler

        return Crawler
    raise AttributeError(name)
