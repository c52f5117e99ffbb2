"""F3a-d / F4a static filters as Catalyst-native predicates.

Evaluation order is the reference's documented one (colly.go:774-845):
URL-length -> DisallowedURLFilters -> URLFilters -> domain deny/allow, with
DisallowedURLFilters strictly before URLFilters (colly.go:69-73, 820-830).
Everything here is built-in expressions (``rlike``/``isin``/``length``) —
constant-folded and pushed down by Catalyst, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from colly_spark.config import CrawlConfig


def _any_rlike(col: Column, patterns: tuple[str, ...]) -> Column:
    out = F.lit(False)
    for p in patterns:
        out = out | col.rlike(p)
    return out


def static_filter_kind(cfg: CrawlConfig, canon_url: Column, domain: Column) -> Column:
    """NULL if the URL passes all static filters, else the colly error kind.

    The CASE order *is* the reference's check order — first failing check
    names the error, exactly like the serial path (colly.go:820-845).
    """
    kind = F.lit(None).cast("string")
    checks: list[tuple[Column, str]] = []
    if cfg.max_url_length:
        checks.append((F.length(canon_url) > cfg.max_url_length, "ErrURLTooLong"))
    if cfg.disallowed_url_filters:
        checks.append((_any_rlike(canon_url, cfg.disallowed_url_filters), "ErrForbiddenURL"))
    if cfg.url_filters:
        checks.append((~_any_rlike(canon_url, cfg.url_filters), "ErrNoURLFiltersMatch"))
    if cfg.disallowed_domains:
        checks.append((domain.isin(list(cfg.disallowed_domains)), "ErrForbiddenDomain"))
    if cfg.allowed_domains:
        checks.append((~domain.isin(list(cfg.allowed_domains)), "ErrForbiddenDomain"))
    if not checks:
        return kind
    expr = None
    for cond, k in reversed(checks):
        expr = F.when(cond, F.lit(k)).otherwise(expr if expr is not None else kind)
    return expr
