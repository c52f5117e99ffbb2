"""Deterministic synthetic-web fixtures (FIXTURES.md §1-§5).

Replaces the reference's in-process ``httptest`` server
(colly_test.go:71-318) with pure functions of ``(seed, spec)`` producing the
``pages`` / ``images`` / ``robots`` / ``seeds`` / ``limit_rules`` tables. The
same per-page pure function drives both driver-side list generation (tests)
and a distributed ``mapInPandas`` generator (bench scale), so a 10^6-page
fixture never materializes on the driver.

Scenario routes mirror the reference test mux: redirect chains + cycles
(colly_test.go:146-153, 885-934), /disallowed + /allowed?q=1 robots paths
(colly_test.go:55-60, 1267-1319), error statuses (colly_test.go:596-623),
deep chains for MaxDepth (colly_test.go:1754-1796), tabs/newlines + lone-%
links (colly_test.go:1187-1250), base-tag pages (colly_test.go:1139-1185),
and a hot domain for the skew clause of the north rule.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

from colly_spark import imagecodec


def h64(*parts) -> int:
    """Stable 64-bit hash of the parts (not Python's salted hash)."""
    key = "\x1f".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.blake2b(key, digest_size=8).digest(), "big")


@dataclass(frozen=True)
class SiteSpec:
    n_domains: int = 3
    pages_per_domain: int = 20
    links_per_page: int = 3
    hot_domain_factor: int = 1  # domain 0 gets factor x pages (skew scenario)
    image_pool_per_domain: int = 8  # distinct images per domain (shared refs)
    image_w: int = 24
    image_h: int = 16
    with_specials: bool = True  # redirects/cycles/robots paths/errors/deep
    deep_chain_len: int = 6
    quirky_links: bool = True  # tabs/newlines/lone-% link forms
    serve_delay_ms: int = 5
    seed: int = 42
    # namespace shift: domain i is named d{i+offset}.test — lets several
    # processes generate DISJOINT self-contained webs (multi-process
    # scaling bench) without any cross-shard edges
    domain_offset: int = 0

    def host(self, d: int) -> str:
        return f"d{d + self.domain_offset:02d}.test"

    def pages_in_domain(self, d: int) -> int:
        n = self.pages_per_domain
        return n * self.hot_domain_factor if d == 0 else n


DEFAULT_ROBOTS_BODY = (
    "User-agent: *\n"
    "Allow: /allowed\n"
    "Disallow: /disallowed\n"
    "Disallow: /allowed*q=\n"
)  # the reference's fixture robots file, colly_test.go:55-60


def page_url(spec: SiteSpec, d: int, j: int) -> str:
    return f"http://{spec.host(d)}/page/{j}"


def image_id_for(spec: SiteSpec, d: int, j: int) -> str:
    pool = max(spec.image_pool_per_domain, 1)
    k = h64(spec.seed, "imgref", d, j) % pool
    return f"img-{d:02d}-{k}"


def caption_for(image_id: str) -> str:
    words = ["amber", "basalt", "cirrus", "delta", "ember", "fjord", "gale", "helix"]
    idx = h64("caption", image_id)
    picked = " ".join(words[(idx >> (8 * i)) % len(words)] for i in range(4))
    return f"caption {image_id}: {picked}"


def _raw_link(spec: SiteSpec, d: int, j: int, k: int, td: int, tj: int) -> str:
    """A raw (pre-canonicalization) href for page (d,j) -> (td,tj)."""
    full = page_url(spec, td, tj)
    variant = h64(spec.seed, "linkform", d, j, k) % 6 if spec.quirky_links else 1
    if td == d:
        if variant == 0:
            return f"/page/{tj}"  # host-relative
        if variant == 2:
            return str(tj)  # path-relative: /page/0 + "2" -> /page/2
        if variant == 3:
            return f"/page/{tj}#frag"  # fragment stripped by canonicalize
        if variant == 4:
            return f"/page/\t{tj}\n"  # tabs+newlines, colly_test.go:1187
    if variant == 5:
        return full + "#s"
    return full


def page_out_links(spec: SiteSpec, d: int, j: int) -> list[tuple[str, str]]:
    """[(raw_href, canonical_target_url)] in element order."""
    out: list[tuple[str, str]] = []
    for k in range(spec.links_per_page):
        r = h64(spec.seed, "edge", d, j, k)
        if spec.n_domains > 1 and r % 5 == 0:  # 20% cross-domain
            td = (d + 1 + (r >> 8) % (spec.n_domains - 1)) % spec.n_domains
        else:
            td = d
        tj = (r >> 16) % spec.pages_in_domain(td)
        out.append((_raw_link(spec, d, j, k, td, tj), page_url(spec, td, tj)))
    if spec.with_specials and j == 0:
        host = f"http://{spec.host(d)}"
        for path in (
            "/redirect/0",
            "/disallowed/0",
            "/allowed",
            "/allowed?q=1",
            "/e404",
            "/e500",
            "/deep/1",
            "/loop/a",
            "/lone%",
        ):
            out.append((path, host + path.replace("/lone%", "/lone%25")))
    return out


def _html_body(links: list[str], image_ids: list[str], base_href: str | None) -> bytes:
    parts = ["<html><head>"]
    if base_href:
        parts.append(f'<base href="{base_href}">')
    parts.append("</head><body>")
    for href in links:
        parts.append(f'<a href="{href}">link</a>')
    for iid in image_ids:
        parts.append(
            f'<figure><img src="img://{iid}"/>'
            f"<figcaption>{caption_for(iid)}</figcaption></figure>"
        )
    parts.append("</body></html>")
    return "".join(parts).encode()


def page_row(spec: SiteSpec, d: int, j: int) -> dict:
    links = page_out_links(spec, d, j)
    iid = image_id_for(spec, d, j)
    raw = [raw_href for raw_href, _ in links]
    return {
        "url": page_url(spec, d, j),
        "domain": spec.host(d),
        "status": 200,
        "content_type": "text/html",
        "body": _html_body(raw, [iid], None),
        "redirect_to": None,
        "links": raw,
        "base_href": None,
        "image_refs": [iid],
        "gzip_body": False,
        "serve_delay_ms": spec.serve_delay_ms,
        "set_cookie": None,
        "require_cookie": None,
        "require_header": None,
    }


def _special_rows(spec: SiteSpec, d: int) -> list[dict]:
    host = spec.host(d)
    base = f"http://{host}"

    def row(path: str, **kw) -> dict:
        r = {
            "url": base + path,
            "domain": host,
            "status": 200,
            "content_type": "text/html",
            "body": b"<html><body>special</body></html>",
            "redirect_to": None,
            "links": [],
            "base_href": None,
            "image_refs": [],
            "gzip_body": False,
            "serve_delay_ms": spec.serve_delay_ms,
            "set_cookie": None,
            "require_cookie": None,
            "require_header": None,
        }
        r.update(kw)
        return r

    rows = [
        # redirect chain /redirect/0 -> /redirect/1 -> /page/1
        row("/redirect/0", status=301, redirect_to=base + "/redirect/1", body=b""),
        row("/redirect/1", status=301, redirect_to=base + "/page/1", body=b""),
        # redirect cycle (colly_test.go:885-934): visits both, no error
        row("/loop/a", status=302, redirect_to=base + "/loop/b", body=b""),
        row("/loop/b", status=302, redirect_to=base + "/loop/a", body=b""),
        # robots-governed paths (fixture robots: colly_test.go:55-60)
        row("/allowed", body=_html_body([], [image_id_for(spec, d, 1)], None),
            image_refs=[image_id_for(spec, d, 1)]),
        row("/allowed?q=1"),
        row("/disallowed/0", links=["/disallowed/1"],
            body=_html_body(["/disallowed/1"], [], None)),
        row("/disallowed/1"),
        # error statuses (colly_test.go:596-623)
        row("/e404", status=404, body=b"not found"),
        row("/e500", status=500, body=b"internal"),
        row("/e204", status=204, body=b""),
        # base-tag page (colly_test.go:1139-1185)
        row("/base", base_href=base + "/sub/dir/",
            links=["child"], body=_html_body(["child"], [], base + "/sub/dir/")),
        row("/sub/dir/child"),
        # lone-% page (colly_test.go:1219-1250)
        row("/lone%25"),
        # non-HTML content type (header-abort / content-gate scenarios)
        row("/binary", content_type="application/octet-stream",
            body=b"\x00\x01binary"),
        # U3 cookies (TestSetCookieRedirect, colly_test.go:2040+): the
        # set_cookie response redirects to a page that 403s without it —
        # the cookie must travel within the redirect chain itself
        row("/set_cookie", status=302, redirect_to=base + "/check_cookie",
            body=b"", set_cookie="session=1"),
        row("/check_cookie", require_cookie="session=1"),
        # plain set-then-need pair (jar persistence across rounds)
        row("/cookie/set", set_cookie="tok=a",
            links=["/cookie/need"], body=_html_body(["/cookie/need"], [], None)),
        row("/cookie/need", require_cookie="tok=a"),
        # E2 request headers: 403 unless the request carries the header
        # (merged per colly.go:645-657) — auth-token crawls in miniature.
        # Not linked from any page: only crawls that seed it meet it.
        row("/auth/need", require_header="x-token=s3cr3t",
            links=["/auth/inner"], body=_html_body(["/auth/inner"], [], None)),
        row("/auth/inner"),
    ]
    # deep chain for MaxDepth (colly_test.go:1754-1796)
    for i in range(1, spec.deep_chain_len + 1):
        nxt = [f"/deep/{i + 1}"] if i < spec.deep_chain_len else []
        rows.append(row(f"/deep/{i}", links=nxt, body=_html_body(nxt, [], None)))
    return rows


@dataclass
class Site:
    spec: SiteSpec
    pages: list[dict] = field(default_factory=list)
    images: list[dict] = field(default_factory=list)
    robots: list[dict] = field(default_factory=list)

    def pages_by_url(self) -> dict[str, dict]:
        return {p["url"]: p for p in self.pages}

    def images_by_id(self) -> dict[str, dict]:
        return {i["image_id"]: i for i in self.images}

    def robots_by_host(self) -> dict[str, dict]:
        return {r["host"]: r for r in self.robots}


def build_images(spec: SiteSpec) -> list[dict]:
    rows = []
    for d in range(spec.n_domains):
        for k in range(max(spec.image_pool_per_domain, 1)):
            iid = f"img-{d:02d}-{k}"
            fmt = "jpeg" if h64(spec.seed, "fmt", iid) % 2 else "png"
            px = imagecodec.reference_pixels(iid, spec.image_w, spec.image_h)
            rows.append(
                {
                    "image_id": iid,
                    "bytes": imagecodec.encode(px, fmt),
                    "w": spec.image_w,
                    "h": spec.image_h,
                    "fmt": fmt,
                    "caption": caption_for(iid),
                    "phash": imagecodec.average_hash(px),
                }
            )
    return rows


def build_site(
    spec: SiteSpec,
    robots_body: str = DEFAULT_ROBOTS_BODY,
    robots_fail_hosts: tuple[str, ...] = (),
) -> Site:
    site = Site(spec=spec)
    for d in range(spec.n_domains):
        for j in range(spec.pages_in_domain(d)):
            site.pages.append(page_row(spec, d, j))
        if spec.with_specials:
            site.pages.extend(_special_rows(spec, d))
        site.robots.append(
            {
                "host": spec.host(d),
                "body": robots_body,
                "fetch_fails": spec.host(d) in robots_fail_hosts,
            }
        )
    site.images = build_images(spec)
    return site


# ---------------- pinned golden-crawl fixture ----------------
# ONE definition consumed by BOTH __spark_entry__.q_crawl_visits (the
# distributed engine side of the driver gate) and
# tools/make_golden.write_crawl_golden (the serial simulator that emits
# the oracle parquet): any tweak moves both sides together, so the golden
# can never silently desync from the gate query. limit_rules are raw
# kwargs (construct config.LimitRule(**d)) to keep this module free of a
# config import.
CRAWL_GOLDEN_SPEC = dict(n_domains=3, pages_per_domain=12, seed=42)
CRAWL_GOLDEN_CFG = dict(
    max_depth=3, ignore_robots_txt=False, shuffle_partitions=8
)
CRAWL_GOLDEN_LIMITS = (
    dict(domain_glob="*.test", delay_ms=50, parallelism=4),
)
CRAWL_GOLDEN_SEEDS = tuple(f"http://d0{d}.test/page/0" for d in range(3))
CRAWL_GOLDEN_MAX_ROUNDS = 6


def make_seeds(urls: list[str], method: str = "GET",
               headers: dict | None = None) -> list[dict]:
    """Seed dicts; ``headers`` (optional) rides on every seed — the queue
    AddRequest / UnmarshalRequest path that preserves Request.Headers."""
    return [
        {"seed_seq": i, "url": u, "method": method, "body": None,
         "headers": headers, "ctx": {}}
        for i, u in enumerate(urls)
    ]


# ---------------- Spark materialization ----------------


def site_to_spark(spark, site: Site):
    """Materialize fixture tables as DataFrames with explicit schemas."""
    from colly_spark import schemas

    pages = spark.createDataFrame(
        [_page_tuple(p) for p in site.pages], schema=schemas.PAGES
    )
    images = spark.createDataFrame(
        [
            (i["image_id"], i["bytes"], i["w"], i["h"], i["fmt"], i["caption"], i["phash"])
            for i in site.images
        ],
        schema=schemas.IMAGES,
    )
    robots = spark.createDataFrame(
        [(r["host"], r["body"], r["fetch_fails"]) for r in site.robots],
        schema=schemas.ROBOTS_FIXTURE,
    )
    return {"pages": pages, "images": images, "robots": robots}


def _page_tuple(p: dict):
    return (
        p["url"], p["domain"], p["status"], p["content_type"], p["body"],
        p["redirect_to"], p["links"], p["base_href"], p["image_refs"],
        p["gzip_body"], p["serve_delay_ms"],
        p.get("set_cookie"), p.get("require_cookie"), p.get("require_header"),
    )


def build_pages_spark(spark, spec: SiteSpec):
    """Distributed fixture generation for bench scale: one task generates a
    slice of (domain, page) indices via the same pure ``page_row`` — the
    10^6-page web never touches the driver."""
    import pandas as pd

    from colly_spark import schemas

    counts = [spec.pages_in_domain(d) for d in range(spec.n_domains)]
    offsets = [0]
    for c in counts:
        offsets.append(offsets[-1] + c)
    total = offsets[-1]
    n_parts = max(32, total // 20000)

    def gen(batches):
        for pdf in batches:
            rows = []
            for gid in pdf["id"]:
                d = _domain_of(int(gid), offsets)
                j = int(gid) - offsets[d]
                rows.append(_page_tuple(page_row(spec, d, j)))
            yield pd.DataFrame(rows, columns=[f.name for f in schemas.PAGES.fields])

    base = spark.range(0, total, 1, n_parts)
    pages = base.mapInPandas(gen, schema=schemas.PAGES)
    if spec.with_specials:
        specials = []
        for d in range(spec.n_domains):
            specials.extend(_page_tuple(r) for r in _special_rows(spec, d))
        pages = pages.unionByName(
            spark.createDataFrame(specials, schema=schemas.PAGES)
        )
    return pages


def _domain_of(gid: int, offsets: list[int]) -> int:
    lo, hi = 0, len(offsets) - 2
    while lo < hi:
        mid = (lo + hi + 1) // 2
        if offsets[mid] <= gid:
            lo = mid
        else:
            hi = mid - 1
    return lo
