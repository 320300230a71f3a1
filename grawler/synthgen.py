"""Deterministic synthetic web graph + image corpus (FIXTURES.md §1-§6).

Pure function of (seed, n_pages, shape): the engine (via Spark DataFrames)
and the pure-Python oracle consume the *same* pandas tables, so trace/seen/
store comparisons are byte-stable. No network, no external data.

Tables produced (schemas in grawler.schemas / FIXTURES.md):
  seeds(url), pages(url host status content_type fetch_latency_ms html
  child_urls image_ids), robots(host robots_txt fetched_ts), images(image_id
  bytes w h fmt caption) + ground-truth pixel arrays for PSNR tests.

Shapes: 'mixed' (default), 'bfs-tree', 'diamond', 'hot-host',
'robots-walled', 'deep-chain'  (FIXTURES.md §6).
"""

from __future__ import annotations

import datetime as dt
import zlib
from dataclasses import dataclass

import numpy as np
import pandas as pd

from . import codecs

_WORDS = (
    "spark frontier wave crawl fetch parse image caption host politeness "
    "robots bloom filter hash shuffle partition merge snapshot lineage "
    "metric depth priority queue window rank salt skew broadcast join"
).split()

_FMTS = ("rgb8", "png", "qlossy")


@dataclass
class SynthWeb:
    seeds: pd.DataFrame
    pages: pd.DataFrame
    robots: pd.DataFrame
    images: pd.DataFrame
    pixels: dict  # image_id -> original (pre-encode) ndarray, for PSNR tests
    n_pages: int
    shape: str


def _host_of(i: int, n_pages: int, n_hosts: int, shape: str) -> int:
    if shape == "hot-host":
        return 0 if i % 2 == 0 else 1 + (i % max(1, n_hosts - 1))
    if shape == "deep-chain":
        return i % max(2, n_hosts // 2)
    return (i * 7919) % n_hosts  # scatter, stable


def _scheme_of(i: int) -> str:
    return "https" if i % 7 == 0 else "http"


def _path_of(i: int) -> str:
    return f"/private/p/{i}" if i % 11 == 3 else f"/p/{i}"


def _children_of(i: int, n: int, shape: str) -> list[int]:
    if shape == "bfs-tree":
        return [c for c in (3 * i + 1, 3 * i + 2, 3 * i + 3) if c < n]
    if shape == "deep-chain":
        out = [i + 1] if i + 1 < n else []
        if i % 10 == 0 and i + 2 < n:
            out.append(i + 2)
        return out
    if shape == "diamond":
        return [(i + 1) % n, (i + 2) % n, (i * 2 + 1) % n, (i * 2 + 2) % n]
    # mixed / hot-host: scattered with heavy re-linking (dedup pressure)
    return [(3 * i + 1) % n, (3 * i + 2) % n, (7 * i + 5) % n]


def _filler(i: int, k: int = 12) -> str:
    return " ".join(_WORDS[(i * 13 + j * 5) % len(_WORDS)] for j in range(k))


def neardup_image_corpus(n: int = 48, side: int = 24, seed: int = 99):
    """Deterministic fixture for phash near-dup: n random-noise rgb8 images
    plus a lightly-perturbed variant of each ('<id>-v', 12 pixels of
    side*side redrawn). Noise images have well-separated average-hashes
    (expected hamming ~32 between unrelated), while each variant stays
    within a few bits of its original — unlike the crawl corpus's patterned
    images, whose avg-hashes collapse to a handful of values.
    Returns [(image_id, rgb8_bytes)]."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        px = rng.integers(0, 256, (side, side, 3), dtype=np.uint8)
        rows.append((f"nd-{i:03d}", codecs.encode_rgb8(px)))
        noisy = px.copy()
        ys = rng.integers(0, side, 12)
        xs = rng.integers(0, side, 12)
        noisy[ys, xs] = rng.integers(0, 256, (12, 3), dtype=np.uint8)
        rows.append((f"nd-{i:03d}-v", codecs.encode_rgb8(noisy)))
    return rows


def gen_image(image_id: str, idx: int) -> tuple[np.ndarray, str, str]:
    """Deterministic pixels + fmt + caption for one image."""
    rng = np.random.default_rng(zlib.crc32(image_id.encode()) % (2**31))
    w = 8 + (idx * 29) % 41
    h = 8 + (idx * 37) % 41
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        (xx * 255 / max(1, w - 1))[:, :, None] * np.array([1.0, 0.5, 0.25])
        + (yy * 255 / max(1, h - 1))[:, :, None] * np.array([0.25, 0.5, 1.0])
    ) / 1.25
    noise = rng.integers(0, 40, size=(h, w, 3))
    px = np.clip(base + noise, 0, 255).astype(np.uint8)
    fmt = _FMTS[idx % 3]
    caption = f"image {image_id} " + _filler(idx, 6)
    return px, fmt, caption


def generate(seed: int = 42, n_pages: int = 120, shape: str = "mixed",
             n_seeds: int = 25) -> SynthWeb:
    n_hosts = max(4, n_pages // 40)
    if shape == "robots-walled":
        n_hosts = max(6, n_hosts)

    hosts = [f"host-{h:04d}.example" for h in range(n_hosts)]
    page_host = [_host_of(i, n_pages, n_hosts, shape) for i in range(n_pages)]
    page_url = [
        f"{_scheme_of(i)}://{hosts[page_host[i]]}{_path_of(i)}"
        for i in range(n_pages)
    ]

    pages_rows, images_rows, pixels = [], [], {}
    for i in range(n_pages):
        host_i, url_i = hosts[page_host[i]], page_url[i]
        base_url = f"{_scheme_of(i)}://{host_i}"
        status = 404 if i % 19 == 7 else (500 if i % 23 == 9 else 200)
        if i % 17 == 11:
            ctype = "image/png"
        elif i % 29 == 13:
            ctype = "application/pdf"
        elif i % 13 == 5:
            ctype = "text/plain"
        else:
            ctype = "text/html"
        latency = 20 + (i * 31) % 180

        hrefs: list[str] = []
        image_ids: list[str] = []
        if ctype == "text/html":
            for j, c in enumerate(_children_of(i, n_pages, shape)):
                curl = page_url[c]
                variant = (i + j) % 5
                if variant == 1 and page_host[c] == page_host[i]:
                    hrefs.append(_path_of(c))          # relative -> base+path
                elif variant == 2:
                    hrefs.append(curl + "#sec1")        # fragment, same canon
                elif variant == 3:
                    hrefs.append(curl.replace("/p/", "/%70/", 1))  # pct-enc
                elif variant == 4 and i % 4 == 0:
                    hrefs.append(curl + f"?ref={i}")    # query -> distinct url
                else:
                    hrefs.append(curl)
            junk = ["#top", "?sort=asc", "javascript:void(0)", "mailto:a@b.c"]
            hrefs.append(junk[i % len(junk)])
            if i % 4 == 0:  # dead link -> fetch error path
                hrefs.append(f"{base_url}/p/{n_pages + i % 50}")
            n_imgs = i % 4
            for j in range(n_imgs):
                image_id = f"img-{i:06d}-{j}"
                image_ids.append(image_id)
                px, fmt, caption = gen_image(image_id, i * 4 + j)
                data = codecs.encode(px, fmt)
                pixels[image_id] = px
                images_rows.append(
                    {
                        "image_id": image_id,
                        "bytes": data,
                        "w": px.shape[1],
                        "h": px.shape[0],
                        "fmt": fmt,
                        "caption": caption,
                    }
                )
        html = _render_html(i, host_i, hrefs, image_ids, ctype)
        pages_rows.append(
            {
                "url": url_i,
                "host": host_i,
                "status": status,
                "content_type": ctype,
                "fetch_latency_ms": latency,
                "html": html,
                "child_urls": hrefs,
                "image_ids": image_ids,
            }
        )

    robots_rows = []
    origin = dt.datetime.fromtimestamp(1_700_000_000, tz=dt.timezone.utc)
    for h, host in enumerate(hosts):
        if shape == "robots-walled" and h % 3 == 1:
            txt = "User-agent: grawler\nDisallow: /\n"
        elif h % 7 == 3:
            txt = "User-agent: grawler\nDisallow: /\n\nUser-agent: *\nAllow: /\n"
        elif h % 5 == 1:
            txt = "User-agent: *\nDisallow: /private/\nAllow: /private/open\n"
        else:
            txt = "User-agent: *\nAllow: /\n"
        stale = h % 6 == 5
        robots_rows.append(
            {
                "host": host,
                "robots_txt": txt,
                "fetched_ts": origin - dt.timedelta(days=100 if stale else 1),
            }
        )

    n_seeds = min(n_seeds, n_pages)
    seed_urls = sorted({page_url[(k * n_pages) // n_seeds] for k in range(n_seeds)})

    return SynthWeb(
        seeds=pd.DataFrame({"url": seed_urls}),
        pages=pd.DataFrame(pages_rows),
        robots=pd.DataFrame(robots_rows),
        images=pd.DataFrame(images_rows),
        pixels=pixels,
        n_pages=n_pages,
        shape=shape,
    )


def _render_html(i: int, host: str, hrefs: list[str], image_ids: list[str],
                 ctype: str) -> str:
    if ctype == "text/plain":
        return f"Plain text page {i}. {_filler(i, 30)}"
    if ctype not in ("text/html",):
        return ""
    links = "\n".join(
        f'<a href="{href}">link {j}</a>' for j, href in enumerate(hrefs)
    )
    imgs = []
    for j, image_id in enumerate(image_ids):
        _, fmt, caption = gen_image(image_id, i * 4 + j)
        src = f"/img/{image_id}.{fmt}"
        if j % 3 == 2:
            imgs.append(
                f'<figure><img src="{src}">'
                f"<figcaption>{caption}</figcaption></figure>"
            )
        else:
            imgs.append(f'<img src="{src}" alt="{caption}">')
    return (
        "<html><head>\n"
        f"<title>Page {i} on {host}</title>\n"
        f'<meta name="description" content="Synthetic page {i} about '
        f'{_filler(i, 4)}">\n'
        f'<meta property="og:site_name" content="{host}">\n'
        '<link rel="icon" href="/favicon.ico">\n'
        "</head><body>\n"
        f"<h1>Page {i}</h1>\n<p>{_filler(i, 20)}</p>\n"
        + links
        + "\n"
        + "\n".join(imgs)
        + '\n<script>var hidden = "not visible text";</script>'
        "\n</body></html>"
    )


def load_seed_list(spark, path: str):
    """S2: load a reference-format seed file {"seed_list": [url, ...]}
    (src/jsonData/jsonData.go:15-40) into a seeds DataFrame."""
    import pyspark.sql.functions as F

    return (
        spark.read.option("multiLine", "true").json(path)
        .select(F.explode("seed_list").alias("url"))
    )


def spark_tables(spark, web: SynthWeb):
    """Create the Spark-side input DataFrames from a SynthWeb."""
    from . import schemas

    seeds = spark.createDataFrame(web.seeds, schema=schemas.SEEDS)
    pages = spark.createDataFrame(
        web.pages[
            ["url", "host", "status", "content_type", "fetch_latency_ms",
             "html", "child_urls", "image_ids"]
        ],
        schema=schemas.PAGES,
    )
    robots = spark.createDataFrame(web.robots, schema=schemas.ROBOTS)
    images = spark.createDataFrame(
        web.images if len(web.images) else
        pd.DataFrame(columns=["image_id", "bytes", "w", "h", "fmt", "caption"]),
        schema=schemas.IMAGES,
    )
    return seeds, pages, robots, images
