"""Generate VALUES-literal DuckDB oracles for the deterministic crawl/img
entry queries — from the PURE-PYTHON oracle, no Spark involved.

The crawl_* and img_* entries in __spark_entry__.py are pure functions of
synthgen seed 42 (n_pages=60, shape=mixed, 3 waves). Their expected rows are
produced here by the independent simulator (grawler.oracle) and pure-numpy
image math (grawler.codecs + grawler.operators.images pure helpers), written
to grawler/entry_expected.json. __spark_entry__.oracle_sql() renders that
JSON as `SELECT * FROM (VALUES ...)` so the driver hash-checks the Spark
engine against oracle-derived literals instead of recording rows-only.

Rerun after any intentional semantics change:
    python tools/gen_value_oracles.py
"""

from __future__ import annotations

import json
import os
import sys
from decimal import ROUND_HALF_UP, Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grawler import codecs, oracle, synthgen  # noqa: E402
from grawler.conf import CrawlConfig  # noqa: E402
from grawler.operators.images import (  # noqa: E402
    FEATURE_DIM,
    _block_mean_resize,
    feature_vec,
)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "grawler", "entry_expected.json")


def spark_round(x: float, s: int = 6) -> float:
    """Spark's round(): BigDecimal.valueOf(double).setScale(s, HALF_UP) —
    i.e. HALF_UP on the shortest decimal repr, not banker's rounding."""
    return float(
        Decimal(repr(float(x))).quantize(Decimal(1).scaleb(-s),
                                         rounding=ROUND_HALF_UP))


def main() -> None:
    web = synthgen.generate(seed=42, n_pages=60, shape="mixed")
    o = oracle.crawl(web, CrawlConfig(), max_waves=3)

    out: dict = {}
    out["crawl_seen"] = {
        "columns": ["url", "first_wave"],
        "types": ["VARCHAR", "INTEGER"],
        "rows": sorted([u, w] for u, w in o.seen.items()),
    }
    out["crawl_trace"] = {
        "columns": ["wave", "seq", "url", "host", "depth"],
        "types": ["INTEGER", "INTEGER", "VARCHAR", "VARCHAR", "INTEGER"],
        "rows": [list(t) for t in o.trace],
    }
    out["crawl_store"] = {
        "columns": ["image_id", "w", "h", "fmt", "caption", "phash"],
        "types": ["VARCHAR", "INTEGER", "INTEGER", "VARCHAR", "VARCHAR",
                  "BIGINT"],
        "rows": sorted(
            [r["image_id"], r["w"], r["h"], r["fmt"], r["caption"],
             r["phash"]]
            for r in o.store.values()
        ),
    }
    out["crawl_pages_meta"] = {
        "columns": ["url", "title", "description", "site_name", "icon",
                    "content"],
        "types": ["VARCHAR"] * 6,
        "rows": sorted(
            [u, m["title"], m["description"], m["site_name"], m["icon"],
             m["content"]]
            for u, m in o.pages_meta.items()
        ),
    }

    out["crawl_frontier"] = {
        "columns": ["url", "parent_url", "host", "depth", "priority",
                    "wave"],
        "types": ["VARCHAR", "VARCHAR", "VARCHAR", "INTEGER", "INTEGER",
                  "INTEGER"],
        "rows": sorted(
            [r["url"], r["parent_url"], r["host"], r["depth"],
             r["priority"], r["wave"]]
            for r in o.frontier
        ),
    }
    budget: dict = {}
    for (w, _seq, _u, h, _d) in o.trace:
        lw, n = budget.get(h, (0, 0))
        budget[h] = (max(lw, w), n + 1)
    out["crawl_host_budget"] = {
        "columns": ["host", "last_crawl_wave", "fetches"],
        "types": ["VARCHAR", "INTEGER", "BIGINT"],
        "rows": sorted([h, lw, n] for h, (lw, n) in budget.items()),
    }
    out["crawl_metrics"] = {
        "columns": ["wave", "scheduled", "fetched", "parsed", "deduped",
                    "stored", "errors"],
        "types": ["INTEGER"] + ["BIGINT"] * 6,
        "rows": [
            [m["wave"], m["scheduled"], m["fetched"], m["parsed"],
             m["deduped"], m["stored"], m["errors"]]
            for m in o.metrics
        ],
    }

    ph_rows, rs_rows, ft_rows = [], [], []
    for r in web.images.to_dict("records"):
        px = codecs.decode(bytes(r["bytes"]), r["fmt"])
        ph_rows.append([r["image_id"], int(r["w"]), int(r["h"]), r["fmt"],
                        codecs.phash64(px), True])
        small = _block_mean_resize(px, 16, 16)
        rs_rows.append([r["image_id"], 16, 16, "rgb8",
                        len(codecs.encode_rgb8(small))])
        fv = feature_vec(px)
        ft_rows.append([r["image_id"], spark_round(fv[0]),
                        spark_round(fv[6]), FEATURE_DIM])
    # img_neardup_phash: python replication of the banded hamming join over
    # the deterministic noise corpus (originals + perturbed variants)
    phashes: dict[str, int] = {}
    for iid, data in synthgen.neardup_image_corpus():
        phashes[iid] = codecs.phash64(codecs.decode(data, "rgb8"))
    n_bands, width, max_h = 8, 8, 6
    buckets: dict = {}
    for iid, ph in phashes.items():
        u = ph & ((1 << 64) - 1)
        for bi in range(n_bands):
            buckets.setdefault(
                (bi, (u >> (width * bi)) & ((1 << width) - 1)), []
            ).append(iid)
    nd_rows = set()
    for ids in buckets.values():
        for x in ids:
            for y in ids:
                if x < y:
                    ham = bin((phashes[x] ^ phashes[y])
                              & ((1 << 64) - 1)).count("1")
                    if ham <= max_h:
                        nd_rows.add((x, y, ham))
    out["img_neardup_phash"] = {
        "columns": ["id_a", "id_b", "hamming"],
        "types": ["VARCHAR", "VARCHAR", "INTEGER"],
        "rows": sorted(list(r) for r in nd_rows),
    }

    # pandas int64 -> Spark LongType for the corpus-frame w/h in img_phash
    out["img_phash"] = {
        "columns": ["image_id", "w", "h", "fmt", "phash", "decode_ok"],
        "types": ["VARCHAR", "BIGINT", "BIGINT", "VARCHAR", "BIGINT",
                  "BOOLEAN"],
        "rows": sorted(ph_rows),
    }
    out["img_resize"] = {
        "columns": ["image_id", "w", "h", "fmt", "n_bytes"],
        "types": ["VARCHAR", "INTEGER", "INTEGER", "VARCHAR", "BIGINT"],
        "rows": sorted(rs_rows),
    }
    out["img_features"] = {
        "columns": ["image_id", "mean_r", "luma_bin0", "dim"],
        "types": ["VARCHAR", "DOUBLE", "DOUBLE", "BIGINT"],
        "rows": sorted(ft_rows),
    }

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    total = sum(len(v["rows"]) for v in out.values())
    print(f"wrote {OUT}: {len(out)} oracles, {total} expected rows")


if __name__ == "__main__":
    main()
