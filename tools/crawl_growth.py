"""The composed scale proof: ONE crawl whose per-wave wall time stays flat
while the seen/store state grows 10x+ (VERDICT r3 'Next round' #2).

SEEN_PROBE.md proves the exact probe is flat under seen growth and
COMMIT_COST.md proves O(delta) commits — each in isolation. This bench runs
the REAL engine (bloom prefilter + bucketed exact probes + MERGE state
tables + self-resizing filter + image decode/phash store) over a layered
synthetic web where every wave discovers a constant number of NEW pages, so
cumulative seen/store grow linearly while per-wave work is constant. If any
hidden O(total-state) cost remained composed into the wave loop, the later
waves would slow down; flat per-wave wall time IS the integral of the
round-2/3 scale fixes.

Web shape: `waves` layers x `per_wave` pages. Page (l, i) links to layer-l+1
pages {i, i+1, i+2 mod P} — every page is discovered by 3 parents (real
dedup pressure: each wave's candidate set is ~3x its new-URL count) — and
references a UNIQUE image, so the store grows with seen. All tables are
generated distributed (spark.range / mapInPandas); no driver-side data.

Usage: python tools/crawl_growth.py [per_wave] [waves]   (default 60000 12)
Writes BENCH/CRAWL_GROWTH.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from grawler.conf import CrawlConfig  # noqa: E402
from grawler.engine import CrawlEngine  # noqa: E402
from grawler.session import get_spark  # noqa: E402
from grawler.store import LocalSnapshotStore  # noqa: E402

N_HOSTS = 4096
IMG_W = IMG_H = 8  # tiny unique image per page: store grows with seen


def layered_web(spark, per_wave: int, waves: int):
    """(pages, robots, images, seeds) for the layered growth web — all
    assembled with native expressions over spark.range."""
    n = per_wave * waves
    ids = spark.range(n).select(
        F.col("id"),
        (F.col("id") / per_wave).cast("int").alias("layer"),
        F.pmod("id", per_wave).cast("int").alias("idx"),
    )
    host = F.concat(F.lit("host-"),
                    F.pmod(F.xxhash64("id"), F.lit(N_HOSTS)).cast("string"),
                    F.lit(".example"))
    url = F.concat(F.lit("http://"), host, F.lit("/L"), "layer",
                   F.lit("/p/"), "idx")

    def child_link(k: int):
        cidx = F.pmod(F.col("idx") + k, F.lit(per_wave))
        # cast to long BEFORE hashing: xxhash64 is type-width-sensitive,
        # so an int32 child id would hash to a different host than the
        # child page's own url (built from the long range id)
        cid = ((F.col("layer") + 1) * per_wave + cidx).cast("long")
        churl = F.concat(
            F.lit("http://host-"),
            F.pmod(F.xxhash64(cid), F.lit(N_HOSTS)).cast("string"),
            F.lit(".example/L"), F.col("layer") + 1, F.lit("/p/"), cidx)
        # last layer links nowhere (frontier drains after `waves` waves)
        return F.when(F.col("layer") < waves - 1,
                      F.concat(F.lit('<a href="'), churl, F.lit('">c</a>'))
                      ).otherwise(F.lit(""))

    # engine id convention (engine.IMG_ID_PATTERN): img-<6 digits>-<n>;
    # (idx, layer) is unique per page so the store grows with seen
    img_id = F.format_string("img-%06d-%d", F.col("idx"), F.col("layer"))
    html = F.concat(
        F.lit("<html><head><title>p</title></head><body>"),
        child_link(0), child_link(1), child_link(2),
        F.lit('<img src="/img/'), img_id, F.lit('.rgb8" alt="cap">'),
        F.lit("</body></html>"),
    )
    pages = ids.select(
        url.alias("url"), host.alias("host"),
        F.lit(200).cast("short").alias("status"),
        F.lit("text/html").alias("content_type"),
        F.lit(10).alias("fetch_latency_ms"), html.alias("html"),
        F.array().cast("array<string>").alias("child_urls"),
        F.array().cast("array<string>").alias("image_ids"),
    )

    def gen_images(batches):
        import numpy as np
        import pandas as pd

        from grawler import codecs

        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                layer, idx = i // per_wave, i % per_wave
                rng = np.random.default_rng(i)
                px = rng.integers(0, 256, (IMG_H, IMG_W, 3), dtype=np.uint8)
                out.append((f"img-{idx:06d}-{layer}",
                            codecs.encode(px, "rgb8"),
                            IMG_W, IMG_H, "rgb8", f"cap {i}"))
            yield pd.DataFrame(out, columns=["image_id", "bytes", "w", "h",
                                             "fmt", "caption"])

    images = spark.range(n).repartition(32).mapInPandas(
        gen_images,
        schema=("image_id string, bytes binary, w int, h int, "
                "fmt string, caption string"))
    robots = spark.range(N_HOSTS).select(
        F.concat(F.lit("host-"), F.col("id").cast("string"),
                 F.lit(".example")).alias("host"),
        F.lit("User-agent: *\nAllow: /\n").alias("robots_txt"),
    ).withColumn("fetched_ts", F.current_timestamp())
    seeds = ids.where(F.col("layer") == 0).select(url.alias("url"))
    return pages, robots, images, seeds


def main() -> None:
    per_wave = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    waves = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    compact_every = 4

    spark = get_spark("crawl-growth", master="local[32]",
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    pages, robots, images, seeds = layered_web(spark, per_wave, waves)

    cfg = CrawlConfig(
        wave_cap=per_wave * 4,
        # enough politeness tokens that the layer's ~per_wave/N_HOSTS
        # fetches per host never defer (deferral would hide growth)
        wave_duration_ms=700 * (4 * per_wave // N_HOSTS + 8),
        # deliberately UNDERSIZED bloom (64 segments x 2^14 bits = 1.05M
        # bits, k=4 -> 0.5 fill at ~180k seen): the crawl OUTGROWS the
        # filter mid-run, so the saturation-triggered rebuild path (double
        # m, rebuild from the exact seen set at a compaction wave) fires
        # under measurement instead of only in pytest
        bloom_m=1 << 14,
    )
    wh = tempfile.mkdtemp(prefix="grawler_growth_")
    rows: list[dict] = []
    try:
        eng = CrawlEngine(spark, pages, robots, images, wh, cfg,
                          robots_cache_init=robots)
        # deliberately small initial buckets/target so the adaptive nb
        # layout must double at least twice mid-crawl (bucket size stays
        # <= target as seen/store grow 12x)
        eng.state = LocalSnapshotStore(spark, wh,
                                       compact_every=compact_every,
                                       initial_buckets=4,
                                       bucket_target_rows=1 << 16)
        seen_total = store_total = 0
        prev = {"m": cfg.bloom_m, "nb": 4}

        def on_wave(w, m, wall):
            nonlocal seen_total, store_total
            seen_total += m["n_parsed"]
            store_total += m.get("n_stored", 0)
            cur_m = int(eng._filter_params.get("m", 0))
            cur_nb = eng.state._current_nb("seen")
            events = []
            if cur_m != prev["m"]:
                events.append(f"filter rebuild m {prev['m']}->{cur_m}")
            if cur_nb != prev["nb"]:
                events.append(f"nb {prev['nb']}->{cur_nb}")
            prev["m"], prev["nb"] = cur_m, cur_nb
            rows.append({
                "wave": w, "wall": wall,
                "scheduled": m["n_scheduled"], "seen": seen_total,
                "store": store_total,
                "compact": w > 0 and w % compact_every == 0,
                "m": cur_m, "nb": cur_nb, "events": events,
            })
            note = ("compaction " if rows[-1]["compact"] else "") + \
                "; ".join(events)
            print(f"wave {w:>2}: {wall:6.1f}s scheduled={m['n_scheduled']:>7,} "
                  f"seen={seen_total:>9,} store={store_total:>9,}  {note}",
                  flush=True)

        t0 = time.time()
        eng.run(seeds, max_waves=waves, on_wave=on_wave)
        total = time.time() - t0
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    import statistics

    # gates: per-wave wall flat. wave 0 is warmup (codegen + python worker
    # spin-up); compaction waves are annotated, not compared. Two
    # statistics: the endpoint ratio (first post-warmup delta wave vs
    # last), and — robust to the 10-45% same-box noise floor the r4 bench
    # recorded — the MEDIAN of the first 3 vs the last 3 delta waves.
    delta = [r for r in rows[1:] if not r["compact"]]
    ratio = (delta[-1]["wall"] / delta[0]["wall"]) if len(delta) >= 2 else 1.0
    med_first = statistics.median(r["wall"] for r in delta[:3])
    med_last = statistics.median(r["wall"] for r in delta[-3:])
    med_ratio = med_last / med_first if med_first else 1.0
    growth = rows[-1]["seen"] / max(1, rows[0]["seen"])
    rebuilds = [r["wave"] for r in rows
                if any(e.startswith("filter rebuild") for e in r["events"])]
    nb_growths = [r["wave"] for r in rows
                  if any(e.startswith("nb") for e in r["events"])]

    md = [
        "# Composed growth crawl: wave cost vs growing state",
        "",
        f"ONE real engine crawl (bloom prefilter + bucketed seen/store_keys",
        f"probes + MERGE frontier/robots tables + self-resizing filter +",
        f"image decode/phash store), {waves} waves x {per_wave:,} new pages",
        f"per wave on a layered synthetic web (every page discovered by 3",
        f"parents -> ~3x dedup pressure; every page stores a unique image).",
        f"local[32], compact_every={compact_every}. Total {total:.0f}s.",
        "",
        f"The bloom filter starts deliberately UNDERSIZED (m=2^14 bits x",
        f"{cfg.bloom_segments} segments, 0.5 fill at ~180k seen) and the",
        f"bucketed tables start at nb=4 with a 65,536-row bucket target, so",
        f"the self-resizing machinery must fire MID-CRAWL under",
        f"measurement: saturation-triggered filter rebuilds (double m,",
        f"rebuild from exact seen) and nb doublings (bounded bucket size)",
        f"both land at compaction waves and are annotated below.",
        "",
        "| wave | wall (s) | scheduled | seen total | store total "
        "| bloom m | nb | note |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        note = ("compaction" if r["compact"] else "")
        if r["events"]:
            note += (": " if note else "") + "; ".join(r["events"])
        md.append(
            f"| {r['wave']} | {r['wall']:.1f} | {r['scheduled']:,} "
            f"| {r['seen']:,} | {r['store']:,} "
            f"| 2^{r['m'].bit_length() - 1} | {r['nb']} | {note} |")
    md += [
        "",
        f"State growth first->last wave: **{growth:.1f}x** "
        f"(seen {rows[0]['seen']:,} -> {rows[-1]['seen']:,}).",
        f"Delta-wave wall ratio, endpoint (first post-warmup -> last,",
        f"compaction waves excluded): **{ratio:.2f}x** (gate <= 1.3x).",
        f"Delta-wave wall ratio, median of first 3 vs last 3 delta waves:",
        f"**{med_ratio:.2f}x** ({med_first:.1f}s -> {med_last:.1f}s; robust",
        f"to the 10-45% single-wave noise floor recorded in BENCH_r04).",
        "",
        f"Filter rebuilds fired at waves {rebuilds or 'NONE'}; nb growth at",
        f"waves {nb_growths or 'NONE'} (final nb ="
        f" {rows[-1]['nb']}, final m = 2^{rows[-1]['m'].bit_length() - 1}).",
        "",
        "Wave 0 includes JVM codegen + python-worker warmup. Compaction",
        "waves additionally rewrite the bucketed seen/store_keys tables",
        "and resolve the frontier MERGE log — an amortized O(total-state)",
        "cost paid every "
        f"{compact_every} waves by design (BENCH/COMMIT_COST.md); a",
        "filter rebuild adds one scan of the exact seen set at the same",
        "amortization point.",
        "",
        f"Verdict: wave cost {'FLAT' if med_ratio <= 1.3 else 'NOT FLAT'} "
        f"(median statistic) while seen grew {growth:.0f}x with all engine "
        f"machinery composed, including "
        f"{len(rebuilds)} mid-crawl filter rebuild(s) and "
        f"{len(nb_growths)} nb growth event(s).",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "CRAWL_GROWTH.md")
    with open(out, "w") as f:
        f.write("\n".join(md) + "\n")
    print(f"wrote {out}; ratio={ratio:.2f} med_ratio={med_ratio:.2f} "
          f"growth={growth:.1f}x rebuilds={rebuilds} nb_growth={nb_growths}")


if __name__ == "__main__":
    main()
