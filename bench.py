"""Benchmark harness (driver contract + scaling evidence).

Runs headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also measures the two BASELINE.json target throughputs:
  - frontier_urls_per_sec: URLs scheduled+deduped/sec over a synthetic
    1M-row skewed frontier (generated distributed via spark.range — no
    driver-side data), through the real scheduling operators:
    canonical allowlist filter -> seen anti-join -> salted per-host
    politeness top-k -> global sequence.
  - store_rows_per_sec: image rows decoded+phashed+deduped into store shape.

Run tools/scaling_run.py for the N-vs-4N cores scaling-efficiency report
(BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FRONTIER_ROWS = int(os.environ.get("GRAWLER_BENCH_FRONTIER", "1000000"))
IMG_ROWS = int(os.environ.get("GRAWLER_BENCH_IMAGES", "12000"))
# best-of-N with recorded spread: the r3 verdict found a single-shot bench
# swinging +75% on an unchanged query on this shared box — a one-sample
# artifact cannot gate anything. min is the capability number (matches
# clean-box runs); median+spread expose the noise the artifact absorbed.
REPEATS = int(os.environ.get("GRAWLER_BENCH_REPEATS", "3"))


def wait_for_idle(max_wait_s: float | None = None,
                  load_threshold: float = 2.0) -> float:
    """Bounded wait for the 1-minute load average to decay below
    `load_threshold` before measuring. This round's same-code fresh-JVM
    wave runs swung 21.4-24.8s min purely with ambient load; a bounded
    pre-measurement wait removes the avoidable part of that swing while
    the cap guarantees the bench still runs on a permanently-busy box.
    Returns seconds actually waited (recorded in the output JSON)."""
    if max_wait_s is None:
        max_wait_s = float(os.environ.get("GRAWLER_BENCH_IDLE_WAIT", "180"))
    t0 = time.time()
    while time.time() - t0 < max_wait_s:
        if os.getloadavg()[0] < load_threshold:
            break
        time.sleep(10)
    return round(time.time() - t0, 1)


def timed_best(fn, repeats: int = REPEATS) -> dict:
    """Run fn() -> wall-sec `repeats` times; report min/median/spread."""
    import statistics

    samples = sorted(fn() for _ in range(max(1, repeats)))
    return {
        "min": round(samples[0], 3),
        "median": round(statistics.median(samples), 3),
        "spread_pct": round(
            100.0 * (samples[-1] - samples[0]) / samples[0], 1)
        if samples[0] > 0 else 0.0,
    }


def synth_frontier(spark, n: int):
    """Distributed synthetic frontier: ~10k hosts, one hot host with ~20%
    of rows, 30% urls overlapping the seen set."""
    df = spark.range(n).select(
        F.col("id"),
        F.when(F.pmod("id", 5) == 0, F.lit("hot.example")).otherwise(
            F.concat(F.lit("host-"),
                     F.pmod(F.xxhash64("id"), F.lit(10000)).cast("string"),
                     F.lit(".example"))
        ).alias("host"),
    )
    return df.select(
        F.concat(F.lit("http://"), "host", F.lit("/p/"), "id").alias("url"),
        F.lit("").alias("parent_url"),
        "host",
        F.pmod("id", 8).cast("int").alias("depth"),
        F.lit(0).alias("priority"),
        F.lit(0).alias("wave"),
    )


def bench_frontier(spark, warmup: bool = True) -> tuple[float, float]:
    """The real wave-scheduling pipeline: canonicalize (Arrow UDF) ->
    allowlist -> seen anti-join -> salted politeness -> global sequence."""
    from grawler.scheduler import schedule_wave
    from grawler.urlnorm import allow_predicate, with_canonical

    def one_pass(n_rows: int) -> float:
        frontier = synth_frontier(spark, n_rows)
        seen = frontier.where(
            F.pmod(F.xxhash64("url"), F.lit(10)) < 3).select("url")
        registry: list = []
        t0 = time.time()
        canon = with_canonical(frontier.drop("host"), "url")
        cand = canon.where(allow_predicate()).select(
            F.col("url_canon").alias("url"), "parent_url", "host",
            "depth", "priority", "wave",
        ).join(seen, "url", "left_anti")
        scheduled, deferred = schedule_wave(
            cand, host_tokens=1000, wave_cap=n_rows, salt_buckets=16,
            registry=registry)
        scheduled.count()
        dt = time.time() - t0
        # unpersist: Spark's CacheManager would otherwise substitute these
        # cached plans into the next (timed) pass and fake the measurement
        for df in registry:
            df.unpersist()
        return dt

    if warmup:  # absorb JVM codegen + python-worker startup once; full size
        # so AQE picks the same physical plans as the timed pass
        one_pass(FRONTIER_ROWS)
    stats = timed_best(lambda: one_pass(FRONTIER_ROWS))
    return stats, FRONTIER_ROWS / stats["min"]


def bench_frontier_split(spark) -> dict:
    """Per-stage scaling evidence: times the Arrow/python-worker stage
    (canonicalize pandas UDF) and the JVM shuffle stage (seen anti-join +
    salted politeness + two-phase global sequence) SEPARATELY, so the
    N-vs-4N efficiency report can attribute scaling loss to the shared JVM
    heap rather than the engine's dataflow (BENCH/BASELINE.md)."""
    from grawler.scheduler import schedule_wave
    from grawler.urlnorm import with_canonical

    n = FRONTIER_ROWS

    def arrow_pass() -> float:
        frontier = synth_frontier(spark, n)
        t0 = time.time()
        (with_canonical(frontier.drop("host"), "url")
         .select("url_canon", "scheme", "host", "path")
         .write.format("noop").mode("overwrite").save())
        return time.time() - t0

    def jvm_pass() -> float:
        frontier = synth_frontier(spark, n)  # native exprs only, no UDF
        seen = frontier.where(
            F.pmod(F.xxhash64("url"), F.lit(10)) < 3).select("url")
        registry: list = []
        t0 = time.time()
        cand = frontier.join(seen, "url", "left_anti")
        scheduled, _ = schedule_wave(cand, host_tokens=1000, wave_cap=n,
                                     salt_buckets=16, registry=registry)
        scheduled.count()
        dt = time.time() - t0
        for df in registry:
            df.unpersist()
        return dt

    arrow_pass()  # warmup (python workers / codegen)
    a_dt = arrow_pass()
    jvm_pass()
    j_dt = jvm_pass()
    return {
        "arrow_urls_per_sec": round(n / a_dt),
        "jvm_urls_per_sec": round(n / j_dt),
        "arrow_sec": round(a_dt, 3),
        "jvm_sec": round(j_dt, 3),
    }


def bench_ann_d512(spark, n: int = 20_000, dim: int = 512,
                   n_queries: int = 8) -> float:
    """Sign-LSH ANN at a realistic embedding dim (512): the signature is one
    numpy matmul per Arrow batch — this entry exists to prove the plan holds
    where the round-1 per-dimension inlined expressions hit the JVM codegen
    method limit. Clustered vectors (i.i.d. gaussians have no true
    neighbors at dim 512)."""
    import numpy as np
    import pandas as pd

    from grawler.operators.similarity import ann_lsh_topk, cosine_topk

    rng = np.random.default_rng(17)
    n_clusters = 200
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    reps = n // n_clusters
    vecs = (np.repeat(centers, reps, axis=0)
            + 0.2 * rng.standard_normal((n_clusters * reps, dim))
            .astype(np.float32))
    pdf = pd.DataFrame({
        "vec_id": range(len(vecs)),
        "embedding": [v.astype(float).tolist() for v in vecs],
    })
    df = spark.createDataFrame(pdf).repartition(32).persist()
    df.count()
    q = df.where(F.col("vec_id") < n_queries)

    def one_pass() -> float:
        t0 = time.time()
        ann_lsh_topk(df, q, dim=dim, k=5, bits=10, tables=8).write.format(
            "noop").mode("overwrite").save()
        return time.time() - t0

    stats = timed_best(one_pass)
    # recall@k vs brute force at the same dim/seeds: a recall regression
    # (e.g. a broken bucket key) must surface in the artifact, not only in
    # the pytest fixed-seed gate
    k = 5
    ann = {(r["query_id"], r["neighbor_id"])
           for r in ann_lsh_topk(df, q, dim=dim, k=k, bits=10,
                                 tables=8).collect()}
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(df, q, k=k).collect()}
    recall = round(len(ann & exact) / max(1, len(exact)), 4)
    df.unpersist()
    return stats, recall


# gates for the seed-averaged hard case (see bench_ann_hard: the original
# single-seed 0.9 gate sat on a lucky seed). Deterministic quantities —
# the margins absorb BLAS summation-order differences, not noise.
ANN_HARD_TARGET = 0.8          # mean over seeds at deploy defaults (~0.85)
ANN_HARD_SCALEUP_TARGET = 0.95  # mean at tables=16 (~0.99): the knob works


ANN_HARD_SEEDS = (17, 101, 2025, 424242)


def bench_ann_hard(spark, n: int = 20_000, dim: int = 64,
                   n_queries: int = 16) -> dict:
    """Falsifiable ANN recall: OVERLAPPING clusters (noise 0.8 vs unit
    centers), SEED-AVERAGED. The first version of this bench used one
    data seed (17) and measured 0.9625 at the deploy-default index
    params (bits=6, tables=8) — re-measuring across four seeds showed
    that was a lucky draw (per-seed 0.9625/0.875/0.75/0.8125): the
    default index's real operating point on this workload is mean ~0.85.
    The metric is now the mean and min over ANN_HARD_SEEDS at default
    params (the honest default-config number, gate on the mean), plus
    the same mean at tables=16 — the index's documented recall knob —
    which restores mean 0.99 / min 0.975 at ~2x probe cost, so a
    deployment needing >=0.95 recall knows exactly what it pays. All
    quantities are deterministic (fixed data seeds, fixed plane seed):
    any change in these numbers is a code change, not noise."""
    import numpy as np
    import pandas as pd

    from grawler.operators.similarity import ann_lsh_topk, cosine_topk

    k = 5
    n_clusters = 200

    def one_seed(seed: int, tables: int) -> float:
        rng = np.random.default_rng(seed)
        centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
        reps = n // n_clusters
        vecs = (np.repeat(centers, reps, axis=0)
                + 0.8 * rng.standard_normal((n_clusters * reps, dim))
                .astype(np.float32))
        pdf = pd.DataFrame({
            "vec_id": range(len(vecs)),
            "embedding": [v.astype(float).tolist() for v in vecs],
        })
        df = spark.createDataFrame(pdf).repartition(32).persist()
        df.count()
        q = df.where(F.col("vec_id") < n_queries)
        ann = {(r["query_id"], r["neighbor_id"])
               for r in ann_lsh_topk(df, q, dim=dim, k=k,
                                     tables=tables).collect()}
        exact = {(r["query_id"], r["neighbor_id"])
                 for r in cosine_topk(df, q, k=k).collect()}
        df.unpersist()
        return len(ann & exact) / max(1, len(exact))

    default = [one_seed(s, tables=8) for s in ANN_HARD_SEEDS]
    scaleup = [one_seed(s, tables=16) for s in ANN_HARD_SEEDS]
    return {
        "mean": round(sum(default) / len(default), 4),
        "min": round(min(default), 4),
        "per_seed": [round(r, 4) for r in default],
        "scaleup_tables16_mean": round(sum(scaleup) / len(scaleup), 4),
        "scaleup_tables16_min": round(min(scaleup), 4),
    }


def bench_store(spark) -> tuple[float, float]:
    import pandas as pd

    from grawler import synthgen
    from grawler.engine import decode_phash_udf

    rows = []
    for i in range(IMG_ROWS):
        iid = f"img-{i:06d}-0"
        px, fmt, caption = synthgen.gen_image(iid, i)
        from grawler import codecs
        rows.append((iid, codecs.encode(px, fmt), px.shape[1], px.shape[0],
                     fmt, caption))
    pdf = pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt",
                                      "caption"])
    df = spark.createDataFrame(pdf).repartition(32).persist()
    df.count()

    def one_pass() -> tuple[float, int]:
        t0 = time.time()
        out = df.withColumn("ph",
                            decode_phash_udf(F.col("bytes"), F.col("fmt")))
        n = out.where(F.col("ph.ok")).dropDuplicates(["image_id"]).count()
        return time.time() - t0, n

    measured = {"n": 0}

    def run() -> float:
        dt, n = one_pass()
        measured["n"] = n  # actual surviving rows, not the configured
        # constant: decode failures dropping rows must deflate the rate
        return dt

    one_pass()  # warm python workers
    stats = timed_best(run)
    df.unpersist()
    return stats, measured["n"] / stats["min"]


def synth_pages_distributed(spark, n: int, n_images: int = 1000):
    """Distributed pages table (spark.range, no driver data): every page is
    a small HTML doc with 3 links + 1 image ref assembled natively."""
    from grawler import synthgen
    import pandas as pd

    host = F.concat(F.lit("host-"),
                    F.pmod(F.xxhash64("id"), F.lit(5000)).cast("string"),
                    F.lit(".example"))
    url = F.concat(F.lit("http://"), host, F.lit("/p/"), "id")

    def link(k):
        child = F.pmod(F.col("id") * (3 + k) + k + 1, F.lit(n))
        return F.concat(F.lit('<a href="http://'),
                        F.concat(F.lit("host-"),
                                 F.pmod(F.xxhash64(child), F.lit(5000))
                                 .cast("string"), F.lit(".example")),
                        F.lit("/p/"), child, F.lit('">c</a>'))

    img_id = F.format_string(
        "img-%06d-0", F.pmod("id", F.lit(n_images)).cast("int"))
    html = F.concat(
        F.lit("<html><head><title>p</title></head><body>"),
        link(0), link(1), link(2),
        F.lit('<img src="/img/'), img_id, F.lit('.rgb8" alt="cap">'),
        F.lit("</body></html>"),
    )
    pages = spark.range(n).select(
        url.alias("url"), host.alias("host"),
        F.lit(200).cast("short").alias("status"),
        F.lit("text/html").alias("content_type"),
        F.lit(10).alias("fetch_latency_ms"), html.alias("html"),
        F.array().cast("array<string>").alias("child_urls"),
        F.array().cast("array<string>").alias("image_ids"),
    )
    rows = []
    for i in range(n_images):
        iid = f"img-{i:06d}-0"
        px, _, caption = synthgen.gen_image(iid, i)
        rows.append((iid, codecs_encode(px), px.shape[1], px.shape[0],
                     "rgb8", caption))
    images = spark.createDataFrame(
        pd.DataFrame(rows, columns=["image_id", "bytes", "w", "h", "fmt",
                                    "caption"]))
    robots = spark.createDataFrame(
        [("host-x.example", "User-agent: *\nAllow: /\n")],
        "host string, robots_txt string",
    ).withColumn("fetched_ts", F.current_timestamp())
    frontier_urls = pages.select("url")
    return pages, robots, images, frontier_urls


def codecs_encode(px):
    from grawler import codecs

    return codecs.encode(px, "rgb8")


def bench_wave(spark, n: int = 100_000, repeats: int = REPEATS,
               warmup: bool = False) -> tuple[float, float]:
    """One full engine wave over a distributed synthetic web: schedule ->
    fetch-sim join -> parse UDF -> children -> image decode+store ->
    wave-atomic commit. URLs/s includes everything a crawl wave does.
    Best of `repeats` runs: the box is shared and a single wave has enough
    jobs that one unlucky run can double the wall (observed 43s vs 84s on
    identical code); peak is the engine's capability."""
    import shutil
    import tempfile

    from grawler.conf import CrawlConfig
    from grawler.engine import CrawlEngine

    pages, robots, images, seeds = synth_pages_distributed(spark, n)
    cfg = CrawlConfig(wave_cap=n, wave_duration_ms=700 * n)  # no cap binds
    engines = []

    def one_pass() -> float:
        wh = tempfile.mkdtemp(prefix="grawler_bench_wave_")
        try:
            eng = CrawlEngine(spark, pages, robots, images, wh, cfg,
                              robots_cache_init=robots)
            engines.append(eng)
            t0 = time.time()
            eng.run(seeds, max_waves=1)
            return time.time() - t0
        finally:
            shutil.rmtree(wh, ignore_errors=True)
            eng.images.unpersist()

    if warmup:  # fresh-JVM callers: absorb codegen/python-worker startup
        # so the repeats measure the engine, same methodology as every
        # other headline bench ("warm best-of-N"). TWO passes: a 100k
        # wave runs ~200 Spark jobs and C2 JIT keeps recompiling the
        # shuffle/codegen hot path well into the second pass (measured
        # 41.9 / 26.2 / 23.9 / 22.0 / 22.1 / 21.7 s over six fresh-JVM
        # passes) — steady state starts at pass 3.
        one_pass()
        one_pass()
    stats = timed_best(one_pass, repeats)
    engines[-1].fetcher.pages.unpersist()
    engines[-1].fetcher.robots_truth.unpersist()
    return stats, n / stats["min"]


def run_wave_isolated() -> dict:
    """crawl_full_wave_100k in a FRESH JVM (subprocess). The r3 and r4
    artifacts both recorded an in-sequence wave number 35-55% above the
    isolated one (26.3 s vs 17.15 s in r4) — JVM-warm ordering pollution
    from the ~10 earlier bench queries (accumulated GC pressure, codegen
    cache, listener backlog), not the engine. The subprocess measurement
    IS the reproducible capability number, so it is what the artifact
    records; spread across repeats is still reported."""
    import subprocess

    env = dict(os.environ)
    env["GRAWLER_BENCH_WAVE_ONLY"] = "1"
    # the wave is the artifact's headline number and its min over 3
    # in-JVM passes still swung 21.4-22.9s across quiet-box runs of
    # identical code; default the ISOLATED wave to best-of-5 (+~45s).
    # An explicit GRAWLER_BENCH_REPEATS always wins (r4 ADVICE contract;
    # scaling_run's wave matrix sets 2 and keeps its runtime).
    env.setdefault("GRAWLER_BENCH_REPEATS", "5")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)], env=env,
        capture_output=True, text=True, timeout=3600,
    )
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"isolated wave bench failed (rc={out.returncode}): "
            f"{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1])
    from grawler.session import get_spark

    if os.environ.get("GRAWLER_BENCH_WAVE_ONLY"):
        # fresh-JVM wave measurement (see run_wave_isolated)
        spark = get_spark("grawler-bench-wave")
        spark.sparkContext.setLogLevel("ERROR")
        w_st, w_rate = bench_wave(
            spark, int(os.environ.get("GRAWLER_BENCH_WAVE", "100000")),
            warmup=True)
        print(json.dumps({"stats": w_st, "rate": round(w_rate),
                          "repeats": REPEATS,
                          "load_avg_1m": round(os.getloadavg()[0], 1)}))
        return

    idle_waited = wait_for_idle()
    spark = get_spark("grawler-bench")
    spark.sparkContext.setLogLevel("ERROR")

    load_start = os.getloadavg()[0]
    timings: dict[str, float] = {}
    stats: dict[str, dict] = {}

    def record(name: str, st: dict) -> None:
        timings[name] = st["min"]
        stats[name] = st

    if not os.environ.get("GRAWLER_BENCH_ONLY_THROUGHPUT"):
        import __spark_entry__ as entry

        qs = entry.queries()
        headline = [
            "a4_wave_metrics", "a1_word_freq", "f4_politeness_topk",
            "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
            "sim_cosine_topk", "text_quality", "text_langid",
        ]
        for name in headline:
            q = qs[name]

            def one_pass(q=q):
                t0 = time.time()
                q(spark, sf_dir).write.format(
                    "noop").mode("overwrite").save()
                return time.time() - t0

            one_pass()  # warm (python workers / codegen / file listing)
            record(name, timed_best(one_pass))

    split = None
    if os.environ.get("GRAWLER_BENCH_SPLIT"):
        split = bench_frontier_split(spark)

    f_st, f_rate = bench_frontier(spark)
    record("crawl_frontier_1m", f_st)
    s_st, s_rate = bench_store(spark)
    record("img_store_decode", s_st)
    recall = recall_hard = None
    if not os.environ.get("GRAWLER_BENCH_ONLY_THROUGHPUT"):
        a_st, recall = bench_ann_d512(spark)
        record("sim_ann_lsh_d512_20k", a_st)
        recall_hard = bench_ann_hard(spark)
    w_rate, wres = None, None
    if not os.environ.get("GRAWLER_BENCH_ONLY_THROUGHPUT"):
        # the wave runs in a fresh JVM, but it starts in the wake of the
        # query benches above (this round's same-code runs: 21.4s min when
        # the box was quiet at wave start vs 24.8s in one full-bench run) —
        # let that load decay, bounded, before the one number read first
        idle_waited_wave = wait_for_idle()
        wres = run_wave_isolated()
        wres["idle_waited_s"] = idle_waited_wave
        record("crawl_full_wave_100k", wres["stats"])
        w_rate = wres["rate"]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_wall_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": {k: v["median"] for k, v in stats.items()},
        "queries_spread_pct": {k: v["spread_pct"]
                               for k, v in stats.items()},
        "repeats": REPEATS,
        "sf": sf,
        "frontier_urls_per_sec": round(f_rate),
        "store_rows_per_sec": round(s_rate),
        "full_wave_urls_per_sec": round(w_rate) if w_rate else None,
        "full_wave_isolated_jvm": w_rate is not None,  # fresh-JVM
        # subprocess, 2 warmup passes then best-of-REPEATS (see
        # run_wave_isolated)
        "full_wave_load_avg_1m": (wres or {}).get("load_avg_1m"),
        "full_wave_repeats": (wres or {}).get("repeats"),
        "ann_recall_at_5": recall,
        # hard case (overlapping clusters at deploy-default bits/tables):
        # genuinely falsifiable — see bench_ann_hard
        # hard case, SEED-AVERAGED (bench_ann_hard): mean/min over 4 data
        # seeds at deploy defaults, plus the tables=16 scale-up evidence
        "ann_recall_at_5_hard": (recall_hard or {}).get("mean"),
        "ann_recall_at_5_hard_min": (recall_hard or {}).get("min"),
        "ann_recall_at_5_hard_per_seed": (recall_hard or {}).get("per_seed"),
        "ann_recall_hard_target": ANN_HARD_TARGET,
        "ann_recall_hard_gate_pass": (
            None if recall_hard is None
            else recall_hard["mean"] >= ANN_HARD_TARGET),
        "ann_recall_hard_scaleup_tables16": (
            (recall_hard or {}).get("scaleup_tables16_mean")),
        "ann_recall_scaleup_target": ANN_HARD_SCALEUP_TARGET,
        "ann_recall_scaleup_gate_pass": (
            None if recall_hard is None
            else recall_hard["scaleup_tables16_mean"]
            >= ANN_HARD_SCALEUP_TARGET),
        "cores": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        # ambient host load (other sandboxes share this box and are
        # invisible to ps): the r3/r4 verdicts each flagged one headline
        # number distorted by load at measurement time — recording the
        # 1-min load average at start/end puts that context IN the
        # artifact instead of in the round notes
        "load_avg_1m_start": round(load_start, 1),
        "load_avg_1m_end": round(os.getloadavg()[0], 1),
        # bounded pre-measurement idle waits (wait_for_idle): seconds spent
        # letting ambient load decay before the first measurement and
        # before the isolated wave subprocess
        "idle_waited_s": idle_waited,
        "idle_waited_wave_s": (wres or {}).get("idle_waited_s"),
    }
    if split:
        out.update({f"frontier_{k}": v for k, v in split.items()})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
