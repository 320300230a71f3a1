"""Cuckoo-filter prefilter: no false negatives, sane fp rate, saturation
degrades gracefully, merge preserves membership, engine equivalence."""

import dataclasses

import pyspark.sql.functions as F
import pytest

from grawler import cuckoo, synthgen
from grawler.conf import CrawlConfig
from grawler.engine import build_engine


def _urls(spark, lo, hi, tag="s"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"http://h{tag}"), F.pmod("id", F.lit(50)),
                 F.lit(".example/"), "id").alias("url"))


def test_no_false_negatives_and_fp_rate(spark):
    seen = _urls(spark, 0, 3000)
    segs = cuckoo.build_segments(seen, buckets=1 << 10).persist()
    assert segs.where("n_keys < 0").count() == 0  # no saturation at 3k keys
    seg_rows = segs.collect()
    seg_map = {r["segment"]: bytes(r["bits"]) for r in seg_rows}
    probe = cuckoo.make_probe_udf(seg_map, set(), 1 << 10, 4)
    u = F.col("url")

    def flag(df):
        return df.withColumn("m", probe(
            cuckoo._segment_col(u, 64), cuckoo._fp_col(u),
            cuckoo._i1_col(u, 1 << 10)))

    # every inserted url MUST probe maybe-seen (no false negatives)
    assert flag(seen).where("NOT m").count() == 0
    # disjoint urls: false-positive rate well under 5%
    fresh = _urls(spark, 100_000, 103_000)
    fp = flag(fresh).where("m").count()
    assert fp / 3000 < 0.05
    segs.unpersist()


def test_anti_join_exactness(spark):
    seen = _urls(spark, 0, 2000)
    frontier = _urls(spark, 1000, 4000)  # 1000 overlap
    segs = cuckoo.build_segments(seen, buckets=1 << 10)
    got = cuckoo.cuckoo_anti_join(frontier, seen, segs, buckets=1 << 10)
    want = frontier.join(seen, "url", "left_anti")
    assert sorted(r["url"] for r in got.collect()) == sorted(
        r["url"] for r in want.collect())


def test_saturated_segment_degrades_to_exact(spark):
    seen = _urls(spark, 0, 5000)
    # 8 buckets x 4 slots x 64 segments = 2048 capacity << 5000 keys
    segs = cuckoo.build_segments(seen, buckets=8).persist()
    assert segs.where("n_keys < 0").count() > 0  # saturation happened
    frontier = _urls(spark, 2500, 7500)
    got = cuckoo.cuckoo_anti_join(frontier, seen, segs, buckets=8)
    want = frontier.join(seen, "url", "left_anti")
    assert got.count() == want.count()  # still exact
    segs.unpersist()


def test_merge_preserves_membership(spark):
    a = _urls(spark, 0, 1500)
    b = _urls(spark, 1500, 3000)
    merged = cuckoo.merge_segment_sets(
        cuckoo.build_segments(a, buckets=1 << 10),
        cuckoo.build_segments(b, buckets=1 << 10),
        buckets=1 << 10).persist()
    seg_rows = merged.collect()
    seg_map = {r["segment"]: bytes(r["bits"]) for r in seg_rows}
    sat = {r["segment"] for r in seg_rows if r["n_keys"] < 0}
    probe = cuckoo.make_probe_udf(seg_map, sat, 1 << 10, 4)
    u = F.col("url")
    both = _urls(spark, 0, 3000)
    misses = both.withColumn("m", probe(
        cuckoo._segment_col(u, 64), cuckoo._fp_col(u),
        cuckoo._i1_col(u, 1 << 10))).where("NOT m").count()
    assert misses == 0
    merged.unpersist()


def test_cogroup_probe_equals_broadcast(spark):
    """The no-broadcast cogroup probe must give identical exact results to
    the broadcast path, including with saturated segments."""
    seen = _urls(spark, 0, 2500)
    frontier = _urls(spark, 1000, 5000)
    for buckets in (1 << 10, 8):  # healthy and saturated tables
        segs = cuckoo.build_segments(seen, buckets=buckets).persist()
        a = cuckoo.cuckoo_anti_join(frontier, seen, segs, buckets=buckets)
        b = cuckoo.cuckoo_anti_join_cogroup(frontier, seen, segs,
                                            buckets=buckets)
        assert sorted(r["url"] for r in a.collect()) == sorted(
            r["url"] for r in b.collect())
        segs.unpersist()


def test_engine_cuckoo_cogroup_path_equivalent(spark, tmp_path):
    """Engine run forced onto the cuckoo cogroup probe (broadcast budget 0)
    equals the broadcast-path run."""
    import dataclasses

    web = synthgen.generate(seed=3, n_pages=60, shape="mixed")
    base = CrawlConfig()
    cfg_cg = dataclasses.replace(base, seen_filter="cuckoo",
                                 cuckoo_buckets=1 << 8,
                                 bloom_broadcast_max_bytes=0)
    cfg_bc = dataclasses.replace(base, seen_filter="cuckoo",
                                 cuckoo_buckets=1 << 8)
    e1, s1 = build_engine(spark, web, str(tmp_path / "cg"), cfg_cg)
    r1 = e1.run(s1, max_waves=3)
    e2, s2 = build_engine(spark, web, str(tmp_path / "bc"), cfg_bc)
    r2 = e2.run(s2, max_waves=3)
    a = sorted(map(tuple, r1.trace().collect()))
    b = sorted(map(tuple, r2.trace().collect()))
    assert a == b


def test_engine_cuckoo_equivalent_to_bloom(spark, tmp_path):
    """Swapping the prefilter family must never change crawl results."""
    web = synthgen.generate(seed=3, n_pages=60, shape="mixed")
    base = CrawlConfig()
    cfg_c = dataclasses.replace(base, seen_filter="cuckoo",
                                cuckoo_buckets=1 << 8)
    cfg_b = dataclasses.replace(base, bloom_m=1 << 14)
    e1, s1 = build_engine(spark, web, str(tmp_path / "c"), cfg_c)
    r1 = e1.run(s1, max_waves=3)
    e2, s2 = build_engine(spark, web, str(tmp_path / "b"), cfg_b)
    r2 = e2.run(s2, max_waves=3)
    a = [(r["wave"], r["seq"], r["url"])
         for r in r1.trace().orderBy("wave", "seq").collect()]
    b = [(r["wave"], r["seq"], r["url"])
         for r in r2.trace().orderBy("wave", "seq").collect()]
    assert a == b
    sa = sorted(r["url"] for r in r1.seen().collect())
    sb = sorted(r["url"] for r in r2.seen().collect())
    assert sa == sb


def test_cogroup_probe_unmerged_deltas(spark):
    """Unmerged per-wave segment deltas (multiple rows per segment) must
    OR-probe: a key inserted into ANY delta stays maybe-seen, preserving
    exactness (ADVICE r2 — the old probe read only row 0)."""
    seen_a, seen_b = _urls(spark, 0, 800), _urls(spark, 800, 1600)
    both = seen_a.union(seen_b)
    unmerged = cuckoo.build_segments(seen_a, buckets=1 << 10).unionByName(
        cuckoo.build_segments(seen_b, buckets=1 << 10))
    frontier = _urls(spark, 0, 2400)  # 1600 overlap + 800 new
    got = sorted(r["url"] for r in cuckoo.cuckoo_anti_join_cogroup(
        frontier, both, unmerged, buckets=1 << 10).collect())
    want = sorted(r["url"] for r in
                  frontier.join(both, "url", "left_anti").collect())
    assert got == want and len(got) == 800


def test_load_factor(spark):
    from grawler.cuckoo import build_segments, load_factor

    urls = spark.createDataFrame(
        [(f"http://h.example/{i}",) for i in range(48)], "url string")
    segs = build_segments(urls, n_segments=2, buckets=16, slots=2)
    f = load_factor(segs)
    assert 0.0 < f <= 1.0
    # 24 keys into 32 slots per segment -> load well above half (or a
    # saturated segment reporting 1.0)
    assert f >= 0.5


def test_broadcast_probe_honors_multirow_segment_deltas(spark):
    """ADVICE r3: multiple unmerged rows per segment (per-wave deltas) —
    the broadcast path must probe EVERY table for a segment, like the
    cogroup path; keeping only the last row would mark urls from the
    dropped delta 'definitely new'."""
    a = _urls(spark, 0, 1000)
    b = _urls(spark, 1000, 2000)
    seen = a.union(b)
    deltas = cuckoo.build_segments(a, buckets=1 << 10).unionByName(
        cuckoo.build_segments(b, buckets=1 << 10))  # 2 rows/segment
    frontier = _urls(spark, 0, 3000)
    got = cuckoo.cuckoo_anti_join(frontier, seen, deltas,
                                  buckets=1 << 10)
    want = frontier.join(seen, "url", "left_anti")
    assert sorted(r["url"] for r in got.collect()) == sorted(
        r["url"] for r in want.collect())
