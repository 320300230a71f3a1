"""Storage layer: lineage commit protocol, crash-before-manifest resume,
Iceberg MERGE SQL generation."""

import os

import pytest

from grawler import oracle, synthgen
from grawler.conf import CrawlConfig
from grawler.engine import build_engine
from grawler.store import IcebergSnapshotStore, LocalSnapshotStore

CFG = CrawlConfig()


def test_crash_before_manifest_rerun_is_idempotent(spark, tmp_path):
    """Kill AFTER wave-2 data files are written but BEFORE its manifest:
    resume must re-run wave 2 and converge to the uninterrupted state
    (north_rule: no duplicate fetches survive into state)."""
    web = synthgen.generate(seed=11, n_pages=80, shape="mixed")
    full_dir, crash_dir = str(tmp_path / "full"), str(tmp_path / "crash")
    e1, s1 = build_engine(spark, web, full_dir, CFG)
    full = e1.run(s1, max_waves=3)

    e2, s2 = build_engine(spark, web, crash_dir, CFG)
    e2.run(s2, max_waves=3)
    # simulate the crash: drop the LAST manifest, keep its orphan data
    manifests = sorted(os.listdir(os.path.join(crash_dir, "_lineage")))
    os.remove(os.path.join(crash_dir, "_lineage", manifests[-1]))

    e3, s3 = build_engine(spark, web, crash_dir, CFG)
    resumed = e3.run(s3, max_waves=3, resume=True)

    a = sorted((r["wave"], r["seq"], r["url"])
               for r in full.trace().collect())
    b = sorted((r["wave"], r["seq"], r["url"])
               for r in resumed.trace().collect())
    assert a == b
    sa = sorted(r["url"] for r in full.seen().collect())
    sb = sorted(r["url"] for r in resumed.seen().collect())
    assert sa == sb and len(sb) == len(set(sb))
    st_a = sorted(r["image_id"] for r in full.store().collect())
    st_b = sorted(r["image_id"] for r in resumed.store().collect())
    assert st_a == st_b


def test_manifest_is_commit_point(spark, tmp_path):
    s = LocalSnapshotStore(spark, str(tmp_path))
    assert s.last_wave() is None
    df = spark.range(3).selectExpr("id as url")
    s.commit_wave(0, {"seen": df})
    assert s.last_wave() == 0
    assert s.read("seen").count() == 3
    s.commit_wave(1, {"seen": df})
    assert s.read("seen").count() == 6          # append mode unions deltas
    assert s.read("seen", upto_wave=0).count() == 3


def test_iceberg_merge_sql():
    class FakeSpark:  # SQL generation is pure string work
        pass

    st = IcebergSnapshotStore(FakeSpark(), catalog="crawl",
                              namespace="grawler")
    sql = st.merge_sql("frontier", ["url", "host", "depth"])
    assert sql.startswith(
        "MERGE INTO crawl.grawler.frontier t USING _delta s "
        "ON t.url = s.url ")
    assert "WHEN MATCHED AND s._op = 'remove' THEN DELETE" in sql
    assert "WHEN MATCHED THEN UPDATE SET t.url = s.url, t.host = s.host" in sql
    assert ("WHEN NOT MATCHED AND s._op = 'add' THEN "
            "INSERT (url, host, depth) VALUES (s.url, s.host, s.depth)"
            in sql)
    assert "INSERT OVERWRITE" not in sql
    assert "ON t.host = s.host" in st.merge_sql("robots_cache", ["host"])
