"""IcebergSnapshotStore contract tests against a recording FakeSpark.

The iceberg-spark-runtime jar is not bundled with this sandbox's PySpark, so
the deployment backend cannot execute here. These tests run its REAL control
flow (commit_wave / last_wave / recover / read-filtering inputs) against a
fake that records every SQL statement and simulates Iceberg's two visible
behaviors: each mutating statement bumps the target table's snapshot id, and
the lineage table accumulates appended rows. Asserted:

  - frontier/robots_cache writes are MERGE INTO with remove->DELETE /
    add->upsert clauses; NEVER an O(total-state) INSERT OVERWRITE
  - ordering: BEGIN lineage rows land before any table write; the commit
    marker is the last statement of the wave
  - last_wave() counts only waves with a commit marker
  - a crash between table writes and the commit marker is recovered by
    rolling each written table back to its BEGIN-recorded snapshot
    (or truncating tables that had no snapshot yet)
"""

import re

import pytest

from grawler.store import IcebergSnapshotStore


class FakeDF:
    def __init__(self, spark, columns, rows=None):
        self._spark = spark
        self.columns = list(columns)
        self.rows = rows or []

    def createOrReplaceTempView(self, name):  # noqa: N802
        self._spark.views[name] = self


class FakeResult:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return self._rows


_TARGET = re.compile(
    r"(?:MERGE INTO|INSERT INTO|INSERT OVERWRITE|DELETE FROM)\s+(\S+)")


class FakeSpark:
    """Records statements; simulates snapshot bumps + the lineage table."""

    def __init__(self):
        self.stmts: list[str] = []
        self.views: dict = {}
        self.snap: dict[str, int] = {}     # table -> latest snapshot id
        self.lineage: list[dict] = []      # appended lineage rows
        self._next_snap = 100
        self._ts = 0

    def createDataFrame(self, rows, schema):  # noqa: N802
        cols = [f.split()[0] for f in schema.split(",")]
        return FakeDF(self, cols, [dict(zip(cols, r)) for r in rows])

    def _bump(self, table):
        self._next_snap += 1
        self.snap[table] = self._next_snap

    def sql(self, s):
        self.stmts.append(s)
        flat = " ".join(s.split())
        if ".refs" in flat:  # snapshot_id() probe: CURRENT (main) snapshot,
            # which — unlike .snapshots ordered by committed_at — reflects
            # rollbacks (rolled-back orphans stay in .snapshots)
            t = flat.split("FROM ", 1)[1].split(".refs")[0].split(".")[-1]
            if t in self.snap:
                return FakeResult([{"snapshot_id": self.snap[t]}])
            return FakeResult([])
        if "kind = 'meta'" in flat and "ORDER BY wave DESC" in flat:
            rows = sorted((r for r in self.lineage if r["kind"] == "meta"),
                          key=lambda r: (r["wave"], r["_ts"]))
            return FakeResult([{"snapshot_id": rows[-1]["snapshot_id"]}]
                              if rows else [])
        if "max(wave)" in flat and "kind = 'commit'" in flat:
            ws = [r["wave"] for r in self.lineage if r["kind"] == "commit"]
            return FakeResult([{"w": max(ws) if ws else None}])
        if flat.startswith("SELECT wave, table, snapshot_id"):
            floor = int(flat.split("wave > ", 1)[1].split()[0])
            rows = [r for r in self.lineage
                    if r["kind"] == "begin" and r["wave"] > floor]
            return FakeResult(sorted(rows, key=lambda r: r["_ts"]))
        m = _TARGET.match(flat)
        if m:
            t = m.group(1).split(".")[-1]
            if t == "lineage":
                src = self.views["_delta"]
                for row in src.rows:
                    self._ts += 1
                    self.lineage.append({**row, "_ts": self._ts})
            self._bump(t)
            return FakeResult([])
        if flat.startswith("CALL"):  # rollback_to_snapshot
            t = flat.split("'")[1].split(".")[-1]
            self.snap[t] = int(flat.rsplit(",", 1)[1].strip(" )"))
            return FakeResult([])
        raise AssertionError(f"unexpected SQL: {s}")


def _store():
    fs = FakeSpark()
    return fs, IcebergSnapshotStore(fs, catalog="crawl", namespace="grawler")


def _wave_tables(fs):
    return {
        "frontier": FakeDF(fs, ["url", "parent_url", "host", "depth",
                                "priority", "wave", "path", "_op"]),
        "robots_cache": FakeDF(fs, ["host", "robots_txt", "fetched_ts",
                                    "_op"]),
        "seen": FakeDF(fs, ["url", "url_hash", "first_wave"]),
        "store": FakeDF(fs, ["image_id", "bytes", "w", "h", "fmt",
                             "caption", "phash"]),
        "bloom": FakeDF(fs, ["segment", "bits", "n_keys"]),
    }


def test_commit_wave_merge_not_overwrite_and_ordering():
    fs, st = _store()
    st.commit_wave(0, _wave_tables(fs))

    frontier_stmts = [s for s in fs.stmts if "grawler.frontier" in s
                      and ".refs" not in s]
    assert len(frontier_stmts) == 1
    s = frontier_stmts[0]
    assert s.startswith("MERGE INTO crawl.grawler.frontier")
    assert "WHEN MATCHED AND s._op = 'remove' THEN DELETE" in s
    assert "_op" not in s.split("INSERT (", 1)[1]  # op col never persisted
    assert not any("INSERT OVERWRITE crawl.grawler.frontier" in x
                   for x in fs.stmts)
    assert not any("INSERT OVERWRITE crawl.grawler.robots_cache" in x
                   for x in fs.stmts)
    # seen is a first-wins keyed MERGE (insert-if-not-matched, delta
    # pre-deduped), bloom the only overwrite (bounded)
    seen_writes = [x for x in fs.stmts if "grawler.seen" in x
                   and ".refs" not in x]
    assert len(seen_writes) == 1
    assert seen_writes[0].startswith("MERGE INTO crawl.grawler.seen")
    assert "WHEN NOT MATCHED THEN INSERT" in seen_writes[0]
    assert "WHEN MATCHED" not in seen_writes[0]  # first-wins: never update
    assert "row_number() OVER (PARTITION BY url ORDER BY first_wave" \
        in seen_writes[0]  # within-delta dedup, deterministic keep-rule
    assert any(x.startswith("INSERT OVERWRITE crawl.grawler.bloom")
               for x in fs.stmts)

    # ordering: begin lineage append < first table write < commit append
    lineage_writes = [i for i, x in enumerate(fs.stmts)
                      if x.startswith("INSERT INTO crawl.grawler.lineage")]
    first_write = min(i for i, x in enumerate(fs.stmts)
                      if _TARGET.match(x) and "lineage" not in x)
    assert lineage_writes[0] < first_write < lineage_writes[-1]
    assert lineage_writes[-1] == len(fs.stmts) - 1  # commit marker is last

    begin = [r for r in fs.lineage if r["kind"] == "begin"]
    assert {r["table"] for r in begin} == set(_wave_tables(fs))
    assert all(r["snapshot_id"] == "none" for r in begin)  # empty tables
    assert st.last_wave() == 0


def test_last_wave_requires_commit_marker():
    fs, st = _store()
    st.commit_wave(0, _wave_tables(fs))
    # wave 1 crashes after BEGIN + table writes, before the commit append:
    st._append_lineage([(1, "frontier", str(fs.snap["frontier"]), "begin"),
                        (1, "seen", str(fs.snap["seen"]), "begin")])
    fs.sql(st.merge_sql("frontier", ["url", "host"]))
    fs.sql(st.insert_new_sql("seen", ["url", "url_hash", "first_wave"]))
    assert st.last_wave() == 0  # orphan wave 1 never committed


def test_recover_rolls_back_orphan_writes():
    fs, st = _store()
    st.commit_wave(0, _wave_tables(fs))
    pre_frontier = fs.snap["frontier"]
    pre_seen = fs.snap["seen"]

    # wave 1: begin recorded, tables written, crash before commit
    st._append_lineage([(1, "frontier", str(pre_frontier), "begin"),
                        (1, "seen", str(pre_seen), "begin")])
    fs.views["_delta"] = FakeDF(fs, ["url", "host", "_op"])
    fs.sql(st.merge_sql("frontier", ["url", "host"]))
    fs.sql(st.insert_new_sql("seen", ["url", "url_hash", "first_wave"]))
    assert fs.snap["frontier"] != pre_frontier

    stmts = st.recover()
    assert fs.snap["frontier"] == pre_frontier  # rolled back
    assert fs.snap["seen"] == pre_seen
    assert any(s.startswith(
        "CALL crawl.system.rollback_to_snapshot('grawler.frontier'")
        for s in stmts)
    assert st.last_wave() == 0

    # idempotent: nothing left to roll back... except the same begin rows;
    # recover targets the same snapshots again (no-op rollbacks)
    again = st.recover()
    assert fs.snap["frontier"] == pre_frontier
    assert len(again) == len(stmts)


def test_recover_truncates_never_snapshotted_tables():
    fs, st = _store()
    # first-ever wave crashes before commit: begin recorded 'none'
    st._append_lineage([(0, "seen", "none", "begin")])
    fs.views["_delta"] = FakeDF(fs, ["url"])
    fs.sql(st.insert_new_sql("seen", ["url", "url_hash", "first_wave"]))
    stmts = st.recover()
    assert stmts == ["DELETE FROM crawl.grawler.seen"]


# ------------------------------------------------------------------ round 3:
# read() paths, meta commits, and interleaved begin/commit recovery — the
# remaining deploy surface the sandbox cannot execute (no iceberg jar, no
# pyiceberg wheel, no network: verified again this round), contract-tested
# as far as a recording fake allows. docs/COVERAGE.md records this limit.

class _FakeCol:
    def __init__(self, name):
        self.name = name
        self.bound = None

    def __le__(self, other):
        self.bound = other
        return self


class _FakeTable(FakeDF):
    def __init__(self, spark, columns):
        super().__init__(spark, columns)
        self.filters = []

    def __getitem__(self, name):
        assert name in self.columns
        return _FakeCol(name)

    def where(self, cond):
        self.filters.append((cond.name, cond.bound))
        return self


def test_read_filters_bucketed_and_append_tables_to_committed_waves():
    """read('seen')/read('trace') must bound rows to the last COMMITTED
    wave via their wave column — orphan appends from a crashed wave can
    never leak into reads even before recover() runs."""
    fs, st = _store()
    st.commit_wave(0, _wave_tables(fs))
    st.commit_wave(1, _wave_tables(fs))
    tables = {
        "seen": _FakeTable(fs, ["url", "url_hash", "first_wave"]),
        "trace": _FakeTable(fs, ["wave", "seq", "url"]),
        "frontier": _FakeTable(fs, ["url", "host", "depth"]),
    }
    fs.table = lambda q: tables[q.split(".")[-1]]
    st.read("seen")
    assert tables["seen"].filters == [("first_wave", 1)]
    st.read("trace", upto_wave=0)
    assert tables["trace"].filters == [("wave", 0)]
    st.read("frontier")  # merge table: no wave filter (MERGE state is live)
    assert tables["frontier"].filters == []


def test_commit_meta_rides_the_commit_append_and_read_meta():
    """meta (seen-filter family/params) must land in the SAME atomic
    lineage append as the commit marker — a crash between them would
    otherwise leave a committed wave with unvalidatable filter config."""
    fs, st = _store()
    meta = {"seen_filter": {"family": "bloom", "m": 8, "k": 4}}
    st.commit_wave(0, _wave_tables(fs), meta=meta)
    lineage_appends = [s for s in fs.stmts
                       if s.startswith("INSERT INTO crawl.grawler.lineage")]
    assert len(lineage_appends) == 2  # one BEGIN append, one COMMIT append
    metas = [r for r in fs.lineage if r["kind"] == "meta"]
    commits = [r for r in fs.lineage if r["kind"] == "commit"]
    assert len(metas) == 1 and len(commits) == 1
    # meta rides before the marker inside the same append (marker is last)
    assert metas[0]["_ts"] == commits[0]["_ts"] - 1
    assert st.read_meta() == meta
    # meta rows must not confuse wave accounting or recovery
    assert st.last_wave() == 0
    assert st.recover() == []


def test_read_meta_latest_committed_wins():
    fs, st = _store()
    st.commit_wave(0, _wave_tables(fs),
                   meta={"seen_filter": {"family": "bloom"}})
    st.commit_wave(1, _wave_tables(fs),
                   meta={"seen_filter": {"family": "cuckoo", "slots": 4}})
    assert st.read_meta() == {"seen_filter": {"family": "cuckoo",
                                              "slots": 4}}


def test_recover_uses_earliest_begin_across_interleaved_replays():
    """Crash -> replay WITHOUT recover -> crash again: two begin rows for
    one table in the same orphan wave. recover() must roll back to the
    EARLIEST begin (the last truly committed snapshot), not the dirty
    re-begin — otherwise the half-written attempt #1 rows would survive
    as duplicates in the deploy crawl."""
    fs, st = _store()
    st.commit_wave(0, _wave_tables(fs))
    clean = fs.snap["frontier"]

    fs.views["_delta"] = FakeDF(fs, ["url", "host", "_op"])
    st._append_lineage([(1, "frontier", str(clean), "begin")])
    fs.sql(st.merge_sql("frontier", ["url", "host"]))   # attempt 1 crash
    dirty = fs.snap["frontier"]
    assert dirty != clean
    st._append_lineage([(1, "frontier", str(dirty), "begin")])
    fs.sql(st.merge_sql("frontier", ["url", "host"]))   # attempt 2 crash

    st.recover()
    assert fs.snap["frontier"] == clean
    assert st.last_wave() == 0


def test_recover_scopes_to_orphan_wave_only():
    """A committed wave followed by a crashed one: recover touches ONLY the
    tables the crashed wave began, and leaves committed snapshots alone."""
    fs, st = _store()
    st.commit_wave(0, _wave_tables(fs))
    st.commit_wave(1, _wave_tables(fs))
    committed = dict(fs.snap)

    fs.views["_delta"] = FakeDF(fs, ["url", "url_hash", "first_wave"])
    st._append_lineage([(2, "seen", str(fs.snap["seen"]), "begin")])
    fs.sql(st.insert_new_sql("seen", ["url", "url_hash", "first_wave"]))                        # crash
    stmts = st.recover()
    assert len(stmts) == 1 and "grawler.seen" in stmts[0]
    assert fs.snap == committed | {"lineage": fs.snap["lineage"]}
    assert st.last_wave() == 1


def test_maintenance_sql_shapes():
    """The maintenance builders (the compaction analogue the deploy doc
    tools/gen_iceberg_log.py schedules every compact_every waves) produce
    the documented statement shapes: bin-pack via rewrite_data_files,
    nb growth via REPLACE PARTITION FIELD on the bucket transform, and
    snapshot expiry bounded by the rollback horizon."""
    _fs, st = _store()
    rw = st.rewrite_data_files_sql("seen")
    assert rw == ("CALL crawl.system.rewrite_data_files("
                  "table => 'grawler.seen', "
                  "options => map('min-input-files', '2'))")
    rb = st.replace_bucket_sql("seen", 1024, 2048)
    assert rb == ("ALTER TABLE crawl.grawler.seen REPLACE PARTITION FIELD "
                  "bucket(1024, url) WITH bucket(2048, url)")
    rb2 = st.replace_bucket_sql("store_keys", 8, 16)
    assert "bucket(8, image_id) WITH bucket(16, image_id)" in rb2
    ex = st.expire_snapshots_sql("frontier", retain_last=8)
    assert ex == ("CALL crawl.system.expire_snapshots("
                  "table => 'grawler.frontier', retain_last => 8)")
