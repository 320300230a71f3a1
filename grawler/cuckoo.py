"""Partitioned cuckoo-filter URL-seen prefilter (north_star: "bloom/cuckoo
filter with vectorized xxhash64"; sibling of grawler.bloom with the same
segment contract and the same exactness guarantee).

Layout per segment: a (buckets x slots) uint16 table. Per url:
  fp  = pmod(xxhash64(url, 1), 65535) + 1        (0 is the empty slot)
  i1  = pmod(xxhash64(url), buckets)
  i2  = i1 XOR (fp * KNUTH) mod buckets           (partial-key cuckoo,
                                                   Fan et al., CoNEXT'14)
fp/i1 are computed as NATIVE columns (JVM xxhash64, like bloom's position
columns); only the table pack/probe run in numpy over Arrow batches.

vs bloom: cuckoo gives ~2x better false-positive rate per bit at high load
and supports deletion (not needed here); bloom builds/merges with pure
bitwise OR while cuckoo must re-insert on merge. Both are PREFILTERS: a
positive still takes the exact anti-join, a negative is guaranteed unseen,
so either choice preserves exactness. If a segment overflows (insert fails
after MAX_KICKS), it is marked saturated (n_keys = -1) and its probe
returns maybe-seen for everything — graceful degradation to the exact
anti-join, never a false negative.

State rows reuse the BLOOM_SEGMENT schema (segment int, bits binary,
n_keys long), so wave checkpointing/resume is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType

DEFAULT_SEGMENTS = 64
DEFAULT_BUCKETS = 1 << 12     # per segment; 4096 buckets x 4 slots x 2B = 32 KiB
DEFAULT_SLOTS = 4
MAX_KICKS = 500
KNUTH = np.uint64(2654435761)


def _fp_col(url_col):
    return (F.pmod(F.xxhash64(url_col, F.lit(1)), F.lit(65535)) + 1).cast(
        "long")


def _i1_col(url_col, buckets: int):
    return F.pmod(F.xxhash64(url_col), F.lit(buckets)).cast("long")


def _segment_col(url_col, n_segments: int):
    return F.pmod(F.xxhash64(url_col, F.lit(7)), F.lit(n_segments)).cast(
        "int")


def _alt(i: np.ndarray, fp: np.ndarray, buckets: int) -> np.ndarray:
    mask = np.uint64(buckets - 1)  # buckets is a power of two
    return (i.astype(np.uint64)
            ^ ((fp.astype(np.uint64) * KNUTH) & mask)) & mask


def _insert_entries(fps: np.ndarray, i1s: np.ndarray, buckets: int,
                    slots: int, rng_seed: int = 0):
    """Classic cuckoo insertion with kicks. Returns (table, ok). The
    per-key python loop runs segment-local on an executor (a production
    build would drop to a compiled kernel; the dataflow around it — segment
    routing, native hashing, Arrow batching — is the part that must scale)."""
    table = np.zeros((buckets, slots), dtype=np.uint16)
    rng = np.random.default_rng(rng_seed)
    for fp0, i0 in zip(fps, i1s):
        fp, i = np.uint16(fp0), int(i0) & (buckets - 1)
        # already present? (idempotent inserts keep merge simple)
        a = int(_alt(np.array([i]), np.array([fp]), buckets)[0])
        if (table[i] == fp).any() or (table[a] == fp).any():
            continue
        placed = False
        for j in (i, a):
            empty = np.nonzero(table[j] == 0)[0]
            if len(empty):
                table[j, empty[0]] = fp
                placed = True
                break
        if placed:
            continue
        cur_i, cur_fp = i, fp
        for _ in range(MAX_KICKS):
            slot = int(rng.integers(slots))
            cur_fp, table[cur_i, slot] = table[cur_i, slot], cur_fp
            cur_i = int(_alt(np.array([cur_i]),
                             np.array([cur_fp]), buckets)[0])
            empty = np.nonzero(table[cur_i] == 0)[0]
            if len(empty):
                table[cur_i, empty[0]] = cur_fp
                placed = True
                break
        if not placed:
            return table, False  # saturated
    return table, True


def build_segments(
    seen: DataFrame,
    url_col: str = "url",
    n_segments: int = DEFAULT_SEGMENTS,
    buckets: int = DEFAULT_BUCKETS,
    slots: int = DEFAULT_SLOTS,
) -> DataFrame:
    """-> (segment int, bits binary, n_keys long), one row per segment;
    n_keys = -1 marks a saturated (degraded-to-exact) segment."""
    u = F.col(url_col)
    prepared = seen.select(
        _segment_col(u, n_segments).alias("segment"),
        _fp_col(u).alias("fp"),
        _i1_col(u, buckets).alias("i1"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["segment"].iloc[0])
        table, ok = _insert_entries(
            pdf["fp"].to_numpy(np.int64), pdf["i1"].to_numpy(np.int64),
            buckets, slots, rng_seed=seg)
        return pd.DataFrame({
            "segment": [seg],
            "bits": [table.tobytes()],
            "n_keys": [len(pdf) if ok else -1],
        })

    return (
        prepared.repartition(n_segments, "segment")
        .groupBy("segment")
        .applyInPandas(pack, schema="segment int, bits binary, n_keys long")
    )


def merge_segment_sets(a: DataFrame, b: DataFrame,
                       buckets: int = DEFAULT_BUCKETS,
                       slots: int = DEFAULT_SLOTS) -> DataFrame:
    """Merge per-wave segment deltas: decode entries and re-insert (cuckoo
    tables are not OR-able like bloom). A lookup probes {i, alt(i, fp)},
    which is symmetric, so re-inserting an entry keyed by whichever bucket
    it currently occupies lands it in the same pair. Saturation (n_keys=-1)
    on any input propagates."""

    def remerge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(key[0])
        degraded = bool((pdf["n_keys"] < 0).any())
        fps, i1s = [], []
        for bz in pdf["bits"]:
            t = np.frombuffer(bz, dtype=np.uint16).reshape(buckets, slots)
            b_idx, _s_idx = np.nonzero(t)
            fps.append(t[t != 0].astype(np.int64))
            i1s.append(b_idx.astype(np.int64))
        fps = np.concatenate(fps) if fps else np.empty(0, np.int64)
        i1s = np.concatenate(i1s) if i1s else np.empty(0, np.int64)
        if degraded:
            table, ok = np.zeros((buckets, slots), dtype=np.uint16), False
        else:
            table, ok = _insert_entries(fps, i1s, buckets, slots,
                                        rng_seed=seg)
        return pd.DataFrame({
            "segment": [seg],
            "bits": [table.tobytes()],
            "n_keys": [int(pdf["n_keys"].clip(lower=0).sum()) if ok else -1],
        })

    return (
        a.unionByName(b)
        .groupBy("segment")
        .applyInPandas(remerge,
                       schema="segment int, bits binary, n_keys long")
    )


def make_probe_udf(segment_map: dict[int, bytes],
                   saturated: set[int],
                   buckets: int, slots: int):
    """Vectorized membership probe against broadcast segment tables.

    `segment_map` values may be one `bytes` table or a list of them
    (unmerged per-wave deltas — same contract as the cogroup path): a key
    present in ANY table for its segment stays maybe-seen.
    """
    tables = {
        seg: [np.frombuffer(bz, dtype=np.uint16).reshape(buckets, slots)
              for bz in (v if isinstance(v, list) else [v])]
        for seg, v in segment_map.items()
    }

    @pandas_udf(BooleanType())
    def maybe_seen(segment: pd.Series, fp: pd.Series,
                   i1: pd.Series) -> pd.Series:
        seg_arr = segment.to_numpy()
        fp_arr = fp.to_numpy(np.int64).astype(np.uint16)
        i1_arr = i1.to_numpy(np.int64)
        out = np.zeros(len(segment), dtype=bool)
        for seg in np.unique(seg_arr):
            mask = seg_arr == seg
            if int(seg) in saturated:
                out[mask] = True  # degraded: exact anti-join decides
                continue
            ts = tables.get(int(seg))
            if not ts:
                continue  # empty segment: definitely new
            f, i = fp_arr[mask], i1_arr[mask] & (buckets - 1)
            a = _alt(i, f, buckets).astype(np.int64)
            hit = np.zeros(int(mask.sum()), dtype=bool)
            for t in ts:
                hit |= ((t[i] == f[:, None]).any(axis=1)
                        | (t[a] == f[:, None]).any(axis=1))
            out[mask] = hit
        return pd.Series(out)

    return maybe_seen


def cuckoo_anti_join_cogroup(
    frontier: DataFrame,
    seen: DataFrame,
    segments: DataFrame,
    url_col: str = "url",
    buckets: int = DEFAULT_BUCKETS,
    slots: int = DEFAULT_SLOTS,
    n_segments: int = DEFAULT_SEGMENTS,
    exact_join=None,
    persisted: list | None = None,
) -> DataFrame:
    """Scale-path probe: NO driver collect, NO broadcast (mirror of
    bloom.bloom_anti_join_cogroup). The frontier is shuffled by segment id
    and cogrouped with the segment table, so each task holds exactly one
    segment's fingerprint table against its slice of the frontier — valid
    when the total filter cannot be broadcast."""
    cols = frontier.columns
    u = F.col(url_col)
    tagged = frontier.select(
        "*",
        _segment_col(u, n_segments).alias("_seg"),
        _fp_col(u).alias("_fp"),
        _i1_col(u, buckets).alias("_i1"),
    )
    out_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in frontier.schema.fields
    ) + ", `_maybe` boolean"

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out = left.drop(columns=["_seg", "_fp", "_i1"])
        if len(left) == 0 or len(right) == 0:
            out["_maybe"] = False  # empty segment: everything new
            return out
        f = left["_fp"].to_numpy(np.int64).astype(np.uint16)
        i = left["_i1"].to_numpy(np.int64) & (buckets - 1)
        a = _alt(i, f, buckets).astype(np.int64)
        # OR-probe across ALL segment rows (unmerged per-wave deltas are
        # a legal input: a key present in ANY delta must stay maybe-seen;
        # probing only row 0 would corrupt the exactness guarantee)
        maybe = np.zeros(len(left), dtype=bool)
        for bz, nk in zip(right["bits"], right["n_keys"]):
            if int(nk) < 0:  # saturated table: exact join decides
                maybe[:] = True
                break
            t = np.frombuffer(bytes(bz),
                              dtype=np.uint16).reshape(buckets, slots)
            maybe |= ((t[i] == f[:, None]).any(axis=1)
                      | (t[a] == f[:, None]).any(axis=1))
        out["_maybe"] = maybe
        return out

    flagged = (
        tagged.groupby("_seg")
        .cogroup(segments.withColumnRenamed("segment", "_seg")
                 .groupby("_seg"))
        .applyInPandas(probe, schema=out_schema)
    )
    if persisted is not None:
        flagged = flagged.persist()
        persisted.append(flagged)
    definitely_new = flagged.where(~F.col("_maybe")).select(*cols)
    maybe = flagged.where(F.col("_maybe")).select(*cols)
    checked = (exact_join(maybe) if exact_join is not None
               else maybe.join(seen.select(url_col), url_col, "left_anti"))
    return definitely_new.unionByName(checked)


def cuckoo_anti_join(
    frontier: DataFrame,
    seen: DataFrame,
    segments: DataFrame | None,
    url_col: str = "url",
    buckets: int = DEFAULT_BUCKETS,
    slots: int = DEFAULT_SLOTS,
    n_segments: int = DEFAULT_SEGMENTS,
    exact_join=None,
    persisted: list | None = None,
) -> DataFrame:
    """Exact frontier-minus-seen with cuckoo shuffle avoidance (same
    contract as bloom.bloom_anti_join: positives re-checked by the exact
    anti-join, negatives guaranteed unseen)."""
    if segments is None:
        return frontier.join(seen.select(url_col), url_col, "left_anti")
    seg_rows = segments.collect()
    # keep ALL rows per segment (unmerged per-wave deltas are a legal
    # input, same contract as the cogroup path) — probe each table
    seg_map: dict[int, list[bytes]] = {}
    for r in seg_rows:
        seg_map.setdefault(r["segment"], []).append(bytes(r["bits"]))
    saturated = {r["segment"] for r in seg_rows if r["n_keys"] < 0}
    probe = make_probe_udf(seg_map, saturated, buckets, slots)
    u = F.col(url_col)
    with_flag = frontier.withColumn(
        "_maybe",
        probe(_segment_col(u, n_segments), _fp_col(u),
              _i1_col(u, buckets)),
    )
    if persisted is not None:
        with_flag = with_flag.persist()
        persisted.append(with_flag)
    definitely_new = with_flag.where(~F.col("_maybe")).drop("_maybe")
    maybe = with_flag.where(F.col("_maybe")).drop("_maybe")
    checked = (exact_join(maybe) if exact_join is not None
               else maybe.join(seen.select(url_col), url_col, "left_anti"))
    return definitely_new.unionByName(checked)


def load_factor(segments: DataFrame) -> float:
    """Max per-segment slot occupancy (1.0 if any segment is saturated:
    n_keys=-1). Partial-key cuckoo insert degrades sharply past ~0.84
    load, so the engine rebuilds with doubled buckets when max load
    crosses cfg.filter_max_load (amortized at compaction)."""

    def occ(batches):
        for pdf in batches:
            out = []
            for bz, nk in zip(pdf["bits"], pdf["n_keys"]):
                if int(nk) < 0:
                    out.append(1.0)
                else:
                    t = np.frombuffer(bytes(bz), dtype=np.uint16)
                    out.append(float((t != 0).mean()) if len(t) else 0.0)
            yield pd.DataFrame({"f": out})

    rows = segments.select("bits", "n_keys").mapInPandas(occ, "f double") \
        .collect()
    return max((r["f"] for r in rows), default=0.0)
