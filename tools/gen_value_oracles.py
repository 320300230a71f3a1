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


# ---------------------------------------------------------------------------
# testdata-derived oracles (sf0.01): the 5 hash-function-bearing entries the
# DuckDB SQL surface cannot express (xxhash64 / seeded hyperplanes / Lloyd's).
# All are deterministic functions of the FIXED driver testdata (seed 42,
# TESTDATA.md) + fixed operator seeds, so expected rows are generated here by
# the pure-Python XXH64 replica (grawler.xxh, bit-for-bit vs Spark, see
# tests/test_xxh.py) + numpy, with zero Spark involved. NOTE: these literals
# are valid for /root/testdata/sf0.01 (the driver's correctness tier).
# ---------------------------------------------------------------------------

SF_DIR = os.environ.get("GRAWLER_ORACLE_SF", "/root/testdata/sf0.01")


def _seq_dot(a, b) -> float:
    """Sequential left fold, matching Spark's aggregate(zip_with(a,b,*))."""
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def _seq_norm(a) -> float:
    import math

    s = 0.0
    for x in a:
        s += x * x
    return math.sqrt(s)


def _rank_rows(cand_ids, qid, cos, k):
    """(neighbor, rounded cosine, rank) by (cosine DESC, neighbor ASC)."""
    ranked = sorted(cand_ids, key=lambda nid: (-cos[nid], nid))[:k]
    return [[qid, nid, spark_round(cos[nid]), r + 1]
            for r, nid in enumerate(ranked)]


def testdata_oracles() -> dict:
    import re as _re

    import numpy as np
    import pyarrow.parquet as pq

    from grawler.operators import dedup
    from grawler.operators.similarity import (_hyperplanes, lloyd_centroids,
                                              nearest_lists)
    from grawler.operators.textstats import fingerprint64_one
    from grawler.xxh import spark_xxhash64

    out: dict = {}
    docs = pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pandas()
    # Java regex \w == [A-Za-z0-9_] (no UNICODE_CHARACTER_CLASS) -> re.ASCII
    word_re = _re.compile(r"\w+", _re.ASCII)
    toks = {int(r.doc_id): word_re.findall(r.text.lower())
            for r in docs.itertuples()}

    # ---- dedup_minhash_lsh (doc_id < 2000 keeps all sf0.01 docs) ----------
    P = dedup.MERSENNE_P
    num_hashes, bands, rows_per_band, seed, thr = 64, 16, 4, 7, 0.5
    a, b = dedup._affine_params(num_hashes, seed)
    sets_ = {i: {" ".join(t[j:j + 3]) for j in range(len(t) - 2)}
             for i, t in toks.items() if len(t) >= 3}
    hcache: dict = {}
    sigs = {}
    for i, sh in sets_.items():
        hs = np.array([hcache.setdefault(s, spark_xxhash64(s) % P)
                       for s in sh], dtype=np.int64)
        sigs[i] = ((hs[:, None] * a[None, :] + b[None, :]) % P).min(axis=0)
    buckets: dict = {}
    for i, sig in sigs.items():
        for bi in range(bands):
            key = (bi, spark_xxhash64(
                np.int32(bi), *sig[bi * rows_per_band:(bi + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(i)
    cand = {tuple(sorted((x, y))) for ids in buckets.values()
            for x in ids for y in ids if x != y}
    mh_rows = []
    for x, y in sorted(cand):
        j = len(sets_[x] & sets_[y]) / len(sets_[x] | sets_[y])
        if j >= thr:
            mh_rows.append([x, y, spark_round(j)])
    out["dedup_minhash_lsh"] = {
        "columns": ["id_a", "id_b", "jaccard"],
        "types": ["BIGINT", "BIGINT", "DOUBLE"],
        "rows": mh_rows,
    }

    # ---- dedup_simhash (4 bands x 16 bits, hamming <= 3) ------------------
    tok_hash: dict = {}
    sh_sig = {}
    for i, t in toks.items():
        if not t:
            sh_sig[i] = 0
            continue
        hs = np.array([tok_hash.setdefault(tk, spark_xxhash64(tk))
                       for tk in t], dtype=np.int64).view(np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64))
                & np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        fp = 0
        for bit in np.nonzero(v > 0)[0]:
            fp |= 1 << int(bit)
        sh_sig[i] = fp - (1 << 64) if fp >= (1 << 63) else fp
    sim_buckets: dict = {}
    for i, sh in sh_sig.items():
        u = sh & ((1 << 64) - 1)
        for bi in range(4):
            sim_buckets.setdefault(
                (bi, (u >> (16 * bi)) & 0xFFFF), []).append(i)
    sim_rows = set()
    for ids in sim_buckets.values():
        for x in ids:
            for y in ids:
                if x < y:
                    ham = bin((sh_sig[x] ^ sh_sig[y])
                              & ((1 << 64) - 1)).count("1")
                    if ham <= 3:
                        sim_rows.add((x, y, ham))
    out["dedup_simhash"] = {
        "columns": ["id_a", "id_b", "hamming"],
        "types": ["BIGINT", "BIGINT", "INTEGER"],
        "rows": sorted(list(r) for r in sim_rows),
    }

    # ---- text_fingerprint --------------------------------------------------
    out["text_fingerprint"] = {
        "columns": ["doc_id", "fp64"],
        "types": ["BIGINT", "BIGINT"],
        "rows": [[i, fingerprint64_one(
            (" ".join(t) + " ").encode() if t else b"")]
            for i, t in sorted(toks.items())],
    }

    # ---- media_audio_frames / media_video_frames ---------------------------
    # pure-numpy replication of the mapInPandas bodies, importing the SAME
    # fake decoders + real phash the Spark operators use
    from grawler import codecs as _codecs
    from grawler.operators.images import fake_frame_decode, fake_pcm_decode

    med = docs[docs.doc_id < 100]
    a_rows, v_rows = [], []
    for r in med.itertuples():
        mid = int(r.doc_id)
        payload = r.text.encode()
        dur = (mid % 4 + 1) * 1000
        for k in range(dur // 1000):
            pcm = fake_pcm_decode(payload, 8000, k * 1000, 8000)
            sig = 0
            for j, b in enumerate((pcm[:64] > 0).astype(int)):
                sig |= int(b) << j
            sig = sig - (1 << 64) if sig >= (1 << 63) else sig
            a_rows.append([mid, k, k * 1000,
                           round(float(np.sqrt((pcm * pcm).mean())), 6),
                           sig])
        for k in range(int(dur / 1000.0)):
            t_ms = int(k * 1000.0)
            px = fake_frame_decode(payload, 24, 16, t_ms)
            luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                    + 0.114 * px[:, :, 2])
            v_rows.append([mid, k, t_ms,
                           round(float(luma.mean()) / 255.0, 6),
                           _codecs.phash64(px)])
    out["media_audio_frames"] = {
        "columns": ["media_id", "frame_idx", "t_ms", "rms", "frame_sig"],
        "types": ["BIGINT", "INTEGER", "INTEGER", "DOUBLE", "BIGINT"],
        "rows": sorted(a_rows),
    }
    out["media_video_frames"] = {
        "columns": ["media_id", "frame_idx", "t_ms", "mean_luma", "phash"],
        "types": ["BIGINT", "INTEGER", "INTEGER", "DOUBLE", "BIGINT"],
        "rows": sorted(v_rows),
    }

    # ---- sim_ann_lsh / sim_ann_ivf -----------------------------------------
    emb = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pandas()
    ids = [int(v) for v in emb.vec_id]
    # float32 -> float64 cast is exact; row order mirrors the parquet scan so
    # Arrow batch shapes match the Spark plan (one file = one batch here)
    M = np.stack([np.asarray(v, dtype=np.float32).astype(np.float64)
                  for v in emb.embedding])
    qmask = [i for i, vid in enumerate(ids) if vid < 8]
    MQ = M[qmask]
    qids = [ids[i] for i in qmask]

    # sign-LSH: one matmul per Spark input batch (corpus batch, query batch)
    dim, bits, tables, k = 64, 6, 8, 5
    planes = _hyperplanes(dim, bits, tables, 11)
    PM = planes.reshape(tables * bits, dim)
    weights = (np.int64(1) << np.arange(bits - 1, -1, -1, dtype=np.int64))

    def _sigs(mat):
        B = (mat @ PM.T) > 0
        return B.reshape(len(mat), tables, bits).astype(np.int64) @ weights

    nsig, qsig = _sigs(M), _sigs(MQ)
    table_buckets: dict = {}
    for row, vid in enumerate(ids):
        for t in range(tables):
            table_buckets.setdefault((t, int(nsig[row][t])), []).append(vid)
    vec_by_id = {vid: M[row] for row, vid in enumerate(ids)}
    lsh_rows = []
    for qrow, qid in enumerate(qids):
        cand_ids = set()
        for t in range(tables):
            cand_ids.update(table_buckets.get((t, int(qsig[qrow][t])), []))
        cand_ids.discard(qid)
        qv = vec_by_id[qid]
        qn = _seq_norm(qv)
        cos = {nid: _seq_dot(qv, vec_by_id[nid])
               / (qn * _seq_norm(vec_by_id[nid])) for nid in cand_ids}
        lsh_rows.extend(_rank_rows(cand_ids, qid, cos, k))
    out["sim_ann_lsh"] = {
        "columns": ["query_id", "neighbor_id", "cosine", "rank"],
        "types": ["BIGINT", "BIGINT", "DOUBLE", "BIGINT"],
        "rows": sorted(lsh_rows),
    }

    # IVF: deterministic Lloyd's on the id-ordered sample (the operator's
    # own training path), assignment via the shared nearest_lists core
    n_lists, n_probe = 16, 3
    # KMV sample replica: smallest (xxhash64(id), id) first — at sf0.01
    # train_cap covers all rows, but the ROW ORDER feeds Lloyd's init/mean
    # and must match the operator's collect() order bit-for-bit
    from grawler.xxh import spark_xxhash64 as _sx
    id_arr = np.array(ids, dtype=np.int64)
    h_arr = np.array([_sx(int(v)) for v in ids], dtype=np.int64)
    order = np.lexsort((id_arr, h_arr))
    X = M[order]
    centers = lloyd_centroids(X, n_lists, 11)
    n_list_id = nearest_lists(M, centers, 1)[:, 0]       # corpus batch
    q_lists = nearest_lists(MQ, centers, n_probe)        # query batch
    members: dict = {}
    for row, vid in enumerate(ids):
        members.setdefault(int(n_list_id[row]), []).append(vid)
    ivf_rows = []
    for qrow, qid in enumerate(qids):
        cand_ids = set()
        for lid in q_lists[qrow]:
            cand_ids.update(members.get(int(lid), []))
        cand_ids.discard(qid)
        qv = vec_by_id[qid]
        qn = _seq_norm(qv)
        cos = {nid: _seq_dot(qv, vec_by_id[nid])
               / (qn * _seq_norm(vec_by_id[nid])) for nid in cand_ids}
        ivf_rows.extend(_rank_rows(cand_ids, qid, cos, k))
    out["sim_ann_ivf"] = {
        "columns": ["query_id", "neighbor_id", "cosine", "rank"],
        "types": ["BIGINT", "BIGINT", "DOUBLE", "BIGINT"],
        "rows": sorted(ivf_rows),
    }
    return out


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

    out["crawl_robots_cache"] = {
        "columns": ["host", "robots_txt", "fetched_unix"],
        "types": ["VARCHAR", "VARCHAR", "BIGINT"],
        "rows": sorted(
            [h, txt, int(ts.timestamp())]
            for h, (txt, ts) in o.robots_cache.items()
        ),
    }

    # hot-host skew fixture (W4 salting + §2.10c deferral driver-verified):
    # host h0 holds 50% of all URLs (synthgen._host_of: even page index ->
    # host 0), so politeness tokens force multi-wave deferral and the
    # engine's salted top-k must still reproduce the oracle's exact trace
    web_hot = synthgen.generate(seed=42, n_pages=60, shape="hot-host")
    o_hot = oracle.crawl(web_hot, CrawlConfig(), max_waves=3)
    hosts = {}
    for _w, _s, _u, h, _d in o_hot.trace:
        hosts[h] = hosts.get(h, 0) + 1
    out["crawl_hot_host"] = {
        "columns": ["wave", "seq", "url", "host", "depth"],
        "types": ["INTEGER", "INTEGER", "VARCHAR", "VARCHAR", "INTEGER"],
        "rows": [list(t) for t in o_hot.trace],
    }

    out.update(testdata_oracles())

    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    total = sum(len(v["rows"]) for v in out.values())
    print(f"wrote {OUT}: {len(out)} oracles, {total} expected rows")


if __name__ == "__main__":
    main()
