"""Dedup operator correctness vs numpy/pure-Python oracles."""

import re

import numpy as np
import pytest

from grawler.operators import dedup


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, base + " extra token"),                  # near dup
        (3, "completely different content about spark shuffle partitions"),
        (4, base.replace("quick", "slow")),          # near dup
        (5, "completely different content about spark shuffle partitions"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _shingle_sets(rows, n=3):
    out = {}
    for i, t in rows:
        toks = re.findall(r"\w+", t.lower())
        out[i] = {" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)}
    return out


def test_exact_dedup(spark):
    d = dedup.exact_dedup(_docs(spark)).collect()
    groups = {r["keep_id"]: r["dup_count"] for r in d}
    assert groups[0] == 2 and groups[3] == 2
    assert groups[2] == 1 and groups[4] == 1


def test_ngram_jaccard_matches_python(spark):
    rows = [(r["doc_id"], r["text"]) for r in _docs(spark).collect()]
    sets_ = _shingle_sets(rows)
    want = {}
    for a in sets_:
        for b in sets_:
            if a < b and sets_[a] and sets_[b]:
                j = len(sets_[a] & sets_[b]) / len(sets_[a] | sets_[b])
                if j >= 0.3:
                    want[(a, b)] = round(j, 6)
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in dedup.ngram_jaccard_pairs(_docs(spark),
                                           threshold=0.3).collect()
    }
    assert got == want


def test_minhash_lsh_finds_high_jaccard_pairs(spark):
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(_docs(spark),
                                         threshold=0.5).collect()
    }
    assert (0, 1) in got          # exact dup always caught
    assert (3, 5) in got
    # verify no false positives: every reported pair really >= 0.5
    rows = [(r["doc_id"], r["text"]) for r in _docs(spark).collect()]
    sets_ = _shingle_sets(rows)
    for a, b in got:
        j = len(sets_[a] & sets_[b]) / len(sets_[a] | sets_[b])
        assert j >= 0.5


def test_minhash_lsh_matches_python_pipeline_oracle(spark):
    """END-TO-END independent replication of the minhash-LSH pipeline in
    pure Python: shingle sets -> xxh64 mod Mersenne -> 64 affine minhashes
    -> banded hashes (chained xxhash64 over [band_idx, mh...]) -> candidate
    pairs sharing a bucket -> exact Jaccard filter. Exact pair set AND
    jaccard values must match the Spark operator."""
    from grawler.xxh import spark_xxhash64

    rows = [(r["doc_id"], r["text"]) for r in _docs(spark).collect()]
    P = dedup.MERSENNE_P
    num_hashes, bands, n, seed, threshold = 64, 16, 3, 7, 0.3
    rows_per_band = num_hashes // bands
    a, b = dedup._affine_params(num_hashes, seed)
    sets_ = _shingle_sets(rows, n)

    sigs = {}
    for i, sh in sets_.items():
        if not sh:
            continue
        hs = [spark_xxhash64(s) % P for s in sh]
        sigs[i] = [min((h * int(a[k]) + int(b[k])) % P for h in hs)
                   for k in range(num_hashes)]
    buckets: dict = {}
    for i, sig in sigs.items():
        for bi in range(bands):
            key = (bi, spark_xxhash64(
                np.int32(bi),
                *sig[bi * rows_per_band:(bi + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(i)
    cand = {tuple(sorted((x, y)))
            for ids in buckets.values()
            for x in ids for y in ids if x < y}
    want = {}
    for x, y in cand:
        j = len(sets_[x] & sets_[y]) / len(sets_[x] | sets_[y])
        if j >= threshold:
            want[(x, y)] = round(j, 6)

    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 6)
        for r in dedup.minhash_lsh_pairs(
            _docs(spark), n=n, num_hashes=num_hashes, bands=bands,
            threshold=threshold, seed=seed).collect()
    }
    assert got == want and len(want) > 0


def test_connected_components_matches_union_find(spark):
    """Label propagation vs a python union-find, including a 4-hop chain
    (multiple propagation rounds) and disjoint clusters."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5),      # chain -> comp 1
             (10, 11),                            # pair  -> comp 10
             (20, 22), (21, 22),                  # star  -> comp 20
             (7, 7)]                              # self-loop
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(df).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want
    assert got[5] == 1 and got[22] == 20 and got[7] == 7


def test_star_contraction_matches_label_propagation(spark):
    """connected_components_star is contract-identical to the min-label
    version on a mixed graph (chain + pair + star + self-loop)."""
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5),
             (10, 11), (20, 22), (21, 22), (7, 7)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    a = {r["id"]: r["component"]
         for r in dedup.connected_components(df).collect()}
    b = {r["id"]: r["component"]
         for r in dedup.connected_components_star(df).collect()}
    assert a == b


def test_star_contraction_long_chain(spark):
    """The case star contraction exists for: a 200-hop duplicate CHAIN
    (A~B~C~... with no transitive pairs). Min-label propagation needs one
    shuffle round per hop (would raise at max_iter=25); star contraction
    converges in O(log^2 n) rounds and labels the whole chain with its
    minimum."""
    n = 201
    df = spark.createDataFrame([(i, i + 1) for i in range(n - 1)],
                               "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(df, max_iter=10)
    got = {r["id"]: r["component"]
           for r in dedup.connected_components_star(df, max_iter=15)
           .collect()}
    assert got == {i: 0 for i in range(n)}


def test_star_contraction_random_graph(spark):
    """Parity vs python union-find on a seeded random graph (multiple
    irregular components)."""
    import random

    rng = random.Random(13)
    pairs = [(rng.randrange(120), rng.randrange(120)) for _ in range(90)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {r["id"]: r["component"]
           for r in dedup.connected_components_star(df).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    assert got == want


def test_simhash_exact_dups_zero_hamming(spark):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in dedup.simhash_pairs(_docs(spark)).collect()}
    assert pairs.get((0, 1)) == 0
    assert pairs.get((3, 5)) == 0


def test_simhash_matches_numpy_oracle(spark):
    """Fully independent oracle: per-token hashes from the pure-Python
    XXH64 (grawler.xxh), voting/bit-pack in numpy — nothing reuses Spark,
    including the repeated-token weighting and the empty-document -> 0
    case."""
    texts = ["alpha beta gamma", "alpha beta gamma delta",
             "alpha alpha alpha beta", "...!!!"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["id"]: r["sh"] for r in dedup.simhash_signatures(df).collect()}
    from grawler.xxh import spark_xxhash64

    all_toks = {t for s in texts for t in re.findall(r"\w+", s.lower())}
    hmap = {t: spark_xxhash64(t) for t in all_toks}  # no Spark involved
    for i, t in enumerate(texts):
        toks = re.findall(r"\w+", t.lower())
        if not toks:
            assert got[i] == 0
            continue
        hs = np.array([hmap[tok] for tok in toks],
                      dtype=np.int64).view(np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(
            np.int64)
        v = (2 * bits - 1).sum(axis=0)
        fp = np.uint64(0)
        for bit in np.nonzero(v > 0)[0]:
            fp |= np.uint64(1) << np.uint64(bit)
        assert got[i] == np.int64(fp.view(np.int64)), i
