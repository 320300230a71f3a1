"""Deduplication operators over a document table (doc_id, text).

Exact + near-dup families a 100 TB training-data pipeline needs:

  exact_dedup      hash-groupBy on md5(text)                     (native)
  minhash_lsh      shingle -> 64 minhashes (affine over xxhash64,
                   all JVM-side) -> banded LSH buckets -> candidate
                   pairs -> exact-Jaccard verify                  (native)
  simhash          64-bit simhash: exploded-token xxhash64 + 64 conditional-
                   sum bit votes, then 16-bit band buckets -> hamming verify
                   (fully native, zero Python)
  ngram_jaccard    token n-gram sets -> shared-gram candidates ->
                   Jaccard                                        (native)
  embedding_neardup  cosine > threshold via sign-LSH buckets      (mixed)

Scale notes: every family avoids the all-pairs cross join — candidates come
from equi-joins on bucket keys (shuffle on bucket, broadcast nothing), so the
plan survives a 100x scale-up. MinHash permutations are affine maps over one
xxhash64 pass: a_i*h+b_i mod p computed as native column expressions (no
Python in the hot path).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# Mersenne-31: keeps a_i * h + b_i < 2^62, safe under ANSI int64 arithmetic
MERSENNE_P = (1 << 31) - 1

# vectorized-UDF objects memoized per parameter set: repeated pipeline
# builds in one session must reference the SAME PythonUDF so their plans
# canonicalize equal (plan identity for the CacheManager)
_UDF_MEMO: dict = {}


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id representative of each exact-duplicate group."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count("*").alias("dup_count"),
        )
    )


def _tokens(text_col: str):
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(r"\w+"), 0)


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             n: int = 3) -> DataFrame:
    """Token n-gram shingles, exploded: (id, shingle).

    The token array is materialized ONCE per document behind a Generate
    barrier (explode of a one-element array wrapper): CollapseProject
    cannot merge expressions across Generate, so the gram-building
    lambdas below reference the materialized column, not the tokenizing
    regex — building grams with element_at() lambdas directly over the
    token-array expression made Catalyst re-evaluate the regex per gram
    per position (measured ~20x slowdown at sf0.1). Grams are then built
    natively with transform over the array; the previous shape (posexplode
    + window lead()) paid a shuffle + SORT by id just to pair adjacent
    tokens. The dedup is an explicit repartition(id) + dropDuplicates
    rather than .distinct(): hash(id) satisfies the dedup's (id, shingle)
    clustering requirement, and — critically — it is the output
    partitioning every consumer keys on (signature/size groupBys by id,
    candidate joins by id), so they all reuse this one exchange (guide
    §2.4). A plain distinct() partitions by (id, shingle), which forced an
    extra exchange into every downstream aggregation — measured 3x on the
    whole minhash pipeline. Same shingle set either way."""
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(_tokens(text_col))).alias("t"),
    )
    gram = F.transform(
        F.sequence(F.lit(0), F.size("t") - n),
        lambda i: F.concat_ws(
            " ", *[F.get("t", i + j) for j in range(n)]),
    )
    return (
        tok.where(F.size("t") >= n)
        .select("id", F.explode(gram).alias("shingle"))
        .repartition(F.col("id"))
        .dropDuplicates(["id", "shingle"])
    )


def _affine_params(num_hashes: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_P, size=num_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE_P, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signatures(sh: DataFrame, num_hashes: int = 64,
                       seed: int = 7) -> DataFrame:
    """(id, mh0..mh{k-1}) — one xxhash64 pass + k affine mins, all native.

    The shingle hash is projected ONCE (`_h`) below the aggregate instead
    of being written inline in each of the k min-aggs: inline, every
    shingle row evaluated xxhash64+pmod k times (the same k-fold
    re-evaluation trap simhash_signatures documents); as a separate
    non-cheap alias, CollapseProject leaves the projection in place and
    each row hashes once. Results are bit-identical (same math)."""
    a, b = _affine_params(num_hashes, seed)
    hashed = sh.select(
        "id", F.pmod(F.xxhash64("shingle"), F.lit(MERSENNE_P)).alias("_h"))
    aggs = [
        F.min(F.pmod(F.col("_h") * F.lit(int(a[i])) + F.lit(int(b[i])),
                     F.lit(MERSENNE_P))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return hashed.groupBy("id").agg(*aggs)


def _minhash_sigs_udf(num_hashes: int, seed: int):
    """Arrow-batched 64-affine-min minhash signatures over per-doc
    shingle-hash arrays (array<long> of raw xxhash64 values, hashed
    JVM-side). Per shingle: h = xxhash64 mod MERSENNE_P (numpy % matches
    Spark pmod on negatives — both return the non-negative residue), then
    sig_i = min over shingles of (h * a_i + b_i) mod MERSENNE_P. All int64
    with products < 2^62 — bit-identical to the native affine-min
    aggregation it replaces. Memoized per (num_hashes, seed) so repeated
    pipeline builds share one PythonUDF (plan/cache identity)."""
    key = ("minhash_sigs", num_hashes, seed)
    if key in _UDF_MEMO:
        return _UDF_MEMO[key]
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, LongType

    a, b = _affine_params(num_hashes, seed)
    A = a[None, :]          # (1, k)
    B = b[None, :]

    @pandas_udf(ArrayType(LongType()))
    def sigs(hs: pd.Series) -> pd.Series:
        if len(hs) == 0:
            return pd.Series([], dtype=object)
        arrs = [np.asarray(x, dtype=np.int64) for x in hs]
        lens = np.fromiter((len(x) for x in arrs), dtype=np.int64,
                           count=len(arrs))
        # callers filter size>=1 pre-UDF; guard empties anyway (min over
        # nothing is undefined): they get an all-MERSENNE_P signature,
        # which can only band-match another empty doc — no false pairs
        # survive the exact verify either way
        flat = (np.concatenate([x for x in arrs if len(x)])
                if lens.sum() else np.empty(0, dtype=np.int64))
        h = flat % MERSENNE_P
        M = (h[:, None] * A + B) % MERSENNE_P          # (n_shingles, k)
        out = np.full((len(arrs), A.shape[1]), MERSENNE_P, dtype=np.int64)
        nz = np.flatnonzero(lens)
        if len(nz):
            starts = np.zeros(len(nz), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=starts[1:])
            out[nz] = np.minimum.reduceat(M, starts, axis=0)
        return pd.Series(list(out))

    _UDF_MEMO[key] = sigs
    return sigs


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, jaccard >= threshold).

    LSH candidates (band-bucket equi-join) verified with exact Jaccard over
    shingle sets — no false positives survive; false-negative rate is the
    standard (1 - s^r)^b curve.

    Round-6 shape: everything per-document is computed per document,
    without a shuffle (guide §1.1 — the minimum number of shuffles this
    operation fundamentally needs is the candidate self-join, nothing
    else). The round-5 pipeline exploded shingles into rows and paid an
    exchange each for the (id, shingle) dedup, the 64-min signature
    groupBy, the set-size groupBy, and a shingle-explode equi-join +
    groupBy to verify each candidate pair. Here the distinct shingle SET
    of a document is one native array (transform + array_distinct, token
    array materialized once behind a Generate barrier — same
    CollapseProject guard as shingles()); signatures are one Arrow pass
    over the per-doc shingle-hash arrays (same affine math, memoized UDF
    so repeated builds share plans/cache); candidate verification attaches
    the two shingle arrays by id (broadcast-sized: pairs are bounded by
    band collisions) and intersects them natively with array_intersect —
    arrays are distinct, so size(array_intersect) IS the exact
    intersection cardinality. Pair set and jaccard values are identical
    (same shingle sets, same integer counts, same division).
    """
    rows = num_hashes // bands
    tok = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(_tokens(text_col))).alias("t"),
    )
    gram = F.transform(
        F.sequence(F.lit(0), F.size("t") - n),
        lambda i: F.concat_ws(
            " ", *[F.get("t", i + j) for j in range(n)]),
    )
    docs = (
        tok.where(F.size("t") >= n)
        .select("id", F.array_distinct(gram).alias("shs"))
        .select(
            "id", F.size("shs").alias("n_sh"),
            _minhash_sigs_udf(num_hashes, seed)(
                F.transform("shs", lambda s: F.xxhash64(s))).alias("_sig"),
            "shs",
        )
        .persist()
    )
    band_cols = F.array(
        *[
            F.xxhash64(
                F.lit(bi), *[F.get("_sig", bi * rows + r)
                             for r in range(rows)]
            )
            for bi in range(bands)
        ]
    )
    banded = docs.select(
        "id", F.posexplode(band_cols).alias("band", "band_hash")
    )
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    out = (
        cand.join(docs.select(F.col("id").alias("id_a"),
                              F.col("shs").alias("_sa"),
                              F.col("n_sh").alias("n_a")), "id_a")
        .join(docs.select(F.col("id").alias("id_b"),
                          F.col("shs").alias("_sb"),
                          F.col("n_sh").alias("n_b")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


# ------------------------------------------------- duplicate clusters

def connected_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iter: int = 25) -> DataFrame:
    """(id, component) for every node in `pairs`; component = min node id
    reachable — the canonical-representative step that turns near-dup PAIRS
    into KEEP/DROP decisions (keep id == component).

    Distributed min-label propagation: each round every node takes the min
    label over itself + neighbors (one shuffle per round), stopping when a
    round changes nothing. Rounds needed = graph diameter, which for
    near-dup clusters is tiny (dups of a doc are dups of each other);
    star-contraction (Kiveris et al., SoCC'14) is the drop-in upgrade if a
    workload ever shows long chains. Checkpointed via localCheckpoint every
    few rounds so the lineage doesn't grow unboundedly."""
    sym = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .unionByName(
            pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .persist()
    )
    labels = sym.select("u").distinct().withColumn("label",
                                                   F.col("u")).persist()
    changed = 1
    for it in range(max_iter):
        # neighbor labels: edge (u,v) proposes label(v) to u
        prop = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .select("u", "label")
        )
        new_labels = (
            labels.unionByName(prop)
            .groupBy("u")
            .agg(F.min("label").alias("label"))
        )
        if it % 4 == 3:  # bound lineage growth across iterations
            new_labels = new_labels.localCheckpoint(eager=False)
        # persist: both the changed-count and the next round read this;
        # without it the whole chain since the last checkpoint recomputes
        new_labels = new_labels.persist()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "u")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1).count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(cluster diameter exceeds max_iter) — raise max_iter or use "
            "star-contraction for chain-shaped duplicate graphs")
    out = labels.select(F.col("u").alias("id"),
                        F.col("label").alias("component"))
    return out


def connected_components_star(pairs: DataFrame, id_a: str = "id_a",
                              id_b: str = "id_b",
                              max_iter: int = 30) -> DataFrame:
    """Same contract as connected_components ((id, component), component =
    min reachable id), via alternating large-star / small-star contraction
    (Kiveris et al., 'Connected Components in MapReduce and Beyond',
    SoCC'14) — the upgrade path the min-label docstring names: rounds are
    O(log^2 n) in the worst case instead of O(diameter), so CHAIN-shaped
    duplicate graphs (doc A ~ B ~ C ~ ... with no transitive pair) converge
    where label propagation needs one shuffle per hop.

    Each round: m(u) = min({u} ∪ N(u)); large-star rewires every neighbor
    v > u to m(u), small-star rewires every neighbor v <= u (and u itself)
    to m(u). Self-loops dropped, edges kept canonical (a < b). Stops when
    the canonical edge set is unchanged (exact exceptAll check on the
    already-small contracted set). A node can never leave its component's
    edge set before convergence: rewiring attaches it to m(u), and the
    final state IS the star centered at the component minimum."""
    def canon(df):
        return (df.where(F.col("u") != F.col("v"))
                .select(F.least("u", "v").alias("u"),
                        F.greatest("u", "v").alias("v"))
                .distinct())

    edges = canon(
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    ).persist()
    # all ids from the ORIGINAL pairs: a row (a, a) contributes node a but
    # no edge (canon drops self-loops) — it must still label itself, as it
    # does under min-label propagation
    nodes = (pairs.select(F.col(id_a).alias("id"))
             .unionByName(pairs.select(F.col(id_b).alias("id")))
             .distinct().persist())
    converged = False
    for it in range(max_iter):
        sym = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (sym.groupBy("u")
                .agg(F.min("v").alias("_mn"))
                .select("u", F.least("u", "_mn").alias("m")))
        # large-star: (v, m(u)) for v > u
        large = canon(
            sym.where(F.col("v") > F.col("u")).join(mins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v")))
        lsym = large.unionByName(
            large.select(F.col("v").alias("u"), F.col("u").alias("v")))
        lmins = (lsym.groupBy("u")
                 .agg(F.min("v").alias("_mn"))
                 .select("u", F.least("u", "_mn").alias("m")))
        # small-star: (v, m(u)) for v <= u, plus (u, m(u))
        small = canon(
            lsym.where(F.col("v") < F.col("u")).join(lmins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(lmins.select("u", F.col("m").alias("v"))))
        if it % 2 == 1:  # bound lineage growth across rounds: star builds
            # ~3 join/union/distinct layers per round (vs min-label's 1),
            # so truncate the LOGICAL plan eagerly before it compounds
            small = small.localCheckpoint(eager=True)
        small = small.persist()
        changed = (small.exceptAll(edges).limit(1).count()
                   or edges.exceptAll(small).limit(1).count())
        edges.unpersist()
        edges = small
        if changed == 0:
            converged = True
            break
    if not converged:
        edges.unpersist()
        nodes.unpersist()
        raise RuntimeError(
            f"star contraction did not converge in {max_iter} rounds")
    # final state: stars centered at component minima. Every non-root node
    # has exactly the edge (root, node); roots label themselves.
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    labels = (sym.groupBy("u").agg(F.min("v").alias("_mn"))
              .select(F.col("u").alias("id"),
                      F.least("u", "_mn").alias("component")))
    # materialize the output, then release edges/nodes: repeated calls in
    # one session must not accumulate cached blocks the caller can't free
    out = (nodes.join(labels, "id", "left")
           .select("id", F.coalesce("component", "id").alias("component"))
           .localCheckpoint(eager=True))
    edges.unpersist()
    nodes.unpersist()
    return out


# ---------------------------------------------------------------- simhash


def _simhash_votes_udf():
    """Arrow-batched bit voting over per-doc token-hash arrays.

    Input: array<long> of xxhash64 token hashes (one array per document,
    hashed JVM-side). Output: the 64-bit simhash. Bit b is set iff strictly
    more tokens have bit b set than clear (2*c_b > n) — integer math, so
    the result is bit-for-bit the vote-aggregation form it replaces
    (pytest XXH64 oracle + driver VALUES oracle unchanged).

    The UDF object is memoized: repeated pipeline builds in one session
    reference the SAME PythonUDF, so their plans canonicalize equal and the
    CacheManager can substitute a persisted signature table built by an
    earlier invocation (plan-identity, same behavior as the all-native
    expression shape this replaces)."""
    if "simhash_votes" in _UDF_MEMO:
        return _UDF_MEMO["simhash_votes"]
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def votes(hs: pd.Series) -> pd.Series:
        out = np.zeros(len(hs), dtype=np.uint64)
        arrs = [np.asarray(a, dtype=np.int64) for a in hs]
        lens = np.fromiter((len(a) for a in arrs), dtype=np.int64,
                           count=len(arrs))
        nz = np.flatnonzero(lens)
        if len(nz):
            flat = np.concatenate([arrs[i] for i in nz]).view(np.uint64)
            starts = np.zeros(len(nz), dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=starts[1:])
            n = lens[nz][:, None]                      # tokens per doc
            sh = np.zeros(len(nz), dtype=np.uint64)
            for b in range(64):
                c = np.add.reduceat((flat >> np.uint64(b)) & np.uint64(1),
                                    starts)
                sh |= (2 * c.astype(np.int64) > n[:, 0]).astype(
                    np.uint64) << np.uint64(b)
            out[nz] = sh
        return pd.Series(out.view(np.int64))

    _UDF_MEMO["simhash_votes"] = votes
    return votes


def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(id, sh): 64-bit simhash — token hashing JVM-side, bit voting in one
    Arrow-vectorized pass.

    The round-5 shape exploded every token and vote-counted through a
    two-level lane-packed aggregation: one Generate of |tokens| rows plus
    TWO shuffle exchanges (groupBy(id, chunk), then groupBy(id)) per
    signature build. But the vote is a per-document pure function of the
    token-hash multiset, so no shuffle is fundamentally required (guide
    §1.1): tokens are hashed natively (transform + xxhash64 — verified
    element-identical to exploded xxhash64), and the only Python crossing
    is 8 bytes per token one way, 8 bytes per doc back. Bit b of the hash
    is set iff strictly more tokens have bit b set than clear (2*c_b > n),
    identical to the vote-aggregation form — signatures are bit-for-bit
    unchanged (pytest XXH64 oracle + driver VALUES oracle). Docs with zero
    tokens (incl. NULL text) get sh=0, as before.
    """
    hashes = F.transform(_tokens(text_col), lambda t: F.xxhash64(t))
    return df.select(
        F.col(id_col).alias("id"),
        # NULL text -> NULL token array -> empty hash list -> sh=0, matching
        # the explode_outer null-marker path this replaces
        _simhash_votes_udf()(F.coalesce(
            hashes, F.array().cast("array<long>"))).alias("sh"),
    )


def hamming_band_pairs(sig: DataFrame, id_col: str = "id",
                       hash_col: str = "sh",
                       max_hamming: int = 3,
                       n_bands: int = 4) -> DataFrame:
    """Pairs within hamming<=max_hamming over a 64-bit hash column, via
    band buckets: pigeonhole guarantees any pair within h differing bits
    shares at least one of n_bands > h disjoint bands; candidates are the
    band-bucket equi-join (never all-pairs), verified by bit_count(xor).
    Shared by simhash (text) and phash (image) near-dup."""
    assert 64 % n_bands == 0 and n_bands > max_hamming
    width = 64 // n_bands
    mask = (1 << width) - 1
    bands = sig.select(
        F.col(id_col).alias("id"), F.col(hash_col).alias("sh"),
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned(F.col(hash_col), width * i)
                .bitwiseAND(F.lit(mask))
                for i in range(n_bands)
            ])
        ).alias("band", "band_val"),
    )
    # hamming-verify BEFORE the distinct: bit_count(xor) is a cheap
    # map-side expression, so filtering first shrinks the dedup shuffle
    # from every band-collision candidate (duplicated across bands) to
    # true near-dups only — and narrows its rows to (id_a, id_b, hamming)
    cand = (
        bands.alias("l")
        .join(
            bands.alias("r"),
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_val") == F.col("r.band_val"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(
            F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh")))
            .cast("int").alias("hamming"),
        )
    )
    return cand.where(F.col("hamming") <= max_hamming).distinct()


def simhash_pairs(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash: 16-bit band buckets (any pair within
    hamming<=3 of a 64-bit hash shares at least one of 4 bands), then exact
    hamming verify via bit_count(xor)."""
    sh = simhash_signatures(df, text_col, id_col).persist()
    return hamming_band_pairs(sh, "id", "sh", max_hamming, n_bands=4)


# ------------------------------------------------------- ngram jaccard

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard for pairs sharing >=1 gram (SQL-expressible:
    this one has a DuckDB oracle)."""
    sh = shingles(df, text_col, id_col, n)
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col("id").alias("id_a"), "shingle")
    b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a")
                   .withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b")
              .withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
