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
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

# Mersenne-31: keeps a_i * h + b_i < 2^62, safe under ANSI int64 arithmetic
MERSENNE_P = (1 << 31) - 1


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
    """
    rows = num_hashes // bands
    sh = shingles(df, text_col, id_col, n).persist()
    # persisted like sh: the banded frame self-joins, and without the cache
    # each side would recompute the full shingle->signature aggregation
    # (AQE does not reuse the exchange across the two scan subtrees here)
    sig = minhash_signatures(sh, num_hashes, seed).persist()
    band_cols = F.array(
        *[
            F.xxhash64(
                F.lit(bi), *[F.col(f"mh{bi * rows + r}") for r in range(rows)]
            )
            for bi in range(bands)
        ]
    )
    banded = sig.select(
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
    sizes = sh.groupBy("id").agg(F.count("*").alias("n_sh"))
    # exact intersection sizes via shingle-set equi-joins on the candidates
    sh_a = sh.select(F.col("id").alias("id_a"), "shingle")
    sh_b = sh.select(F.col("id").alias("id_b"), "shingle")
    inter = (
        cand.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
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

def simhash_signatures(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(id, sh): 64-bit simhash, fully JVM-side — no Python in the path.

    Bit-count form with 16-bit LANE PACKING. The round-2 shape was one
    groupBy with 64 conditional-sum vote aggregates; >100 aggregate buffer
    fields pushes HashAggregate out of whole-stage codegen and the
    interpreted evaluator cost ~23 us/token (2.4 s for 108k tokens,
    measured). This shape:

      level 1 (hot, WSCG-sized, map-side partial agg preserved):
        groupBy(id, chunk) with 17 buffer fields — token count n plus 16
        longs p0..p15, where p_g packs the counts of bits {g, g+16, g+32,
        g+48} into four 16-bit lanes. Chunk = token_pos >> 15 bounds any
        group at 32768 tokens, so a lane can never overflow into its
        neighbor.
      level 2 (tiny, O(docs x chunks) rows):
        sum n and the 64 unpacked lane counts per id.

    Bit b of the hash is set iff strictly more tokens have bit b set than
    clear (2*c_b > n) — identical to the +-1 vote form, so signatures are
    bit-for-bit unchanged (pytest XXH64 oracle + driver VALUES oracle).
    Docs with zero tokens (explode_outer null) get sh=0.
    """
    # materialize the token hash ONCE before the aggregate (referencing the
    # xxhash64 expression inside each packed sum would re-evaluate it per
    # lane-group — the same re-evaluation trap the round-1 code hit)
    tok = df.select(
        F.col(id_col).alias("id"),
        F.posexplode_outer(_tokens(text_col)).alias("pos", "tok"),
    ).select(
        "id",
        F.shiftright(F.coalesce(F.col("pos"), F.lit(0)), 15).alias("_chunk"),
        # xxhash64(NULL) is the seed, not NULL: keep empty docs' null marker
        F.when(F.col("tok").isNotNull(), F.xxhash64("tok")).alias("h"),
    )

    def bit(b):
        return F.shiftrightunsigned("h", b).bitwiseAND(F.lit(1))

    packed = []
    for g in range(16):
        e = bit(g)
        for j in range(1, 4):
            e = e + F.shiftleft(bit(g + 16 * j), 16 * j)
        packed.append(F.sum(e).alias(f"p{g}"))
    level1 = tok.groupBy("id", "_chunk").agg(
        F.count("h").alias("n"), *packed)

    lane_sums = [
        F.sum(F.shiftrightunsigned(f"p{g}", 16 * j)
              .bitwiseAND(F.lit(0xFFFF))).alias(f"c{g + 16 * j}")
        for j in range(4) for g in range(16)
    ]
    level2 = level1.groupBy("id").agg(F.sum("n").alias("n"), *lane_sums)

    fp = F.lit(0).cast("long")
    for b in range(64):
        fp = fp.bitwiseOR(
            F.when(2 * F.col(f"c{b}") > F.col("n"),
                   F.shiftleft(F.lit(1).cast("long"), b))
            .otherwise(F.lit(0).cast("long"))
        )
    return level2.select("id", fp.alias("sh"))


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
