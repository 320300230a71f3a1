"""Similarity search over an embedding column (array<float>).

  cosine_topk      brute-force cosine top-k per query — the exactness
                   baseline; dot product via native zip_with/aggregate
                   (JVM-side, no Python in the hot path)
  ann_lsh_topk     sign-LSH (random hyperplanes) bucketed ANN — the scale
                   path: candidates share >=1 of `tables` bucket keys, so
                   the cross join shrinks from |Q|x|N| to bucket-local
  embedding_neardup  pairs with cosine >= threshold via the same buckets

Hyperplanes/centroids are generated driver-side (seeded numpy) and applied in
ONE Arrow-vectorized matrix pass per batch (`sign(V @ P.T)` / distance-to-
centroid argsort). An earlier version inlined them as per-dimension Catalyst
expressions; at realistic embedding dims (512-1536) that builds tables x bits
x dim expression nodes and blows past the 64KB JVM codegen method limit —
the batched numpy matmul is the right Python boundary here (still zero
per-row Python). Scoring/rerank stays native (zip_with/aggregate, which are
loop-based exprs, not per-dim inlined).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, LongType


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def with_cosine(df: DataFrame, a: str = "emb_a", b: str = "emb_b",
                out: str = "cosine") -> DataFrame:
    return df.withColumn(
        out,
        _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b))),
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force baseline).

    (query_id, neighbor_id, cosine, rank); self-matches excluded.
    """
    # norms are precomputed per VECTOR below the join (guide §2.3 "don't
    # recompute per pair what is per-row"): the fold that produces each
    # norm is unchanged, so cosine values are bit-identical — previously
    # both norms re-folded the full arrays for every (query, neighbor)
    # pair, tripling the per-pair array work.
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).withColumn("_qn", _norm(F.col("qv")))
    n = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nv")
    ).withColumn("_nn", _norm(F.col("nv")))
    scored = (
        q.crossJoin(n)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", _dot(F.col("qv"), F.col("nv"))
            / (F.col("_qn") * F.col("_nn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, bits: int, tables: int, seed: int = 11):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((tables, bits, dim))


def _signatures_udf(planes: np.ndarray):
    """Arrow-batched sign-LSH signatures: one numpy matmul per batch.

    planes is (tables, bits, dim); returns array<long> of one signature per
    table (bit order MSB-first, matching sig = sig*2 + bit).
    """
    tables, bits, dim = planes.shape
    P = planes.reshape(tables * bits, dim)
    weights = (np.int64(1) << np.arange(bits - 1, -1, -1, dtype=np.int64))

    @pandas_udf(ArrayType(LongType()))
    def sigs(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        M = np.stack(v.to_numpy())                       # (n, dim)
        B = (M @ P.T) > 0                                # (n, tables*bits)
        S = B.reshape(len(v), tables, bits).astype(np.int64) @ weights
        return pd.Series(list(S))

    return sigs


def with_lsh_buckets(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    bits: int = 6,
    tables: int = 8,
    seed: int = 11,
) -> DataFrame:
    """(.., bucket_table, bucket_sig) exploded — one row per LSH table."""
    planes = _hyperplanes(dim, bits, tables, seed)
    sig = _signatures_udf(planes)
    return df.withColumn("_sigs", sig(F.col(vec_col))).select(
        *df.columns, F.posexplode("_sigs").alias("bucket_table", "bucket_sig")
    )


def _bucket_keys(df: DataFrame, id_col: str, vec_col: str, dim: int,
                 bits: int, tables: int, seed: int) -> DataFrame:
    """(id, bucket_table, bucket_sig) ONLY — the embedding never rides
    through the tables-way explode. At dim 512 x 8 tables, carrying vectors
    through the explode shuffles ~8x the corpus bytes; keys-only keeps the
    candidate join narrow and vectors are re-attached by id afterwards."""
    planes = _hyperplanes(dim, bits, tables, seed)
    sig = _signatures_udf(planes)
    return df.select(
        id_col,
        F.posexplode(sig(F.col(vec_col))).alias("bucket_table",
                                                "bucket_sig"),
    )


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 6,
    tables: int = 8,
    seed: int = 11,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in >=1 table,
    re-ranked by exact cosine. Recall rises with `tables`. Bucket keys are
    exploded WITHOUT the vectors; vectors re-attach by id post-join."""
    n = embeddings.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"))
    nb = _bucket_keys(n, "neighbor_id", "nv", dim, bits, tables, seed)
    qb = _bucket_keys(q, "query_id", "qv", dim, bits, tables, seed)
    cand = (
        qb.join(nb, ["bucket_table", "bucket_sig"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    # per-vector norms computed below the candidate join (same fold, same
    # values — see cosine_topk): a candidate id appearing in many pairs no
    # longer re-folds its norm per pair. The candidate set is BROADCAST:
    # it is (query_id, neighbor_id) longs bounded by |queries| x bucket
    # collisions, while the neighbor side carries the full embedding
    # payload — the default plan shuffled+sorted every corpus vector to
    # meet a few thousand candidate keys (SortMergeJoin in the r06
    # baseline plan); broadcasting the keys streams the vectors in place.
    scored = (
        F.broadcast(cand)
        .join(n.withColumn("_nn", _norm(F.col("nv"))), "neighbor_id")
        .join(F.broadcast(q.withColumn("_qn", _norm(F.col("qv")))),
              "query_id")  # queries are the small side
        .withColumn(
            "cosine", _dot(F.col("qv"), F.col("nv"))
            / (F.col("_qn") * F.col("_nn")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("cosine", 6).alias("cosine"), "rank")
    )


def _pairwise_d2(M: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Squared L2 distances, |M|^2 - 2 M.C + |C|^2 form — ONE canonical
    formula shared by training, assignment, and the pure-numpy oracle so
    all three agree bit-for-bit on ties."""
    c_sq = (C * C).sum(axis=1)
    return (M * M).sum(axis=1)[:, None] - 2.0 * (M @ C.T) + c_sq[None, :]


def nearest_lists(M: np.ndarray, C: np.ndarray, n: int) -> np.ndarray:
    """Ids of the n nearest centroids per row (ties -> lower list id via
    stable argsort). Shared by the Spark UDF and the VALUES-oracle
    generator."""
    d2 = _pairwise_d2(M, C)
    return np.argsort(d2, axis=1, kind="stable")[:, :n].astype(np.int32)


def lloyd_centroids(X: np.ndarray, k: int, seed: int = 11,
                    iters: int = 20) -> np.ndarray:
    """Deterministic seeded Lloyd's k-means in float64 (coarse-quantizer
    training). Replaces pyspark.ml KMeans, whose kmeans|| init + partial
    aggregation order made centroids partitioning/platform-dependent — an
    oracle-hostile property for a deterministic entry. Callers pass X in a
    deterministic row order (sorted by id); given that, centroids are
    bit-stable across platforms, so the pure-numpy oracle reproduces them
    by calling this same function. Empty clusters keep their previous
    centroid (k <= len(X) enforced)."""
    rng = np.random.default_rng(seed)
    k = min(k, len(X))
    idx = rng.choice(len(X), size=k, replace=False)
    C = X[idx].astype(np.float64).copy()
    for _ in range(iters):
        assign = np.argmin(_pairwise_d2(X, C), axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def ann_ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 16,
    n_probe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
    train_cap: int = 16384,
) -> DataFrame:
    """IVF-style ANN: a coarse quantizer (deterministic Lloyd's k-means on
    a bounded, hash-ordered k-minimum-values training sample — the
    standard IVF practice of training on an unbiased subsample, bounded
    driver traffic at any corpus size)
    partitions the corpus into n_lists inverted lists; each query probes
    its n_probe nearest centroids and reranks by exact cosine within those
    lists only.

    The scan shrinks from |Q| x |N| to |Q| x (n_probe/n_lists) x |N|;
    recall rises with n_probe (n_probe == n_lists -> exact).
    """
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    # deterministic UNBIASED training sample: the train_cap rows with the
    # smallest (xxhash64(id), id) — k-minimum-values sampling. Still
    # TakeOrdered (no full sort), exact size, and hash-uniform over the
    # corpus (orderBy(id).limit biased training toward low ids); the
    # pure-Python XXH64 replica (grawler.xxh) reproduces the same sample
    # and row order in the VALUES oracle. Not .sample(): Bernoulli
    # sampling is partitioning-dependent.
    train_rows = (
        base.withColumn("_h", F.xxhash64("neighbor_id"))
        .orderBy("_h", "neighbor_id").limit(train_cap)
        .select("neighbor_id", "nv").collect())
    X = np.array([list(r["nv"]) for r in train_rows], dtype=np.float64)
    centers = lloyd_centroids(X, n_lists, seed)

    def nearest_lists_udf(n: int):
        """Arrow-batched nearest-centroid ids (shared nearest_lists core)."""
        C = centers

        @pandas_udf(ArrayType(IntegerType()))
        def nearest(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype=object)
            M = np.stack(v.to_numpy())
            return pd.Series(list(nearest_lists(M, C, n)))

        return nearest

    # per-vector norms precomputed below the probe join (same fold, same
    # values — see cosine_topk); they ride through the distinct as
    # deterministic functions of the vectors, so the pair set is unchanged
    listed = base.withColumn(
        "list_id", F.element_at(nearest_lists_udf(1)(F.col("nv")), 1)
    ).withColumn("_nn", _norm(F.col("nv")))
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("_qn", _norm(F.col("qv"))).withColumn(
        "list_id", F.explode(nearest_lists_udf(n_probe)(F.col("qv"))),
    )
    cand = (
        q.join(listed, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "_qn", "neighbor_id", "nv", "_nn")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine", _dot(F.col("qv"), F.col("nv"))
        / (F.col("_qn") * F.col("_nn")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id",
                F.round("cosine", 6).alias("cosine"), "rank")
    )


def embedding_neardup(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 6,
    tables: int = 8,
    seed: int = 11,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine (id_a < id_b). Bucket keys
    exploded without vectors; vectors re-attach by id on the candidate
    pairs (narrow self-join survives wide embeddings)."""
    e = embeddings.select(F.col(id_col).alias("id"),
                          F.col(vec_col).alias("v"))
    b = _bucket_keys(e, "id", "v", dim, bits, tables, seed)
    cand = (
        b.alias("l")
        .join(
            b.alias("r"),
            on=[
                F.col("l.bucket_table") == F.col("r.bucket_table"),
                F.col("l.bucket_sig") == F.col("r.bucket_sig"),
                F.col("l.id") < F.col("r.id"),
            ],
        )
        .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .distinct()
    )
    # per-vector norms below the candidate joins (same fold, same values —
    # see cosine_topk): ids in many candidate pairs fold their norm once
    va = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                  _norm(F.col("v")).alias("_na"))
    vb = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                  _norm(F.col("v")).alias("_nb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn(
            "cosine",
            _dot(F.col("va"), F.col("vb"))
            / (F.col("_na") * F.col("_nb")),
        )
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
