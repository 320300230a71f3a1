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


# cosine_topk collects the query vectors into the scoring closure; above
# this cap it falls back to the join-based plan so the collect stays
# bounded at any query-set size (policy: no unbounded driver traffic)
BRUTE_QUERY_CAP = 1024


def _seq_sq_norms(M: np.ndarray) -> np.ndarray:
    """sqrt of the SEQUENTIAL left-fold of x*x over each row — the exact
    operation order of the native _norm expression (acc + x*x, dim by
    dim), vectorized across rows. Bit-identical to the JVM fold."""
    acc = np.zeros(len(M), dtype=np.float64)
    for j in range(M.shape[1]):
        acc += M[:, j] * M[:, j]
    return np.sqrt(acc)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine for each query vector (brute force baseline).

    (query_id, neighbor_id, cosine, rank); self-matches excluded.

    Round-6 shape: the query vectors (bounded: <= BRUTE_QUERY_CAP, else
    the join fallback below) are collected into ONE mapInPandas pass over
    the corpus that scores every (query, neighbor) pair numpy-vectorized
    and emits only each partition's per-query top-k — the exact partial
    top-k: the global top-k is the top-k of the union of per-partition
    top-ks under the same (cosine desc, neighbor_id asc) order, and all
    arithmetic preserves the native expressions' sequential fold order
    dim by dim (see _seq_sq_norms), so every cosine is bit-identical to
    the crossJoin+aggregate plan it replaces. The final window then ranks
    <= partitions x |Q| x k rows instead of |Q| x |corpus| — the round-5
    plan shipped every scored pair through the rank exchange and paid an
    interpreted zip_with/aggregate fold per pair (guide §4.2: batch the
    custom math, keep Spark for distribution)."""
    q_rows = queries.select(id_col, vec_col).limit(
        BRUTE_QUERY_CAP + 1).collect()
    if len(q_rows) > BRUTE_QUERY_CAP:
        return _cosine_topk_join(embeddings, queries, k, id_col, vec_col)
    q_rows.sort(key=lambda r: r[0])
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    qn = _seq_sq_norms(Q)
    m = len(q_ids)
    id_type = embeddings.schema[id_col].dataType.simpleString()

    def score(batches):
        ids_parts, cos_parts = [], []
        for pdf in batches:
            if pdf[vec_col].isna().any():
                pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            M = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            nn = _seq_sq_norms(M)
            cos = np.empty((m, len(ids)), dtype=np.float64)
            for qi in range(m):
                acc = np.zeros(len(ids), dtype=np.float64)
                for j in range(M.shape[1]):       # sequential-fold dot
                    acc += M[:, j] * Q[qi, j]
                cos[qi] = acc / (qn[qi] * nn)
            ids_parts.append(ids)
            cos_parts.append(cos)
        if not ids_parts:
            return
        ids = np.concatenate(ids_parts)
        cos = np.concatenate(cos_parts, axis=1)
        out_q, out_n, out_c = [], [], []
        for qi in range(m):
            mask = ids != q_ids[qi]               # self-match excluded
            nid, c = ids[mask], cos[qi][mask]
            # cosine desc, id asc; NaN maps to -inf on the NEGATED key so
            # it sorts FIRST, matching Spark's NaN-is-greatest desc order
            key = np.where(np.isnan(c), -np.inf, -c)
            order = np.lexsort((nid, key))[:k]
            out_q.append(np.full(len(order), q_ids[qi], dtype=np.int64))
            out_n.append(nid[order])
            out_c.append(c[order])
        yield pd.DataFrame({
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_n),
            "cosine": np.concatenate(out_c),
        })

    scored = embeddings.select(id_col, vec_col).mapInPandas(
        score,
        schema=f"query_id {id_type}, neighbor_id {id_type}, cosine double",
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


def _cosine_topk_join(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Join-based brute force (the round-5 plan): used when the query set
    exceeds BRUTE_QUERY_CAP. Same results, all-JVM scoring."""
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


_UDF_MEMO: dict = {}


def _pair_cosine_udf():
    """Arrow-batched cosine over (query_vec, neighbor_vec) pair rows:
    sequential-fold dot and norms (dim by dim, the exact operation order
    of the native _dot/_norm expressions — see _seq_sq_norms), then
    dot / (qn * nn). Bit-identical to the zip_with/aggregate scoring it
    replaces; vectorized across the batch instead of an interpreted fold
    per pair. Memoized so repeated pipeline builds share one PythonUDF
    (plan/cache identity)."""
    if "pair_cosine" in _UDF_MEMO:
        return _UDF_MEMO["pair_cosine"]
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def pair_cosine(qv: pd.Series, nv: pd.Series) -> pd.Series:
        if len(qv) == 0:
            return pd.Series([], dtype=np.float64)
        A = np.stack(qv.to_numpy()).astype(np.float64)
        B = np.stack(nv.to_numpy()).astype(np.float64)
        dot = np.zeros(len(A), dtype=np.float64)
        for j in range(A.shape[1]):               # sequential-fold dot
            dot += A[:, j] * B[:, j]
        return pd.Series(dot / (_seq_sq_norms(A) * _seq_sq_norms(B)))

    _UDF_MEMO["pair_cosine"] = pair_cosine
    return pair_cosine


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
    # The candidate set is BROADCAST: it is (query_id, neighbor_id) longs
    # bounded by |queries| x bucket collisions, while the neighbor side
    # carries the full embedding payload — the default plan shuffled+sorted
    # every corpus vector to meet a few thousand candidate keys
    # (SortMergeJoin in the r06 baseline plan); broadcasting the keys
    # streams the vectors in place. Rerank scoring is one Arrow-vectorized
    # pass over the candidate rows (_pair_cosine_udf: sequential-fold dot
    # and norms, bit-identical to the interpreted zip_with/aggregate fold
    # the round-5 plan evaluated per pair — at dim 512 that fold WAS the
    # rerank cost once the join stopped shuffling the corpus).
    scored = (
        F.broadcast(cand)
        .join(n, "neighbor_id")
        .join(F.broadcast(q), "query_id")  # queries are the small side
        .withColumn("cosine", _pair_cosine_udf()(F.col("qv"), F.col("nv")))
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

    # the round-5 shape carried per-vector norm columns through the
    # distinct; they are deterministic functions of the vectors, so
    # dropping them leaves the distinct pair set unchanged — scoring is
    # now one Arrow pass over the distinct candidates (_pair_cosine_udf:
    # sequential-fold dot/norms, bit-identical cosines)
    listed = base.withColumn(
        "list_id", F.element_at(nearest_lists_udf(1)(F.col("nv")), 1)
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn(
        "list_id", F.explode(nearest_lists_udf(n_probe)(F.col("qv"))),
    )
    cand = (
        q.join(listed, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "neighbor_id", "nv")
        .distinct()
    )
    scored = cand.withColumn(
        "cosine", _pair_cosine_udf()(F.col("qv"), F.col("nv")))
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
    # scoring is one Arrow-vectorized pass over the candidate pair rows
    # (_pair_cosine_udf: sequential-fold dot/norms, bit-identical values)
    va = e.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cosine",
                    _pair_cosine_udf()(F.col("va"), F.col("vb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
