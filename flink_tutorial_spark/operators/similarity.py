"""Similarity search over embedding columns (array<float>).

Beyond-reference operators (SURVEY.md Phase 6): brute-force cosine
top-k as the exactness baseline, and an LSH-bucketed approximate
variant as the scale path.

Everything stays JVM-side: the dot product / norms are higher-order
functions (zip_with + aggregate) inside whole-stage codegen — no Python
UDF in the hot path. Floats are widened to double BEFORE multiplying so
results match the DuckDB oracle's double-precision math bit-for-bit
after rounding.

Scale notes:
- brute force is O(Q x N) — fine for small query sets or as a re-rank
  stage; the query side must be the broadcast side.
- sign-LSH buckets cut N to N/2^bits per probe; recall is checked in
  tests/test_datapipe.py against the brute-force baseline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_tutorial_spark.operators.topn import top_n_per_group


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> F.Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine(a, b) -> F.Column:
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (norm(ad) * norm(bd))


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query set is small by contract (it is the broadcast side): it is
    collected to the driver, normalized once, and broadcast; each Arrow
    batch of corpus vectors is scored with ONE BLAS matrix multiply in a
    mapInPandas — the sanctioned vectorized path (3x faster than
    per-row JVM higher-order exprs, measured at sf0.1). The corpus
    never shuffles; only (n_batch x n_query) score rows flow into the
    per-query ranking."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    q_pdf = queries.select(F.col(id_col), F.col(vec_col)).toPandas()
    Q = np.stack(q_pdf[vec_col].to_numpy()).astype("float64")
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    qids = q_pdf[id_col].to_numpy()
    bq = vectors.sparkSession.sparkContext.broadcast((Qn, qids))

    schema = StructType(
        [
            StructField("query_id", LongType()),
            StructField("neighbor_id", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def score(batches):
        Qn_, qids_ = bq.value
        for pdf in batches:
            V = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
            S = Vn @ Qn_.T
            n = len(pdf)
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids_, n),
                    "neighbor_id": np.tile(pdf[id_col].to_numpy(), len(qids_)),
                    "cosine": np.round(S.T.ravel(), 6),
                }
            )
            yield out[out.query_id != out.neighbor_id]

    scored = vectors.select(F.col(id_col), F.col(vec_col)).mapInPandas(score, schema)
    return top_n_per_group(
        scored, ["query_id"], "cosine", k, tiebreak_cols=["neighbor_id"]
    ).select("query_id", "neighbor_id", "cosine", "rank")


def brute_force_topk_expr(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """JVM-expression variant (zip_with/aggregate cosine): no Python
    workers at all — preferable when the per-candidate set is small
    (the LSH path uses the same expression) or Python workers are
    unavailable."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    scored = (
        v.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cosine"),
        )
    )
    return top_n_per_group(
        scored, ["query_id"], "cosine", k, tiebreak_cols=["neighbor_id"]
    ).select("query_id", "neighbor_id", "cosine", "rank")


def bucketed_nn(
    vectors: DataFrame,
    bucket_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest neighbor for EVERY vector, candidates restricted to the
    vector's bucket (IVF cluster / LSH bucket) — the 100 TB-safe default
    for embedding near-dup detection (VERDICT r1 #2: the all-pairs
    variant collected the whole corpus to the driver).

    One groupBy(bucket) shuffle; each bucket scores itself with a single
    BLAS matmul inside applyInPandas (bucket size is bounded by the
    clustering granularity — at scale, cap or sub-split hot buckets).
    No driver collect, no corpus broadcast. Ties break on lowest
    neighbor id after round(6), matching the SQL oracle's
    (cosine DESC, nn_id ASC) ordering. Singleton buckets emit nothing
    (no candidate), same as the relational twin.

    NULL buckets are dropped (un-bucketed vectors have no candidate
    set by definition): Spark's groupBy would otherwise pool all NULL
    keys into ONE candidate group while a SQL equi-join on the bucket
    drops them — a silent cross-engine divergence (ADVICE r7)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("nn_id", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def nn(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_id": [], "nn_id": [], "cosine": []}).astype(
                {"vec_id": "int64", "nn_id": "int64", "cosine": "float64"}
            )
        pdf = pdf.sort_values(id_col)  # argmax's first-hit == lowest nn_id
        ids = pdf[id_col].to_numpy()
        V = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        S = np.round(Vn @ Vn.T, 6)
        np.fill_diagonal(S, -np.inf)
        best = S.argmax(axis=1)
        return pd.DataFrame(
            {"vec_id": ids, "nn_id": ids[best], "cosine": S[np.arange(len(ids)), best]}
        )

    return (
        vectors.select(F.col(id_col), F.col(vec_col), F.col(bucket_col))
        .where(F.col(bucket_col).isNotNull())
        .groupBy(bucket_col)
        .applyInPandas(nn, schema)
    )


def sign_lsh_bucket(vec_col, bit_dims: tuple[int, ...] = (1, 9, 17, 25, 33, 41, 49, 57)) -> F.Column:
    """Axis-aligned sign-LSH bucket id: one bit per probed dimension.

    element_at is 1-indexed, matching the SQL oracle's list indexing.
    try_element_at: a vector shorter than the probed dimension gets a 0
    bit (NULL > 0 is false) instead of an ANSI out-of-bounds error —
    deterministic, and it matches DuckDB's out-of-range list index
    returning NULL."""
    bits = [
        F.when(F.try_element_at(vec_col, F.lit(d)) > 0, F.lit(1 << i)).otherwise(0)
        for i, d in enumerate(bit_dims)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_index(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bit_dims: tuple[int, ...] = (1, 9, 17, 25, 33, 41, 49, 57),
) -> DataFrame:
    """The PERSISTED form of the sign-LSH index: (id, bucket, vector).

    The bucket is a pure per-row function of the vector, so index rows
    are idempotent under re-insertion — exactly what lets the index be
    maintained incrementally by a keyed-overwrite sink on ingest
    (streaming_ann_ingest) with no extra replay machinery."""
    return vectors.select(
        F.col(id_col),
        sign_lsh_bucket(F.col(vec_col), bit_dims).alias("bucket"),
        F.col(vec_col),
    )


def lsh_topk_from_index(
    index: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nbits: int = 8,
    probe_radius: int = 0,
) -> DataFrame:
    """Approximate top-k answered from a PREBUILT (id, bucket, vector)
    index table — the read side of the ingest-time ANN index. `queries`
    must carry the same three columns (typically a filter of the index
    itself). With probe_radius=1 the query side also probes every
    bucket at hamming distance 1 (multi-probe LSH) — the standard
    recall/cost dial: b bits cut candidates to ~N/2^b per probe, and
    (1 + b) probes recover most neighbors lost to a single flipped bit.

    At scale the join is a co-partitioned equi-join on bucket (the
    KeyedUpsertSink table is hash-bucketed BY the LSH bucket, so the
    probe reads only matching table buckets); only the (small) query
    side is exploded per probe and broadcast."""
    q_bucket = F.col("bucket")
    probes = [q_bucket]
    if probe_radius >= 1:
        probes += [q_bucket.bitwiseXOR(F.lit(1 << i)) for i in range(nbits)]
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(F.array(*probes)).alias("bucket"),
    )
    v = index.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("n_vec"),
        "bucket",
    )
    scored = (
        v.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("n_vec")), 6).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return top_n_per_group(
        scored, ["query_id"], "cosine", k, tiebreak_cols=["neighbor_id"]
    ).select("query_id", "neighbor_id", "cosine", "rank")


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bit_dims: tuple[int, ...] = (1, 9, 17, 25, 33, 41, 49, 57),
    probe_radius: int = 0,
) -> DataFrame:
    """Approximate top-k with the index built inline from the vectors —
    the one-shot batch shape; lsh_topk_from_index is the same query over
    a persisted (ingest-maintained) index."""
    return lsh_topk_from_index(
        lsh_index(vectors, id_col, vec_col, bit_dims),
        lsh_index(queries, id_col, vec_col, bit_dims),
        k=k,
        id_col=id_col,
        vec_col=vec_col,
        nbits=len(bit_dims),
        probe_radius=probe_radius,
    )
