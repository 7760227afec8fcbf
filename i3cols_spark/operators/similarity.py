"""§2.3-E — similarity search over the embeddings table.

Three tiers, matching how ANN scales from correctness to 100 TB:
  * brute-force top-k   — exact baseline; O(n) per query, scan-bound.
  * threshold pair join — blocked by label (bounded pair space).
  * LSH-bucketed ANN    — random-hyperplane buckets; at scale the
    bucket is a partition column, so a query prunes to ~n/2^bits of
    the data before any distance math.  The hyperplanes are literal
    constants (seeded, embedded in BOTH the Spark expression and the
    SQL oracle) so the approximate result is still deterministic and
    oracle-checkable.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from i3cols_spark.functions.vectors import as_double, cosine, dot, lsh_bucket, norm_l2
from i3cols_spark.operators.registry import query
from i3cols_spark.sources.tables import table

#: Fixed random hyperplanes (seed 42) shared by the Spark plan and the
#: SQL oracle; 6 dp literals parse to identical doubles in both engines.
_RNG = np.random.default_rng(42)
HYPERPLANES: list[list[float]] = [
    [round(float(v), 6) for v in row] for row in _RNG.standard_normal((4, 64))
]


def _sql_array(vals: list[float]) -> str:
    return "CAST([" + ", ".join(repr(v) for v in vals) + "] AS DOUBLE[])"


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_dot_product(v, {_sql_array(h)}) >= 0 THEN {2**j} ELSE 0 END)"
    for j, h in enumerate(HYPERPLANES)
)


@query(
    "q_similarity_knn_cosine",
    oracle="""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
    SELECT e.vec_id, round(list_cosine_similarity(e.v, q.qv), 6) AS cos_sim
    FROM e, q
    WHERE e.vec_id <> 0
    ORDER BY cos_sim DESC, e.vec_id
    LIMIT 10
    """,
)
def q_similarity_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for the query vector (vec_id=0).

    The single-row query side is broadcast; the distance is a codegen'd
    HOF; TakeOrderedAndProject keeps a 10-row heap per partition — the
    exact-kNN plan you'd run at any scale when recall must be 1.0.
    """
    emb = table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        as_double("embedding").alias("qv")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qv))
        .select(
            "vec_id",
            F.round(cosine("embedding", "qv"), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(10)
    )


@query(
    "q_similarity_pairs_threshold",
    oracle="""
    WITH e AS (
        SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    )
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
    FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.25
    """,
)
def q_similarity_pairs_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All pairs with cosine ≥ 0.25, blocked by label.

    The equi-join on the block key keeps this a hash join with a
    per-block pair space — never an unblocked n² cross join.  At
    100 TB the block key is an LSH/IVF bucket (see q_similarity_ann_lsh)
    and the same plan shape applies.
    """
    # Per-row norms precomputed once (HOF lambdas are interpreted per
    # element, so the pair loop must do ONE reduction, not three), and
    # an explicit repartition because the fixture is a single parquet
    # file → a single input split would serialize all pair work.
    emb = (
        table(spark, sf_dir, "embeddings")
        .repartition(spark.sparkContext.defaultParallelism, "label")
        .select("vec_id", "label", "embedding", norm_l2("embedding").alias("nrm"))
    )
    a, b = emb.alias("a"), emb.alias("b")
    sim = F.round(
        dot("a.embedding", "b.embedding") / (F.col("a.nrm") * F.col("b.nrm")), 6
    )
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("a_id"),
            F.col("b.vec_id").alias("b_id"),
            sim.alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.25)
    )


@query(
    "q_similarity_ann_lsh",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        FROM embeddings
    ),
    b AS (SELECT vec_id, v, {_BUCKET_SQL} AS bucket FROM e),
    q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = 0)
    SELECT b.vec_id, b.bucket,
           round(list_cosine_similarity(b.v, q.qv), 6) AS cos_sim
    FROM b, q
    WHERE b.bucket = q.qbucket AND b.vec_id <> 0
    ORDER BY cos_sim DESC, b.vec_id
    LIMIT 5
    """,
)
def q_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 via random-hyperplane LSH bucketing: score
    only vectors in the query's bucket (~n/16 of the data with 4
    bits).

    This is the 100 TB path: persist ``bucket`` as a partition column
    (sources.ingest supports partitionBy) and the same query becomes a
    partition-pruned scan of one bucket — no full-data distance pass.
    The oracle reproduces the identical bucketing from the shared
    hyperplane literals, so approximation ≠ nondeterminism.
    """
    emb = table(spark, sf_dir, "embeddings")
    bucketed = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket("embedding", HYPERPLANES).alias("bucket"),
    )
    qside = bucketed.filter(F.col("vec_id") == 0).select(
        as_double("embedding").alias("qv"), F.col("bucket").alias("qbucket")
    )
    return (
        bucketed.filter(F.col("vec_id") != 0)
        .join(F.broadcast(qside), F.col("bucket") == F.col("qbucket"))
        .select(
            "vec_id",
            "bucket",
            F.round(cosine("embedding", "qv"), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(5)
    )
