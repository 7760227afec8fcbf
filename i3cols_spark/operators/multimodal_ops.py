"""§2.3-E (north-star) — multimodal binary-column pipeline as a
registered, oracle-checked query.

The engine's multimodal layer (functions/multimodal.py) treats media
as opaque ``binary`` payloads + typed metadata and runs decode /
feature-extract as Arrow-batched ``mapInPandas`` operators, with the
codec itself stubbed (no image/audio libs in this container).  The
deterministic fake codec makes the WHOLE pipeline oracle-checkable:
payload = UTF-8 bytes of the document text, so byte length, md5
checksum and feature count are reproducible in SQL — the correctness
gate covers the real Spark-side plumbing (schema, Arrow batch shape,
UDF signature), which is exactly the part that survives a codec swap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from i3cols_spark.functions.multimodal import attach_fake_media, extract_features
from i3cols_spark.operators.registry import query
from i3cols_spark.sources.tables import table


@query(
    "q_multimodal_features",
    oracle="""
    SELECT doc_id AS media_id,
           'fake/raw' AS media_type,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS checksum,
           CAST(least(32, (octet_length(encode(text)) + 7) // 8) AS INT)
               AS n_features
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → decode+featurize via one ``mapInPandas`` pass
    (functions/multimodal.py::extract_features).

    The fake codec reads every 8th byte (≤32 samples), so the oracle
    can state the feature count in closed form; checksum is md5 of
    the payload bytes in both engines.  At scale this is
    embarrassingly parallel over the scan — payloads stay
    page-compressed in parquet and peak memory is one Arrow batch.
    """
    media = attach_fake_media(table(spark, sf_dir, "documents"))
    return extract_features(media).select(
        "media_id",
        "media_type",
        "n_bytes",
        "checksum",
        F.size("features").alias("n_features"),
    )


@query(
    "q_multimodal_resize_sample",
    oracle="""
    WITH t AS (
        SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ),
    s AS (  -- resize factor 2: payload[::2] keeps ceil(n/2) bytes
        SELECT doc_id, CAST(ceil(n / 2.0) AS BIGINT) AS m FROM t
    ),
    b AS (  -- 8-byte frame blocks of the resized payload
        SELECT doc_id, m,
               m % 8 AS rem,
               m // 8 + CASE WHEN m % 8 > 0 THEN 1 ELSE 0 END AS nblocks
        FROM s
    ),
    k AS (  -- frame_sample every_n=2 keeps block indices 0,2,...
        SELECT doc_id, rem, nblocks, (nblocks + 1) // 2 AS nkept FROM b
    ),
    z AS (
        SELECT doc_id,
               CASE WHEN rem > 0 AND (nblocks - 1) % 2 = 0
                    THEN 8 * (nkept - 1) + rem
                    ELSE 8 * nkept END AS n_bytes_sampled
        FROM k
    )
    SELECT doc_id AS media_id,
           n_bytes_sampled,
           CAST(least(32, (n_bytes_sampled + 7) // 8) AS INT) AS n_features
    FROM z
    """,
)
def q_multimodal_resize_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal chain — decode-side resize (every 2nd byte)
    → frame sampling (every 2nd 8-byte block) → featurize — as three
    chained ``mapInPandas`` passes over the binary column.

    The oracle states the surviving byte/feature counts in CLOSED FORM
    from the stride arithmetic, so the correctness gate pins the exact
    slicing semantics of all three operators (off-by-one in any stride
    or block boundary shifts the counts).  At scale the chain stays
    one task per Arrow batch end-to-end: no shuffle between stages,
    payloads never visit the driver, and swapping the fake codec for a
    real one changes none of the plumbing under test.
    """
    from i3cols_spark.functions.multimodal import frame_sample, resize_media

    media = attach_fake_media(table(spark, sf_dir, "documents"))
    sampled = frame_sample(resize_media(media, factor=2), every_n=2)
    return extract_features(sampled).select(
        "media_id",
        F.col("n_bytes").alias("n_bytes_sampled"),
        F.size("features").alias("n_features"),
    )
