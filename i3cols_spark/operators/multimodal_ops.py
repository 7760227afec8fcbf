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
