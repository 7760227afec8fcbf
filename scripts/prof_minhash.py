"""Stage-by-stage profile of q_dedup_near_minhash (dev tool)."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from i3cols_spark.functions.text import shingles
from i3cols_spark.session import get_spark
from i3cols_spark.sources.tables import table

spark = get_spark(cpus=32)
spark.sparkContext.setLogLevel("ERROR")
sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

docs = (
    table(spark, sf, "documents")
    .repartition(spark.sparkContext.defaultParallelism)
    .select("doc_id", shingles("text").alias("sh"))
)
sh_rows = docs.select("doc_id", F.explode("sh").alias("shingle"))
t0 = time.time(); sh_rows.count(); print(f"T explode count: {time.time()-t0:.1f}s")

sig = sh_rows.groupBy("doc_id").agg(
    *[F.min(F.xxhash64(F.lit(j), F.col("shingle"))).alias(f"h{j}") for j in range(32)]
)
t0 = time.time(); sig.write.mode("overwrite").format("noop").save(); print(f"T signature agg: {time.time()-t0:.1f}s")

band_entries = F.array(
    *[
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b*4+r}") for r in range(4)]).alias("bkey"),
        )
        for b in range(8)
    ]
)
banded = sig.select("doc_id", F.explode(band_entries).alias("b")).select(
    "doc_id", F.col("b.band").alias("band"), F.col("b.bkey").alias("bkey")
)
a, b = banded.alias("a"), banded.alias("b")
cand = (
    a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    .dropDuplicates()
)
t0 = time.time(); n = cand.count(); print(f"T candidates: {n} in {time.time()-t0:.1f}s")

sh_a = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
sh_b = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(F.array_union("sh_a", "sh_b"))
full = cand.join(sh_a, "doc_a").join(sh_b, "doc_b").withColumn("jaccard", jac).filter(
    F.col("jaccard") >= 0.5
)
t0 = time.time(); n = full.count(); print(f"T verify: {n} in {time.time()-t0:.1f}s")
