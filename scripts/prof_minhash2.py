"""Post-rewrite minhash profile: which stage holds the remaining ~5s."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from i3cols_spark.functions.text import shingles
from i3cols_spark.session import get_spark
from i3cols_spark.sources.tables import table

spark = get_spark(cpus=32)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"

docs = (
    table(spark, sf, "documents")
    .repartition(spark.sparkContext.defaultParallelism)
    .select("doc_id", shingles("text").alias("sh"))
)
sh_rows = docs.select("doc_id", F.explode("sh").alias("shingle"))
sig = sh_rows.groupBy("doc_id").agg(
    *[F.min(F.xxhash64(F.lit(j), F.col("shingle"))).alias(f"h{j}") for j in range(32)]
)
sig.count()  # warm
for name, df in [("sig", sig)]:
    t0 = time.time()
    df.write.mode("overwrite").format("noop").save()
    print(f"P {name}: {time.time()-t0:.2f}s")

from i3cols_spark.operators import QUERIES

q = QUERIES["q_dedup_near_minhash"]
q(spark, sf).count()
t0 = time.time()
q(spark, sf).count()
print(f"P full query: {time.time()-t0:.2f}s")

# how much of it is the two verify joins? count candidates only
import i3cols_spark.operators.dedup as dd  # noqa: F401
