"""Isolate the shingle-build cost (dev tool)."""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from i3cols_spark.functions.text import normalize, tokens
from i3cols_spark.session import get_spark
from i3cols_spark.sources.tables import table

spark = get_spark(cpus=32)
spark.sparkContext.setLogLevel("ERROR")
sf = "/root/testdata/sf0.1"
docs = table(spark, sf, "documents").repartition(32)

def t(name, col):
    df = docs.select(F.size(col).alias("n")) if col is not None else docs
    df.count()  # warm
    t0 = time.time()
    for _ in range(3):
        df.agg(F.sum("n") if col is not None else F.count("*")).collect()
    print(f"T {name}: {(time.time()-t0)/3:.2f}s")

toks = tokens("text")
t("tokens only", toks)

ngrams = F.transform(
    F.sequence(F.lit(0), F.greatest(F.size(toks) - 3, F.lit(0))),
    lambda i: F.array_join(F.slice(toks, i + 1, 3), " "),
)
t("ngrams (no distinct)", ngrams)
t("ngrams + distinct", F.array_distinct(ngrams))

# alternative formulation: concat_ws over zipped arrays via arrays_zip+slice-free
toks2 = tokens("text")
zipped = F.zip_with(
    toks2,
    F.zip_with(F.slice(toks2, 2, 1000000), F.slice(toks2, 3, 1000000),
               lambda b, c: F.concat_ws(" ", b, c)),
    lambda a, bc: F.concat_ws(" ", a, bc),
)
t("zip_with shingles", F.array_distinct(F.slice(zipped, 1, 1000000)))
