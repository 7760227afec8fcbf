"""Scale probe: replicate the sf0.1 fixtures N× (offset keys) into a
larger dataset under /tmp and measure how the headline plans scale —
the local stand-in for the "would this hold at 1000×?" question.

Derived purely from the driver fixtures (no new synthesis semantics);
writes only under /tmp.

Usage:
    python scripts/scale_probe.py                 # 10×, all 16 plans
    python scripts/scale_probe.py 100             # 100× documents +
                                                  # embeddings, pair-
                                                  # family plans only
    python scripts/scale_probe.py 10 q_agg_groupby ...   # subset
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from i3cols_spark.session import get_spark
from i3cols_spark.sources.tables import TABLES, table

SRC = "/root/testdata/sf0.1"
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
DST = f"/tmp/i3cols_scale/x{COPIES}"
KEY_OFFSET = 10_000_000

# Heavy-output probes LAST: the session is shared, and GC pressure from
# a 6 M-row materialization skews whatever runs next.
PROBES = [
    "q_agg_groupby",
    "q_window_topk_pergroup",
    "q_dedup_exact",
    "q_stream_tumbling",
    "q_stream_session",
    "q_udaf_grouped",
    "q_tfidf_topterms",
    "q_dedup_simhash",
    "q_dedup_embedding",
    "q_similarity_ann_lsh",
    "q_similarity_ann_ivf",
    "q_join_multiway_star",
    "q_filter_compound",
    "q_join_sortmerge",
    "q_dedup_ngram_jaccard",
    "q_dedup_near_minhash",
    "q_similarity_pairs_threshold",
]

# Past 10× only the documents/embeddings tables are replicated (the
# relational facts already probed linear at 10×; the pair-family ops
# are the ones with quadratic failure modes worth pushing further).
PAIR_FAMILY = [
    "q_dedup_exact",
    "q_dedup_simhash",
    "q_dedup_embedding",
    "q_similarity_ann_lsh",
    "q_similarity_ann_ivf",
    "q_dedup_ngram_jaccard",
    "q_dedup_near_minhash",
    "q_similarity_pairs_threshold",
]


def build(spark) -> None:
    os.makedirs(DST, exist_ok=True)

    def replicate(name, offsets):
        base = spark.read.parquet(f"{SRC}/{name}.parquet")
        out = None
        for k in range(COPIES):
            df = base
            for col in offsets:
                df = df.withColumn(col, F.col(col) + k * KEY_OFFSET)
            out = df if out is None else out.unionByName(df)
        out.write.mode("overwrite").parquet(f"{DST}/{name}.parquet")

    replicate("documents", ["doc_id"])     # texts repeat → real dups
    replicate("embeddings", ["vec_id"])
    if COPIES <= 10:
        for name in ("region", "nation", "customer", "supplier", "part"):
            table(spark, SRC, name).write.mode("overwrite").parquet(
                f"{DST}/{name}.parquet"
            )
        replicate("orders", ["o_orderkey"])
        replicate("lineitem", ["l_orderkey"])
        replicate("events", ["event_id"])  # ts untouched: density ×N


def main() -> None:
    spark = get_spark("scale-probe", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(f"{DST}/lineitem.parquet"):
        t0 = time.time()
        build(spark)
        print(f"# built {DST} in {time.time()-t0:.0f}s", file=sys.stderr)

    from i3cols_spark.operators import QUERIES

    def run(name: str, sf: str) -> float:
        # noop sink: full engine-side materialization without the
        # driver-transfer cost (collecting 6 M rows to Python measures
        # py4j/Arrow serialization, not the plan).
        t0 = time.perf_counter()
        QUERIES[name](spark, sf).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    probes = sys.argv[2:] or (PROBES if COPIES <= 10 else PAIR_FAMILY)
    print(f"{'query':32s} {'sf0.1':>8s} {f'x{COPIES}':>8s} {'ratio':>6s}")
    for name in probes:
        # Warm ×2 PER SIDE then min-of-2: wide-join codegen takes ~3
        # runs to JIT, and the big side spawns extra Python workers on
        # its first mapInPandas run (a cold x10 run once measured
        # 22.6× on q_multimodal_features vs 1.1× warm).
        run(name, SRC)
        run(name, SRC)
        small = min(run(name, SRC), run(name, SRC))
        run(name, DST)
        big = min(run(name, DST), run(name, DST))
        n = QUERIES[name](spark, DST).count()
        print(f"{name:32s} {small:8.2f} {big:8.2f} {big/small:6.1f}  ({n} rows)")


def cleanup() -> None:
    shutil.rmtree("/tmp/i3cols_scale", ignore_errors=True)


if __name__ == "__main__":
    main()
