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
    python scripts/scale_probe.py 10 distinct [q_...]    # DISTINCT-
                                                  # value growth (sf1
                                                  # stand-in): texts
                                                  # mutated per copy,
                                                  # embeddings
                                                  # perturbed — the
                                                  # collapse-first
                                                  # passes gain
                                                  # nothing, so the
                                                  # probe measures the
                                                  # real downstream
                                                  # cost (VERDICT r05
                                                  # item 4)
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
DISTINCT = "distinct" in sys.argv[2:3]
FACTS = "facts" in sys.argv[2:4]  # replicate orders/lineitem/events past 10x
DST = f"/tmp/i3cols_scale/{'d' if DISTINCT else ('f' if FACTS and COPIES > 10 else 'x')}{COPIES}"
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
    "simhash_sketches",
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
    "simhash_sketches",
    "q_dedup_embedding",
    "q_similarity_ann_lsh",
    "q_similarity_ann_ivf",
    "q_dedup_ngram_jaccard",
    "q_dedup_near_minhash",
    "q_similarity_pairs_threshold",
]

# Distinct-value mode replicates only documents + embeddings, so the
# default probe set is the heaviest document/embedding plans — the
# ones whose collapse-first stage is a no-op when every text/vector
# is distinct.
DISTINCT_PROBES = [
    "q_dedup_exact",
    "simhash_sketches",
    "q_tfidf_topterms",
    "q_text_bigram_lm",
    "q_text_minhash_signature",
    "q_dedup_embedding",
    "q_similarity_ann_lsh",
    "q_similarity_ann_ivf",
    "q_similarity_pairs_threshold",
    "q_dedup_near_minhash",
    "q_dedup_ngram_jaccard",
    "q_dedup_clusters",
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

    if DISTINCT:
        # sf1 stand-in: every copy's CONTENT is distinct, not just its
        # keys.  Texts: rotate the word order by k and append a unique
        # copy tag — all 50 k texts distinct (exact-collapse gains
        # nothing) while ~99% of shingles stay shared, so copies are
        # genuine NEAR-duplicates and the LSH/verify paths do real
        # work.  Embeddings: per-dimension deterministic perturbation
        # (direction depends on (k, dim)), so vectors are distinct
        # under cosine too (a pure scaling would collapse).
        base_docs = spark.read.parquet(f"{SRC}/documents.parquet")
        out = None
        for k in range(COPIES):
            toks = F.split(F.col("text"), " ")
            rot = F.pmod(F.lit(k), F.greatest(F.size(toks), F.lit(1)))
            rotated = F.concat(
                F.slice(toks, rot + 1, F.size(toks) - rot),
                F.slice(toks, 1, rot),
            )
            df = base_docs.withColumn(
                "doc_id", F.col("doc_id") + k * KEY_OFFSET
            ).withColumn(
                "text",
                F.concat(
                    F.array_join(rotated, " "),
                    F.lit(f" uniqtag{k}c"),
                    (F.col("doc_id") % 101).cast("string"),
                ),
            ).withColumn("n_chars", F.length("text").cast("long"))
            out = df if out is None else out.unionByName(df)
        out.write.mode("overwrite").parquet(f"{DST}/documents.parquet")

        def perturb(k: int):
            # binary (element, index) lambda — pyspark dispatches on
            # arity, so the copy index must be closed over, not a
            # third parameter.
            return lambda x, i: (
                x + 0.01 * (F.pmod(F.lit(k) * 31 + i, F.lit(7)) - 3)
            ).cast("float")

        base_emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
        out = None
        for k in range(COPIES):
            df = base_emb.withColumn(
                "vec_id", F.col("vec_id") + k * KEY_OFFSET
            ).withColumn("embedding", F.transform("embedding", perturb(k)))
            out = df if out is None else out.unionByName(df)
        out.write.mode("overwrite").parquet(f"{DST}/embeddings.parquet")
        return

    replicate("documents", ["doc_id"])     # texts repeat → real dups
    replicate("embeddings", ["vec_id"])
    if COPIES <= 10 or FACTS:
        # Past 10× the relational facts replicate only on request
        # (`facts` flag — VERDICT r09 item 6 ×100 probes for the
        # orders/lineitem-graph family); ~60 M lineitem rows at ×100.
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

    # Probe-able production streams that live behind audit-form
    # registered queries (round-10 rows-only flips): the audit's
    # truth side costs ∝ banded candidates BY DESIGN (measured 8.1×
    # at d10 for q_dedup_simhash), so the standing scale probes track
    # the production plan; the audit is a test-SF artifact.
    from i3cols_spark.operators.dedup import (
        minhash_cluster_members,
        simhash_sketches,
    )

    HELPERS = {
        "simhash_sketches": simhash_sketches,
        "minhash_cluster_members": minhash_cluster_members,
    }

    def run(name: str, sf: str) -> float:
        # noop sink: full engine-side materialization without the
        # driver-transfer cost (collecting 6 M rows to Python measures
        # py4j/Arrow serialization, not the plan).
        t0 = time.perf_counter()
        fn = HELPERS.get(name) or QUERIES[name]
        fn(spark, sf).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    extra = [a for a in sys.argv[2:] if a not in ("distinct", "facts")]
    if DISTINCT:
        probes = extra or DISTINCT_PROBES
    else:
        probes = extra or (PROBES if COPIES <= 10 else PAIR_FAMILY)
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
        n = (HELPERS.get(name) or QUERIES[name])(spark, DST).count()
        print(f"{name:32s} {small:8.2f} {big:8.2f} {big/small:6.1f}  ({n} rows)")


def cleanup() -> None:
    shutil.rmtree("/tmp/i3cols_scale", ignore_errors=True)


if __name__ == "__main__":
    main()
