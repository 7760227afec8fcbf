"""§2.3-D (nested half) — the i3cols ragged-data surface: array
collect/explode round-trip, higher-order functions, nested structs,
maps, JSON.

This is the heart of the reference's data model (SURVEY §1): a ragged
column (`data.npy` + `(start,stop)` index) IS an ArrayType column —
Parquet/Arrow list offsets are the same representation.  collect_list
rebuilds the ragged column from an exploded child table
(i3cols/cols.py::concatenate_and_index_cols semantics), posexplode is
the child-table view, and array higher-order functions are the
per-event Numba kernel analog (i3cols/phys.py) running JVM-side with
zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from i3cols_spark.operators.registry import query
from i3cols_spark.sources.tables import table


@query(
    "q_array_collect",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(event_id)), ',') AS event_ids,
           CAST(count(*) AS BIGINT)      AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def q_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebuild a ragged column: per-user sorted id list (the i3cols
    values+index write path).  sort_array kills collect_list's
    nondeterministic arrival order (SURVEY §5.2.4).

    The collected array is serialized to CSV in the final projection
    (both dialects) because the driver's canonicalizer pandas-sorts
    every output column and cannot hash numpy arrays — the array
    build/sort itself still runs as ArrayType upstream.
    """
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("event_id")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("event_ids"),
        F.count("*").alias("n_events"),
    )


@query(
    "q_array_explode",
    oracle="""
    SELECT vec_id,
           CAST(t.pos - 1 AS BIGINT)            AS pos,
           CAST(embedding[CAST(t.pos AS INT)] AS DOUBLE) AS val
    FROM embeddings, generate_series(1, 64) t(pos)
    """,
)
def q_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Child-table view of the ragged column via posexplode (the
    i3cols `data.npy` read path: one row per (event, item)).

    Oracle note: DuckDB's generate_series can't take a lateral column
    arg, so it uses the fixture's fixed dim=64 (FIXTURES.md); Spark's
    posexplode needs no such constant.  float→double widening is exact
    on both sides.
    """
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "vec_id",
        F.col("pos").cast("long").alias("pos"),
        F.col("val").cast("double").alias("val"),
    )


@query(
    "q_array_hof",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           round(sqrt(list_aggregate(
               list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               'sum')), 6)                 AS l2_norm,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_aggregate(
               list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)),
               'sum'), 6)                  AS head8_sum
    FROM embeddings
    """,
)
def q_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions: aggregate / transform / filter /
    size / slice — per-row reduction entirely inside whole-stage
    codegen, the Numba-kernel analog (i3cols/phys.py) with no Python
    boundary and no shuffle."""
    emb = table(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    head8 = F.aggregate(
        F.transform(F.slice("embedding", 1, 8), lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(head8, 6).alias("head8_sum"),
    )


@query(
    "q_struct_nested",
    oracle="""
    SELECT c_custkey,
           (s).cname     AS cname,
           (s).geo.nname AS nname,
           (s).geo.rname AS rname
    FROM (
        SELECT c.c_custkey,
               struct_pack(
                   cname := c.c_name,
                   geo := struct_pack(nname := n.n_name, rname := r.r_name)
               ) AS s
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    """,
)
def q_struct_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a nested struct (I3PARTICLE_T-style: record containing a
    record — SURVEY §1.1) and project leaf fields back out, so the
    output stays scalar for the oracle while exercising struct
    construction + nested access."""
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    nested = joined.select(
        "c_custkey",
        F.struct(
            F.col("c_name").alias("cname"),
            F.struct(
                F.col("n_name").alias("nname"), F.col("r_name").alias("rname")
            ).alias("geo"),
        ).alias("s"),
    )
    return nested.select(
        "c_custkey",
        F.col("s.cname").alias("cname"),
        F.col("s.geo.nname").alias("nname"),
        F.col("s.geo.rname").alias("rname"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           map_extract(m, 'qty')[1]              AS qty_v,
           array_to_string(map_keys(m), ',')     AS mkeys,
           CAST(len(map_keys(m)) AS BIGINT)      AS n_keys
    FROM (
        SELECT l_orderkey, l_linenumber,
               map(['qty', 'price'], [l_quantity, l_extendedprice]) AS m
        FROM lineitem
    )
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at + map_keys (the i3cols
    "frame map flattened at extraction" analog, SURVEY §1.1).

    map_keys output is CSV-serialized in the final projection (both
    dialects) so the driver's pandas-sort canonicalizer can hash it;
    the MapType column itself is exercised upstream.
    """
    li = table(spark, sf_dir, "lineitem")
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("price")),
        F.array(F.col("l_quantity"), F.col("l_extendedprice")),
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(m, "qty").alias("qty_v"),
        F.array_join(F.map_keys(m), ",").alias("mkeys"),
        F.size(F.map_keys(m)).cast("long").alias("n_keys"),
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k')                 AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
    FROM events
    """,
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props string column (the
    auto-discovered-frame-object analog: schema-on-read)."""
    ev = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return ev.select(
        "event_id", k.alias("k_str"), k.cast("long").alias("k_num")
    )


@query(
    "q_udtf_expand",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents
    """,
)
def q_udtf_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table-generating expansion: document text → one row per token
    (native split+explode; a Python UDTF would be the slow path)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )


@query(
    "q_udtf_python",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' '))                          AS word,
           CAST(length(unnest(string_split(text, ' '))) AS BIGINT)  AS word_len
    FROM documents
    """,
)
def q_udtf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Python UDTF (Spark 4 ``@udtf``): tokenize each document and
    emit (word, word_len) rows — the user-defined table function form
    of q_udtf_expand, proving the UDTF machinery end-to-end.

    Kept OFF bench's headline set: a Python UDTF pays per-row Python
    dispatch; the native split+explode twin is the hot-path spelling
    (q_udtf_expand).  Both hash-match the same oracle.
    """
    from pyspark.sql.functions import udtf

    from i3cols_spark.sources.tables import register_views

    @udtf(returnType="word: string, word_len: long")
    class Tokenize:
        def eval(self, text: str):  # noqa: ANN001
            for w in text.split(" "):
                yield w, len(w)

    register_views(spark, sf_dir, ("documents",))
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        """
        SELECT d.doc_id, t.word, t.word_len
        FROM documents d, LATERAL tokenize_udtf(d.text) t
        """
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS value
    FROM orders
    UNION ALL
    SELECT o_orderkey, 'custkey' AS metric, CAST(o_custkey AS DOUBLE) AS value
    FROM orders
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-order metrics to long (key, metric,
    value) rows — the inverse of q_pivot and the standard reshape
    before a generic metric pipeline.  Uses the native ``unpivot``
    operator (Spark 3.4+ Expand node — one pass, each input row fans
    to |metrics| rows map-side, NO shuffle or union-of-scans); the
    oracle states the same result as the classic UNION ALL, which
    scans the table once per metric — the exact cost the Expand form
    avoids at 100 TB.
    """
    orders = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    return orders.unpivot(
        ids="o_orderkey",
        values=["totalprice", "custkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )
