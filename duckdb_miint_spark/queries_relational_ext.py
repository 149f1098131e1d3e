"""Layer-A relational parity, part 2 (SURVEY.md §2.1 rows not covered in
``queries_relational``): CSV/JSON file scans with options, glob + filename,
cross join, self/theta join, UNION ALL, recursive CTE, array functions,
inline VALUES, and COPY round-trips.

File-scan queries read byte-identical fixtures (``fixtures.py``) from both
engines. The recursive-CTE query runs a genuine iterative DataFrame loop on
the Spark side (Spark has no WITH RECURSIVE) against DuckDB's native
recursion — the loop is the documented Spark idiom and converges in
O(log n) joins over a broadcast frontier.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from duckdb_miint_spark.fixtures import GEN_DIR, ensure_fixtures
from duckdb_miint_spark.registry import register
from duckdb_miint_spark.session import read_table

ensure_fixtures()

TSV = os.path.join(GEN_DIR, "annotations.tsv")
JSONL = os.path.join(GEN_DIR, "events_extra.jsonl")
CSV_GLOB = os.path.join(GEN_DIR, "chunk_*.csv")


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# --- CSV scan with options ---------------------------------------------------


@register(
    "csv_scan_options",
    oracle=f"""
SELECT column0 AS seqid, column2 AS ftype,
       CAST(column3 AS BIGINT) AS start,
       CAST(column4 AS BIGINT) AS stop,
       CASE WHEN column5 = '.' THEN NULL ELSE CAST(column5 AS DOUBLE) END AS score,
       CASE WHEN column6 = '.' THEN NULL ELSE column6 END AS strand
FROM read_csv('{TSV}',
  delim = '\t', header = false, auto_detect = false,
  columns = {{'column0':'VARCHAR','column1':'VARCHAR','column2':'VARCHAR',
             'column3':'VARCHAR','column4':'VARCHAR','column5':'VARCHAR',
             'column6':'VARCHAR','column7':'VARCHAR','column8':'VARCHAR'}},
  null_padding = true)
WHERE column0 NOT LIKE '#%'
ORDER BY seqid, start
""",
    tags=("relational", "csv"),
)
def csv_scan_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tab-delimited CSV with comment lines and '.'-as-NULL (the read_gff
    input shape, miint_macros.hpp:136-154): explicit schema, no inference."""
    schema = StructType([StructField(f"column{i}", StringType()) for i in range(9)])
    df = spark.read.csv(TSV, sep="\t", header=False, comment="#", schema=schema)
    return df.select(
        F.col("column0").alias("seqid"),
        F.col("column2").alias("ftype"),
        F.col("column3").cast("long").alias("start"),
        F.col("column4").cast("long").alias("stop"),
        F.when(F.col("column5") == ".", None).otherwise(F.col("column5").cast("double")).alias("score"),
        F.when(F.col("column6") == ".", None).otherwise(F.col("column6")).alias("strand"),
    ).orderBy("seqid", "start")


# --- JSON file scan + nested access ------------------------------------------


@register(
    "json_file_scan",
    oracle=f"""
SELECT kind,
       COUNT(*) AS n,
       CAST(SUM(CAST(meta.score AS BIGINT)) AS BIGINT) AS sum_score,
       CAST(SUM(CAST(vals[1] AS BIGINT)) AS BIGINT) AS sum_v0
FROM read_json('{JSONL}', format = 'newline_delimited')
GROUP BY kind ORDER BY kind
""",
    tags=("relational", "json"),
)
def json_file_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """spark.read.json over JSON-lines with nested struct + array access
    (SURVEY §2.1 'JSON scan + path extraction')."""
    df = spark.read.json(JSONL)
    return (
        df.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("meta.score").cast("long")).alias("sum_score"),
            F.sum(F.element_at("vals", 1).cast("long")).alias("sum_v0"),
        )
        .orderBy("kind")
    )


# --- glob scan + filename column ---------------------------------------------


@register(
    "glob_scan_filename",
    oracle=f"""
SELECT regexp_extract(filename, '(chunk_[0-9]+\\.csv)$', 1) AS fname,
       COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS sum_v
FROM read_csv('{CSV_GLOB}', header = true, filename = true,
              columns = {{'k':'BIGINT','v':'BIGINT'}}, auto_detect = false)
GROUP BY fname ORDER BY fname
""",
    tags=("relational", "glob"),
)
def glob_scan_filename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-file glob + per-file provenance via input_file_name()
    (reference: table_function_common.cpp:64-124 + filepath columns)."""
    schema = StructType([StructField("k", LongType()), StructField("v", LongType())])
    df = spark.read.csv(CSV_GLOB, header=True, schema=schema)
    return (
        df.withColumn("fname", F.regexp_extract(F.input_file_name(), r"(chunk_[0-9]+\.csv)$", 1))
        .groupBy("fname")
        .agg(F.count("*").alias("n"), F.sum("v").alias("sum_v"))
        .orderBy("fname")
    )


# --- cross join ---------------------------------------------------------------


@register(
    "cross_join_region_priority",
    oracle="""
SELECT r_name, o_orderpriority,
       COUNT(*) AS n_pairs
FROM region CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
GROUP BY r_name, o_orderpriority
ORDER BY r_name, o_orderpriority
""",
    tags=("relational", "join"),
)
def cross_join_region_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small relations (README.md:2230-2233 probes ×
    reads shape). Only ever used dim × dim — both sides O(10)."""
    region = T(spark, sf_dir, "region")
    prios = T(spark, sf_dir, "orders").select("o_orderpriority").distinct()
    return (
        region.crossJoin(prios)
        .groupBy("r_name", "o_orderpriority")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("r_name", "o_orderpriority")
    )


# --- self join / theta join ---------------------------------------------------


@register(
    "self_join_nation_pairs",
    oracle="""
SELECT a.n_name AS n1, b.n_name AS n2, a.n_regionkey AS rk
FROM nation a JOIN nation b
  ON a.n_regionkey = b.n_regionkey AND a.n_nationkey < b.n_nationkey
ORDER BY rk, n1, n2
""",
    tags=("relational", "join"),
)
def self_join_nation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join with a theta (<) condition — the GFF parent-child idiom
    (README.md:638-645)."""
    n = T(spark, sf_dir, "nation")
    a, b = n.alias("a"), n.alias("b")
    return (
        a.join(
            b,
            (F.col("a.n_regionkey") == F.col("b.n_regionkey"))
            & (F.col("a.n_nationkey") < F.col("b.n_nationkey")),
        )
        .select(
            F.col("a.n_name").alias("n1"),
            F.col("b.n_name").alias("n2"),
            F.col("a.n_regionkey").alias("rk"),
        )
        .orderBy("rk", "n1", "n2")
    )


# --- UNION ALL ----------------------------------------------------------------


@register(
    "union_all_parties",
    oracle="""
SELECT kind, nationkey, COUNT(*) AS n FROM (
  SELECT 'customer' AS kind, c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT 'supplier' AS kind, s_nationkey AS nationkey FROM supplier
) t
GROUP BY kind, nationkey
ORDER BY kind, nationkey
""",
    tags=("relational", "setop"),
)
def union_all_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL with a discriminator column (README.md:429-433 shape)."""
    c = T(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"), F.col("c_nationkey").alias("nationkey")
    )
    s = T(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"), F.col("s_nationkey").alias("nationkey")
    )
    return (
        c.unionByName(s)
        .groupBy("kind", "nationkey")
        .agg(F.count("*").alias("n"))
        .orderBy("kind", "nationkey")
    )


# --- recursive CTE (tree depth) ----------------------------------------------


@register(
    "recursive_tree_depth",
    oracle="""
WITH RECURSIVE t AS (
  SELECT CAST(0 AS BIGINT) AS k, 0 AS depth
  UNION ALL
  SELECT p.p_partkey, t.depth + 1
  FROM part p JOIN t ON (p.p_partkey - 1) // 2 = t.k
  WHERE p.p_partkey > 0
)
SELECT depth, COUNT(*) AS n, CAST(MIN(k) AS BIGINT) AS min_k, CAST(MAX(k) AS BIGINT) AS max_k
FROM t GROUP BY depth ORDER BY depth
""",
    tags=("relational", "recursive"),
)
def recursive_tree_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECURSIVE CTE ≡ iterative DataFrame loop (README.md:1024-1034 tree
    depth). part keys form an implicit binary heap (parent = (k-1) div 2);
    each iteration joins the frontier (broadcast — it's one tree level)
    against the edge table until the frontier empties. O(log n) rounds.
    """
    part = T(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("k"), F.expr("(p_partkey - 1) div 2").alias("parent")
    )
    frontier = part.filter(F.col("k") == 0).select("k", F.lit(0).alias("depth"))
    all_levels = [frontier]
    depth = 0
    while True:
        depth += 1
        prev = all_levels[-1].select(F.col("k").alias("pk"))
        nxt = (
            part.filter(F.col("k") > 0)
            .join(F.broadcast(prev), F.col("parent") == F.col("pk"))
            .select("k", F.lit(depth).alias("depth"))
        )
        # one driver-side emptiness probe per tree level (log2(n) probes)
        if nxt.limit(1).count() == 0:
            break
        all_levels.append(nxt)
    from functools import reduce

    t = reduce(lambda a, b: a.unionByName(b), all_levels)
    return (
        t.groupBy("depth")
        .agg(F.count("*").alias("n"), F.min("k").alias("min_k"), F.max("k").alias("max_k"))
        .orderBy("depth")
    )


# --- array / list functions ---------------------------------------------------


@register(
    "array_functions_docs",
    oracle="""
SELECT doc_id,
       CAST(len(words) AS BIGINT) AS n_words,
       CAST(len(list_distinct(words)) AS BIGINT) AS n_distinct,
       CAST(len(list_intersect(words, ['table','scan','join','row'])) AS BIGINT) AS n_kw,
       CAST(list_avg(list_transform(words, w -> length(w))) AS DOUBLE) AS avg_word_len,
       COALESCE(array_to_string(list_sort(list_distinct(list_intersect(words, ['table','scan','join','row']))), ','), '') AS kw_sorted
FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
ORDER BY doc_id
""",
    tags=("relational", "array"),
)
def array_functions_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """list/array surface (README.md:246-248,1908-1921): len, distinct,
    intersect, transform+avg (list_avg), sort. array_intersect preserves
    distinct semantics on both engines; avg = int sum / count (exact)."""
    docs = T(spark, sf_dir, "documents")
    kw = F.array(*[F.lit(w) for w in ("table", "scan", "join", "row")])
    words = F.split("text", " ")
    d = docs.select("doc_id", words.alias("words"))
    inter = F.array_intersect(F.array_distinct("words"), kw)
    return d.select(
        "doc_id",
        F.size("words").cast("long").alias("n_words"),
        F.size(F.array_distinct("words")).cast("long").alias("n_distinct"),
        F.size(inter).cast("long").alias("n_kw"),
        (
            F.aggregate(
                F.transform("words", lambda w: F.length(w).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).cast("double")
            / F.size("words")
        ).alias("avg_word_len"),
        F.array_join(F.sort_array(inter), ",").alias("kw_sorted"),
    ).orderBy("doc_id")


# --- inline VALUES -----------------------------------------------------------


@register(
    "values_inline_join",
    oracle="""
SELECT v.region_name, COUNT(*) AS n_nations
FROM (VALUES ('ASIA', 2), ('AFRICA', 0), ('EUROPE', 3)) AS v(region_name, rk)
JOIN nation ON n_regionkey = v.rk
GROUP BY v.region_name
ORDER BY v.region_name
""",
    tags=("relational", "values"),
)
def values_inline_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES relation (README.md:1347-1351) joined to a table."""
    vals = spark.createDataFrame(
        [("ASIA", 2), ("AFRICA", 0), ("EUROPE", 3)], ["region_name", "rk"]
    )
    nation = T(spark, sf_dir, "nation")
    return (
        F.broadcast(vals)
        .join(nation, vals.rk == nation.n_regionkey)
        .groupBy("region_name")
        .agg(F.count("*").alias("n_nations"))
        .orderBy("region_name")
    )


# --- COPY round-trips --------------------------------------------------------


@register(
    "copy_roundtrip_parquet",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    tags=("relational", "copy"),
)
def copy_roundtrip_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY TO parquet → scan back (README.md:530-534). The oracle computes
    the same aggregate directly; the round-trip must be lossless."""
    orders = T(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("total_cents"),
    )
    out = os.path.join(tempfile.gettempdir(), "spark_graft_copy_parquet")
    agg.write.mode("overwrite").parquet(out)
    return spark.read.parquet(out).orderBy("o_orderpriority")


@register(
    "copy_roundtrip_csv",
    oracle="""
SELECT n_name, COUNT(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
    tags=("relational", "copy"),
)
def copy_roundtrip_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COPY TO CSV (with header) → scan back with explicit schema."""
    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    agg = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_cust"))
    )
    out = os.path.join(tempfile.gettempdir(), "spark_graft_copy_csv")
    agg.write.mode("overwrite").option("header", True).csv(out)
    schema = StructType(
        [StructField("n_name", StringType()), StructField("n_cust", LongType())]
    )
    return spark.read.csv(out, header=True, schema=schema).orderBy("n_name")


@register(
    "semi_join_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    tags=("relational", "join"),
)
def semi_join_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS correlated subquery ≡ LEFT SEMI join (TPC-H Q4 shape)."""
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    late = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate")
    ).select("l_orderkey").distinct()
    return (
        orders.join(late, orders.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .orderBy("o_orderpriority")
    )


@register(
    "scalar_subquery_small_quantity",
    oracle="""
SELECT l_partkey,
       COUNT(*) AS n_small,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
FROM lineitem l1
WHERE l_quantity < (
  SELECT 0.5 * AVG(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey
)
GROUP BY l_partkey
ORDER BY l_partkey
LIMIT 100
""",
    tags=("relational", "subquery"),
)
def scalar_subquery_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape) ≡ join against the
    per-key aggregate — the decorrelated plan Catalyst would produce."""
    li = T(spark, sf_dir, "lineitem")
    avgs = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg")
    )
    return (
        li.join(avgs, li.l_partkey == avgs.pk)
        .filter(F.col("l_quantity") < F.col("half_avg"))
        .groupBy("l_partkey")
        .agg(
            F.count("*").alias("n_small"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .orderBy("l_partkey")
        .limit(100)
    )


@register(
    "asof_join_purchases",
    oracle="""
WITH l AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, ts, MAX(value) AS view_value
  FROM events WHERE event_type = 'view' GROUP BY user_id, ts
)
SELECT l.event_id, l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       ROUND(l.value, 6) AS purchase_value,
       strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS view_ts_s,
       ROUND(r.view_value, 6) AS view_value
FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
ORDER BY event_id
""",
    tags=("relational", "asof"),
)
def asof_join_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent view at
    or before it. Spark has no native ASOF JOIN — the operator
    (operators/asof.py) is the union+window formulation (one shuffle on
    the key, no range blow-up); the oracle is DuckDB's native ASOF JOIN."""
    from duckdb_miint_spark.operators.asof import asof_join
    from duckdb_miint_spark.queries_relational import read_events

    ev = read_events(spark, sf_dir)
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
    )
    out = asof_join(left, right, on="ts", by=["user_id"], how="inner")
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round("value", 6).alias("purchase_value"),
        F.date_format("ts_r", "yyyy-MM-dd HH:mm:ss").alias("view_ts_s"),
        F.round("view_value", 6).alias("view_value"),
    ).orderBy("event_id")


@register(
    "cube_order_stats",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority) AS g_pri, GROUPING(o_orderstatus) AS g_st,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(o_totalprice*100,0) AS BIGINT)) AS DOUBLE)/100.0 AS sum_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY g_pri, g_st, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
""",
    tags=("relational", "agg"),
)
def cube_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation (Catalyst Expand) with GROUPING() disambiguation of
    the NULL super-aggregate rows — the full grouping-sets surface on top
    of the existing ROLLUP gate."""
    orders = T(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    return (
        orders.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.grouping("o_orderpriority").cast("long").alias("g_pri"),
            F.grouping("o_orderstatus").cast("long").alias("g_st"),
            F.count("*").alias("n"),
            (F.sum(cents).cast("double") / 100.0).alias("sum_price"),
        )
        .select("o_orderpriority", "o_orderstatus", "g_pri", "g_st", "n", "sum_price")
        .orderBy(
            "g_pri", "g_st",
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


@register(
    "window_suite_events",
    oracle="""
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
       CAST(ROUND(value*100,0) AS BIGINT) AS v_cents,
       CAST(LAG(CAST(ROUND(value*100,0) AS BIGINT)) OVER w AS BIGINT) AS prev_cents,
       CAST(LEAD(CAST(ROUND(value*100,0) AS BIGINT)) OVER w AS BIGINT) AS next_cents,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       CAST(FIRST_VALUE(CAST(ROUND(value*100,0) AS BIGINT)) OVER w AS BIGINT) AS first_cents,
       CAST(RANK() OVER (PARTITION BY user_id ORDER BY CAST(ROUND(value*100,0) AS BIGINT) DESC, event_id) AS BIGINT) AS value_rank
FROM events
WHERE user_id < 50
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, ts_s, event_id
""",
    tags=("relational", "window"),
)
def window_suite_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/ntile/first_value/rank in one pass over a per-user event
    ordering — the window-function surface beyond row_number/sum gates."""
    from pyspark.sql import Window as W
    from duckdb_miint_spark.queries_relational import read_events

    ev = read_events(spark, sf_dir).filter(F.col("user_id") < 50)
    cents = F.round(F.col("value") * 100, 0).cast("long")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wr = W.partitionBy("user_id").orderBy(F.desc("v_cents"), F.asc("event_id"))
    return (
        ev.withColumn("v_cents", cents)
        .select(
            "user_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
            "v_cents",
            F.lag("v_cents").over(w).alias("prev_cents"),
            F.lead("v_cents").over(w).alias("next_cents"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.first("v_cents").over(w).alias("first_cents"),
            F.rank().over(wr).cast("long").alias("value_rank"),
            "ts", "event_id",
        )
        .orderBy("user_id", "ts", "event_id")
        .drop("ts", "event_id")
    )
