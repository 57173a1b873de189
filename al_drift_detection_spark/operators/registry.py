"""Operator registry: every SURVEY.md §2 operator as an idiomatic-Spark query
over the driver testdata tables, each (where ANSI-SQL-expressible) paired with
a DuckDB oracle for the per-round correctness gate.

Conventions (driver contract):
- every computed column is aliased IDENTICALLY in the Spark plan and the SQL;
- floats are rounded (2-6 dp) on both sides so order-of-summation FP noise
  cannot flip the value hash;
- timestamps leave results as formatted strings (Spark session TZ is pinned
  UTC to match DuckDB's naive timestamps);
- deterministic total orders everywhere a window/rank needs one (ties broken
  by the unique key column).

Each QuerySpec cites the reference operator it re-expresses (SURVEY.md §2 ids
with /root/reference file:line).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    # DuckDB oracle; None → driver does rows-only check; a zero-arg callable
    # is resolved lazily by __spark_entry__.oracle_sql() (used when the SQL
    # embeds data-derived literals, e.g. q_ivf_topk's trained centroids)
    sql: str | None | Callable[[], str]
    doc: str


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, sql: str | None, doc: str):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, sql, doc)
        return fn

    return deco


# =====================================================================
# Scans / projections / filters (SURVEY.md §2.1 S1, §2.2 P2/P5)
# =====================================================================
@register(
    "q_filter_project",
    """
    SELECT l_orderkey, l_partkey, round(l_extendedprice, 2) AS price
    FROM lineitem
    WHERE l_quantity BETWEEN 30 AND 35 AND l_returnflag = 'R'
    """,
    "P2/P5 projection + predicate (ref util.py:88-96, gan.py:648); filter and "
    "column pruning push into the parquet scan (PushedFilters in explain)",
)
def q_filter_project(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _t(spark, sf, "lineitem")
        .filter(F.col("l_quantity").between(30, 35) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_partkey", F.round("l_extendedprice", 2).alias("price"))
    )


@register(
    "q_tpch_q1",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    "flagship agg (A1/A3 analog; TPC-H Q1 shape): partial+final hash agg, "
    "one shuffle of (2-key × 6-agg) rows only",
)
def q_tpch_q1(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _t(spark, sf, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "sum_disc_price"
            ),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# =====================================================================
# Aggregations (SURVEY.md §2.4)
# =====================================================================
@register(
    "q_global_stats",
    """
    SELECT 'l_quantity' AS column,
           count(*) - count(l_quantity) AS nulls,
           round(min(l_quantity), 6) AS min_v, round(max(l_quantity), 6) AS max_v,
           round(avg(l_quantity), 6) AS avg_v, round(stddev_samp(l_quantity), 6) AS std_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice',
           count(*) - count(l_extendedprice),
           round(min(l_extendedprice), 6), round(max(l_extendedprice), 6),
           round(avg(l_extendedprice), 6), round(stddev_samp(l_extendedprice), 6)
    FROM lineitem
    """,
    "A1/A13 one-pass column stats (ref gan.py:631-634 z-score prep); "
    "pandas std ddof=1 == stddev_samp",
)
def q_global_stats(spark: SparkSession, sf: str) -> DataFrame:
    li = _t(spark, sf, "lineitem")
    rows = []
    for c in ("l_quantity", "l_extendedprice"):
        rows.append(
            li.agg(
                F.lit(c).alias("column"),
                (F.count(F.lit(1)) - F.count(c)).alias("nulls"),
                F.round(F.min(c), 6).alias("min_v"),
                F.round(F.max(c), 6).alias("max_v"),
                F.round(F.avg(c), 6).alias("avg_v"),
                F.round(F.stddev_samp(c), 6).alias("std_v"),
            )
        )
    return rows[0].unionByName(rows[1])


@register(
    "q_value_counts",
    "SELECT event_type, count(*) AS n FROM events GROUP BY event_type",
    "A3 value counts (ref np.unique return_counts, gan.py:404)",
)
def q_value_counts(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "events").groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


@register(
    "q_distinct_keys",
    "SELECT DISTINCT o_orderpriority AS priority FROM orders",
    "A2 distinct keys (ref pd.unique, gan.py:644)",
)
def q_distinct_keys(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "orders").select(F.col("o_orderpriority").alias("priority")).distinct()


@register(
    "q_group_extents",
    """
    SELECT user_id, count(*) AS n,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS first_ts,
           strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_ts
    FROM events GROUP BY user_id
    """,
    "A4 group boundary extents (ref orbit index ranges, gan.py:647-651)",
)
def q_group_extents(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _t(spark, sf, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
        )
    )


@register(
    "q_entropy_per_group",
    """
    WITH c AS (SELECT source, lang, count(*)::DOUBLE AS n FROM documents GROUP BY 1, 2),
         t AS (SELECT source, sum(n) AS tot FROM c GROUP BY 1)
    SELECT c.source, round(-sum((n / tot) * ln(n / tot)), 6) AS entropy
    FROM c JOIN t USING (source) GROUP BY c.source
    """,
    "A5 Shannon entropy per group (ported from ref cnn.py:69-83 get_entropy); "
    "pure two-level agg, no UDF",
)
def q_entropy_per_group(spark: SparkSession, sf: str) -> DataFrame:
    docs = _t(spark, sf, "documents")
    c = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).cast("double").alias("n"))
    t = c.groupBy("source").agg(F.sum("n").alias("tot"))
    p = F.col("n") / F.col("tot")
    return (
        c.join(t, "source")
        .groupBy("source")
        .agg(F.round(-F.sum(p * F.log(p)), 6).alias("entropy"))
    )


@register(
    "q_minmax_class_counts",
    """
    WITH c AS (SELECT label, count(*) AS n FROM embeddings GROUP BY label)
    SELECT min(n) AS min_count, max(n) AS max_count, count(*) AS n_classes,
           least(min(n), 500) AS equalize_target
    FROM c
    """,
    "A12 min/max over class counts + equalization target "
    "(ref gan.py:451-453 min(min(counts), max_count))",
)
def q_minmax_class_counts(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "embeddings").groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return c.agg(
        F.min("n").alias("min_count"),
        F.max("n").alias("max_count"),
        F.count(F.lit(1)).alias("n_classes"),
        F.least(F.min("n"), F.lit(500)).alias("equalize_target"),
    )


@register(
    "q_class_weights",
    """
    WITH c AS (SELECT label, count(*)::DOUBLE AS n FROM embeddings GROUP BY label),
         t AS (SELECT sum(n) AS total, count(*)::DOUBLE AS k FROM c)
    SELECT label, round(total / (k * n), 6) AS weight FROM c, t
    """,
    "A11 sklearn-'balanced' class weights N/(C*count_c) (ref cnn.py:217-219)",
)
def q_class_weights(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "embeddings").groupBy("label").agg(
        F.count(F.lit(1)).cast("double").alias("n")
    )
    t = c.agg(F.sum("n").alias("total"), F.count(F.lit(1)).cast("double").alias("k"))
    return c.crossJoin(F.broadcast(t)).select(
        "label", F.round(F.col("total") / (F.col("k") * F.col("n")), 6).alias("weight")
    )


# =====================================================================
# Joins (SURVEY.md §2.3)
# =====================================================================
@register(
    "q_broadcast_join_agg",
    """
    SELECT c.c_mktsegment, round(sum(o.o_totalprice), 2) AS revenue, count(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    "J1 broadcast hash equi-join (ref dict-lookup update cnn.py:496-500); "
    "small dim broadcast, zero shuffle of the fact side pre-agg",
)
def q_broadcast_join_agg(spark: SparkSession, sf: str) -> DataFrame:
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q_anti_join",
    """
    SELECT c_custkey FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    "J2/J4 membership complement as broadcast LEFT ANTI join "
    "(ref list-comprehension complement cnn.py:524; target referential check)",
)
def q_anti_join(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey")


@register(
    "q_lead_target",
    """
    SELECT event_id, user_id, round(value, 4) AS value,
           round(lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS next_value
    FROM events
    """,
    "J3 current↔next row alignment via lead() — no physical join "
    "(ref generator target pairing gan.py:221-231)",
)
def q_lead_target(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.round("value", 4).alias("value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
    )


# =====================================================================
# Window functions (SURVEY.md §2.5)
# =====================================================================
@register(
    "q_rolling_mean",
    """
    SELECT event_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 4) AS roll_avg
    FROM events
    """,
    "W1 rolling mean (ref rolling(5000,min_periods=1).mean(), gan.py:637-639) — "
    "partitioned by group to avoid the reference's cross-boundary leak AND a "
    "single-partition global sort",
)
def q_rolling_mean(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-4, 0)
    return _t(spark, sf, "events").select(
        "event_id", F.round(F.avg("value").over(w), 4).alias("roll_avg")
    )


@register(
    "q_lag_features",
    """
    SELECT event_id,
           round(lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS lag1,
           round(lag(value, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS lag2
    FROM events
    """,
    "W2 lag-sequence features (ref concatenate_features gan.py:348-385, "
    "sequence_length window of prior rows)",
)
def q_lag_features(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return _t(spark, sf, "events").select(
        "event_id",
        F.round(F.lag("value", 1).over(w), 4).alias("lag1"),
        F.round(F.lag("value", 2).over(w), 4).alias("lag2"),
    )


@register(
    "q_tumbling_vote",
    """
    WITH r AS (
      SELECT event_type, row_number() OVER (ORDER BY ts, event_id) - 1 AS rn FROM events
    )
    SELECT CAST(rn // 4 AS BIGINT) AS window_id, count(*) AS n,
           count(DISTINCT event_type) AS n_types, min(event_type) AS first_type,
           (count(DISTINCT event_type) = 1) AS unanimous
    FROM r GROUP BY 1
    """,
    "W3+W4 tumbling count window (test_batch_size=4 cursor, ref gan.py:730) + "
    "unanimity vote per window (ref gan.py:737-757). Global row_number is the "
    "two-pass bucketed form (hour-of-ts buckets + broadcast offsets) — no "
    "single-partition sort (operators/windows.py global_cumulative)",
)
def q_tumbling_vote(spark: SparkSession, sf: str) -> DataFrame:
    from al_drift_detection_spark.operators.windows import global_cumulative

    numbered = global_cumulative(
        _t(spark, sf, "events").select("event_type", "ts", "event_id"),
        bucket=F.floor(F.unix_timestamp("ts") / 3600),
        order_cols=["ts", "event_id"],
        row_number_col="_rn1",
    )
    r = numbered.select("event_type", (F.col("_rn1") - 1).alias("rn"))
    return (
        r.groupBy(F.floor(F.col("rn") / 4).alias("window_id"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("event_type").alias("n_types"),
            F.min("event_type").alias("first_type"),
            (F.count_distinct("event_type") == 1).alias("unanimous"),
        )
    )


@register(
    "q_topk_per_group",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rk
      FROM orders
    ) WHERE rk <= 2
    """,
    "W6/O2 top-k per group (ref entropy-ranked train-orbit selection "
    "cnn.py:530-533)",
)
def q_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        _t(spark, sf, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("price"),
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= 2)
    )


@register(
    "q_sessionize",
    """
    WITH g AS (
      SELECT user_id,
             CASE WHEN date_diff('second',
                                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                                 ts) > 3600
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
    )
    SELECT user_id, CAST(sum(new_sess) + 1 AS BIGINT) AS n_sessions FROM g GROUP BY user_id
    """,
    "W7 sessionization: gap-flag cumsum (ref orbit-gap grouping "
    "gan.py:849-860, abs gap > 6)",
)
def q_sessionize(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = _t(spark, sf, "events").select(
        "user_id",
        F.when(
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))) > 3600, 1
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    return g.groupBy("user_id").agg((F.sum("new_sess") + 1).alias("n_sessions"))


# =====================================================================
# Sorts / limits / argmax (SURVEY.md §2.6)
# =====================================================================
@register(
    "q_topn_global",
    """
    SELECT o_orderkey, round(o_totalprice, 2) AS price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    "O2 global top-N (TakeOrderedAndProject — no full sort at scale)",
)
def q_topn_global(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _t(spark, sf, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.round("o_totalprice", 2).alias("price"))
        .limit(10)
    )


@register(
    "q_argmax_array",
    """
    SELECT vec_id,
           CAST(list_position(embedding[1:8], list_max(embedding[1:8])) AS BIGINT) AS argmax_pos
    FROM embeddings
    """,
    "O3 argmax over a probability-vector-like array (ref labels_pred.argmax, "
    "cnn.py:235; torch.max gan.py:733-735); built-in array fns, no UDF",
)
def q_argmax_array(spark: SparkSession, sf: str) -> DataFrame:
    first8 = F.slice(F.col("embedding"), 1, 8)
    return _t(spark, sf, "embeddings").select(
        "vec_id",
        F.array_position(first8, F.array_max(first8)).alias("argmax_pos"),
    )


# =====================================================================
# Set operations (SURVEY.md §2.7)
# =====================================================================
@register(
    "q_union_tagged",
    """
    SELECT event_id, 'click' AS src FROM events WHERE event_type = 'click'
    UNION ALL
    SELECT event_id, 'purchase' AS src FROM events WHERE event_type = 'purchase'
    """,
    "U1/U2 union-all assembly of filtered segments (ref pd.concat util.py:58, "
    "vstack gan.py:428-432)",
)
def q_union_tagged(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "events")
    a = e.filter(F.col("event_type") == "click").select("event_id", F.lit("click").alias("src"))
    b = e.filter(F.col("event_type") == "purchase").select(
        "event_id", F.lit("purchase").alias("src")
    )
    return a.unionByName(b)


@register(
    "q_except_keys",
    """
    SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
    """,
    "U3 set complement (ref valid-orbit complement cnn.py:524)",
)
def q_except_keys(spark: SparkSession, sf: str) -> DataFrame:
    e = _t(spark, sf, "events")
    a = e.filter(F.col("event_type") == "click").select("user_id").distinct()
    b = e.filter(F.col("event_type") == "error").select("user_id").distinct()
    return a.exceptAll(b.distinct()).distinct()


# =====================================================================
# Sampling / balancing (SURVEY.md §2.8)
# =====================================================================
@register(
    "q_stratified_sample",
    """
    SELECT vec_id, label FROM (
      SELECT vec_id, label,
             row_number() OVER (PARTITION BY label
                                ORDER BY (vec_id * 2654435761) % 1000003, vec_id) AS rk
      FROM embeddings
    ) WHERE rk <= 20
    """,
    "M1 exact stratified downsample, deterministic pseudo-random order "
    "(ref equalize_classes gan.py:437-465; seeded, unlike the reference)",
)
def q_stratified_sample(spark: SparkSession, sf: str) -> DataFrame:
    # two-stage salted rank (operators/windows.ranked_head): a plain
    # partitionBy(label) rank funnels each label's whole row set through
    # ONE task — at corpus scale a label is billions of rows (the
    # CLAUDE.md single-hot-task rule); identical kept set by construction
    from al_drift_detection_spark.operators.windows import ranked_head

    key = (F.col("vec_id") * 2654435761) % 1000003
    return ranked_head(
        _t(spark, sf, "embeddings").select("vec_id", "label"),
        ["label"], [key, F.col("vec_id")], 20,
    ).select("vec_id", "label")


@register(
    "q_split_counts",
    """
    SELECT label, count(*) AS n,
           greatest(CAST(floor(count(*) / 5) AS BIGINT), 1) AS test_count
    FROM embeddings GROUP BY label
    """,
    "M5 20%-or-1 test split sizing per group (ref cnn.py:514-524)",
)
def q_split_counts(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _t(spark, sf, "embeddings")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.greatest(F.floor(F.count(F.lit(1)) / 5).cast("long"), F.lit(1)).alias(
                "test_count"
            ),
        )
    )


# =====================================================================
# Scalar functions (SURVEY.md §2.9)
# =====================================================================
@register(
    "q_zscore",
    """
    SELECT c_custkey,
           round((c_acctbal - avg(c_acctbal) OVER ()) / stddev_samp(c_acctbal) OVER (), 4) AS z
    FROM customer
    """,
    "F1 z-score normalization (ref gan.py:634; pandas std ddof=1). Plan: one "
    "agg → two scalars → broadcast crossJoin back (SURVEY §2.4 A1), NOT an "
    "empty-partition window (which would move every row through one task)",
)
def q_zscore(spark: SparkSession, sf: str) -> DataFrame:
    c = _t(spark, sf, "customer")
    s = c.agg(
        F.avg("c_acctbal").alias("_mu"), F.stddev_samp("c_acctbal").alias("_sd")
    )
    return c.crossJoin(F.broadcast(s)).select(
        "c_custkey",
        F.round((F.col("c_acctbal") - F.col("_mu")) / F.col("_sd"), 4).alias("z"),
    )


@register(
    "q_vector_magnitude",
    """
    SELECT vec_id,
           round(sqrt(CAST(embedding[1] AS DOUBLE) ^ 2 + CAST(embedding[2] AS DOUBLE) ^ 2
                      + CAST(embedding[3] AS DOUBLE) ^ 2), 4) AS b_tot
    FROM embeddings
    """,
    "F2 B_tot = sqrt(x²+y²+z²) (ref cnn.py:681) over array elements",
)
def q_vector_magnitude(spark: SparkSession, sf: str) -> DataFrame:
    e = F.col("embedding")
    mag = F.sqrt(
        F.pow(F.element_at(e, 1).cast("double"), 2)
        + F.pow(F.element_at(e, 2).cast("double"), 2)
        + F.pow(F.element_at(e, 3).cast("double"), 2)
    )
    return _t(spark, sf, "embeddings").select("vec_id", F.round(mag, 4).alias("b_tot"))


@register(
    "q_regexp_extract",
    """
    SELECT o_orderkey, CAST(regexp_extract(o_orderpriority, '(\\d+)', 1) AS INT) AS prio_num
    FROM orders
    """,
    "F3/S2 digits-from-string (ref filename→ORBIT util.py:53-55, gan.py:938)",
)
def q_regexp_extract(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "orders").select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", r"(\d+)", 1).cast("int").alias("prio_num"),
    )


@register(
    "q_label_remap",
    """
    SELECT event_id,
           CASE event_type WHEN 'click' THEN 0 WHEN 'view' THEN 1 ELSE -1 END AS remapped
    FROM events
    """,
    "F4 label re-mapping when/otherwise chain (ref periodicity remap "
    "gan.py:415-426)",
)
def q_label_remap(spark: SparkSession, sf: str) -> DataFrame:
    return _t(spark, sf, "events").select(
        "event_id",
        F.when(F.col("event_type") == "click", 0)
        .when(F.col("event_type") == "view", 1)
        .otherwise(-1)
        .alias("remapped"),
    )


@register(
    "q_abs_gap_flags",
    """
    WITH g AS (
      SELECT user_id,
             abs(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
      FROM events
    )
    SELECT user_id, count(CASE WHEN gap > 50 THEN 1 END) AS n_jumps FROM g GROUP BY user_id
    """,
    "F5 abs-gap threshold flags (ref orbit-number gap > 6, gan.py:856)",
)
def q_abs_gap_flags(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = _t(spark, sf, "events").select(
        "user_id", F.abs(F.col("value") - F.lag("value").over(w)).alias("gap")
    )
    return g.groupBy("user_id").agg(
        F.count(F.when(F.col("gap") > 50, 1)).alias("n_jumps")
    )
