"""Driver-contract queries: the reference's relational operators
(SURVEY §2.9) expressed over the TPC-H-ish testdata tables, each with
an exactly-equivalent DuckDB oracle SQL (FIXTURES.md §10).

Mapping of testdata to crawl-domain semantics:

* customer  ~ frontier entities, orders ~ check runs / sightings
* events    ~ append-only history with JSON payloads
* documents / embeddings ~ the training-data payload tables

Every computed column is aliased identically in the Spark plan and the
oracle SQL (the driver hashes values after sorting columns by name).
All queries are pure built-ins — no Python in any of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def load(spark: SparkSession, sf_dir: str, name: str, spread: bool = False) -> DataFrame:
    """Read one testdata table. `spread=True` rebalances the scan up to
    the session's parallelism when the file yields fewer splits — the
    sandbox tables are single-row-group parquet, so without it every
    per-row-expensive projection (shingling HOFs, mapInPandas stages)
    downstream of the scan runs on ONE core. At production scale the
    scan produces >= parallelism splits and this is a no-op (the guard
    checks, it does not shuffle unconditionally); the shuffle it may
    add moves only the raw scan columns, always cheaper than
    serializing the compute."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if spread:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


# ------------------------------------------------------------------ flagship
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship aggregation (TPC-H Q1 shape; the reference's run-level
    count/sum metrics G1 writ large). Partial aggregation map-side,
    two-column group key — the canonical Catalyst-friendly agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 6) AS avg_qty,
       round(avg(l_extendedprice), 6) AS avg_price,
       round(avg(l_discount), 6) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------------------- Q1 view
def q_latest_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 latest_detail_items (dfg-gepris.sql:48-51): DISTINCT ON ->
    rank-1 window. Latest order per customer."""
    orders = load(spark, sf_dir, "orders")
    win = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        orders.withColumn("_rn", F.row_number().over(win))
        .where(F.col("_rn") == 1)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_orderdate").alias("latest_orderdate"),
            F.col("o_orderstatus").alias("latest_status"),
        )
    )


SQL_LATEST_WINS = """
SELECT o_custkey AS custkey,
       o_orderkey AS latest_orderkey,
       o_orderdate AS latest_orderdate,
       o_orderstatus AS latest_status
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
WHERE rn = 1
"""


# ------------------------------------------------------------------- Q2 view
def q_latest_items_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 latest_items (dfg-gepris.sql:56-64): CASE-fallback join.
    'O' (open) orders fall back to the customer's own segment value,
    like error rows fall back to last_available_item."""
    cust = load(spark, sf_dir, "customer")
    latest = q_latest_wins(spark, sf_dir)
    return (
        cust.join(latest, cust["c_custkey"] == latest["custkey"], "inner")
        .where(F.col("latest_status") != "P")  # exclude, like moved rows
        .select(
            F.col("c_custkey").alias("custkey"),
            F.when(F.col("latest_status") == "F", F.col("latest_orderkey").cast("string"))
            .when(F.col("c_mktsegment").isNotNull(), F.col("c_mktsegment"))
            .otherwise(F.lit("{}"))
            .alias("item"),
        )
    )


SQL_LATEST_ITEMS_COALESCE = """
WITH latest AS (
  SELECT o_custkey AS custkey, o_orderkey AS latest_orderkey,
         o_orderstatus AS latest_status
  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders)
  WHERE rn = 1)
SELECT c.c_custkey AS custkey,
       CASE WHEN l.latest_status = 'F' THEN CAST(l.latest_orderkey AS VARCHAR)
            WHEN c.c_mktsegment IS NOT NULL THEN c.c_mktsegment
            ELSE '{}' END AS item
FROM customer c JOIN latest l ON c.c_custkey = l.custkey
WHERE l.latest_status <> 'P'
"""


# ------------------------------------------------------------- Q3 explosion
def q_explode_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 reference explosion (dfg-gepris.sql:99-115): JSON attribute
    map -> edge rows. events.props is a JSON object; one edge per key
    whose name is in the relation whitelist."""
    ev = load(spark, sf_dir, "events")
    attrs = F.from_json(F.col("props"), "map<string, long>")
    return (
        ev.select("event_id", "user_id", F.explode(attrs).alias("relation", "ref_id"))
        .where(F.col("relation").isin("k", "ref", "target"))
        .select("event_id", "user_id", "relation", "ref_id")
        .orderBy("event_id", "relation")
    )


# DuckDB ships no json_each table function; the synthetic props objects
# are flat {"key": int}, so the oracle explodes them with regexps —
# same result set as the Spark from_json+explode plan.
SQL_EXPLODE_REFS = """
WITH kv AS (
  SELECT event_id, user_id,
         unnest(regexp_extract_all(props, '"(\\w+)":\\s*-?\\d+', 1)) AS relation,
         CAST(unnest(regexp_extract_all(props, '"\\w+":\\s*(-?\\d+)', 1)) AS BIGINT) AS ref_id
  FROM events)
SELECT event_id, user_id, relation, ref_id FROM kv
WHERE relation IN ('k', 'ref', 'target')
ORDER BY event_id, relation
"""


# ------------------------------------------------------------ Q4 discovery
def q_antijoin_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 newly-referenced discovery (database.py:118-147): the
    distinct-ids EXCEPT known-set anti-join. Here: customers never
    seen in the event stream (the set the crawler must enqueue)."""
    cust = load(spark, sf_dir, "customer")
    events = load(spark, sf_dir, "events")
    return (
        cust.join(
            events.select("user_id").distinct(), cust["c_custkey"] == F.col("user_id"), "left_anti"
        )
        .select(F.col("c_custkey").alias("custkey"))
        .orderBy("custkey")
    )


SQL_ANTIJOIN_DISCOVERY = """
SELECT c_custkey AS custkey FROM customer
WHERE c_custkey NOT IN (SELECT DISTINCT user_id FROM events)
ORDER BY custkey
"""


# ---------------------------------------------------------- A2 priority top-k
def q_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 priority queue (database.py:43-64): UNION ALL of never-seen
    entities (tier 0, by id) then seen ones stalest-first; LIMIT n.
    Exactly the get_ids shape over customer/orders. Spark plans this
    as TakeOrderedAndProject — per-partition top-k, no global sort."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    last = orders.groupBy("o_custkey").agg(F.max("o_orderdate").alias("last_dt"))
    tier1 = cust.join(last, cust["c_custkey"] == F.col("o_custkey"), "left_anti").select(
        F.col("c_custkey").alias("custkey"),
        F.lit(0).alias("priority_tier"),
        F.lit(None).cast("timestamp").alias("order_ts"),
    )
    tier2 = cust.join(last, cust["c_custkey"] == F.col("o_custkey"), "inner").select(
        F.col("c_custkey").alias("custkey"),
        F.lit(1).alias("priority_tier"),
        F.col("last_dt").alias("order_ts"),
    )
    return (
        tier1.unionByName(tier2)
        .orderBy("priority_tier", F.col("order_ts").asc_nulls_first(), "custkey")
        .limit(20)
    )


SQL_PRIORITY_TOPK = """
SELECT * FROM (
  SELECT c_custkey AS custkey, 0 AS priority_tier, NULL::TIMESTAMP AS order_ts
  FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
  UNION ALL
  SELECT c_custkey AS custkey, 1 AS priority_tier, last_dt AS order_ts
  FROM customer JOIN (SELECT o_custkey, max(o_orderdate) AS last_dt
                      FROM orders GROUP BY o_custkey) o
       ON c_custkey = o.o_custkey)
ORDER BY priority_tier, order_ts ASC NULLS FIRST, custkey
LIMIT 20
"""


# ------------------------------------------------------- Q12/Q13 change detect
def q_merge_change_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1/Q12/Q13 MERGE with null-safe change detection
    (database.py:77-96): 'frontier' = each customer's latest order
    before the cutoff; 'batch' = latest order after. The merge output
    carries the IS DISTINCT FROM change flags."""
    orders = load(spark, sf_dir, "orders")
    cutoff = F.lit("1997-01-01")
    win = Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())

    def latest(side):
        return (
            orders.where(side)
            .withColumn("_rn", F.row_number().over(win))
            .where(F.col("_rn") == 1)
            .select("o_custkey", "o_orderstatus", "o_orderkey")
        )

    target = latest(F.col("o_orderdate") < cutoff).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("old_status"),
    )
    source = latest(F.col("o_orderdate") >= cutoff).select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("new_status"),
    )
    merged = target.join(source, "custkey", "full_outer")
    return merged.select(
        "custkey",
        F.coalesce(F.col("new_status"), F.col("old_status")).alias("status"),
        (~F.col("old_status").eqNullSafe(F.col("new_status"))).alias("changed"),
        (F.col("old_status").isNull() & F.col("new_status").isNotNull()).alias("inserted"),
    ).orderBy("custkey")


SQL_MERGE_CHANGE_DETECTION = """
WITH latest_before AS (
  SELECT o_custkey AS custkey, o_orderstatus AS old_status
  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00') WHERE rn = 1),
latest_after AS (
  SELECT o_custkey AS custkey, o_orderstatus AS new_status
  FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
        ORDER BY o_orderdate DESC, o_orderkey DESC) rn
        FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00') WHERE rn = 1)
SELECT coalesce(b.custkey, a.custkey) AS custkey,
       coalesce(a.new_status, b.old_status) AS status,
       (b.old_status IS DISTINCT FROM a.new_status) AS changed,
       (b.old_status IS NULL AND a.new_status IS NOT NULL) AS inserted
FROM latest_before b FULL OUTER JOIN latest_after a ON b.custkey = a.custkey
ORDER BY custkey
"""


# ------------------------------------------------------------- Q7 vanished
def q_vanished_marking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 vanished marking (database.py:149-161): entities seen before
    but not by the 'current sweep' (orders in the last window) get
    flagged."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    last = orders.groupBy("o_custkey").agg(F.max("o_orderdate").alias("last_seen"))
    sweep_start = F.lit("1998-01-01")
    return (
        cust.join(last, cust["c_custkey"] == F.col("o_custkey"), "left")
        .select(
            F.col("c_custkey").alias("custkey"),
            (
                F.col("last_seen").isNotNull() & (F.col("last_seen") < sweep_start)
            ).alias("detail_check_needed"),
        )
        .orderBy("custkey")
    )


SQL_VANISHED_MARKING = """
SELECT c_custkey AS custkey,
       (last_seen IS NOT NULL AND last_seen < TIMESTAMP '1998-01-01 00:00:00')
         AS detail_check_needed
FROM customer LEFT JOIN (SELECT o_custkey, max(o_orderdate) AS last_seen
                         FROM orders GROUP BY o_custkey) o
     ON c_custkey = o.o_custkey
ORDER BY custkey
"""


# ------------------------------------------------------------ Q8 hierarchy
def q_hierarchy_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 recursive hierarchy closure (dfg-gepris.sql:117-141): Spark
    has no recursive CTE -> iterative explode-join loop to fixpoint.
    Synthetic deterministic hierarchy over part: parent(k) = k/4
    (0 -> root). Emits (id, parent_id, root_id, depth)."""
    part = load(spark, sf_dir, "part")
    nodes = part.select(
        F.col("p_partkey").alias("id"),
        F.when(F.col("p_partkey") / 4 >= 1, F.floor(F.col("p_partkey") / 4))
        .cast("long")
        .alias("parent_id"),
    )
    # iterate: walk up until the ancestor has no parent (root)
    closure = nodes.select(
        "id", "parent_id", F.coalesce("parent_id", "id").alias("cur"), F.lit(0).alias("depth")
    )
    parents = nodes.select(F.col("id").alias("p_id"), F.col("parent_id").alias("p_parent"))
    for _ in range(12):  # log4(10^7) bound; loop exits early at fixpoint
        stepped = (
            closure.join(F.broadcast(parents), closure["cur"] == F.col("p_id"), "left")
            .select(
                "id",
                "parent_id",
                F.coalesce("p_parent", "cur").alias("cur"),
                F.when(F.col("p_parent").isNotNull(), F.col("depth") + 1)
                .otherwise(F.col("depth"))
                .alias("depth"),
                F.col("p_parent").isNotNull().alias("_advanced"),
            )
            .localCheckpoint(eager=True)  # break lineage growth per level
        )
        done = stepped.where(F.col("_advanced")).isEmpty()
        closure = stepped.drop("_advanced")
        if done:
            break
    return closure.select("id", "parent_id", F.col("cur").alias("root_id"), "depth").orderBy("id")


SQL_HIERARCHY_CLOSURE = """
WITH RECURSIVE nodes AS (
  SELECT p_partkey AS id,
         CASE WHEN p_partkey / 4 >= 1 THEN CAST(floor(p_partkey / 4) AS BIGINT) END AS parent_id
  FROM part),
walk AS (
  SELECT id, parent_id, coalesce(parent_id, id) AS cur, 0 AS depth FROM nodes
  UNION ALL
  SELECT w.id, w.parent_id, coalesce(n.parent_id, w.cur) AS cur, w.depth + 1
  FROM walk w JOIN nodes n ON w.cur = n.id
  WHERE n.parent_id IS NOT NULL)
SELECT id, parent_id, cur AS root_id, CAST(depth AS INT) AS depth
FROM (SELECT *, row_number() OVER (PARTITION BY id ORDER BY depth DESC) rn FROM walk)
WHERE rn = 1
ORDER BY id
"""


# ------------------------------------------------------------- G5 latest stat
def q_latest_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5 latest-stat lookup (database.py:231-241): most recent event
    per event_type (max_by twice, one pass)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.max("ts").alias("last_ts"),
            F.max_by("value", F.struct(F.col("ts"), F.col("event_id"))).alias("last_value"),
        )
        .select("event_type", "last_ts", F.round("last_value", 6).alias("last_value"))
        .orderBy("event_type")
    )


# DuckDB 1.0 max_by has no struct-ordered form; the rank-1 window is
# the same latest-row-per-group semantics.
SQL_LATEST_STAT = """
SELECT event_type, last_ts, last_value FROM (
  SELECT event_type, max(ts) OVER (PARTITION BY event_type) AS last_ts,
         round(value, 6) AS last_value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1 ORDER BY event_type
"""


# --------------------------------------------------------- K3 insert-if-changed
def q_insert_if_changed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K3 history dedup-insert (database.py:100-116): a row is kept
    only when it differs (null-safe) from the previous row of its
    entity — lag window + IS DISTINCT FROM."""
    ev = load(spark, sf_dir, "events")
    win = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("event_type").over(win)
    return (
        ev.withColumn("_prev", prev)
        .where(~F.col("event_type").eqNullSafe(F.col("_prev")))
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
    )


SQL_INSERT_IF_CHANGED = """
SELECT event_id, user_id, event_type
FROM (SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events)
WHERE event_type IS DISTINCT FROM prev
ORDER BY event_id
"""


# ----------------------------------------------------------- windowed stream
def q_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-shaped aggregation: tumbling 1-hour event-time window
    per event_type (the batch equivalent of the Structured Streaming
    query in streaming/eventstream.py — same logical plan)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
        .orderBy("window_start", "event_type")
    )


SQL_WINDOWED_COUNTS = """
SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 6) AS total
FROM events GROUP BY 1, 2 ORDER BY window_start, event_type
"""


RELATIONAL_QUERIES: dict[str, tuple] = {
    "pricing_summary": (q_pricing_summary, SQL_PRICING_SUMMARY),
    "latest_wins": (q_latest_wins, SQL_LATEST_WINS),
    "latest_items_coalesce": (q_latest_items_coalesce, SQL_LATEST_ITEMS_COALESCE),
    "explode_refs": (q_explode_refs, SQL_EXPLODE_REFS),
    "antijoin_discovery": (q_antijoin_discovery, SQL_ANTIJOIN_DISCOVERY),
    "priority_topk": (q_priority_topk, SQL_PRIORITY_TOPK),
    "merge_change_detection": (q_merge_change_detection, SQL_MERGE_CHANGE_DETECTION),
    "vanished_marking": (q_vanished_marking, SQL_VANISHED_MARKING),
    "hierarchy_closure": (q_hierarchy_closure, SQL_HIERARCHY_CLOSURE),
    "latest_stat": (q_latest_stat, SQL_LATEST_STAT),
    "insert_if_changed": (q_insert_if_changed, SQL_INSERT_IF_CHANGED),
    "windowed_counts": (q_windowed_counts, SQL_WINDOWED_COUNTS),
}
