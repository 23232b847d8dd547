package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Aggregation / multi-join / window headliners.
  *
  * These are the scale-critical plans: partial (map-side) aggregation
  * before the shuffle, broadcast joins for dimensions, one shuffle per
  * wide aggregation, deterministic tie-broken ordering for top-k.
  * All money math goes through Exact (decimal) so results are
  * bit-stable across partitionings and match the DuckDB oracle.
  */
object Agg {
  import Exact._
  type Q = (SparkSession, String) => DataFrame

  /** Mart-shaped flagship (ref: seasonal_metrics_agg.sql:1-74): one
    * fact joined to the same dimension on two different keys, branches
    * UNIONed with set semantics. The second key is synthetic
    * (o_orderkey % 100 + 1) to model the reference's home-team key.
    * Dimension side is broadcast — no fact shuffle; the UNION-distinct
    * is the single mandatory shuffle, exactly like the reference mart.
    */
  def martJoinUnion(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).withColumn(
      "alt_custkey",
      (col("o_orderkey") % 100 + 1).cast("long"))
    val c = broadcast(customer(s, d))
    val b1 = o
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"),
        col("o_orderstatus"),
        col("c_name").as("party_name"),
        col("c_mktsegment").as("party_segment"),
        lit("primary").as("branch"))
    val b2 = o
      .join(c, col("alt_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"),
        col("o_orderstatus"),
        col("c_name").as("party_name"),
        col("c_mktsegment").as("party_segment"),
        lit("alternate").as("branch"))
    b1.union(b2).distinct()
  }

  val queries: Map[String, Q] = Map(
    "mart_join_union" -> (martJoinUnion _),

    // TPC-H Q1 shape: wide scan, filter pushed to parquet, partial+
    // final hash aggregate on low-cardinality keys.
    "q1_agg" -> { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sumD(col("l_quantity")).as("sum_qty"),
          sumD(col("l_extendedprice")).as("sum_base_price"),
          sumExprD(revenue(col("l_extendedprice"), col("l_discount")))
            .as("sum_disc_price"),
          avgD(col("l_quantity")).as("avg_qty"),
          avgD(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
    },

    // TPC-H Q3 shape: dimension-filtered 3-way join, grouped revenue,
    // deterministic top-10 (tie-broken by key).
    "q3_top_revenue" -> { (s, d) =>
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d)
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      val l = lineitem(s, d)
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(
          sumExprD(revenue(col("l_extendedprice"), col("l_discount")))
            .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    },

    // TPC-H Q5 shape: snowflake join region->nation->(customer,
    // supplier)->orders->lineitem, revenue by nation. Dimensions
    // broadcast; the only shuffles are the two fact joins + final agg.
    "q5_region_revenue" -> { (s, d) =>
      val r = region(s, d).filter(col("r_name") === "ASIA")
      val n = nation(s, d)
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      val c = customer(s, d)
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_nationkey", "n_name")
      val o = orders(s, d)
        .filter(
          col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      val l = lineitem(s, d)
      val sup = supplier(s, d).select("s_suppkey", "s_nationkey")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(sup),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          sumExprD(revenue(col("l_extendedprice"), col("l_discount")))
            .as("revenue"))
    },

    // W1 [ext] — ranking window over an aggregate (SURVEY §2.8 W1,
    // the standings-rank analog). rank() with a fully deterministic
    // ORDER BY (value desc, key asc).
    "w1_rank_window" -> { (s, d) =>
      val perNation = customer(s, d)
        .groupBy(col("c_nationkey"))
        .agg(
          sumD(col("c_acctbal")).as("total_bal"),
          count(lit(1)).as("n_customers"))
      perNation
        .join(broadcast(nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("total_bal"), col("n_customers"))
        .withColumn("bal_rank",
          rank().over(
            Window.orderBy(col("total_bal").desc, col("n_name").asc))
            .cast(IntegerType))
    },

    // Windowed running metrics per partition: lag + cumulative sum
    // (the building blocks of sessionization, X5).
    "w2_running_total" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      orders(s, d)
        .withColumn("order_seq", row_number().over(w).cast(IntegerType))
        .withColumn("running_spend",
          sum(dec2(col("o_totalprice")))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .select("o_orderkey", "o_custkey", "order_seq", "running_spend")
    })

  val oracles: Map[String, String] = Map(
    "mart_join_union" ->
      """WITH o AS (SELECT *, CAST(o_orderkey % 100 + 1 AS BIGINT) AS alt_custkey FROM orders)
         SELECT o_orderkey, o_orderstatus, c_name AS party_name,
                c_mktsegment AS party_segment, 'primary' AS branch
         FROM o JOIN customer ON o_custkey = c_custkey
         UNION
         SELECT o_orderkey, o_orderstatus, c_name AS party_name,
                c_mktsegment AS party_segment, 'alternate' AS branch
         FROM o JOIN customer ON alt_custkey = c_custkey""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
         CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS DOUBLE) AS avg_qty,
         CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS DOUBLE) AS avg_price,
         count(*) AS count_order
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         GROUP BY l_returnflag, l_linestatus""",
    "q3_top_revenue" ->
      """SELECT l_orderkey,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1995-03-15'
           AND l_shipdate > TIMESTAMP '1995-03-15'
         GROUP BY l_orderkey
         ORDER BY revenue DESC, l_orderkey ASC
         LIMIT 10""",
    "q5_region_revenue" ->
      """SELECT n_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1994-01-01'
           AND o_orderdate <  TIMESTAMP '1996-01-01'
         GROUP BY n_name""",
    "w1_rank_window" ->
      """WITH per_nation AS (
           SELECT c_nationkey,
             CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
             count(*) AS n_customers
           FROM customer GROUP BY c_nationkey)
         SELECT n_name, total_bal, n_customers,
           CAST(rank() OVER (ORDER BY total_bal DESC, n_name ASC) AS INTEGER) AS bal_rank
         FROM per_nation JOIN nation ON c_nationkey = n_nationkey""",
    "w2_running_total" ->
      """SELECT o_orderkey, o_custkey,
         CAST(row_number() OVER w AS INTEGER) AS order_seq,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
           (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""")
}
