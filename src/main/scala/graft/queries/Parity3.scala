package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Third operator batch: bag-semantics set ops, unpivot/melt, regex
  * extraction, range-frame windows, argmax aggregates, and the Q10
  * shape — completing the relational surface sweep. */
object Parity3 {
  import Exact._
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Bag-semantics set operations (multiplicity-preserving).
    "set_intersect_all" -> { (s, d) =>
      customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
        .intersectAll(
          supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
    },
    "set_except_all" -> { (s, d) =>
      customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
        .exceptAll(
          supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
    },

    // Unpivot / melt: wide stat columns to (metric, value) rows.
    "unpivot_melt" -> { (s, d) =>
      part(s, d)
        .select(col("p_partkey"),
          col("p_size").cast("double").as("size"),
          Exact.dec2(col("p_retailprice")).cast("double").as("retail"))
        .unpivot(
          Array(col("p_partkey")),
          Array(col("size"), col("retail")),
          "metric", "value")
    },

    // Regex extraction + null handling scalar suite.
    "f_regex_null" -> { (s, d) =>
      part(s, d).select(
        col("p_partkey"),
        regexp_extract(col("p_brand"), "Brand#(\\d+)", 1).as("brand_num"),
        regexp_extract(col("p_name"), "^(\\w+)", 1).as("first_word"),
        coalesce(nullif(col("p_type"), lit("PROMO")), lit("(none)"))
          .as("type_or_none"),
        when(col("p_size").isNull, lit(-1)).otherwise(col("p_size"))
          .cast(IntegerType).as("size_nvl"))
    },

    // Range-frame window: trailing-7-epoch-day spend per customer
    // (RANGE frame over an integer ordering key).
    "w4_range_frame" -> { (s, d) =>
      val days = (unix_micros(col("o_orderdate").cast("timestamp")) /
        lit(86400000000L)).cast("long")
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("order_day"))
        .rangeBetween(-7, Window.currentRow)
      orders(s, d)
        .withColumn("order_day", days)
        .select(col("o_orderkey"), col("o_custkey"), col("order_day"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double")
            .as("spend_7d"))
    },

    // argmax/argmin aggregates: each nation's richest customer.
    // Tie-safety: acctbal augmented with the key so the argmax is
    // total (max_by ties are otherwise arbitrary in both engines).
    "a8_argmax" -> { (s, d) =>
      // total-order scalar key: balance-cents (exact) * 1e8 + custkey
      val key = (Exact.dec2(col("c_acctbal")) * 100).cast("long") *
        100000000L + col("c_custkey")
      customer(s, d)
        .groupBy(col("c_nationkey").cast("int").as("nationkey"))
        .agg(
          max_by(col("c_name"), key).as("richest"),
          min_by(col("c_name"), key).as("poorest"),
          max(col("c_acctbal")).as("max_bal"))
    },

    // TPC-H Q10 shape: returned-item revenue per customer, top 20.
    "q10_returned" -> { (s, d) =>
      val l = lineitem(s, d).filter(col("l_returnflag") === "R")
      val o = orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1995-07-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sumExprD(revenue(col("l_extendedprice"), col("l_discount")))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    })

  val oracles: Map[String, String] = Map(
    "set_intersect_all" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
         INTERSECT ALL
         SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier""",
    "set_except_all" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
         EXCEPT ALL
         SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier""",
    "unpivot_melt" ->
      """SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
         UNION ALL
         SELECT p_partkey, 'retail' AS metric,
                CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS value FROM part""",
    "f_regex_null" ->
      """SELECT p_partkey,
         regexp_extract(p_brand, 'Brand#(\d+)', 1) AS brand_num,
         regexp_extract(p_name, '^(\w+)', 1) AS first_word,
         coalesce(nullif(p_type, 'PROMO'), '(none)') AS type_or_none,
         CAST(CASE WHEN p_size IS NULL THEN -1 ELSE p_size END AS INTEGER) AS size_nvl
         FROM part""",
    "w4_range_frame" ->
      """SELECT o_orderkey, o_custkey,
         epoch_us(o_orderdate) // 86400000000 AS order_day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER
           (PARTITION BY o_custkey ORDER BY epoch_us(o_orderdate) // 86400000000
            RANGE BETWEEN 7 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_7d
         FROM orders""",
    "a8_argmax" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nationkey,
         arg_max(c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * 100000000 + c_custkey) AS richest,
         arg_min(c_name, CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) * 100000000 + c_custkey) AS poorest,
         max(c_acctbal) AS max_bal
         FROM customer GROUP BY 1""",
    "q10_returned" ->
      """SELECT c_custkey, c_name,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1995-01-01'
           AND o_orderdate < TIMESTAMP '1995-07-01'
         GROUP BY c_custkey, c_name
         ORDER BY revenue DESC, c_custkey ASC
         LIMIT 20""")
}
