package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Second operator batch: semi/exists joins, set operations, grouping
  * sets, selective filter-aggregates, token-level text analytics, and
  * frame-based windows — rounding out the relational surface a user
  * of the engine expects (SURVEY.md §2.3/§2.5 extensions).
  */
object Parity2 {
  import Exact._
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Semi-join — the complement of J4's anti-join (SURVEY §2.3).
    "j5_semi_join" -> { (s, d) =>
      val big = orders(s, d).filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey"))
      customer(s, d).join(big, Seq("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    },

    // Correlated EXISTS through the SQL path (RewritePredicateSubquery).
    "j6_exists_subquery" -> { (s, d) =>
      customer(s, d).createOrReplaceTempView("g2_customer")
      orders(s, d).createOrReplaceTempView("g2_orders")
      s.sql("""SELECT c_custkey, c_mktsegment FROM g2_customer c
               WHERE EXISTS (SELECT 1 FROM g2_orders o
                 WHERE o.o_custkey = c.c_custkey
                   AND o.o_orderstatus = 'F'
                   AND o.o_totalprice > 300000)""")
    },

    // Set operations beyond UNION (SURVEY §2.5 notes none in ref).
    "set_intersect" -> { (s, d) =>
      customer(s, d).select(col("c_nationkey").cast("int").as("nationkey"))
        .intersect(
          supplier(s, d).select(col("s_nationkey").cast("int").as("nationkey")))
    },
    "set_except" -> { (s, d) =>
      val c = customer(s, d)
      c.filter(col("c_acctbal") > 9000)
        .select(col("c_mktsegment"), col("c_nationkey").cast("int").as("nationkey"))
        .except(
          c.filter(col("c_acctbal") < 0)
            .select(col("c_mktsegment"), col("c_nationkey").cast("int").as("nationkey")))
    },

    // Grouping sets: rollup + cube with exact sums. grouping_id
    // disambiguates NULL-as-total from NULL data on both engines.
    "a4_rollup" -> { (s, d) =>
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sumD(col("l_quantity")).as("sum_qty"),
          count(lit(1)).as("n"),
          grouping_id().cast(IntegerType).as("gid"))
    },
    "a5_cube" -> { (s, d) =>
      orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sumD(col("o_totalprice")).as("sum_price"),
          count(lit(1)).as("n"),
          grouping_id().cast(IntegerType).as("gid"))
    },

    // TPC-H Q6 shape: highly selective scan-level predicates, single
    // global aggregate — the pushdown showcase.
    "q6_filter_agg" -> { (s, d) =>
      lineitem(s, d)
        .filter(
          col("l_shipdate") >= lit("1994-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1995-01-01").cast("timestamp") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
        .agg(sumExprD(dec2(col("l_extendedprice")) * dec2(col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n_rows"))
    },

    // GROUP BY + HAVING + join back (TPC-H Q18 shape): post-aggregate
    // filtering, then enriching the surviving keys.
    "q18_having" -> { (s, d) =>
      val bigOrders = lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sumD(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 250)
      bigOrders
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_orderkey"),
          Exact.dec2(col("o_totalprice")).cast("double").as("o_totalprice"),
          col("total_qty"))
    },

    // Token-level text analytics: explode + count + deterministic
    // top-k (X4 at corpus granularity — the word-count of a
    // training-data pipeline).
    "x4_token_topk" -> { (s, d) =>
      documents(s, d)
        .select(explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token").asc)
        .limit(20)
    },

    // Pivot (conditional aggregation): event counts per user bucket x
    // event_type, expressed as a real pivot in Spark and conditional
    // sums in the oracle — identical output columns.
    "a6_pivot" -> { (s, d) =>
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      events(s, d)
        .withColumn("user_bucket", (col("user_id") % 10).cast("int"))
        .groupBy(col("user_bucket"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
    },

    // Sorted collect: deterministic array aggregation (collect_list
    // order is undefined -> sort_array pins it; oracle list_sort).
    "a7_collect_sorted" -> { (s, d) =>
      nation(s, d)
        .join(customer(s, d), col("n_nationkey") === col("c_nationkey"))
        .groupBy(col("n_name"))
        .agg(sort_array(collect_list(col("c_custkey"))).as("ck"))
        .select(col("n_name"),
          concat_ws(",", col("ck")).as("custkeys"),
          size(col("ck")).as("n_customers"))
    },

    // Exact statistical moments: stddev/variance recomposed from
    // exact decimal sums so results are order-independent and match
    // the oracle bit-for-bit (single-pass stddev would drift).
    "x6_moments" -> { (s, d) =>
      val x = dec2(col("l_quantity"))
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(x).cast("double").as("sum_x"),
          sum(x * x).cast("double").as("sum_xx"))
        .select(col("l_returnflag"), col("n"),
          ((col("sum_xx") - col("sum_x") * col("sum_x") / col("n")) /
            (col("n") - 1)).as("var_samp"),
          sqrt((col("sum_xx") - col("sum_x") * col("sum_x") / col("n")) /
            (col("n") - 1)).as("stddev_samp"))
    },

    // Custom physical operator: bounded-heap top-k per key (see
    // graft.plans.TopKPerKey) — semantically identical to the
    // row_number window formulation the oracle uses, but without
    // sorting whole partitions.
    "topk_per_key" -> { (s, d) =>
      graft.plans.TopKPerKey.topKPerKey(
        orders(s, d).select("o_custkey", "o_orderkey", "o_totalprice"),
        Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    },

    // Frame-based moving average over event time (SURVEY §2.5 W-ext).
    "w3_moving_avg" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(-2, Window.currentRow)
      orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        (sum(dec2(col("o_totalprice"))).over(w).cast("double") /
          count(lit(1)).over(w)).cast("double").as("avg3"))
    })

  val oracles: Map[String, String] = Map(
    "j5_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
    "j6_exists_subquery" ->
      """SELECT c_custkey, c_mktsegment FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
           WHERE o.o_custkey = c.c_custkey
             AND o.o_orderstatus = 'F'
             AND o.o_totalprice > 300000)""",
    "set_intersect" ->
      """SELECT CAST(c_nationkey AS INTEGER) AS nationkey FROM customer
         INTERSECT
         SELECT CAST(s_nationkey AS INTEGER) AS nationkey FROM supplier""",
    "set_except" ->
      """SELECT c_mktsegment, CAST(c_nationkey AS INTEGER) AS nationkey
         FROM customer WHERE c_acctbal > 9000
         EXCEPT
         SELECT c_mktsegment, CAST(c_nationkey AS INTEGER) AS nationkey
         FROM customer WHERE c_acctbal < 0""",
    "a4_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         count(*) AS n,
         CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS INTEGER) AS gid
         FROM lineitem
         GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
    "a5_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
         count(*) AS n,
         CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS INTEGER) AS gid
         FROM orders
         GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
    "q6_filter_agg" ->
      """SELECT
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
         count(*) AS n_rows
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1994-01-01'
           AND l_shipdate < TIMESTAMP '1995-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q18_having" ->
      """SELECT c_name, o_orderkey,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
         total_qty
         FROM (SELECT l_orderkey,
                 CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
               FROM lineitem GROUP BY l_orderkey
               HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > 250)
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey""",
    "a6_pivot" -> """
      SELECT CAST(user_id % 10 AS INTEGER) AS user_bucket,
        count(*) FILTER (WHERE event_type = 'click') AS click,
        count(*) FILTER (WHERE event_type = 'view') AS view,
        count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
        count(*) FILTER (WHERE event_type = 'signup') AS signup,
        count(*) FILTER (WHERE event_type = 'error') AS error
      FROM events GROUP BY 1""",
    "a7_collect_sorted" -> """
      SELECT n_name,
             array_to_string(list_sort(list(c_custkey)), ',') AS custkeys,
             CAST(count(*) AS INTEGER) AS n_customers
      FROM nation JOIN customer ON n_nationkey = c_nationkey
      GROUP BY n_name""",
    "x6_moments" -> """
      WITH s AS (
        SELECT l_returnflag, count(*) AS n,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_x,
          CAST(sum(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_xx
        FROM lineitem GROUP BY l_returnflag)
      SELECT l_returnflag, n,
        (sum_xx - sum_x * sum_x / n) / (n - 1) AS var_samp,
        sqrt((sum_xx - sum_x * sum_x / n) / (n - 1)) AS stddev_samp
      FROM s""",
    "topk_per_key" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
           FROM orders)
         WHERE rn <= 3""",
    "x4_token_topk" ->
      """WITH t AS (
           SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
           FROM documents)
         SELECT token, count(*) AS n FROM t
         GROUP BY token ORDER BY n DESC, token ASC LIMIT 20""",
    "w3_moving_avg" ->
      """SELECT o_orderkey, o_custkey,
         CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) /
              count(*) OVER w AS DOUBLE) AS avg3
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
           ORDER BY o_orderdate ASC, o_orderkey ASC
           ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""")
}
