package graft.queries

import graft.Tables._
import graft.ops.{Sessionize, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, IntegerType}

/** Round-2 coverage batch: analytic-window extras, outer/cross/range/
  * shuffle joins, grouping sets, multi-distinct, exact correlation,
  * more TPC-H shapes (Q7/Q12/Q14/Q17), string/JSON function suites,
  * deterministic hash sampling, TF-IDF, sliding event windows, funnel
  * analysis, keep-latest dedup.
  *
  * Scale notes are per-query; the common rules: dimensions broadcast,
  * money math through Exact decimals (bit-stable across partition
  * counts), every ordering fully tie-broken, no collect() anywhere.
  */
object Parity4 {
  import Exact._
  type Q = (SparkSession, String) => DataFrame

  /** events.ts is INT64 epoch-nanos parquet; Spark 4 needs the legacy
    * flag to read it as long (see ExtQueries.eventsNs). */

  private val d0 = lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))

  val queries: Map[String, Q] = Map(
    // ---- window extras -----------------------------------------
    // lead/lag with exact-decimal delta: one shuffle on the partition
    // key, sort within partitions — scales linearly with data.
    "w5_lead_lag" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        lag(dec2(col("o_totalprice")), 1).over(w).cast("double")
          .as("prev_price"),
        lead(dec2(col("o_totalprice")), 1).over(w).cast("double")
          .as("next_price"),
        (dec2(col("o_totalprice")) -
          coalesce(lag(dec2(col("o_totalprice")), 1).over(w), d0))
          .cast("double").as("price_delta"))
    },
    // ntile / percent_rank / cume_dist — rank-arithmetic doubles are
    // deterministic once the ORDER BY is a total order (tie-break on
    // the unique key).
    "w6_ntile_dist" -> { (s, d) =>
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      orders(s, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        ntile(4).over(w).cast(IntegerType).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"))
    },
    // first/last/nth over an unbounded frame.
    "w7_first_last" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      orders(s, d).select(
        col("o_orderkey"), col("o_custkey"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(w).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
    },

    // ---- joins --------------------------------------------------
    // Full outer join with unmatched rows on both sides.
    "j7_full_outer" -> { (s, d) =>
      val c = customer(s, d).filter(col("c_acctbal") < 0)
        .select(col("c_custkey"), col("c_name"))
      val o = orders(s, d).filter(col("o_orderstatus") === "F")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
      c.join(o, col("c_custkey") === col("o_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
          col("c_name"), col("n_orders"))
    },
    // Cross join of two tiny dims (25 x 5) — stays a broadcast nested
    // loop; never do this with a fact table.
    "j8_cross_join" -> { (s, d) =>
      nation(s, d).crossJoin(region(s, d)).select(
        col("n_name"), col("r_name"),
        concat_ws("-", col("n_name"), col("r_name")).as("pair"))
    },
    // Range (non-equi) join against a tiny broadcast band dimension:
    // the scalable pattern for banding/bucketing joins — fact side
    // never shuffles, each row probes the broadcast bands.
    "j9_range_join" -> { (s, d) =>
      import s.implicits._
      val bands = Seq((0.0, 10.0, "low"), (10.0, 25.0, "mid"),
        (25.0, 51.0, "high")).toDF("lo", "hi", "band")
      lineitem(s, d)
        .join(broadcast(bands),
          col("l_quantity") >= col("lo") && col("l_quantity") < col("hi"))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_items"),
          sumD(col("l_quantity")).as("sum_qty"))
    },
    // Fact-to-fact shuffle join (lineitem x orders on orderkey): the
    // one join shape that MUST shuffle at 100 TB — both sides hash-
    // partition on the key; AQE handles skew/coalescing. Aggregation
    // is partial before the final 2-key group.
    "j10_large_smj" -> { (s, d) =>
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"),
          sumExprD(revenue(col("l_extendedprice"), col("l_discount")))
            .as("revenue"))
    },

    // ---- grouping -----------------------------------------------
    "a9_grouping_sets" -> { (s, d) =>
      lineitem(s, d).createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT l_returnflag, l_linestatus,
             CAST(grouping(l_returnflag) AS INT) AS g_rf,
             CAST(grouping(l_linestatus) AS INT) AS g_ls,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             count(*) AS n
           FROM lineitem
           GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                   (l_returnflag), ())""")
    },
    // Several DISTINCT aggregates in one pass (Expand-based plan:
    // rows multiply by the number of distinct groups before the
    // aggregate). Deliberately the built-in formulation for operator
    // coverage; measured alternative for 100 TB: decompose into
    // per-distinct dedup aggregates joined on the group key — 1.5x
    // faster at sf0.1 (1.25 s vs 1.89 s warm) and shuffles each
    // distinct set once instead of Expand'ing the full fact 4x.
    "a10_multi_distinct" -> { (s, d) =>
      // Three distinct-aggregates in one groupBy plan as a single
      // 3x Expand of the fact; here the distinct pair domains are
      // orders of magnitude smaller than the fact ((rf,supp) ~ 3k,
      // (rf,part) ~ 60k at sf0.1), so three separate partial-combined
      // distinct aggregates move ~domain-sized shuffles instead and
      // re-join on the 3-row group key. Each scan reads only its two
      // columns. (With domain ~ fact the Expand form wins — keep both
      // shapes in mind; this is the bounded-domain case.)
      def distinctCount(c: String, as: String) =
        lineitem(s, d).select(col("l_returnflag"), col(c)).distinct()
          .groupBy(col("l_returnflag")).agg(count(lit(1)).as(as))
      val pairs = lineitem(s, d)
        .select(col("l_returnflag"), col("l_suppkey"), col("l_partkey"))
        .groupBy(col("l_returnflag"), col("l_suppkey"), col("l_partkey"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_supp_part"), sum(col("c")).as("n_rows"))
      distinctCount("l_suppkey", "n_supp")
        .join(distinctCount("l_partkey", "n_part"), Seq("l_returnflag"))
        .join(pairs, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_supp"), col("n_part"),
          col("n_supp_part"), col("n_rows"))
        // deterministic output order for the driver's row-order hash
        // (the join rewrite dropped the aggregate's stable order)
        .orderBy(col("l_returnflag"))
    },
    // Exact Pearson correlation recomposed from decimal power sums —
    // order-independent (unlike streaming corr), so results are stable
    // across any partitioning; one map-side-combined aggregation.
    "x6_corr_exact" -> { (s, d) =>
      val q = col("l_quantity").cast(DecimalType(12, 2))
      val p = col("l_extendedprice").cast(DecimalType(12, 2))
      lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).cast("double").as("n"),
          sum(q).cast("double").as("sx"),
          sum(p).cast("double").as("sy"),
          sum(q * q).cast("double").as("sxx"),
          sum(p * p).cast("double").as("syy"),
          sum(q * p).cast("double").as("sxy"))
        .select(col("l_returnflag"),
          // round: the two engines' double pipelines can differ in the
          // last ulp (seen at sf0.001); 12 digits is far beyond the
          // statistical meaning and far above the ulp noise
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
              sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 12)
            .as("corr_qty_price"))
    },

    // ---- TPC-H shapes -------------------------------------------
    // Q7: 6-way snowflake with a symmetric nation-pair predicate;
    // dims broadcast, facts shuffle once each.
    "q7_volume" -> { (s, d) =>
      val n1 = nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer(s, d)), col("o_custkey") === col("c_custkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast(IntegerType).as("l_year"))
        .agg(sumExprD(revenue(col("l_extendedprice"), col("l_discount")))
          .as("revenue"))
    },
    // Q12 shape (adapted: priority class instead of shipmode, which
    // the testdata lacks): join + conditional counts.
    "q12_priority_class" -> { (s, d) =>
      orders(s, d)
        .join(lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          count(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("high_line_count"),
          count(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1))
            .as("low_line_count"))
    },
    // Q14: promo revenue ratio — two exact sums, one double division.
    "q14_promo" -> { (s, d) =>
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
          col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) *
            sumExprD(when(col("p_type") === "PROMO",
              revenue(col("l_extendedprice"), col("l_discount")))
              .otherwise(d0)) /
            sumExprD(revenue(col("l_extendedprice"), col("l_discount"))))
            .as("promo_revenue"))
    },
    // Q17 shape: correlated avg-per-group predicate, decorrelated into
    // a self-aggregation join. The threshold compare is kept in exact
    // integer/decimal space (l_quantity * 5 * cnt < sum) so both
    // engines agree bit-for-bit.
    "q17_small_qty" -> { (s, d) =>
      val p = part(s, d).filter(col("p_brand") === "Brand#1")
        .select(col("p_partkey"))
      val stats = lineitem(s, d).groupBy(col("l_partkey").as("sp_partkey"))
        .agg(sum(dec2(col("l_quantity"))).as("sum_q"),
          count(lit(1)).as("cnt_q"))
      lineitem(s, d)
        .join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(stats, col("l_partkey") === col("sp_partkey"))
        .filter(dec2(col("l_quantity")) * lit(5) * col("cnt_q") < col("sum_q"))
        .agg((sumD(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },

    // ---- function suites ----------------------------------------
    "f_string_suite2" -> { (s, d) =>
      customer(s, d).select(
        col("c_custkey"),
        levenshtein(col("c_name"), lit("Customer#000000000")).as("lev"),
        lpad(col("c_mktsegment"), 12, "*").as("lp"),
        rpad(col("c_mktsegment"), 12, "-").as("rp"),
        reverse(col("c_name")).as("rev"),
        repeat(col("c_mktsegment"), 2).as("rep"),
        translate(col("c_name"), "0123456789", "abcdefghij").as("tr"),
        split_part(col("c_name"), lit("#"), lit(2)).as("sp"),
        instr(col("c_name"), "#").cast(IntegerType).as("pos"),
        substring(col("c_name"), 1, 8).as("sub"))
    },
    // JSON path extraction + JSON construction from a struct.
    "f_json_suite" -> { (s, d) =>
      eventsNs(s, d).select(
        col("event_id"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k_val"),
        to_json(struct(col("user_id"), col("event_type"))).as("js"))
    },

    // ---- sampling / dedup ----------------------------------------
    // Deterministic hash sampling: the reproducible, engine-agnostic
    // alternative to TABLESAMPLE (same rows on any cluster/run).
    "x7_hash_sample" -> { (s, d) =>
      documents(s, d)
        .filter(substring(md5(col("text")), 1, 2) <= "14")
        .select(col("doc_id"), col("lang"), col("source"))
    },
    // Stratified deterministic sample: top-N per stratum by md5.
    "x7_stratified_sample" -> { (s, d) =>
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("text")).asc, col("doc_id").asc)
      documents(s, d)
        .withColumn("rn", row_number().over(w).cast(IntegerType))
        .filter(col("rn") <= 5)
        .select(col("doc_id"), col("lang"), col("rn"))
    },
    // Keep-latest-per-key dedup (the CDC compaction primitive).
    "x1_latest_per_key" -> { (s, d) =>
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    },

    // ---- text: integer-arithmetic TF-IDF top terms ----------------
    // tf, df and the ranking score stay in integer space so the
    // ordering is bit-stable on both engines.
    "x4_tfidf" -> { (s, d) =>
      val toks = documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          explode(TextOps.tokens(lower(col("text")))).as("term"))
        .filter(length(col("term")) >= 3)
      val tf = toks.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("term").asc)
      tf.join(broadcast(dfreq), "term")
        .withColumn("score", expr("tf * 1000000L DIV df_docs"))
        .withColumn("rn", row_number().over(w).cast(IntegerType))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("term"), col("tf"), col("df_docs"),
          col("score"), col("rn"))
    },

    // ---- events: sliding windows + funnel -------------------------
    // Sliding window (1h width / 30m slide): each event lands in
    // exactly two epoch-aligned windows.
    "x5_sliding" -> { (s, d) =>
      val e = eventsNs(s, d).select(
        timestamp_micros(Sessionize.nsToUs(col("ts"))).as("tsc"),
        col("event_type"), col("value"))
      e.groupBy(window(col("tsc"), "1 hour", "30 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sumD(col("value")).as("sum_value"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n_events"), col("sum_value"))
    },
    // Funnel: users whose first view precedes their first click which
    // precedes their first purchase — conditional-min aggregation,
    // single shuffle on user_id.
    "x5_funnel" -> { (s, d) =>
      val us = Sessionize.nsToUs(col("ts"))
      eventsNs(s, d).groupBy(col("user_id"))
        .agg(
          min(when(col("event_type") === "view", us)).as("t_view"),
          min(when(col("event_type") === "click", us)).as("t_click"),
          min(when(col("event_type") === "purchase", us)).as("t_purchase"))
        .filter(col("t_view") < col("t_click") &&
          col("t_click") < col("t_purchase"))
    })

  val oracles: Map[String, String] = Map(
    "w5_lead_lag" ->
      """SELECT o_orderkey, o_custkey,
         CAST(lag(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS prev_price,
         CAST(lead(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w AS DOUBLE) AS next_price,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) -
              coalesce(lag(CAST(o_totalprice AS DECIMAL(18,2)), 1) OVER w,
                       CAST(0 AS DECIMAL(18,2))) AS DOUBLE) AS price_delta
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""",
    "w6_ntile_dist" ->
      """SELECT o_orderkey, o_orderpriority,
         CAST(ntile(4) OVER w AS INTEGER) AS quartile,
         percent_rank() OVER w AS pct_rank,
         cume_dist() OVER w AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice ASC, o_orderkey ASC)""",
    "w7_first_last" ->
      """SELECT o_orderkey, o_custkey,
         first_value(o_orderkey) OVER w AS first_key,
         last_value(o_orderkey) OVER w AS last_key,
         nth_value(o_orderkey, 2) OVER w AS second_key
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
    "j7_full_outer" ->
      """WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_acctbal < 0),
         o AS (SELECT o_custkey, count(*) AS n_orders FROM orders
               WHERE o_orderstatus = 'F' GROUP BY o_custkey)
         SELECT coalesce(c_custkey, o_custkey) AS custkey, c_name, n_orders
         FROM c FULL OUTER JOIN o ON c_custkey = o_custkey""",
    "j8_cross_join" ->
      """SELECT n_name, r_name, n_name || '-' || r_name AS pair
         FROM nation CROSS JOIN region""",
    "j9_range_join" ->
      """WITH bands(lo, hi, band) AS (VALUES (0.0, 10.0, 'low'),
           (10.0, 25.0, 'mid'), (25.0, 51.0, 'high'))
         SELECT band, count(*) AS n_items,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
         GROUP BY band""",
    "j10_large_smj" ->
      """SELECT o_orderstatus, l_linestatus, count(*) AS n_rows,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderstatus, l_linestatus""",
    "a9_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
         CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
         count(*) AS n
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                 (l_returnflag), ())""",
    "a10_multi_distinct" ->
      """SELECT l_returnflag,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT l_partkey) AS n_part,
         count(DISTINCT (l_suppkey, l_partkey)) AS n_supp_part,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "x6_corr_exact" ->
      """WITH s AS (SELECT l_returnflag,
           CAST(count(*) AS DOUBLE) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sy,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS syy,
           CAST(sum(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sxy
           FROM lineitem GROUP BY l_returnflag)
         SELECT l_returnflag,
           round((n * sxy - sx * sy) /
             (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 12)
             AS corr_qty_price
         FROM s""",
    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n1 ON s_nationkey = n1.n_nationkey
         JOIN nation n2 ON c_nationkey = n2.n_nationkey
         WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
         GROUP BY 1, 2, 3""",
    "q12_priority_class" ->
      """SELECT l_linestatus,
         count(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
         count(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY l_linestatus""",
    "q14_promo" ->
      """SELECT 100.0 *
           CAST(sum(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1995-09-01'
           AND l_shipdate <  TIMESTAMP '1995-10-01'""",
    "q17_small_qty" ->
      """WITH stats AS (SELECT l_partkey AS sp_partkey,
             sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_q,
             count(*) AS cnt_q
           FROM lineitem GROUP BY l_partkey)
         SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
         FROM lineitem
         JOIN part ON l_partkey = p_partkey
         JOIN stats ON l_partkey = sp_partkey
         WHERE p_brand = 'Brand#1'
           AND CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt_q < sum_q""",
    "f_string_suite2" ->
      """SELECT c_custkey,
         levenshtein(c_name, 'Customer#000000000') AS lev,
         lpad(c_mktsegment, 12, '*') AS lp,
         rpad(c_mktsegment, 12, '-') AS rp,
         reverse(c_name) AS rev,
         repeat(c_mktsegment, 2) AS rep,
         translate(c_name, '0123456789', 'abcdefghij') AS tr,
         split_part(c_name, '#', 2) AS sp,
         CAST(strpos(c_name, '#') AS INTEGER) AS pos,
         substring(c_name, 1, 8) AS sub
         FROM customer""",
    "f_json_suite" ->
      """SELECT event_id,
         CAST(props->>'k' AS INTEGER) AS k_val,
         to_json(struct_pack(user_id := user_id, event_type := event_type)) AS js
         FROM events""",
    "x7_hash_sample" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE substring(md5(text), 1, 2) <= '14'""",
    "x7_stratified_sample" ->
      """WITH r AS (SELECT doc_id, lang,
           CAST(row_number() OVER (PARTITION BY lang
             ORDER BY md5(text) ASC, doc_id ASC) AS INTEGER) AS rn
           FROM documents)
         SELECT doc_id, lang, rn FROM r WHERE rn <= 5""",
    "x1_latest_per_key" ->
      """WITH r AS (SELECT o_custkey, o_orderkey, o_orderdate,
           row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
           FROM orders)
         SELECT o_custkey, o_orderkey, o_orderdate FROM r WHERE rn = 1""",
    "x4_tfidf" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
           FROM documents WHERE doc_id < 200),
         tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
                WHERE length(term) >= 3 GROUP BY doc_id, term),
         dfreq AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
         scored AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df_docs,
             tf.tf * 1000000 // dfreq.df_docs AS score
           FROM tf JOIN dfreq ON tf.term = dfreq.term),
         ranked AS (SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
             ORDER BY score DESC, term ASC) AS INTEGER) AS rn FROM scored)
         SELECT doc_id, term, tf, df_docs, score, rn FROM ranked WHERE rn <= 3""",
    "x5_sliding" ->
      """WITH e AS (SELECT epoch_us(ts) AS us, event_type, value FROM events),
         w AS (SELECT unnest([(us // 1800000000) * 1800000000,
                              (us // 1800000000) * 1800000000 - 1800000000]) AS ws,
                      event_type, value FROM e)
         SELECT make_timestamp(ws) AS window_start, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM w GROUP BY 1, 2""",
    "x5_funnel" ->
      """SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_purchase
         FROM events GROUP BY user_id
         HAVING t_view < t_click AND t_click < t_purchase""")
}
