package graft.queries

import graft.Tables._
import graft.ops.{Sessionize, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, IntegerType}

/** Round-2 coverage batch #2: the remaining TPC-H shapes expressible on
  * the testdata star schema (Q4/Q8/Q9/Q11/Q13/Q15/Q19/Q20/Q22 —
  * partsupp-based queries adapted to lineitem), array / higher-order /
  * variant function suites, embedding centroids, a bloom-filter
  * semi-join pre-filter, a BPE-ish regex tokenizer, exact median+mode,
  * and weekly cohort retention.
  *
  * Scale rules as Parity4: dims broadcast, money through exact
  * decimals, orderings total, no collect(), every array output
  * serialized or exploded (the harness compare cannot hash arrays).
  */
object Parity5 {
  import Exact._
  type Q = (SparkSession, String) => DataFrame


  private val d0 = lit(java.math.BigDecimal.ZERO).cast(DecimalType(18, 2))

  val queries: Map[String, Q] = Map(
    // ---- TPC-H shapes -------------------------------------------
    // Q4: EXISTS-correlated count by priority. The correlated EXISTS
    // becomes a left-semi join with the non-equi condition inside the
    // join predicate — one shuffle on orderkey, no row explosion.
    "q4_order_priority" -> { (s, d) =>
      val l = lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
      orders(s, d)
        .join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
    },
    // Q8: market share of one supplier nation within one customer
    // region, per year. Fact side shuffles once (l⋈o); all dims and
    // the customer semi-filter broadcast.
    "q8_market_share" -> { (s, d) =>
      val asiaCust = customer(s, d)
        .join(broadcast(nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppN = supplier(s, d)
        .join(broadcast(nation(s, d)
          .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("sn_key"))
        .select(col("s_suppkey"), col("supp_nation"))
      val rev = revenue(col("l_extendedprice"), col("l_discount"))
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(asiaCust), col("o_custkey") === col("c_custkey"), "left_semi")
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).cast(IntegerType).as("o_year"))
        .agg((sumExprD(when(col("supp_nation") === "NATION_1", rev).otherwise(d0)) /
          sumExprD(rev)).as("mkt_share"))
    },
    // Q9 (adapted: cost = p_retailprice * l_quantity instead of the
    // missing partsupp.ps_supplycost): profit by supplier nation and
    // year. One fact shuffle; part/supplier/nation broadcast.
    "q9_profit" -> { (s, d) =>
      val amount = revenue(col("l_extendedprice"), col("l_discount")) -
        dec2(col("p_retailprice")) * dec2(col("l_quantity"))
      lineitem(s, d)
        .join(orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(part(s, d)), col("l_partkey") === col("p_partkey"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).cast(IntegerType).as("o_year"))
        .agg(sumExprD(amount).as("sum_profit"))
    },
    // Q11 (adapted): part "inventory value" from lineitem; keep parts
    // at > 1.5x the mean per-part value (scale-free selectivity — a
    // fixed fraction-of-total threshold empties as the part count
    // grows). The scalar subquery is a 1-row broadcast, so the
    // threshold compare is map-side.
    "q11_top_value" -> { (s, d) =>
      val value = sum(dec2(col("l_extendedprice")) * dec2(col("l_quantity")))
      val byPart = lineitem(s, d).groupBy(col("l_partkey"))
        .agg(value.as("v"))
      val total = byPart.agg(sum(col("v")).as("tot"), count(lit(1)).as("cnt"))
      byPart.crossJoin(broadcast(total))
        .filter(col("v").cast(DoubleType) >
          col("tot").cast(DoubleType) / col("cnt") * lit(1.5))
        .select(col("l_partkey"), col("v").cast(DoubleType).as("part_value"))
    },
    // Q13: customer order-count distribution — the canonical
    // outer-join + double-aggregation shape.
    "q13_custdist" -> { (s, d) =>
      val o = orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      customer(s, d)
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
    },
    // Q15: supplier(s) with the maximum quarterly revenue. Revenue
    // totals stay decimal end-to-end so the max-equality is exact.
    "q15_top_supplier" -> { (s, d) =>
      val rev = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey"))
        .agg(sum(revenue(col("l_extendedprice"), col("l_discount"))).as("total_rev"))
      val mx = rev.agg(max(col("total_rev")).as("max_rev"))
      rev.crossJoin(broadcast(mx))
        .filter(col("total_rev") === col("max_rev"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("total_rev").cast(DoubleType).as("total_revenue"))
    },
    // Q19: disjunction of brand/size/quantity conjunctions inside the
    // join condition — exercises OR-predicate pushdown + BHJ.
    "q19_disjunctive" -> { (s, d) =>
      val cond = col("l_partkey") === col("p_partkey") && (
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 20)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 30) &&
          col("l_quantity").between(10, 30)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 50) &&
          col("l_quantity").between(20, 40)))
      lineitem(s, d).join(broadcast(part(s, d)), cond)
        .agg(sumExprD(revenue(col("l_extendedprice"), col("l_discount")))
          .as("revenue"), count(lit(1)).as("n_rows"))
    },
    // Q20 (adapted): suppliers who shipped a meaningful quantity of a
    // brand's parts in 1996 — semi-join chain, threshold in decimal.
    "q20_qty_suppliers" -> { (s, d) =>
      val brandParts = part(s, d).filter(col("p_brand") === "Brand#2")
        .select(col("p_partkey"))
      val bigSupp = lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
        .groupBy(col("l_suppkey"))
        .agg(sum(dec2(col("l_quantity"))).as("qty"))
        .filter(col("qty") > 100)
      supplier(s, d)
        .join(bigSupp, col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    },
    // Q22: positive-balance customers above the global average with no
    // high-value order — scalar-subquery threshold (1-row broadcast) +
    // anti-join against the filtered order set.
    "q22_no_orders" -> { (s, d) =>
      val thresh = customer(s, d).filter(col("c_acctbal") > 0)
        .agg((sum(dec2(col("c_acctbal"))).cast(DoubleType) / count(lit(1)))
          .as("avg_bal"))
      customer(s, d).crossJoin(broadcast(thresh))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(orders(s, d).filter(col("o_totalprice") > 300000)
          .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"), sumD(col("c_acctbal")).as("totacctbal"))
    },

    // ---- function suites ----------------------------------------
    // Array functions over the token set; array outputs serialized via
    // array_join (the harness compare cannot hash raw arrays). `st` is
    // a bound column so the tokenize+distinct+sort runs once per row.
    "f_array_suite" -> { (s, d) =>
      documents(s, d).filter(col("doc_id") < 300)
        .select(col("doc_id"),
          array_sort(array_distinct(TextOps.tokens(lower(col("text"))))).as("st"))
        .select(col("doc_id"),
          array_join(slice(col("st"), 1, 3), " ").as("first3"),
          array_position(col("st"), "the").cast(IntegerType).as("pos_the"),
          array_max(col("st")).as("tok_max"),
          array_min(col("st")).as("tok_min"),
          size(col("st")).cast(IntegerType).as("n_distinct"),
          array_contains(col("st"), "and").as("has_and"))
    },
    // Higher-order functions: aggregate / filter / exists / forall /
    // transform, all over bound arrays (nested-HOF trap avoided).
    "f_hof_suite" -> { (s, d) =>
      documents(s, d).filter(col("doc_id") < 300)
        .select(col("doc_id"),
          TextOps.tokens(lower(col("text"))).as("toks"))
        .withColumn("lens", transform(col("toks"), t => length(t).cast("long")))
        .select(col("doc_id"),
          coalesce(aggregate(col("lens"), lit(0L), (a, x) => a + x), lit(0L))
            .as("sum_len"),
          size(filter(col("toks"), t => length(t) > 5)).cast(IntegerType)
            .as("n_long"),
          coalesce(exists(col("toks"), t => t.rlike("[0-9]")), lit(false))
            .as("has_digit"),
          coalesce(forall(col("toks"), t => length(t) < 20), lit(true))
            .as("all_short"),
          coalesce(aggregate(col("lens"), lit(0L), (a, x) => a + x * x), lit(0L))
            .as("sum_sq"))
    },
    // Spark 4 VariantType: parse_json → variant_get path extraction
    // (the schema-flexible cousin of get_json_object; F1/F2 analog).
    "f_variant_json" -> { (s, d) =>
      eventsNs(s, d)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.k", "int").as("k_val"),
          variant_get(col("v"), "$.missing", "string").as("missing_val"))
    },

    // ---- embeddings: per-label exact centroids --------------------
    // posexplode + hash aggregate on (label, idx): the distributed
    // vector-mean (cluster centroid / class prototype) primitive.
    // Float components quantize to decimal(18,6) (same micro-unit
    // scale as ops/Similarity — both engines round these floats to 6
    // decimals identically, unlike scale 12 which sits at the noise
    // floor of the double's 17-digit repr), so the sum is exact and
    // partition-count independent.
    "x3_centroids" -> { (s, d) =>
      embeddings(s, d)
        .select(col("label"), posexplode(col("embedding")))
        .groupBy(col("label"), (col("pos") + 1).cast(IntegerType).as("idx"))
        .agg((sum(col("col").cast(DoubleType).cast(DecimalType(18, 6)))
          .cast(DoubleType) / count(lit(1))).cast(DoubleType).as("centroid"))
    },

    // ---- bloom-filter semi-join ----------------------------------
    // The 100 TB pattern for filtering a fact table by a huge dim-key
    // set: build a bloom filter over the keys (1 small agg), ship the
    // few-KB sketch as a scalar subquery, pre-filter the fact scan
    // map-side, then make the result exact with a real semi-join over
    // the survivors. Spark's BloomFilterAggregate/BloomFilterMightContain
    // (the machinery behind runtime row-level filtering) are not in the
    // public function registry, so we register them as temp functions;
    // might_contain requires its sketch to be a literal or scalar
    // subquery — hence the SQL formulation. Result is exactly the
    // semi-join (the bloom only prunes, the IN makes it exact).
    "x6_bloom_semi" -> { (s, d) =>
      import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_bloom_agg",
        e => new BloomFilterAggregate(e(0), e(1), e(2)), "built-in")
      s.sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_might_contain",
        e => BloomFilterMightContain(e(0), e(1)), "built-in")
      part(s, d).filter(col("p_size") <= 5).select(col("p_partkey"))
        .createOrReplaceTempView("bloom_keys")
      lineitem(s, d).createOrReplaceTempView("lineitem_bf")
      s.sql(
        """WITH bf AS (SELECT graft_bloom_agg(p_partkey, 10000L, 200000L) AS b
                       FROM bloom_keys)
           SELECT count(*) AS n_rows,
                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS sum_price
           FROM lineitem_bf
           WHERE graft_might_contain((SELECT b FROM bf), l_partkey)
             AND l_partkey IN (SELECT p_partkey FROM bloom_keys)""")
    },

    // ---- text: BPE-ish regex tokenizer ---------------------------
    // Letter-runs / single digits / single punctuation — the shape of
    // a byte-pair pre-tokenizer, as one codegen'd regexp_extract_all.
    "x4_bpe_tokens" -> { (s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          regexp_extract_all(lower(col("text")),
            lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)).as("bt"))
        .select(col("doc_id"),
          size(col("bt")).cast(IntegerType).as("n_tokens"),
          size(array_distinct(col("bt"))).cast(IntegerType).as("n_unique"),
          try_element_at(col("bt"), lit(1)).as("tok1"))
    },

    // ---- exact median + mode -------------------------------------
    // Median via row_number against the partition count (exact decimal
    // average of the middle one/two values); mode via count-then-rank
    // with a total tie-break. Both engine-portable — no reliance on
    // percentile/mode built-ins whose interpolation/tie rules differ.
    "x6_median_mode" -> { (s, d) =>
      val li = lineitem(s, d)
        .select(col("l_returnflag").as("rf"), dec2(col("l_quantity")).as("q"))
      // EXACT median + mode from one HISTOGRAM shuffle: quantity has
      // bounded distinct values (1..50), so groupBy(rf, q) map-side
      // combines the fact down to ~|rf|×|q| rows — everything after
      // (cumulative counts, middle-rank lookup, argmax) runs on that
      // tiny histogram. One fact shuffle total, where the previous
      // shape sorted the full fact under a window and scanned it
      // three times. The histogram move applies whenever value
      // cardinality ≪ row count; for unbounded continuous values the
      // rank-window form (see git history) is the fallback.
      val hist = li.groupBy(col("rf"), col("q")).agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("rf")).orderBy(col("q").asc)
      val cum = hist
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(Window.partitionBy(col("rf"))))
      // middle ranks (n+1)/2 and (n+2)/2: the median is the mean of
      // the smallest q values whose cumulative count reaches them
      val med = cum.groupBy(col("rf")).agg(
        ((min(when(col("cum") >= expr("(n+1) DIV 2"), col("q"))) +
          min(when(col("cum") >= expr("(n+2) DIV 2"), col("q"))))
          .cast(DoubleType) / 2).as("median_qty"))
      val mode = hist
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("rf")).orderBy(col("cnt").desc, col("q").asc)))
        .filter(col("rn") === 1)
        .select(col("rf"), col("q").cast(DoubleType).as("mode_qty"))
      med.join(mode, Seq("rf"))
    },

    // ---- events: weekly cohort retention --------------------------
    // distinct (user, week) grid → semi-join against the next week.
    // Two shuffles total (distinct + grouped counts); user activity
    // never leaves integer microsecond space.
    "x5_retention" -> { (s, d) =>
      val uw = eventsNs(s, d)
        .select(col("user_id"), Sessionize.nsToUs(col("ts")).as("us"))
        .select(col("user_id"), expr("us DIV 604800000000").as("wk"))
        .distinct()
      val nxt = uw.select(col("user_id"), (col("wk") - 1).as("wk"))
      val active = uw.groupBy(col("wk")).agg(count(lit(1)).as("n_active"))
      val retained = uw.join(nxt, Seq("user_id", "wk"), "left_semi")
        .groupBy(col("wk")).agg(count(lit(1)).as("n_retained"))
      active.join(retained, Seq("wk"), "left_outer")
        .select(col("wk").as("week"), col("n_active"),
          coalesce(col("n_retained"), lit(0L)).as("n_retained"))
    })

  val oracles: Map[String, String] = Map(
    "q4_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
         FROM orders
         WHERE EXISTS (SELECT 1 FROM lineitem
                       WHERE l_orderkey = o_orderkey
                         AND l_shipdate > o_orderdate)
         GROUP BY o_orderpriority""",
    "q8_market_share" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CASE WHEN n2.n_name = 'NATION_1'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) /
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS mkt_share
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation n2 ON s_nationkey = n2.n_nationkey
         WHERE o_custkey IN (
           SELECT c_custkey FROM customer
           JOIN nation ON c_nationkey = n_nationkey
           JOIN region ON n_regionkey = r_regionkey
           WHERE r_name = 'ASIA')
         GROUP BY 1""",
    "q9_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) -
                    CAST(p_retailprice AS DECIMAL(18,2)) *
                    CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         GROUP BY 1, 2""",
    "q11_top_value" ->
      """WITH bp AS (SELECT l_partkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 CAST(l_quantity AS DECIMAL(18,2))) AS v
           FROM lineitem GROUP BY l_partkey),
         tot AS (SELECT sum(v) AS tot, count(*) AS cnt FROM bp)
         SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
         FROM bp CROSS JOIN tot
         WHERE CAST(v AS DOUBLE) > CAST(tot AS DOUBLE) / cnt * 1.5""",
    "q13_custdist" ->
      """WITH cc AS (SELECT c_custkey, count(o_orderkey) AS c_count
           FROM customer LEFT OUTER JOIN (
             SELECT o_custkey, o_orderkey FROM orders
             WHERE o_orderpriority <> '1-URGENT') o
           ON c_custkey = o_custkey
           GROUP BY c_custkey)
         SELECT c_count, count(*) AS custdist FROM cc GROUP BY c_count""",
    "q15_top_supplier" ->
      """WITH rev AS (SELECT l_suppkey,
             sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                 (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey)
         SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
         FROM rev JOIN supplier ON l_suppkey = s_suppkey
         WHERE total_rev = (SELECT max(total_rev) FROM rev)""",
    "q19_disjunctive" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
           count(*) AS n_rows
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
                AND l_quantity BETWEEN 1 AND 20)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
                AND l_quantity BETWEEN 10 AND 30)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
                AND l_quantity BETWEEN 20 AND 40)""",
    "q20_qty_suppliers" ->
      """SELECT s_suppkey, s_name, s_acctbal
         FROM supplier
         WHERE s_suppkey IN (
           SELECT l_suppkey FROM lineitem
           WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2')
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate <  TIMESTAMP '1997-01-01'
           GROUP BY l_suppkey
           HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 100)""",
    "q22_no_orders" ->
      """WITH t AS (SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) /
             count(*) AS avg_bal
           FROM customer WHERE c_acctbal > 0)
         SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
         FROM customer CROSS JOIN t
         WHERE c_acctbal > avg_bal
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_totalprice > 300000)
         GROUP BY c_nationkey""",
    "f_array_suite" ->
      """WITH b AS (SELECT doc_id,
           list_sort(list_distinct(string_split_regex(trim(lower(text)), '\s+'))) AS st
           FROM documents WHERE doc_id < 300)
         SELECT doc_id,
           array_to_string(st[1:3], ' ') AS first3,
           CAST(coalesce(list_position(st, 'the'), 0) AS INTEGER) AS pos_the,
           list_max(st) AS tok_max,
           list_min(st) AS tok_min,
           CAST(len(st) AS INTEGER) AS n_distinct,
           list_contains(st, 'and') AS has_and
         FROM b""",
    "f_hof_suite" ->
      """WITH b AS (SELECT doc_id,
           string_split_regex(trim(lower(text)), '\s+') AS toks
           FROM documents WHERE doc_id < 300),
         l AS (SELECT doc_id, toks,
           list_transform(toks, t -> CAST(length(t) AS BIGINT)) AS lens FROM b)
         SELECT doc_id,
           CAST(coalesce(list_aggregate(lens, 'sum'), 0) AS BIGINT) AS sum_len,
           CAST(len(list_filter(toks, t -> length(t) > 5)) AS INTEGER) AS n_long,
           coalesce(list_bool_or(list_transform(toks,
             t -> regexp_matches(t, '[0-9]'))), FALSE) AS has_digit,
           coalesce(list_bool_and(list_transform(toks,
             t -> length(t) < 20)), TRUE) AS all_short,
           CAST(coalesce(list_aggregate(list_transform(lens, x -> x * x), 'sum'), 0)
             AS BIGINT) AS sum_sq
         FROM l""",
    "f_variant_json" ->
      """SELECT event_id,
           CAST(props->>'k' AS INTEGER) AS k_val,
           props->>'missing' AS missing_val
         FROM events""",
    "x3_centroids" ->
      """WITH e AS (SELECT label,
             unnest(range(1, len(embedding)+1)) AS idx,
             unnest(embedding) AS v
           FROM embeddings)
         SELECT label, CAST(idx AS INTEGER) AS idx,
           CAST(CAST(sum(CAST(CAST(v AS DOUBLE) AS DECIMAL(18,6))) AS DOUBLE) /
                count(*) AS DOUBLE) AS centroid
         FROM e GROUP BY 1, 2""",
    "x6_bloom_semi" ->
      """SELECT count(*) AS n_rows,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM lineitem
         WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 5)""",
    "x4_bpe_tokens" ->
      """WITH b AS (SELECT doc_id,
           regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\s]') AS bt
           FROM documents)
         SELECT doc_id,
           CAST(len(bt) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(bt)) AS INTEGER) AS n_unique,
           bt[1] AS tok1
         FROM b""",
    "x6_median_mode" ->
      """WITH li AS (SELECT l_returnflag AS rf,
             CAST(l_quantity AS DECIMAL(18,2)) AS q FROM lineitem),
         r AS (SELECT rf, q,
             row_number() OVER (PARTITION BY rf ORDER BY q ASC) AS rn,
             count(*) OVER (PARTITION BY rf) AS n FROM li),
         med AS (SELECT rf, CAST(sum(q) AS DOUBLE) / count(*) AS median_qty
           FROM r WHERE rn = (n+1)//2 OR rn = (n+2)//2 GROUP BY rf),
         c AS (SELECT rf, q, count(*) AS cnt FROM li GROUP BY rf, q),
         m AS (SELECT rf, CAST(q AS DOUBLE) AS mode_qty,
             row_number() OVER (PARTITION BY rf
               ORDER BY cnt DESC, q ASC) AS rn FROM c)
         SELECT med.rf AS rf, med.median_qty, m.mode_qty
         FROM med JOIN m ON med.rf = m.rf AND m.rn = 1""",
    "x5_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
             epoch_us(ts) // 604800000000 AS wk FROM events),
         a AS (SELECT wk, count(*) AS n_active FROM uw GROUP BY wk),
         r AS (SELECT u.wk, count(*) AS n_retained FROM uw u
           WHERE EXISTS (SELECT 1 FROM uw v
             WHERE v.user_id = u.user_id AND v.wk = u.wk + 1)
           GROUP BY u.wk)
         SELECT a.wk AS week, a.n_active,
           coalesce(r.n_retained, 0) AS n_retained
         FROM a LEFT JOIN r ON a.wk = r.wk""")
}
