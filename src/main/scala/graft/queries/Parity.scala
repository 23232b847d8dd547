package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Reference-parity operators (SURVEY.md §2) expressed on the harness
  * testdata so the DuckDB oracle can check them.
  *
  * Each query is a pure (SparkSession, sfDir) => DataFrame; every
  * computed column is aliased identically in the Spark plan and the
  * oracle SQL (driver hash-compares by sorted column name).
  */
object Parity {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // P1 — identity projection (ref: games.sql:9-10 pass-through).
    "p1_identity" -> ((s, d) => region(s, d).select("r_regionkey", "r_name")),

    // P2 — named multi-column projection (ref: seasonal_metrics_agg.sql:21-42).
    "p2_projection" -> ((s, d) =>
      customer(s, d).select("c_custkey", "c_name", "c_mktsegment")),

    // P3 — positional projection + rename + casts, with a skipped
    // column (ref: copy_into_nhl_stats_seasons.sql:7-14 skips $7).
    "p3_rename_cast" -> { (s, d) =>
      val o = orders(s, d)
      o.select(
        col("o_orderkey").as("order_id"),
        col("o_custkey").as("customer_id"),
        col("o_orderdate").cast("date").as("order_date"),
        Exact.dec2(col("o_totalprice")).cast("double").as("total_price"))
      // o_orderstatus / o_orderpriority deliberately skipped
    },

    // P4 — computed load columns: md5 content key + source_file
    // (ref: copy_into_nhl_api_schedules.sql:4-7, F3).
    "p4_computed_load_cols" -> { (s, d) =>
      lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber"),
        md5(concat_ws("|", col("l_orderkey"), col("l_linenumber")))
          .as("unique_key"),
        lit("lineitem.parquet").as("source_file"))
    },

    // P6 + P5 — conditional null-out then all-not-null filter
    // (ref: team_statistics.sql:12-46 division-row cleaning).
    "p6_p5_null_clean" -> { (s, d) =>
      val cleaned = Seq("p_name", "p_brand", "p_type").foldLeft(part(s, d)) {
        (df, c) =>
          df.withColumn(
            c,
            when(upper(col(c)).like("%PROMO%") || upper(col(c)).like("%RED%"), lit(null)).otherwise(col(c)))
      }
      cleaned
        .filter(
          col("p_name").isNotNull && col("p_brand").isNotNull &&
            col("p_type").isNotNull)
        .select("p_partkey", "p_name", "p_brand", "p_type")
    },

    // P7 — incremental NOT-IN predicate, exercised through SQL so
    // Catalyst plans the null-aware anti join (ref: games.sql:11-13).
    "p7_incremental_notin" -> { (s, d) =>
      customer(s, d).createOrReplaceTempView("g_customer")
      orders(s, d).createOrReplaceTempView("g_orders")
      s.sql("""SELECT c_custkey, c_name FROM g_customer
               WHERE c_custkey NOT IN
                 (SELECT o_custkey FROM g_orders WHERE o_totalprice > 450000)""")
    },

    // J1 — lateral flatten / array unnest with position
    // (ref: teams.sql:16-17 LATERAL FLATTEN). 1-based idx to match
    // the oracle's generate_subscripts.
    "j1_explode" -> { (s, d) =>
      embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .select(
          col("vec_id"),
          (col("pos") + 1).as("idx"),
          col("val").cast("double").as("val"))
    },

    // J2 — inner equi-join enriching facts with a small dimension,
    // broadcast (ref: seasonal_metrics_agg.sql:43-45).
    "j2_join_enrich" -> { (s, d) =>
      orders(s, d)
        .join(
          broadcast(customer(s, d)),
          col("o_custkey") === col("c_custkey"),
          "inner")
        .select("o_orderkey", "o_orderstatus", "c_name", "c_mktsegment")
    },

    // J4 — anti-join form of the incremental predicate
    // (ref: games.sql:11-13 executional shape).
    "j4_anti_join" -> { (s, d) =>
      val bigSpenders = orders(s, d)
        .filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey"))
      customer(s, d)
        .join(bigSpenders, Seq("c_custkey"), "left_anti")
        .select("c_custkey", "c_mktsegment")
    },

    // A1 — null-count data-quality gate
    // (ref: hockeyreference_dag.py:141-149 SQLColumnCheckOperator).
    "a1_null_gate" -> { (s, d) =>
      documents(s, d).agg(
        count(lit(1)).as("total_rows"),
        count(when(col("text").isNull, 1)).as("null_text"),
        count(when(col("lang").isNull, 1)).as("null_lang"))
    },

    // A2 + J2/J3 — two dimension joins UNIONed with set semantics
    // (ref: seasonal_metrics_agg.sql:43-73 + UNION at :47).
    "a2_union_distinct" -> { (s, d) =>
      val n = nation(s, d)
      val b1 = customer(s, d)
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .select(
          col("n_name").as("nation"),
          col("c_name").as("entity_name"),
          lit("customer").as("side"))
      val b2 = supplier(s, d)
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(
          col("n_name").as("nation"),
          col("s_name").as("entity_name"),
          lit("supplier").as("side"))
      b1.union(b2).distinct()
    },

    // A3 — md5-content-key dedup; key covers every projected column
    // so dropDuplicates(key) == DISTINCT (ref: copy_into_*.sql md5
    // keys + P7 idempotence).
    "a3_dedup_key" -> { (s, d) =>
      // The content key is a pure function of the projected columns,
      // so dedup-by-key == dedup-by-columns — and deduping FIRST
      // (map-side partial agg collapses each partition to ~|distinct|
      // rows before the shuffle) means md5 runs once per SURVIVOR,
      // not once per input row. Same survivors, same keys; at 100 TB
      // the order flips only when the row is much wider than the
      // 16-byte digest being shuffled.
      lineitem(s, d)
        .select(
          col("l_returnflag"),
          col("l_linestatus"),
          year(col("l_shipdate")).cast(IntegerType).as("ship_year"))
        .dropDuplicates("l_returnflag", "l_linestatus", "ship_year")
        .withColumn(
          "unique_key",
          md5(concat_ws("|", col("l_returnflag"), col("l_linestatus"),
            col("ship_year"))))
        .select("unique_key", "l_returnflag", "l_linestatus", "ship_year")
    },

    // F4-F10 — scalar-function suite: upper/replace/concat/substring/
    // length/CASE/casts (ref: team_statistics.sql:12-25,
    // copy_into_nhl_stats_seasons.sql:7-14, teams.sql:11-15).
    "f_scalar_suite" -> { (s, d) =>
      part(s, d).select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        substring(col("p_brand"), 1, 5).as("brand5"),
        length(col("p_name")).cast(IntegerType).as("name_len"),
        when(col("p_size") >= 25, lit("large"))
          .when(col("p_size") >= 10, lit("medium"))
          .otherwise(lit("small")).as("size_class"),
        col("p_size").cast("long").as("size_l"))
    },

    // S8 — file metadata projection: the hidden _metadata struct is
    // the engine's metadata$filename (ref: copy_into_*.sql S8).
    "s8_file_metadata" -> { (s, d) =>
      lineitem(s, d)
        .groupBy(regexp_extract(col("_metadata.file_name"), "[^/]+$", 0)
          .as("source_file"))
        .agg(count(lit(1)).as("n_rows"))
    },

    // F11-ish — temporal scalar functions on timestamps
    // (ref: nhl_api_dag.py:68 date handling; F10 casts).
    "f_datetime" -> { (s, d) =>
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast(IntegerType).as("o_year"),
        month(col("o_orderdate")).cast(IntegerType).as("o_month"),
        dayofmonth(col("o_orderdate")).cast(IntegerType).as("o_day"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        col("o_orderdate").cast("date").as("order_date"))
    })

  /** DuckDB-dialect oracle SQL, column-name aligned with `queries`. */
  val oracles: Map[String, String] = Map(
    "p1_identity" -> "SELECT r_regionkey, r_name FROM region",
    "p2_projection" -> "SELECT c_custkey, c_name, c_mktsegment FROM customer",
    "p3_rename_cast" ->
      """SELECT o_orderkey AS order_id, o_custkey AS customer_id,
         CAST(o_orderdate AS DATE) AS order_date,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
         FROM orders""",
    "p4_computed_load_cols" ->
      """SELECT l_orderkey, l_linenumber,
         md5(concat_ws('|', l_orderkey, l_linenumber)) AS unique_key,
         'lineitem.parquet' AS source_file FROM lineitem""",
    "p6_p5_null_clean" ->
      """WITH cleaned AS (
           SELECT p_partkey,
             CASE WHEN upper(p_name)  LIKE '%PROMO%' OR upper(p_name)  LIKE '%RED%' THEN NULL ELSE p_name  END AS p_name,
             CASE WHEN upper(p_brand) LIKE '%PROMO%' OR upper(p_brand) LIKE '%RED%' THEN NULL ELSE p_brand END AS p_brand,
             CASE WHEN upper(p_type)  LIKE '%PROMO%' OR upper(p_type)  LIKE '%RED%' THEN NULL ELSE p_type  END AS p_type
           FROM part)
         SELECT p_partkey, p_name, p_brand, p_type FROM cleaned
         WHERE p_name IS NOT NULL AND p_brand IS NOT NULL AND p_type IS NOT NULL""",
    "p7_incremental_notin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)""",
    "j1_explode" ->
      """SELECT vec_id,
         generate_subscripts(embedding, 1) AS idx,
         CAST(unnest(embedding) AS DOUBLE) AS val
         FROM embeddings""",
    "j2_join_enrich" ->
      """SELECT o_orderkey, o_orderstatus, c_name, c_mktsegment
         FROM orders JOIN customer ON o_custkey = c_custkey""",
    "j4_anti_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 400000)""",
    "a1_null_gate" ->
      """SELECT count(*) AS total_rows,
         count(*) FILTER (WHERE text IS NULL) AS null_text,
         count(*) FILTER (WHERE lang IS NULL) AS null_lang
         FROM documents""",
    "a2_union_distinct" ->
      """SELECT n_name AS nation, c_name AS entity_name, 'customer' AS side
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         UNION
         SELECT n_name AS nation, s_name AS entity_name, 'supplier' AS side
         FROM supplier JOIN nation ON s_nationkey = n_nationkey""",
    "a3_dedup_key" ->
      """SELECT DISTINCT
           md5(concat_ws('|', l_returnflag, l_linestatus,
             CAST(year(l_shipdate) AS INTEGER))) AS unique_key,
           l_returnflag, l_linestatus,
           CAST(year(l_shipdate) AS INTEGER) AS ship_year
         FROM lineitem""",
    "f_scalar_suite" ->
      """SELECT p_partkey,
         upper(p_name) AS name_upper,
         regexp_replace(p_type, ' ', '_', 'g') AS type_snake,
         concat_ws('/', p_brand, p_type) AS brand_type,
         substring(p_brand, 1, 5) AS brand5,
         CAST(length(p_name) AS INTEGER) AS name_len,
         CASE WHEN p_size >= 25 THEN 'large'
              WHEN p_size >= 10 THEN 'medium'
              ELSE 'small' END AS size_class,
         CAST(p_size AS BIGINT) AS size_l
         FROM part""",
    "s8_file_metadata" ->
      "SELECT 'lineitem.parquet' AS source_file, count(*) AS n_rows FROM lineitem",
    "f_datetime" ->
      """SELECT o_orderkey,
         CAST(year(o_orderdate) AS INTEGER) AS o_year,
         CAST(month(o_orderdate) AS INTEGER) AS o_month,
         CAST(day(o_orderdate) AS INTEGER) AS o_day,
         date_trunc('month', o_orderdate) AS month_start,
         CAST(o_orderdate AS DATE) AS order_date
         FROM orders""")
}
