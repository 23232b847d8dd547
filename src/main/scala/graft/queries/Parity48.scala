package graft.queries

import graft.Tables._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-11 batch 17: data-delivery gap detection — FULL-equality
  * DuckDB oracle.
  *
  *  - `x5_delivery_gaps`: per event type, audit the hourly delivery
  *    calendar — expected hours (the global span spine), observed
  *    hours, missing hours, and the LONGEST consecutive outage
  *    (gaps-and-islands over the missing set — a 3-hour hole pages
  *    someone, 3 scattered holes don't). THE freshness/completeness
  *    monitor every ingestion pipeline runs against its landing
  *    tables; the spine anti-join formulation is the standard
  *    calendar-join shape.
  *
  * Scale posture: observed hours is one map-side-combined distinct
  * per type; the spine is sequence()-generated metadata (span-sized,
  * not event-sized); the anti-join and island windows run on
  * (type × span) rows. At 100 TB the same audit reads partition
  * METADATA (x8_zonemap family) instead of scanning rows — the
  * relational shape is unchanged.
  */
object Parity48 {
  type Q = (SparkSession, String) => DataFrame

  private val NsPerHour = 3600L * 1000000000L

  val queries: Map[String, Q] = Map(
    "x5_delivery_gaps" -> { (s, d) =>
      val obs = eventsNs(s, d)
        .select(col("event_type"), expr(s"ts DIV $NsPerHour").as("hr"))
        .distinct()
      val span = obs.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
      val types = obs.select(col("event_type")).distinct()
      val spine = types.crossJoin(broadcast(span))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"))).as("hr"),
          (col("hi") - col("lo") + 1).as("n_expected"))
      val missing = spine.join(obs, Seq("event_type", "hr"), "left_anti")
      // longest outage: islands over consecutive missing hours
      val isl = missing.withColumn("grp", col("hr") -
          row_number().over(Window.partitionBy(col("event_type"))
            .orderBy(col("hr"))).cast("long"))
        .groupBy(col("event_type"), col("grp"))
        .agg(count(lit(1)).as("run"), min(col("hr")).as("run_start"))
      val worst = isl.groupBy(col("event_type"))
        .agg(max(struct(col("run"), negate(col("run_start")).as("ns")))
          .as("m"))
        .select(col("event_type"), col("m.run").as("longest_outage"),
          negate(col("m.ns")).as("outage_start"))
      val stats = missing.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_missing"),
          min(col("hr")).as("first_missing"))
      spine.select(col("event_type"), col("n_expected")).distinct()
        .join(obs.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_observed")), Seq("event_type"))
        .join(stats, Seq("event_type"), "left")
        .join(worst, Seq("event_type"), "left")
        .select(col("event_type"), col("n_expected"), col("n_observed"),
          coalesce(col("n_missing"), lit(0L)).as("n_missing"),
          col("first_missing"), col("longest_outage"),
          col("outage_start"))
        .orderBy(col("event_type"))
    })

  val oracles: Map[String, String] = Map(
    "x5_delivery_gaps" ->
      s"""WITH obs AS (SELECT DISTINCT event_type,
             epoch_us(ts) * 1000 // $NsPerHour AS hr FROM events),
         span AS (SELECT min(hr) AS lo, max(hr) AS hi FROM obs),
         types AS (SELECT DISTINCT event_type FROM obs),
         spine AS (SELECT t.event_type,
             unnest(generate_series(s.lo, s.hi)) AS hr,
             s.hi - s.lo + 1 AS n_expected
           FROM types t CROSS JOIN span s),
         missing AS (SELECT sp.event_type, sp.hr FROM spine sp
           LEFT JOIN obs o ON sp.event_type = o.event_type
             AND sp.hr = o.hr
           WHERE o.hr IS NULL),
         isl AS (SELECT event_type,
             hr - CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY hr) AS BIGINT) AS grp,
             hr
           FROM missing),
         runs AS (SELECT event_type, grp,
             CAST(count(*) AS BIGINT) AS run, min(hr) AS run_start
           FROM isl GROUP BY event_type, grp),
         worst AS (SELECT event_type,
             max(struct_pack(run := run, ns := -run_start)) AS m
           FROM runs GROUP BY event_type),
         stats AS (SELECT event_type, CAST(count(*) AS BIGINT)
             AS n_missing, min(hr) AS first_missing
           FROM missing GROUP BY event_type),
         base AS (SELECT DISTINCT event_type, n_expected FROM spine),
         ob AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n_observed
           FROM obs GROUP BY event_type)
         SELECT b.event_type, b.n_expected, ob.n_observed,
           coalesce(st.n_missing, 0) AS n_missing, st.first_missing,
           w.m.run AS longest_outage, -w.m.ns AS outage_start
         FROM base b
         JOIN ob ON b.event_type = ob.event_type
         LEFT JOIN stats st ON b.event_type = st.event_type
         LEFT JOIN worst w ON b.event_type = w.event_type
         ORDER BY b.event_type"""
  )
}
