package graft.queries

import graft.Tables._
import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 batch 5: the versioned table's CHANGE-CONSUMPTION half.
  * The write protocol (`x1_versioned_merge`/`x1_merge_pruned`), the
  * maintenance jobs (`x1_optimize_roundtrip`/`x1_vacuum_orphans`) and
  * point-in-time reads (`x1_time_travel`) are already in the gate;
  * this row adds the two missing verbs a production lakehouse table
  * speaks — DELETE and table_changes — and hash-checks them THROUGH
  * the protocol (reference: the warehouse's incremental
  * delete+insert loads, `dags/dbt_dag.py` + the staging models,
  * generalized to row-level CDC).
  *
  *  - `x1_change_feed`: build a 4-group key-clustered table (four
  *    contiguous-range append commits) → stats-pruned MERGE of an
  *    update+insert batch confined to group 0's range → stats-pruned
  *    [[VersionedTable.deleteRange]] confined to group 1's range →
  *    [[VersionedTable.changeFeed]] between the pre-merge and
  *    post-delete versions. The feed must contain EXACTLY the planted
  *    update pre/post-image pairs, the inserts, and the deletes —
  *    and both pruned writes must report rewriting exactly ONE group
  *    (pinned as `mrg_rewritten`/`del_rewritten` columns).
  *  - `x1_feed_apply`: CDC-driven incremental view maintenance — a
  *    grouped (count, spend) aggregate maintained by applying the
  *    feed's deltas to the vFrom state, never re-scanning the table,
  *    hash-matched against the oracle's full recompute at vTo. Money
  *    rides as exact integer cents end-to-end (the one decimal→double
  *    conversion step is where the two engines round differently).
  *
  * Scale posture: both writes are O(groups overlapping the batch
  * range), not O(table) (the vtable_prune law); the feed itself skips
  * every group live in BOTH versions — identical files cannot
  * produce a change under the one-row-per-key invariant all write
  * paths preserve — so CDC off a 100 TB table costs O(changed
  * groups) + one keyed join, not a full-table diff.
  * ChangeFeedSpec pins the skip against the naive full diff, the
  * empty-rewrite group drop, and the stats-proven no-op delete.
  */
object Parity69 {
  type Q = (SparkSession, String) => DataFrame

  /** Contiguous base-commit ranges (keys are o_orderkey % 50 == 0,
    * so at the gate's sf0.01 — keys ≤ 14800 — every slice is
    * non-empty and the four groups carry disjoint [min,max] stats). */
  private val Bounds = // lo exclusive, hi inclusive; key 0 exists
    Seq((-1L, 4000L), (4000L, 8000L), (8000L, 12000L), (12000L, Long.MaxValue))

  /** Base fixture shared by every row in this file: the %50 keys
    * committed as four contiguous-range groups (edit ONCE — three
    * queries replay it). Returns (table path, version after build). */
  private def buildBaseTable(s: SparkSession, d: String,
      tag: String): (String, Long) = {
    val target = Scratch.dir("cdf", tag, d)
    Scratch.clean(s, target)
    val src = orders(s, d).filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))
    var v = 0L
    Bounds.foreach { case (lo, hi) =>
      v = VersionedTable.commit(s, target,
        src.filter(col("o_orderkey") > lo && col("o_orderkey") <= hi), v,
        statsCol = Some("o_orderkey"))
    }
    (target, v)
  }

  /** Updates: keys % 150 == 0 (a subset of the table's % 50 keys),
    * price + 100, re-cast so the table's column type is stable. */
  private def updatesBatch(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderkey") % 150 === 0 && col("o_orderkey") <= 4000)
      .select(col("o_orderkey"),
        (col("o_totalprice") + 100).cast("decimal(15,2)")
          .as("o_totalprice"))

  /** Inserts: % 50 == 25 keys — disjoint from the base key set,
    * range-confined to group 0 like the updates. */
  private def insertsBatch(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .filter(col("o_orderkey") % 50 === 25 && col("o_orderkey") <= 4000)
      .select(col("o_orderkey"), col("o_totalprice"))

  /** The feed fixture: base table → range-confined pruned MERGE
    * (updates + inserts) → pruned range DELETE. Returns
    * (table path, vFrom, vTo, mergeRewrites, deleteRewrites). */
  private def buildFeedTable(s: SparkSession, d: String,
      tag: String): (String, Long, Long, Int, Int) = {
    val (target, v) = buildBaseTable(s, d, tag)
    val (_, mrg) = VersionedTable.mergePruned(s, target,
      updatesBatch(s, d).unionByName(insertsBatch(s, d)), "o_orderkey")
    val (vTo, del) =
      VersionedTable.deleteRange(s, target, "o_orderkey", 4001L, 6000L)
    (target, v, vTo, mrg, del)
  }

  val queries: Map[String, Q] = Map(
    "x1_change_feed" -> { (s, d) =>
      val (target, vFrom, vTo, mrg, del) = buildFeedTable(s, d, "feed")
      VersionedTable.changeFeed(s, target, "o_orderkey",
          fromVersion = vFrom, toVersion = vTo)
        .withColumn("mrg_rewritten", lit(mrg.toLong))
        .withColumn("del_rewritten", lit(del.toLong))
        .orderBy(col("o_orderkey"), col("change_type"))
    },

    // ---- CDC-driven incremental view maintenance --------------------
    // The reason a change feed exists: a downstream grouped aggregate
    // maintained by APPLYING the feed's deltas (+post/+insert,
    // -pre/-delete) to the vFrom state — never re-scanning the table —
    // must land on exactly the aggregate a full recompute at vTo
    // yields (the oracle recomputes it relationally). At 100 TB the
    // maintenance job's cost is O(changed rows), not O(table).
    "x1_feed_apply" -> { (s, d) =>
      val (target, vFrom, vTo, _, _) = buildFeedTable(s, d, "apply")
      // money kept as exact integer CENTS end-to-end: the maintained
      // and recomputed aggregates must match to the BIT, and decimal→
      // double conversion is the one step the two engines round
      // differently at this magnitude
      val cents = (Exact.dec2(col("o_totalprice")) * 100).cast("long")
      def grouped(df: DataFrame) = df
        .groupBy((col("o_orderkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"), sum(cents).as("spend_cents"))
      val base = grouped(VersionedTable.read(s, target, Some(vFrom)).get)
      val deltas = VersionedTable
        .changeFeed(s, target, "o_orderkey", vFrom, vTo)
        .groupBy((col("o_orderkey") % 10).as("bucket"))
        .agg(
          sum(when(col("change_type") === "insert", 1L)
            .when(col("change_type") === "delete", -1L)
            .otherwise(0L)).as("dn"),
          sum(when(col("change_type")
              .isin("insert", "update_postimage"), cents)
            .otherwise(-cents)).as("dspend"))
      base.join(deltas, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
            .as("n"),
          (coalesce(col("spend_cents"), lit(0L)) +
            coalesce(col("dspend"), lit(0L))).as("spend_cents"))
        .filter(col("n") > 0)
        .orderBy(col("bucket"))
    },

    // ---- schema evolution THROUGH the commit protocol ----------------
    // Widening the table is just committing wider data: the narrow v1
    // generation and the widened v2 generation coexist as immutable
    // groups, and the reconciling read returns NULL o_orderstatus for
    // pre-widening rows — no table rewrite (the s16/s17 evolution
    // posture, applied through the versioned table's own read path;
    // time travel to v1 keeps the narrow schema, VersionedTableSpec).
    "x1_schema_evolve" -> { (s, d) =>
      val target = Scratch.dir("cdf", "evolve", d)
      Scratch.clean(s, target)
      val narrow = orders(s, d).filter(col("o_orderkey") % 70 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      val wide = orders(s, d).filter(col("o_orderkey") % 70 === 35)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val v1 = VersionedTable.commit(s, target, narrow, 0L,
        statsCol = Some("o_orderkey"))
      VersionedTable.commit(s, target, wide, v1,
        statsCol = Some("o_orderkey"), allowEvolution = true)
      VersionedTable.read(s, target).get
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"))
        .orderBy(col("o_orderkey"))
    },

    // ---- re-clustering OPTIMIZE restores pruning --------------------
    // Interleaved ingest ((key DIV 50) % 4 round-robin) leaves every
    // group's [min,max] spanning the WHOLE key range, so a pruned
    // MERGE degenerates to rewrite-everything (mrg_frag = 4 = all
    // groups). optimizeClustered re-cuts the snapshot into 4 disjoint
    // key spans (n_groups = 4, content hash-preserved), after which
    // the same-shaped range-confined batch touches exactly ONE group
    // (mrg_clustered = 1). Compaction is not enough at 100 TB —
    // CLUSTERED compaction is what keeps upserts O(touched).
    "x1_recluster" -> { (s, d) =>
      val target = Scratch.dir("cdf", "reclu", d)
      Scratch.clean(s, target)
      val src = orders(s, d).filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      var v = 0L
      (0 until 4).foreach { i =>
        v = VersionedTable.commit(s, target,
          src.filter(expr("(o_orderkey DIV 50) % 4") === i), v,
          statsCol = Some("o_orderkey"))
      }
      val (_, mrgFrag) = VersionedTable.mergePruned(s, target,
        updatesBatch(s, d), "o_orderkey")
      val (_, nGroups) = VersionedTable.optimizeClustered(s, target,
        "o_orderkey", Seq(4000L, 8000L, 12000L))
      val (_, mrgClu) = VersionedTable.mergePruned(s, target,
        insertsBatch(s, d), "o_orderkey")
      VersionedTable.read(s, target).get
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("mrg_frag", lit(mrgFrag.toLong))
        .withColumn("n_groups", lit(nGroups.toLong))
        .withColumn("mrg_clustered", lit(mrgClu.toLong))
        .orderBy(col("o_orderkey"))
    },

    // ---- deletion-vector MERGE (merge-on-read) ------------------------
    // The DV form of the pruned MERGE (round-14 verdict item 4): the
    // one range-overlapping group is MASKED (dv_masked = 1, its data
    // files untouched), the batch appends as one group, nothing is
    // rewritten (dv_rewritten = 0) — yet the visible content is
    // row-equal to the copy-on-write merge the x1_recluster oracle
    // replays. Update cost tracked the batch, not the group bytes.
    "x1_merge_dv" -> { (s, d) =>
      val (target, _) = buildBaseTable(s, d, "mdv")
      val (_, masked, rewrote) = VersionedTable.mergeDv(s, target,
        updatesBatch(s, d).unionByName(insertsBatch(s, d)),
        "o_orderkey", maxDvFraction = 0.5)
      VersionedTable.read(s, target).get
        .withColumn("dv_masked", lit(masked.toLong))
        .withColumn("dv_rewritten", lit(rewrote.toLong))
        .orderBy(col("o_orderkey"))
    },

    // ---- checkpointed change-feed TAIL --------------------------------
    // The streaming-SOURCE form of the feed (round-14 verdict item 3):
    // a CdfTail subscription replays the table's whole history in
    // version-bounded batches through a checkpointed offset, applies
    // each batch to a downstream snapshot (never re-scanning the
    // table), and survives a simulated crash BETWEEN apply and commit
    // — the replayed batch re-applies idempotently. Final state must
    // equal the head read; batches_applied pins the bounded-batch
    // count INCLUDING the replay (3 batches + 1 replay).
    "x1_cdf_tail" -> { (s, d) =>
      import graft.streaming.CdfTail
      val (target, _, vTo, _, _) = buildFeedTable(s, d, "tail")
      val ckpt = Scratch.dir("cdf", "tailckpt", d)
      Scratch.clean(s, ckpt)
      var state = VersionedTable.read(s, target, Some(vTo)).get.limit(0)
      var applied = 0L
      var crashed = false
      var done = false
      while (!done) {
        CdfTail.next(s, target, "o_orderkey", ckpt,
            maxVersionsPerBatch = 2) match {
          case None => done = true
          case Some(b) =>
            state = graft.ops.Iter.truncate(
              CdfTail.applyFeed(state, b.feed, "o_orderkey"), None)
            applied += 1
            if (!crashed && b.fromVersion >= 2) crashed = true
            else CdfTail.commit(s, ckpt, b)
        }
      }
      state.withColumn("batches_applied", lit(applied))
        .orderBy(col("o_orderkey"))
    },

    // ---- streaming keyed UPSERT sink ----------------------------------
    // The CDC write side (round-15): three micro-batches land through
    // VersionedSink.upsertBatch (mergeDv per batch — batch-sized
    // sidecars, batchId-tagged), with batch 1 RETRIED mid-stream (the
    // Structured Streaming failure-recovery shape) — the retry is a
    // no-op, so exactly 3 versions exist (n_versions pinned) and the
    // final content is last-write-per-key: batch 2's +500 overrides
    // batch 1's +100 on the %300 keys.
    "x1_stream_upsert" -> { (s, d) =>
      import graft.streaming.VersionedSink
      val target = Scratch.dir("cdf", "supsert", d)
      Scratch.clean(s, target)
      val base = orders(s, d).filter(col("o_orderkey") % 50 === 0)
        .select(col("o_orderkey"), col("o_totalprice"))
      VersionedSink.upsertBatch(s, target, base, 0L, "o_orderkey")
      val b1 = updatesBatch(s, d).unionByName(insertsBatch(s, d))
      VersionedSink.upsertBatch(s, target, b1, 1L, "o_orderkey")
      // the recovery retry: same batchId, must commit nothing
      VersionedSink.upsertBatch(s, target, b1, 1L, "o_orderkey")
      val b2 = orders(s, d)
        .filter(col("o_orderkey") % 300 === 0 && col("o_orderkey") <= 4000)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 500).cast("decimal(15,2)")
            .as("o_totalprice"))
      val v = VersionedSink.upsertBatch(s, target, b2, 2L, "o_orderkey")
      VersionedTable.read(s, target).get
        .withColumn("n_versions", lit(v))
        .orderBy(col("o_orderkey"))
    },

    // ---- end-to-end table REPLICATION ---------------------------------
    // The capstone composing the round's two halves: a CdfTail
    // subscription (bounded batches, crash+replay mid-log) maintains a
    // versioned-table REPLICA through the commit protocol — upserts
    // via the merge-on-read mergeDv (batch-sized sidecars, no group
    // rewrites), deletes via deleteKeys. O(changed rows) per batch off
    // an arbitrarily large source; the replayed batch re-applies
    // content-idempotently (the replica gains versions, never rows).
    "x1_replicate" -> { (s, d) =>
      import graft.streaming.CdfTail
      val (target, _, _, _, _) = buildFeedTable(s, d, "repl")
      val ckpt = Scratch.dir("cdf", "replckpt", d)
      Scratch.clean(s, ckpt)
      val replica = Scratch.dir("cdf", "replica", d)
      Scratch.clean(s, replica)
      var applied = 0L
      var crashed = false
      var done = false
      while (!done) {
        CdfTail.next(s, target, "o_orderkey", ckpt,
            maxVersionsPerBatch = 2) match {
          case None => done = true
          case Some(b) =>
            CdfTail.applyToTable(s, b, replica, "o_orderkey")
            applied += 1
            if (!crashed && b.fromVersion >= 2) crashed = true
            else CdfTail.commit(s, ckpt, b)
        }
      }
      VersionedTable.read(s, replica).get
        .withColumn("batches_applied", lit(applied))
        .orderBy(col("o_orderkey"))
    },

    // ---- relation-integrated indexed scan ------------------------------
    // readRange's Catalyst-native twin (round-15): the snapshot as a
    // standard parquet relation over VTableFileIndex, the BETWEEN
    // arriving as an ordinary DataFrame filter — group skipping
    // happens inside Catalyst's file listing (the scan's numFiles
    // metric proves it: `pruned` pins opened < total), and the read
    // itself is the stock vectorized parquet scan.
    "x1_index_scan" -> { (s, d) =>
      val (target, _) = buildBaseTable(s, d, "idxscan")
      def scannedFiles(df: DataFrame): Long = {
        df.collect()
        df.queryExecution.executedPlan.collectLeaves()
          .flatMap(_.metrics.get("numFiles")).map(_.value).sum
      }
      val total = scannedFiles(
        VersionedTable.readIndexed(s, target, "o_orderkey").get)
      val filtered = VersionedTable.readIndexed(s, target, "o_orderkey")
        .get.filter(col("o_orderkey").between(4500L, 7500L))
      val opened = scannedFiles(filtered)
      filtered.select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("pruned", lit(if (opened < total) 1L else 0L))
        .orderBy(col("o_orderkey"))
    },

    // ---- stats-pruned point/range read -------------------------------
    // The read-side counterpart of mergePruned (the group skipping a
    // DSv2 filter-pushdown binding would do): a range lookup on the
    // 4-group clustered table opens EXACTLY the one group whose stats
    // overlap [4500, 7500] — pinned as groups_opened — then applies
    // the exact row filter.
    "x1_read_pruned" -> { (s, d) =>
      val (target, _) = buildBaseTable(s, d, "rdprune")
      val (df, opened) =
        VersionedTable.readRange(s, target, "o_orderkey", 4500L, 7500L)
      df.get
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("groups_opened", lit(opened.toLong))
        .orderBy(col("o_orderkey"))
    })

  val oracles: Map[String, String] = Map(
    "x1_change_feed" ->
      """WITH upd AS (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 150 = 0 AND o_orderkey <= 4000),
         ins AS (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 50 = 25 AND o_orderkey <= 4000),
         del AS (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 50 = 0
             AND o_orderkey > 4000 AND o_orderkey <= 6000)
         SELECT *, CAST(1 AS BIGINT) AS mrg_rewritten,
                CAST(1 AS BIGINT) AS del_rewritten
         FROM (
           SELECT o_orderkey, o_totalprice,
                  'update_preimage' AS change_type FROM upd
           UNION ALL
           SELECT o_orderkey,
                  CAST(o_totalprice + 100 AS DECIMAL(15,2)),
                  'update_postimage' FROM upd
           UNION ALL
           SELECT o_orderkey, o_totalprice, 'insert' FROM ins
           UNION ALL
           SELECT o_orderkey, o_totalprice, 'delete' FROM del)
         ORDER BY o_orderkey, change_type""",
    "x1_feed_apply" ->
      """WITH final AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 150 = 0 AND o_orderkey <= 4000
                       THEN CAST(o_totalprice + 100 AS DECIMAL(15,2))
                       ELSE o_totalprice END AS p
           FROM orders
           WHERE (o_orderkey % 50 = 0
                  AND NOT (o_orderkey > 4000 AND o_orderkey <= 6000))
              OR (o_orderkey % 50 = 25 AND o_orderkey <= 4000))
         SELECT o_orderkey % 10 AS bucket, COUNT(*) AS n,
                CAST(SUM(CAST(CAST(p AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS spend_cents
         FROM final GROUP BY 1 ORDER BY bucket""",
    "x1_stream_upsert" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 300 = 0 AND o_orderkey <= 4000
                THEN CAST(o_totalprice + 500 AS DECIMAL(15,2))
                WHEN o_orderkey % 150 = 0 AND o_orderkey <= 4000
                THEN CAST(o_totalprice + 100 AS DECIMAL(15,2))
                ELSE o_totalprice END AS o_totalprice,
           CAST(3 AS BIGINT) AS n_versions
         FROM orders
         WHERE o_orderkey % 50 = 0
            OR (o_orderkey % 50 = 25 AND o_orderkey <= 4000)
         ORDER BY o_orderkey""",
    "x1_replicate" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 150 = 0 AND o_orderkey <= 4000
                THEN CAST(o_totalprice + 100 AS DECIMAL(15,2))
                ELSE o_totalprice END AS o_totalprice,
           CAST(4 AS BIGINT) AS batches_applied
         FROM orders
         WHERE (o_orderkey % 50 = 0
                AND NOT (o_orderkey > 4000 AND o_orderkey <= 6000))
            OR (o_orderkey % 50 = 25 AND o_orderkey <= 4000)
         ORDER BY o_orderkey""",
    "x1_merge_dv" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 150 = 0 AND o_orderkey <= 4000
                THEN CAST(o_totalprice + 100 AS DECIMAL(15,2))
                ELSE o_totalprice END AS o_totalprice,
           CAST(1 AS BIGINT) AS dv_masked,
           CAST(0 AS BIGINT) AS dv_rewritten
         FROM orders
         WHERE o_orderkey % 50 = 0
            OR (o_orderkey % 50 = 25 AND o_orderkey <= 4000)
         ORDER BY o_orderkey""",
    "x1_cdf_tail" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 150 = 0 AND o_orderkey <= 4000
                THEN CAST(o_totalprice + 100 AS DECIMAL(15,2))
                ELSE o_totalprice END AS o_totalprice,
           CAST(4 AS BIGINT) AS batches_applied
         FROM orders
         WHERE (o_orderkey % 50 = 0
                AND NOT (o_orderkey > 4000 AND o_orderkey <= 6000))
            OR (o_orderkey % 50 = 25 AND o_orderkey <= 4000)
         ORDER BY o_orderkey""",
    "x1_schema_evolve" ->
      """SELECT o_orderkey, o_totalprice,
           CASE WHEN o_orderkey % 70 = 35 THEN o_orderstatus END
             AS o_orderstatus
         FROM orders WHERE o_orderkey % 35 = 0
         ORDER BY o_orderkey""",
    "x1_recluster" ->
      """SELECT o_orderkey,
           CASE WHEN o_orderkey % 150 = 0 AND o_orderkey <= 4000
                THEN CAST(o_totalprice + 100 AS DECIMAL(15,2))
                ELSE o_totalprice END AS o_totalprice,
           CAST(4 AS BIGINT) AS mrg_frag,
           CAST(4 AS BIGINT) AS n_groups,
           CAST(1 AS BIGINT) AS mrg_clustered
         FROM orders
         WHERE o_orderkey % 50 = 0
            OR (o_orderkey % 50 = 25 AND o_orderkey <= 4000)
         ORDER BY o_orderkey""",
    "x1_index_scan" ->
      """SELECT o_orderkey, o_totalprice,
           CAST(1 AS BIGINT) AS pruned
         FROM orders
         WHERE o_orderkey % 50 = 0
           AND o_orderkey BETWEEN 4500 AND 7500
         ORDER BY o_orderkey""",
    "x1_read_pruned" ->
      """SELECT o_orderkey, o_totalprice,
           CAST(1 AS BIGINT) AS groups_opened
         FROM orders
         WHERE o_orderkey % 50 = 0
           AND o_orderkey BETWEEN 4500 AND 7500
         ORDER BY o_orderkey"""
  )
}
