package graft.queries

import graft.Tables._
import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 batch 9: the two remaining table-management verbs a
  * production lakehouse speaks — RESTORE and SHALLOW CLONE — both
  * metadata-only commits through the versioned-table protocol
  * (reference: the warehouse's Snowflake substrate exposes the same
  * verbs as `UNDROP`/time-travel restore and zero-copy cloning;
  * its incremental loads are the tables these verbs manage,
  * `dags/dbt_dag.py`, `include/sql/copy_into_*.sql`).
  *
  *  - `x1_restore`: base commit → MERGE (updates + inserts) → range
  *    DELETE → [[VersionedTable.restore]] back to the post-merge
  *    version. The head read must be EXACTLY the merged state — the
  *    deleted range resurfaces, the rollback is itself a new version
  *    (pinned as `head_version` = 4) and no data was staged or moved
  *    to get there (VersionedTableSpec pins the metadata-only
  *    property and the vacuum re-pinning).
  *  - `x1_clone_shallow`: 4-group key-clustered source →
  *    [[VersionedTable.cloneShallow]] → range-confined pruned MERGE
  *    into the CLONE. The clone diverges (planted +1000 on one key
  *    span), the source must read back UNCHANGED, the pruned merge
  *    must have rewritten exactly ONE group (`clone_rewrites` — key
  *    stats carry over the clone boundary), and at clone time the
  *    clone held ZERO local data groups (`local_groups_at_clone` —
  *    the zero-copy property, measured from the filesystem).
  *
  * Scale posture: both verbs cost O(live groups) metadata + one
  * log-entry CAS regardless of table size — "roll back the bad
  * backfill" and "give the experiment a writable branch" are O(1)
  * operations on a 100 TB table. SCALE.md's restore_clone block
  * measures the flat-vs-table-size law.
  */
object Parity76 {
  type Q = (SparkSession, String) => DataFrame

  /** Same contiguous spans as Parity69: four range-disjoint base
    * commits so group stats make pruning decidable. */
  private val Bounds =
    Seq((-1L, 4000L), (4000L, 8000L), (8000L, 12000L), (12000L, Long.MaxValue))

  private def baseRows(s: SparkSession, d: String): DataFrame =
    orders(s, d).filter(col("o_orderkey") % 50 === 0)
      .select(col("o_orderkey"), col("o_totalprice"))

  val queries: Map[String, Q] = Map(
    // ---- RESTORE TABLE TO VERSION ----------------------------------
    "x1_restore" -> { (s, d) =>
      val target = Scratch.dir("rst", "restore", d)
      Scratch.clean(s, target)
      val v1 = VersionedTable.commit(s, target, baseRows(s, d), 0L,
        statsCol = Some("o_orderkey"))
      val updates = orders(s, d)
        .filter(col("o_orderkey") % 150 === 0 && col("o_orderkey") <= 4000)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 100).cast("decimal(15,2)")
            .as("o_totalprice"))
      val inserts = orders(s, d)
        .filter(col("o_orderkey") % 50 === 25 && col("o_orderkey") <= 4000)
        .select(col("o_orderkey"), col("o_totalprice"))
      val v2 = VersionedTable.merge(s, target,
        updates.unionByName(inserts), "o_orderkey")
      VersionedTable.deleteRange(s, target, "o_orderkey", 4001L, 6000L)
      val v4 = VersionedTable.restore(s, target, v2)
      VersionedTable.read(s, target).get
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("head_version", lit(v4))
        .orderBy(col("o_orderkey"))
    },

    // ---- SHALLOW CLONE + independent divergence --------------------
    "x1_clone_shallow" -> { (s, d) =>
      val src = Scratch.dir("rst", "clonesrc", d)
      val dst = Scratch.dir("rst", "clonedst", d)
      Scratch.clean(s, src); Scratch.clean(s, dst)
      var v = 0L
      Bounds.foreach { case (lo, hi) =>
        v = VersionedTable.commit(s, src,
          baseRows(s, d)
            .filter(col("o_orderkey") > lo && col("o_orderkey") <= hi), v,
          statsCol = Some("o_orderkey"))
      }
      // cloneShallow requires an absolute source path (a relative ref
      // would resolve against the clone's own data dir)
      val srcAbs = new java.io.File(src).getAbsolutePath
      VersionedTable.cloneShallow(s, srcAbs, dst)
      // zero-copy pin: at clone time the clone owns NO local data
      val dataDir = new java.io.File(dst, "data")
      val localAtClone =
        Option(dataDir.list()).map(_.length.toLong).getOrElse(0L)
      // diverge the CLONE on one key span — stats carried over the
      // clone boundary must confine the rewrite to that span's group
      val bump = orders(s, d)
        .filter(col("o_orderkey") % 50 === 0 &&
          col("o_orderkey") > 8000 && col("o_orderkey") <= 12000)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 1000).cast("decimal(15,2)")
            .as("o_totalprice"))
      val (_, rewrites) =
        VersionedTable.mergePruned(s, dst, bump, "o_orderkey")
      val srcHead = VersionedTable.read(s, srcAbs).get
        .select(col("o_orderkey"), col("o_totalprice").as("src_price"))
      val cloneHead = VersionedTable.read(s, dst).get
        .select(col("o_orderkey"), col("o_totalprice").as("clone_price"))
      srcHead.join(cloneHead, Seq("o_orderkey"), "full_outer")
        .select(col("o_orderkey"), col("src_price"), col("clone_price"),
          (!(col("src_price") <=> col("clone_price")))
            .cast("int").as("diverged"))
        .withColumn("clone_rewrites", lit(rewrites.toLong))
        .withColumn("local_groups_at_clone", lit(localAtClone))
        .orderBy(col("o_orderkey"))
    },

    // ---- OPTIMISTIC REBASE: merge over a disjoint concurrent append
    // The common 100 TB race — a MERGE running while append-ingest
    // lands elsewhere in the keyspace — resolved by LOGICAL conflict
    // detection: the merge pins snapshot v4, an append (key-disjoint
    // from everything the merge reads or writes) lands as v5, and
    // mergePrunedRebase folds it into its own replace entry instead
    // of throwing — one metadata CAS, zero data movement, pinned as
    // exactly one rebase + one rewritten group.
    "x1_merge_rebase" -> { (s, d) =>
      val target = Scratch.dir("rst", "rebase", d)
      Scratch.clean(s, target)
      var v = 0L
      Bounds.foreach { case (lo, hi) =>
        v = VersionedTable.commit(s, target,
          baseRows(s, d)
            .filter(col("o_orderkey") > lo && col("o_orderkey") <= hi), v,
          statsCol = Some("o_orderkey"))
      }
      // interloper: lands AFTER the merge's pinned snapshot, keys
      // disjoint from the merge's touched span (8000, 12000]
      VersionedTable.commit(s, target,
        orders(s, d)
          .filter(col("o_orderkey") % 50 === 25 && col("o_orderkey") <= 4000)
          .select(col("o_orderkey"), col("o_totalprice")),
        v, statsCol = Some("o_orderkey"))
      val bump = orders(s, d)
        .filter(col("o_orderkey") % 50 === 0 &&
          col("o_orderkey") > 8000 && col("o_orderkey") <= 12000)
        .select(col("o_orderkey"),
          (col("o_totalprice") + 1000).cast("decimal(15,2)")
            .as("o_totalprice"))
      val (cv, rewrites, rebases) = VersionedTable.mergePrunedRebase(
        s, target, bump, "o_orderkey", fromVersion = Some(v))
      VersionedTable.read(s, target).get
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("head_version", lit(cv))
        .withColumn("rewrites", lit(rewrites.toLong))
        .withColumn("rebases", lit(rebases.toLong))
        .orderBy(col("o_orderkey"))
    },

    // ---- COLUMN MAPPING: metadata-only RENAME + DROP ---------------
    // Schema changes on a 100 TB table must not rewrite data: rename
    // o_totalprice→price and drop o_orderstatus are two pure-metadata
    // commits; the pre-rename generation maps at read time, the
    // post-rename append writes the new name physically, and the
    // reconciling read unions both generations under the logical
    // schema (VersionedTableSchemaSpec pins metadata-only, era-true
    // time travel, expiry/restore/clone carry).
    "x1_rename_drop" -> { (s, d) =>
      val target = Scratch.dir("rst", "rendrop", d)
      Scratch.clean(s, target)
      val v1 = VersionedTable.commit(s, target,
        orders(s, d).filter(col("o_orderkey") % 50 === 0)
          .select(col("o_orderkey"), col("o_totalprice"),
            col("o_orderstatus")), 0L)
      val v2 = VersionedTable.renameColumn(s, target,
        "o_totalprice", "price")
      val v3 = VersionedTable.dropColumn(s, target, "o_orderstatus")
      val v4 = VersionedTable.commit(s, target,
        orders(s, d)
          .filter(col("o_orderkey") % 50 === 25 && col("o_orderkey") <= 4000)
          .select(col("o_orderkey"), col("o_totalprice").as("price")), v3)
      VersionedTable.read(s, target).get
        .select(col("o_orderkey"), col("price"))
        .withColumn("head_version", lit(v4))
        .orderBy(col("o_orderkey"))
    },

    // ---- DELETION VECTORS: point delete without rewrite ------------
    // GDPR-delete on a 100 TB table: deleting k rows costs k-row key
    // sidecars on the stats-overlapping groups, not a rewrite of
    // every touched multi-GB group. The range-confined delete pins
    // exactly ONE vectored group (dv_groups); the later pruned upsert
    // of a subset of the deleted keys rewrites that group from its
    // MASKED rows — the upserted keys resurrect (+77), the rest stay
    // deleted (DeletionVectorSpec pins the full protocol interplay).
    "x1_delete_vectors" -> { (s, d) =>
      val target = Scratch.dir("rst", "dv", d)
      Scratch.clean(s, target)
      var v = 0L
      Bounds.foreach { case (lo, hi) =>
        v = VersionedTable.commit(s, target,
          baseRows(s, d)
            .filter(col("o_orderkey") > lo && col("o_orderkey") <= hi), v,
          statsCol = Some("o_orderkey"))
      }
      val (_, dvGroups) = VersionedTable.deleteKeys(s, target,
        orders(s, d)
          .filter(col("o_orderkey") % 250 === 0 && col("o_orderkey") <= 4000)
          .select(col("o_orderkey")), "o_orderkey")
      val (_, rewrites) = VersionedTable.mergePruned(s, target,
        orders(s, d)
          .filter(col("o_orderkey") % 500 === 0 && col("o_orderkey") <= 4000)
          .select(col("o_orderkey"),
            (col("o_totalprice") + 77).cast("decimal(15,2)")
              .as("o_totalprice")), "o_orderkey")
      VersionedTable.read(s, target).get
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("dv_groups", lit(dvGroups.toLong))
        .withColumn("rewrites", lit(rewrites.toLong))
        .orderBy(col("o_orderkey"))
    },

    // ---- CHECK constraints: write-time row gate ---------------------
    // ALTER TABLE ADD CONSTRAINT as a metadata commit riding the
    // schema state: the valid append lands, the violating batch
    // (negated prices) is REFUSED naming the constraint — pinned as
    // refused=1 — and the refused batch leaves no version behind
    // (head_version = 3). VersionedTableSchemaSpec pins the full
    // contract (existing-data validation, merge gating, unresolvable
    // batches, internal-rewrite skip, dropCheck).
    "x1_check_constraint" -> { (s, d) =>
      val target = Scratch.dir("rst", "check", d)
      Scratch.clean(s, target)
      VersionedTable.commit(s, target, baseRows(s, d), 0L,
        statsCol = Some("o_orderkey"))
      VersionedTable.addCheck(s, target, "price_pos",
        "o_totalprice >= 0")
      val v3 = VersionedTable.commit(s, target,
        orders(s, d)
          .filter(col("o_orderkey") % 50 === 25 && col("o_orderkey") <= 4000)
          .select(col("o_orderkey"), col("o_totalprice")), 2L,
        statsCol = Some("o_orderkey"))
      val refused =
        try {
          VersionedTable.commit(s, target,
            orders(s, d)
              .filter(col("o_orderkey") % 50 === 25 &&
                col("o_orderkey") > 4000 && col("o_orderkey") <= 8000)
              .select(col("o_orderkey"),
                (-col("o_totalprice")).cast("decimal(15,2)")
                  .as("o_totalprice")), v3,
            statsCol = Some("o_orderkey"))
          0L
        } catch {
          case e: IllegalArgumentException
              if e.getMessage.contains("price_pos") => 1L
        }
      VersionedTable.read(s, target).get
        .select(col("o_orderkey"), col("o_totalprice"))
        .withColumn("head_version",
          lit(VersionedTable.currentVersion(s, target)))
        .withColumn("refused", lit(refused))
        .orderBy(col("o_orderkey"))
    })

  val oracles: Map[String, String] = Map(
    "x1_restore" ->
      """WITH base AS (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 50 = 0),
         merged AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 150 = 0 AND o_orderkey <= 4000
                       THEN CAST(o_totalprice + 100 AS DECIMAL(15,2))
                       ELSE o_totalprice END AS o_totalprice
           FROM base
           UNION ALL
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 50 = 25 AND o_orderkey <= 4000)
         SELECT o_orderkey, o_totalprice,
                CAST(4 AS BIGINT) AS head_version
         FROM merged ORDER BY o_orderkey""",
    "x1_clone_shallow" ->
      """SELECT o_orderkey,
                o_totalprice AS src_price,
                CASE WHEN o_orderkey > 8000 AND o_orderkey <= 12000
                     THEN CAST(o_totalprice + 1000 AS DECIMAL(15,2))
                     ELSE o_totalprice END AS clone_price,
                CAST(CASE WHEN o_orderkey > 8000 AND o_orderkey <= 12000
                     THEN 1 ELSE 0 END AS INTEGER) AS diverged,
                CAST(1 AS BIGINT) AS clone_rewrites,
                CAST(0 AS BIGINT) AS local_groups_at_clone
         FROM orders WHERE o_orderkey % 50 = 0
         ORDER BY o_orderkey""",
    "x1_merge_rebase" ->
      """WITH merged AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey > 8000 AND o_orderkey <= 12000
                       THEN CAST(o_totalprice + 1000 AS DECIMAL(15,2))
                       ELSE o_totalprice END AS o_totalprice
           FROM orders WHERE o_orderkey % 50 = 0
           UNION ALL
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 50 = 25 AND o_orderkey <= 4000)
         SELECT o_orderkey, o_totalprice,
                CAST(6 AS BIGINT) AS head_version,
                CAST(1 AS BIGINT) AS rewrites,
                CAST(1 AS BIGINT) AS rebases
         FROM merged ORDER BY o_orderkey""",
    "x1_rename_drop" ->
      """SELECT o_orderkey, price, CAST(4 AS BIGINT) AS head_version
         FROM (
           SELECT o_orderkey, o_totalprice AS price FROM orders
           WHERE o_orderkey % 50 = 0
           UNION ALL
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_orderkey % 50 = 25 AND o_orderkey <= 4000)
         ORDER BY o_orderkey""",
    "x1_delete_vectors" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderkey % 500 = 0 AND o_orderkey <= 4000
                     THEN CAST(o_totalprice + 77 AS DECIMAL(15,2))
                     ELSE o_totalprice END AS o_totalprice,
                CAST(1 AS BIGINT) AS dv_groups,
                CAST(1 AS BIGINT) AS rewrites
         FROM orders
         WHERE o_orderkey % 50 = 0
           AND NOT (o_orderkey % 250 = 0 AND o_orderkey <= 4000
                    AND o_orderkey % 500 <> 0)
         ORDER BY o_orderkey""",
    "x1_check_constraint" ->
      """SELECT o_orderkey, o_totalprice,
                CAST(3 AS BIGINT) AS head_version,
                CAST(1 AS BIGINT) AS refused
         FROM orders
         WHERE o_orderkey % 50 = 0
            OR (o_orderkey % 50 = 25 AND o_orderkey <= 4000)
         ORDER BY o_orderkey"""
  )
}
