package graft.queries

import graft.Tables._
import graft.ops.{ListRank, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14 batch 7: pointer-doubling list ranking — the canonical
  * O(log n)-round distributed technique for SUCCESSOR-CHAIN data
  * (linked logs, parent/next pointers, version chains), which no
  * built-in covers: a window over the chain is the one shape that
  * cannot distribute (whole list into one task's sort), and a naive
  * walk is O(n) shuffle rounds.
  *
  *  - `x9_list_rank`: build 8 pseudo-random chains over the even
  *    order keys (chain id and in-chain order both md5-derived, so
  *    the pointer structure is opaque to the algorithm and
  *    reconstructible by the oracle), hand [[ListRank.ranks]] ONLY
  *    the (node, succ) pairs, and hash-check every node's computed
  *    distance-to-root against the oracle's window replay.
  *
  * The fixture constructs the chains with a lag window (any planted
  * fixture must manufacture pointers somehow); the OPERATOR consumes
  * nothing but the opaque pair relation — Wyllie doubling, one
  * self-join per round, ceil(log2(longest chain)) rounds, lineage
  * truncated per round, convergence detected on the round's own join
  * (ListRankSpec pins chains/singletons/rootless-cycle refusal;
  * SCALE.md `list_rank` prices doubling vs the single-partition
  * window at three chain lengths).
  */
object Parity71 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "x9_list_rank" -> { (s, d) =>
      val keyed = orders(s, d).filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"))
        .withColumn("m", md5(col("o_orderkey").cast("string")))
        .withColumn("chain",
          TextOps.polyHash60(col("o_orderkey").cast("string")) % 8)
      val w = Window.partitionBy(col("chain"))
        .orderBy(col("m"), col("o_orderkey"))
      val seq = keyed.withColumn("prev", lag(col("o_orderkey"), 1).over(w))
      val links = seq.select(col("o_orderkey").as("node"),
        coalesce(col("prev"), col("o_orderkey")).as("succ"))
      ListRank.ranks(links)
        .join(seq.select(col("o_orderkey"), col("chain")),
          col("node") === col("o_orderkey"))
        .select(col("o_orderkey"), col("chain"),
          col("rank").as("list_rank"))
        .orderBy(col("o_orderkey"))
    },

    // ---- the O(n)-WORK arm, pinned bit-equal ------------------------
    // Same fixture, same oracle: independent-set contraction (splice
    // ~1/4 of the list per round, expand in reverse) — more rounds
    // than Wyllie but geometrically shrinking data, the form that
    // wins once per-round DATA cost dominates the per-round fixed
    // floor (SCALE.md list_rank measures the crossover).
    "x9_list_rank_contract" -> { (s, d) =>
      val keyed = orders(s, d).filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"))
        .withColumn("m", md5(col("o_orderkey").cast("string")))
        .withColumn("chain",
          TextOps.polyHash60(col("o_orderkey").cast("string")) % 8)
      val w = Window.partitionBy(col("chain"))
        .orderBy(col("m"), col("o_orderkey"))
      val seq = keyed.withColumn("prev", lag(col("o_orderkey"), 1).over(w))
      val links = seq.select(col("o_orderkey").as("node"),
        coalesce(col("prev"), col("o_orderkey")).as("succ"))
      ListRank.ranksByContraction(links)
        .join(seq.select(col("o_orderkey"), col("chain")),
          col("node") === col("o_orderkey"))
        .select(col("o_orderkey"), col("chain"),
          col("rank").as("list_rank"))
        .orderBy(col("o_orderkey"))
    },

    // ---- cycle labeling (SCC of a permutation) ----------------------
    // The same 8 md5-shuffled chains CLOSED into cycles (the first
    // element's successor is the chain's last element): a permutation
    // of the even order keys whose strongly connected components ARE
    // the cycles. ListRank.cycleLabels consumes only the opaque
    // (node, succ) pairs; every node must report its cycle's minimum
    // key, which the oracle recomputes as a window MIN per chain.
    "x9_cycle_label" -> { (s, d) =>
      val keyed = orders(s, d).filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"))
        .withColumn("m", md5(col("o_orderkey").cast("string")))
        .withColumn("chain",
          TextOps.polyHash60(col("o_orderkey").cast("string")) % 8)
      val w = Window.partitionBy(col("chain"))
        .orderBy(col("m"), col("o_orderkey"))
      val seq = keyed
        .withColumn("rn", row_number().over(w))
        .withColumn("prev", lag(col("o_orderkey"), 1).over(w))
      val lastk = seq.groupBy(col("chain"))
        .agg(max_by(col("o_orderkey"), col("rn")).as("lastk"))
      val links = seq.join(lastk, Seq("chain"))
        .select(col("o_orderkey").as("node"),
          coalesce(col("prev"), col("lastk")).as("succ"))
      ListRank.cycleLabels(links)
        .join(seq.select(col("o_orderkey"), col("chain")),
          col("node") === col("o_orderkey"))
        .select(col("o_orderkey"), col("chain"),
          col("label").as("scc_id"))
        .orderBy(col("o_orderkey"))
    })

  val oracles: Map[String, String] = Map(
    "x9_list_rank" ->
      s"""SELECT o_orderkey, chain,
            ROW_NUMBER() OVER (PARTITION BY chain
              ORDER BY m, o_orderkey) - 1 AS list_rank
          FROM (SELECT o_orderkey,
                  md5(CAST(o_orderkey AS VARCHAR)) AS m,
                  ${OracleSql.hx15("CAST(o_orderkey AS VARCHAR)")} % 8
                    AS chain
                FROM orders WHERE o_orderkey % 2 = 0)
          ORDER BY o_orderkey""",
    // identical semantics, different algorithm — same replay
    "x9_list_rank_contract" ->
      s"""SELECT o_orderkey, chain,
            ROW_NUMBER() OVER (PARTITION BY chain
              ORDER BY m, o_orderkey) - 1 AS list_rank
          FROM (SELECT o_orderkey,
                  md5(CAST(o_orderkey AS VARCHAR)) AS m,
                  ${OracleSql.hx15("CAST(o_orderkey AS VARCHAR)")} % 8
                    AS chain
                FROM orders WHERE o_orderkey % 2 = 0)
          ORDER BY o_orderkey""",
    "x9_cycle_label" ->
      s"""SELECT o_orderkey, chain,
            MIN(o_orderkey) OVER (PARTITION BY chain) AS scc_id
          FROM (SELECT o_orderkey,
                  ${OracleSql.hx15("CAST(o_orderkey AS VARCHAR)")} % 8
                    AS chain
                FROM orders WHERE o_orderkey % 2 = 0)
          ORDER BY o_orderkey"""
  )
}
