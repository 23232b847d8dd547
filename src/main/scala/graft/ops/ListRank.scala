package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed LIST RANKING by pointer doubling (Wyllie's algorithm) —
  * the canonical O(log n)-round technique for successor-chain data
  * (linked logs, parent pointers, next-version chains) that no
  * built-in operator covers: a window over the chain would move the
  * WHOLE list into one task's sort, and a naive walk is O(n) rounds.
  *
  * Input: (node, succ) pairs forming chains that terminate at root
  * self-loops (succ = node). Output: (node, rank) where rank is the
  * node's distance to its chain's root.
  *
  * Each round squares every pointer: node's pointer jumps to its
  * pointer's pointer and accumulates that hop's distance — after k
  * rounds every pointer has jumped 2^k links, so ceil(log2(longest
  * chain)) rounds finish regardless of how many chains there are.
  * Root rows are ABSORBING ((root, root, 0): joining through them
  * adds zero and leaves the pointer parked), which is what makes the
  * fixed-point detectable as "every pointer parked on a root".
  *
  * Scale shape: one self-join per round, both sides the same n-row
  * relation shuffled on the join key; lineage truncated per round
  * ([[Iter.truncate]]); convergence checked by one count per round.
  * 100 TB: n rows per round × log2(n) rounds, each a plain keyed
  * shuffle — contrast with the single-partition window, which is the
  * one shape that CANNOT distribute (SCALE.md `list_rank` prices
  * both arms).
  */
object ListRank {

  /** @param links (node, succ) long pairs; roots are self-loops.
    * @param maxRounds hard bound (2^64 links is unreachable, so 64
    *   is "until converged" with a runaway guard). */
  def ranks(links: DataFrame, checkpointDir: Option[String] = None,
      maxRounds: Int = 64): DataFrame = {
    // after k rounds every pointer has jumped 2^k links, and no chain
    // is longer than the relation itself — so ceil(log2 n) rounds
    // suffice UNCONDITIONALLY, and the loop needs no per-round
    // convergence action (half the jobs): one n-count up front, one
    // parked-check at the end (which doubles as the rootless-cycle
    // refusal — a cycle never parks).
    // truncate the input once: the dangling check, the n-count, and
    // the loop's round 0 all reference it, and an expensive upstream
    // plan (window-built fixtures) must not re-execute per reference
    val lk = Iter.truncate(links.select(col("node"), col("succ")),
      checkpointDir)
    val n = lk.count()
    // refuse DANGLING pointers up front (succ values that are not
    // nodes): the self-join would silently DROP such rows mid-
    // iteration — surviving nodes would "converge" with wrong ranks
    // and the vanished ones would just be missing from the output
    val dangling = lk.as("x").join(lk.as("y"),
      col("x.succ") === col("y.node"), "left_anti").count()
    require(dangling == 0,
      s"$dangling dangling successor pointer(s): succ values that are " +
        "not nodes")
    val bound =
      if (n <= 1) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(n - 1) // ceil(log2 n)
    val rounds = math.min(bound, maxRounds)
    // state: (node, ptr, dist); roots start parked at dist 0
    var state = lk.select(col("node"), col("succ").as("ptr"),
      when(col("succ") === col("node"), lit(0L)).otherwise(lit(1L))
        .as("dist"))
    (0 until rounds).foreach { _ =>
      val jumped = state.as("a")
        .join(state.as("b"), col("a.ptr") === col("b.node"))
        .select(col("a.node").as("node"), col("b.ptr").as("ptr"),
          (col("a.dist") + col("b.dist")).as("dist"))
      state = Iter.truncate(jumped, checkpointDir)
    }
    // parked ⟺ the pointer sits on a root ⟺ one more jump would add
    // 0 (only roots carry dist 0 — non-root dist starts at 1 and
    // never shrinks). One join-count, once — not per round.
    val pending = state.as("s")
      .join(state.as("t"), col("s.ptr") === col("t.node"))
      .filter(col("t.dist") =!= 0L).count()
    require(pending == 0,
      s"list ranking did not converge in $rounds rounds " +
        "(rootless cycle in the input, or maxRounds too low)")
    state.select(col("node"), col("dist").as("rank"))
  }

  /** List ranking by INDEPENDENT-SET CONTRACTION (the O(n)-WORK form,
    * JaJa §3; [[ranks]] is Wyllie doubling, O(n log n) work at
    * O(log n) depth): per round, a deterministic per-round coin
    * (hash parity of (node, round)) selects every non-root node whose
    * coin is heads and whose successor's coin is tails — no two
    * ADJACENT nodes can both be selected, so splicing them out is a
    * single-hop pointer fix: each survivor pointing at a spliced node
    * re-points to the spliced node's successor and absorbs its link
    * weight. ~1/4 of the list contracts per round; total touched rows
    * across all rounds telescope to O(n). The spliced sets are then
    * EXPANDED in reverse round order — rank(v) = rank(successor at
    * splice time) + absorbed weight — each expansion a join sized by
    * that round's splice set.
    *
    * Trade vs [[ranks]]: ~2·log_{4/3}(n) rounds (contract + expand)
    * against Wyllie's log2(n), but geometrically SHRINKING data per
    * round against Wyllie's constant n — work-bound beats depth-bound
    * once n is large enough that per-round data cost dominates the
    * per-round fixed floor (SCALE.md `list_rank` measures the
    * crossover). Works on in-trees like [[ranks]] (a spliced node's
    * many predecessors all re-point in the same fix-up join).
    * Bit-equal to [[ranks]] by oracle and spec. */
  def ranksByContraction(links: DataFrame,
      checkpointDir: Option[String] = None,
      maxRounds: Int = 300): DataFrame = {
    val lk = Iter.truncate(links.select(col("node"), col("succ")),
      checkpointDir)
    val dangling = lk.as("x").join(lk.as("y"),
      col("x.succ") === col("y.node"), "left_anti").count()
    require(dangling == 0,
      s"$dangling dangling successor pointer(s): succ values that are " +
        "not nodes")
    // state: (node, succ, w) — w = distance from node to its CURRENT
    // successor; roots are self-loops with w = 0
    var cur = Iter.truncate(lk.select(col("node"), col("succ"),
      when(col("succ") === col("node"), lit(0L)).otherwise(lit(1L))
        .as("w")), checkpointDir)
    val spliced = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var active = cur.filter(col("node") =!= col("succ")).count()
    // convergence polled every CheckEvery rounds, not every round: a
    // post-convergence round splices nothing and is harmless, so the
    // poll cadence trades ≤3 wasted cheap rounds for 3/4 of the
    // count jobs
    val CheckEvery = 4
    while (active > 0) {
      require(round < maxRounds,
        s"contraction did not converge in $maxRounds rounds " +
          "(rootless cycle in the input?)")
      val coin = (c: org.apache.spark.sql.Column) =>
        pmod(xxhash64(c, lit(round)), lit(2)) === 0
      // the coin is a pure hash of the node ID, so the successor's
      // coin comes straight from the succ VALUE — no join to mark
      val m = cur.withColumn("sel",
        coin(col("node")) && !coin(col("succ")) &&
          col("node") =!= col("succ"))
      val spl = m.filter(col("sel")).select(col("node"), col("succ"),
        col("w"))
      // survivors re-point through spliced successors (never two in a
      // row — the coin rule forbids adjacent selections)
      val next = m.filter(!col("sel"))
        .join(spl.select(col("node").as("sn"), col("succ").as("ss"),
          col("w").as("sw")), col("succ") === col("sn"), "left")
        .select(col("node"), coalesce(col("ss"), col("succ")).as("succ"),
          (col("w") + coalesce(col("sw"), lit(0L))).as("w"))
      cur = Iter.truncate(next, checkpointDir)
      spliced += spl
      round += 1
      if (round % CheckEvery == 0)
        active = cur.filter(col("node") =!= col("succ")).count()
    }
    // a ROOTLESS CYCLE contracts to a self-loop with ACCUMULATED
    // weight — distinguishable from a true root (w = 0) and refused
    // rather than silently ranked against a fake root
    val fake = cur.filter(col("node") === col("succ") &&
      col("w") =!= 0L).count()
    require(fake == 0,
      s"$fake rootless cycle(s) in the input (contracted to weighted " +
        "self-loops)")
    // expansion, reverse order: a spliced node's splice-time successor
    // survived to the NEXT round, so by induction its rank is already
    // assigned when we get there. The lookup relation only GROWS, so
    // it is re-truncated every few rounds (the in-between unions keep
    // the plan a shallow union of checkpoints). NOTE the lookup join
    // is O(n) PER ROUND — the honest cost of realizing contraction on
    // a shuffle engine; SCALE.md's list_rank reading prices it.
    var ranks = cur.select(col("node"), lit(0L).as("rank"))
    var sinceTrunc = 0
    spliced.reverseIterator.foreach { spl =>
      val add = spl.join(ranks.select(col("node").as("rn"),
          col("rank").as("rr")), col("succ") === col("rn"))
        .select(col("node"), (col("rr") + col("w")).as("rank"))
      ranks = ranks.unionByName(Iter.truncate(add, checkpointDir))
      sinceTrunc += 1
      if (sinceTrunc % CheckEvery == 0)
        ranks = Iter.truncate(ranks, checkpointDir)
    }
    Iter.truncate(ranks, checkpointDir)
  }

  /** CYCLE LABELING of a functional graph (every node exactly one
    * successor; self-loops allowed) by min-label doubling — the
    * cycle-shaped counterpart of [[ranks]]: after k rounds each node
    * knows the MINIMUM label among its first 2^k successors, and with
    * 2^k ≥ n that covers the entire forward reach (re-walking a cycle
    * is idempotent under min), so ceil(log2 n) rounds suffice with NO
    * convergence action at all. On a permutation (pure cycles) the
    * returned label IS the strongly-connected-component id — every
    * node of a cycle reports the cycle's minimum node; on rho-shaped
    * inputs (tails into cycles) it is the min label forward-reachable,
    * the standard "which basin am I in" key. Same per-round cost
    * shape as [[ranks]]: one keyed self-join, lineage truncated.
    *
    * Input must be FUNCTIONAL (node unique in `links`); a node with
    * two successors would duplicate through the self-join. Returns
    * (node, label). */
  def cycleLabels(links: DataFrame, checkpointDir: Option[String] = None,
      maxRounds: Int = 64): DataFrame = {
    val lk = Iter.truncate(links.select(col("node"), col("succ")),
      checkpointDir)
    val n = lk.count()
    // same dangling-pointer refusal as ranks(): the self-join would
    // silently drop rows whose succ is not a node
    val dangling = lk.as("x").join(lk.as("y"),
      col("x.succ") === col("y.node"), "left_anti").count()
    require(dangling == 0,
      s"$dangling dangling successor pointer(s): succ values that are " +
        "not nodes")
    val rounds =
      if (n <= 1) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(n - 1) // ceil(log2 n)
    // unlike ranks(), a short run is silently WRONG (no parked state
    // to check), so refuse up front rather than underrun
    require(rounds <= maxRounds,
      s"cycle labeling needs $rounds rounds for $n links (> maxRounds)")
    // state: (node, ptr, mn) — mn = min label among positions
    // [0, 2^k) of the successor walk; ptr = successor 2^k ahead
    var state = lk.select(col("node"), col("succ").as("ptr"),
      col("node").as("mn"))
    (0 until rounds).foreach { _ =>
      val jumped = state.as("a")
        .join(state.as("b"), col("a.ptr") === col("b.node"))
        .select(col("a.node").as("node"), col("b.ptr").as("ptr"),
          least(col("a.mn"), col("b.mn")).as("mn"))
      state = Iter.truncate(jumped, checkpointDir)
    }
    state.select(col("node"), col("mn").as("label"))
  }
}
