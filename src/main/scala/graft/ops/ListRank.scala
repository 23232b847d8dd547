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
