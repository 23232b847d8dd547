package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.ListRank

/** Pointer-doubling list-ranking contract: exact distance-to-root on
  * single chains, multiple chains, and singletons; a rootless cycle
  * (which can never converge) is refused rather than looped on.
  */
class ListRankSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def links(pairs: (Long, Long)*) = {
    import spark.implicits._
    pairs.toDF("node", "succ")
  }

  private def rankMap(df: org.apache.spark.sql.DataFrame) =
    ListRank.ranks(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("single chain: rank = distance to the self-loop root") {
    // 0 <- 1 <- 2 <- ... <- 9 (succ points toward the root)
    val chain = links((0L -> 0L) +: (1L to 9L).map(i => i -> (i - 1)): _*)
    assert(rankMap(chain) == (0L to 9L).map(i => i -> i).toMap)
  }

  test("multiple chains of different lengths + singleton roots") {
    val ls = links(
      // chain A: 10 <- 11 <- 12
      10L -> 10L, 11L -> 10L, 12L -> 11L,
      // chain B: 20 <- 21
      20L -> 20L, 21L -> 20L,
      // singleton
      30L -> 30L)
    assert(rankMap(ls) == Map(10L -> 0L, 11L -> 1L, 12L -> 2L,
      20L -> 0L, 21L -> 1L, 30L -> 0L))
  }

  test("round count is logarithmic: a 33-link chain converges (2^6 " +
      "coverage) where a naive walk would need 33 rounds") {
    val n = 33L
    val chain = links((0L -> 0L) +: (1L to n).map(i => i -> (i - 1)): _*)
    // maxRounds = 7 is enough for 33 links (ceil(log2 33) = 6, plus
    // the final no-move round that detects convergence)
    val r = ListRank.ranks(chain, maxRounds = 7).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == (0L to n).map(i => i -> i).toMap)
  }

  test("a rootless cycle is refused (would never converge)") {
    val cycle = links(1L -> 2L, 2L -> 3L, 3L -> 1L)
    val e = intercept[IllegalArgumentException] {
      ListRank.ranks(cycle, maxRounds = 8).collect()
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("dangling successor pointers are refused up front — the " +
      "self-join would silently drop those rows mid-iteration") {
    // node 3 does not exist; node 0 is a real root so the survivors
    // WOULD park and a converge-only check would pass wrongly
    val broken = links(0L -> 0L, 1L -> 0L, 2L -> 3L)
    val e = intercept[IllegalArgumentException] {
      ListRank.ranks(broken).collect()
    }
    assert(e.getMessage.contains("dangling"))
    // single dangling link (the bound-0-rounds edge): also refused
    intercept[IllegalArgumentException] {
      ListRank.ranks(links(1L -> 2L)).collect()
    }
    // cycleLabels applies the same refusal
    intercept[IllegalArgumentException] {
      ListRank.cycleLabels(links(1L -> 1L, 2L -> 9L)).collect()
    }
  }

  private def rankMapC(df: org.apache.spark.sql.DataFrame) =
    ListRank.ranksByContraction(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("contraction arm: identical ranks to Wyllie on a single " +
      "chain, multiple chains, and an in-tree") {
    val chain = links((0L -> 0L) +: (1L to 40L).map(i => i -> (i - 1)): _*)
    assert(rankMapC(chain) == rankMap(chain))
    val multi = links(10L -> 10L, 11L -> 10L, 12L -> 11L,
      20L -> 20L, 21L -> 20L, 30L -> 30L)
    assert(rankMapC(multi) == Map(10L -> 0L, 11L -> 1L, 12L -> 2L,
      20L -> 0L, 21L -> 1L, 30L -> 0L))
    // in-tree: two branches sharing a parent (many preds re-point
    // through one spliced node)
    val tree = links(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L)
    assert(rankMapC(tree) ==
      Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 2L))
  }

  test("contraction arm refuses rootless cycles and dangling " +
      "pointers like Wyllie") {
    val e = intercept[IllegalArgumentException] {
      ListRank.ranksByContraction(
        links(1L -> 2L, 2L -> 3L, 3L -> 1L), maxRounds = 40).collect()
    }
    assert(e.getMessage.contains("rootless cycle"))
    intercept[IllegalArgumentException] {
      ListRank.ranksByContraction(links(1L -> 2L)).collect()
    }
  }

  private def labelMap(df: org.apache.spark.sql.DataFrame) =
    ListRank.cycleLabels(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("cycleLabels: every node of a cycle reports the cycle's " +
      "minimum; multiple cycles + fixed points") {
    val perm = links(
      // cycle A: 5 -> 9 -> 2 -> 5
      5L -> 9L, 9L -> 2L, 2L -> 5L,
      // cycle B: 7 -> 8 -> 7
      7L -> 8L, 8L -> 7L,
      // fixed point
      4L -> 4L)
    assert(labelMap(perm) == Map(5L -> 2L, 9L -> 2L, 2L -> 2L,
      7L -> 7L, 8L -> 7L, 4L -> 4L))
  }

  test("cycleLabels on a rho shape: tail nodes report the min of " +
      "their forward reach (basin key)") {
    // tail 10 -> 11 -> into cycle 1 -> 2 -> 3 -> 1
    val rho = links(10L -> 11L, 11L -> 1L,
      1L -> 2L, 2L -> 3L, 3L -> 1L)
    assert(labelMap(rho) ==
      Map(10L -> 1L, 11L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("cycleLabels refuses an insufficient maxRounds up front " +
      "(a short run would be silently wrong)") {
    val perm = links((1L to 40L).map(i => i -> (i % 40 + 1)): _*)
    intercept[IllegalArgumentException] {
      ListRank.cycleLabels(perm, maxRounds = 3)
    }
  }
}
