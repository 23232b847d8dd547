package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-drift guard: the coverage map in SURVEY.md §2.9 and the README
  * query count must track `SparkEntry.queries` MECHANICALLY — the
  * round-10 verdict had to demand the map be completed by hand once;
  * this spec fails the build the moment a new query lands unmapped
  * (or a stale count survives a rename).
  */
class DocCoverageSpec extends AnyFunSuite {

  private def readRepoFile(name: String): String = {
    val p = java.nio.file.Paths.get(name)
    assert(java.nio.file.Files.exists(p), s"$name missing at repo root")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  test("every SparkEntry.queries key appears (backticked) in SURVEY.md") {
    val survey = readRepoFile("SURVEY.md")
    val missing = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(k => survey.contains(s"`$k`"))
    assert(missing.isEmpty,
      s"queries with no SURVEY.md §2.9 mention: ${missing.mkString(", ")}")
  }

  test("every oracleSql key is an actual query (no orphan oracles)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: ${orphans.mkString(", ")}")
  }

  test("README query count matches SparkEntry.queries.size") {
    val n = SparkEntry.queries.size
    val readme = readRepoFile("README.md")
    assert(readme.contains(s"$n queries") && readme.contains(s"all $n "),
      s"README does not carry the current query count $n — update both " +
        "the layout line and the oracle line")
  }
}
