package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Deployment entry point: `spark.sql.extensions=graft.GraftExtensions`
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  *
  * Injects everything the library adds at the Catalyst level, so a
  * cluster operator gets the whole surface without any per-session
  * imperative registration:
  *  - the TopKPerKey planner strategy (plans/TopKPerKey.scala);
  *  - the native kernel expressions (minhash/simhash/shingles/dot) as
  *    SQL-callable functions under their `graft_*` names — the same
  *    names the Column wrappers use, so plans built via the DataFrame
  *    API and via `spark.sql(...)` resolve identically.
  *
  * The Column-level wrappers (e.g. `functions.MinHashSig.minhash_sig`)
  * self-register on the active session as a fallback, so the library
  * also works WITHOUT this extension class — this is the idiomatic
  * all-in wiring, not a requirement.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    // auto-rewrite row_number-top-k windows into the heap operator
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
    // auto-rewrite pure BETWEEN joins into the binned equi-join
    // (width auto-sampled from the data; spark.graft.rangeJoin.binWidth
    // overrides, 0 disables)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewriteRule)

    ext.injectFunction((
      FunctionIdentifier(functions.MinHashSig.FuncName),
      info(functions.MinHashSig.FuncName,
        "one-pass k-minima MinHash signature of array<string> shingles"),
      (e: Seq[Expression]) =>
        functions.MinHashSig(e.head, e(1).eval().asInstanceOf[Int])))

    ext.injectFunction((
      FunctionIdentifier(functions.SimHashSig.FuncName),
      info(functions.SimHashSig.FuncName,
        "one-pass 64-bit SimHash of an array<string> token multiset"),
      (e: Seq[Expression]) => functions.SimHashSig(e.head)))

    ext.injectFunction((
      FunctionIdentifier(functions.ShingleSet.FuncName),
      info(functions.ShingleSet.FuncName,
        "distinct word n-gram shingles of an array<string>, one pass"),
      (e: Seq[Expression]) =>
        functions.ShingleSet(e.head, e(1).eval().asInstanceOf[Int])))

    ext.injectFunction((
      FunctionIdentifier(functions.DotLongs.FuncName),
      info(functions.DotLongs.FuncName,
        "dot product of two array<long> micro-unit vectors"),
      (e: Seq[Expression]) => functions.DotLongs(e.head, e(1))))

    ext.injectFunction((
      FunctionIdentifier(functions.IntersectCountSorted.FuncName),
      info(functions.IntersectCountSorted.FuncName,
        "|A ∩ B| of two sorted duplicate-free array<long> columns"),
      (e: Seq[Expression]) => functions.IntersectCountSorted(e.head, e(1))))

    ext.injectFunction((
      FunctionIdentifier(functions.LshBucket.FuncName),
      info(functions.LshBucket.FuncName,
        "random-hyperplane LSH bucket id (nBits sign bits) of a float vector"),
      (e: Seq[Expression]) =>
        functions.LshBucket(e.head, e(1).eval().asInstanceOf[Int])))

    ext.injectFunction((
      FunctionIdentifier(functions.ZOrder2.FuncName),
      info(functions.ZOrder2.FuncName,
        "2-D Z-order (Morton) curve value of two non-negative long keys"),
      (e: Seq[Expression]) => functions.ZOrder2(e.head, e(1))))

    ext.injectFunction((
      FunctionIdentifier(functions.Hilbert2.FuncName),
      info(functions.Hilbert2.FuncName,
        "2-D Hilbert curve index of two 16-bit grid coordinates"),
      (e: Seq[Expression]) => functions.Hilbert2(e.head, e(1))))

    ext.injectFunction((
      FunctionIdentifier(functions.TextNorm.NfcName),
      info(functions.TextNorm.NfcName,
        "Unicode NFC canonicalization (UAX #15)"),
      (e: Seq[Expression]) => functions.UnicodeNfc(e.head)))

    ext.injectFunction((
      FunctionIdentifier(functions.TextNorm.StripName),
      info(functions.TextNorm.StripName,
        "diacritic removal: NFD then strip combining marks"),
      (e: Seq[Expression]) => functions.StripAccents(e.head)))

    ext.injectFunction((
      FunctionIdentifier(functions.TextLang.Name),
      info(functions.TextLang.Name,
        "one-pass heuristic language ID (stopword lanes + Han count)"),
      (e: Seq[Expression]) => functions.LangIdExpr(e.head)))
  }
}
