package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass heuristic language ID (SURVEY.md §2.8 X4).
  *
  * The HOF formulation (`TextOps.langPacked`: an `aggregate` lambda
  * doing 20 `array_contains` probes per token) is interpreted
  * per-element — measured at ~0.7 ms/doc on the bench corpus, it was
  * the whole cost of `x4_kappa` (3.5–3.9 s for a 5-row confusion
  * matrix). This expression does the identical classification in one
  * compiled pass over the string: whitespace tokenization (the Java
  * `\s` set `split(trim(text), "\\s+")` uses), per-token lowercase +
  * hash-map probe into the marker lists, and the Han-range character
  * count for zh — then the same first-wins argmax over
  * (en, fr, es, de, zh) with the en default when every score is 0.
  * `doGenCode` emits a static call, so whole-stage codegen spans stay
  * intact; OpsSpec pins native == HOF formulation on the real corpus.
  */
case class LangIdExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextLang.langIdOf(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextLang.langIdOf($c);")

  override protected def withNewChildInternal(c: Expression): LangIdExpr =
    copy(child = c)
  override def prettyName: String = "graft_lang_id"
}

object TextLang {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.call_function

  /** Canonical marker lists — the single source of truth shared with
    * the HOF formulation in `TextOps` (zh is marked by CJK characters
    * instead of stopwords). Order IS the argmax tie-break order. */
  val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "zh" -> Seq())

  private val laneOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    markers.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach(w => m.put(w, i))
    }
    m
  }
  private val langOut: Array[UTF8String] =
    markers.map(l => UTF8String.fromString(l._1)).toArray

  @inline private def isWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Called from interpreted eval AND generated code. */
  def langIdOf(s: UTF8String): UTF8String = {
    val str = s.toString
    val scores = new Array[Int](markers.length)
    val n = str.length
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) scores(scores.length - 1) += 1
      if (isWs(c)) { i += 1 }
      else {
        // token span [i, j); probe the marker map on its lowercase
        var j = i + 1
        while (j < n && !isWs(str.charAt(j))) {
          val cj = str.charAt(j)
          if (cj >= 0x4e00 && cj <= 0x9fff) scores(scores.length - 1) += 1
          j += 1
        }
        // marker words are ASCII and ≤ 5 chars — skip longer tokens
        // without allocating
        if (j - i <= 5) {
          val tok = str.substring(i, j).toLowerCase(java.util.Locale.ROOT)
          val lane = laneOf.get(tok)
          if (lane != null) scores(lane) += 1
        }
        i = j
      }
    }
    // first-wins argmax in marker order; en default when all zero
    var best = 0
    var k = 1
    while (k < scores.length) {
      if (scores(k) > scores(best)) best = k
      k += 1
    }
    if (scores(best) > 0) langOut(best) else langOut(0)
  }

  val Name = "graft_lang_id"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => LangIdExpr(exprs.head), "built-in")

  def lang_id(c: Column): Column = {
    register(SparkSession.active)
    call_function(Name, c)
  }
}
