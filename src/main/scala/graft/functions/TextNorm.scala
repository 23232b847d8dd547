package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode text canonicalization for dedup/fingerprint
  * pipelines (SURVEY.md §2.8 X4 — the engine-side counterpart of the
  * reference's pandas text cleaning, extended to real-corpus Unicode).
  *
  * Web-scale corpora mix precomposed ("é" U+00E9) and decomposed
  * ("e" + U+0301) representations of the same visible text; without
  * NFC canonicalization every downstream content hash (md5 dedup
  * keys, MinHash shingles, winnowing fingerprints) treats them as
  * distinct documents. `graft_nfc` applies Unicode NFC (UAX #15);
  * `graft_strip_accents` removes diacritics (NFD, then drop all
  * combining marks) — the standard pre-tokenization fold used by text
  * dedup and language-ID stages.
  *
  * Both are one-pass scalar kernels with `doGenCode` (a static call
  * from generated code, so whole-stage codegen spans stay intact) and
  * declare `inputTypes` so SQL callers get an analysis error, not a
  * runtime ClassCastException. The fast path: `Normalizer.isNormalized`
  * is O(n) with no allocation for already-NFC text (the overwhelming
  * majority of real corpora), so the scan cost is a cheap verify, not
  * a rewrite.
  */
case class UnicodeNfc(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNorm.nfc($c);")

  override protected def withNewChildInternal(c: Expression): UnicodeNfc =
    copy(child = c)
  override def prettyName: String = "unicode_nfc"
}

/** Diacritic removal: NFD then strip combining marks (category M). */
case class StripAccents(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextNorm.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextNorm.stripAccents($c);")

  override protected def withNewChildInternal(c: Expression): StripAccents =
    copy(child = c)
  override def prettyName: String = "strip_accents"
}

object TextNorm {
  import org.apache.spark.sql.SparkSession
  import org.apache.spark.sql.functions.call_function

  /** Combining marks (all of category M: Mn/Mc/Me), precompiled once. */
  private val Marks = java.util.regex.Pattern.compile("\\p{M}+")

  /** Called from interpreted eval AND generated code. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def stripAccents(s: UTF8String): UTF8String = {
    val str = s.toString
    val nfd =
      if (Normalizer.isNormalized(str, Normalizer.Form.NFD)) str
      else Normalizer.normalize(str, Normalizer.Form.NFD)
    val stripped = Marks.matcher(nfd).replaceAll("")
    // recompose: scripts whose NFD decomposition contains non-mark
    // characters (Hangul syllables -> conjoining Jamo, category Lo)
    // must return to composed form or accent-free text comes back
    // byte-different from the input (and diverges from utf8proc
    // oracles, which emit composed output)
    val out =
      if (Normalizer.isNormalized(stripped, Normalizer.Form.NFC)) stripped
      else Normalizer.normalize(stripped, Normalizer.Form.NFC)
    if (out == str) s else UTF8String.fromString(out)
  }

  val NfcName = "graft_nfc"
  val StripName = "graft_strip_accents"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      NfcName, exprs => UnicodeNfc(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      StripName, exprs => StripAccents(exprs.head), "built-in")
  }

  def unicode_nfc(c: Column): Column = {
    register(SparkSession.active)
    call_function(NfcName, c)
  }

  def strip_accents(c: Column): Column = {
    register(SparkSession.active)
    call_function(StripName, c)
  }
}
