package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native Catalyst expression — the first
  * step of any text-curation pipeline (mixed-source web corpora carry
  * the same grapheme in composed and decomposed forms, which breaks
  * exact/MinHash dedup, n-gram fingerprints and tokenizer vocab hits
  * alike). A custom `Expression` with `doGenCode` (not a UDF) so it
  * runs inside whole-stage codegen; the already-normalized fast path
  * (the overwhelming case for real corpora) costs one scan and zero
  * allocation.
  *
  * Spark has no built-in for this; the reference reaches it the same
  * way (user functions over strings — flink-table ScalarFunction,
  * e.g. table/functions/ScalarFunction.java:61). Forms: NFC/NFD/
  * NFKC/NFKD per java.text.Normalizer; DuckDB's nfc_normalize
  * reproduces NFC for the oracle.
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {

  NormalizeUnicode.formOrdinal(form) // validate eagerly at plan time

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    NormalizeUnicode.compute(input.asInstanceOf[UTF8String],
      NormalizeUnicode.formOrdinal(form))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = graft.functions.NormalizeUnicode.compute(
         |  $c, ${NormalizeUnicode.formOrdinal(form)});""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)

  override def prettyName: String = "normalize_unicode"
}

object NormalizeUnicode {

  private val forms = java.text.Normalizer.Form.values()

  private def formOrdinal(form: String): Int = {
    val i = forms.indexWhere(_.name == form)
    require(i >= 0, s"unknown normalization form $form " +
      s"(one of ${forms.map(_.name).mkString("/")})")
    i
  }

  /** Shared by interpreted eval and generated code. Returns the input
    * buffer unchanged when already normalized (no allocation). */
  def compute(s: UTF8String, formOrd: Int): UTF8String = {
    val f = forms(formOrd)
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, f))
  }

  /** Column-level entry points (classic Column ⇄ Expression bridge). */
  def normalize(c: Column, form: String): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(NormalizeUnicode(Bridge.expression(c), form))
  }
  def nfc(c: Column): Column = normalize(c, "NFC")
}
