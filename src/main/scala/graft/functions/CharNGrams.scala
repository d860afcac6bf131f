package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing the array of character
  * n-grams of a string — the hot inner loop of n-gram dedup
  * (q54/q55). A custom `Expression` with `doGenCode` (not a Scala
  * UDF) so it stays inside whole-stage codegen: no Row boxing, no
  * serialization, single pass over the UTF8 bytes.
  *
  * Replaces the equivalent-but-heavier
  * `transform(sequence(1, length(s)-n+1), i -> substring(s, i, n))`
  * composite (two intermediate arrays + per-element Int boxing).
  */
case class CharNGrams(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    CharNGrams.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.CharNGrams.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): CharNGrams =
    copy(child = newChild)

  override def prettyName: String = "char_ngrams"
}

object CharNGrams {

  /** Shared by interpreted eval and generated code. Works on code
    * points via UTF8String.substringSQL (1-based), matching
    * substring() semantics exactly. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    val count = math.max(0, len - n + 1)
    val out = new Array[AnyRef](count)
    var i = 0
    while (i < count) {
      out(i) = s.substringSQL(i + 1, n)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point (classic Column ⇄ Expression bridge). */
  def char_ngrams(c: Column, n: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(CharNGrams(Bridge.expression(c), n))
  }
}
