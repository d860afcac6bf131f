package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** |A ∩ B| for two SORTED, DISTINCT string arrays — the inner loop of
  * exact-Jaccard verification over candidate pairs (q54). A linear
  * two-pointer merge in generated code: no hash set, no allocation,
  * one pass — versus array_intersect's per-pair hash-set build. The
  * caller guarantees sortedness (array_sort at gram build time, paid
  * once per document instead of once per pair).
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectSize.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_size"
}

object SortedIntersectSize {

  def compute(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var common = 0
    while (i < na && j < nb) {
      val cmp = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (cmp == 0) { common += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    common
  }

  def sorted_intersect_size(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(SortedIntersectSize(Bridge.expression(a), Bridge.expression(b)))
  }

  def computeLong(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var common = 0
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { common += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    common
  }

  def sorted_intersect_size_long(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(SortedIntersectSizeLong(Bridge.expression(a), Bridge.expression(b)))
  }
}

/** |A ∩ B| for SORTED, DISTINCT long arrays — same merge as
  * SortedIntersectSize but on primitive longs (no string deref), for
  * callers that pre-hash set elements (q54: 64-bit gram hashes make
  * the per-pair merge a primitive compare; a collision would need
  * ~2^32 grams in one document, so Jaccard values are unchanged).
  */
case class SortedIntersectSizeLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectSize.computeLong(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectSize.computeLong($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSizeLong =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "sorted_intersect_size_long"
}
