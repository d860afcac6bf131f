package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused vector arithmetic for the embedding family (ANN search,
  * near-dup scoring, k-means assignment). The composite
  * `aggregate(zip_with(a, b, (x, y) -> …), 0d, (acc, v) -> acc + v)`
  * allocates a zipped intermediate array per PAIR — at corpus×probe
  * or corpus×centroid volume that is billions of short-lived arrays.
  * These expressions run the identical left-to-right IEEE fold in a
  * tight generated loop with zero allocation, so results are
  * bit-for-bit what the composites produced (same add/multiply
  * order), and every existing DuckDB oracle is unchanged.
  *
  * Inputs: array<float> or array<double> (floats upcast exactly, as
  * the composites' CAST did). Divergence from the composites on
  * malformed input only: length mismatch / null element THROWS
  * instead of null-poisoning — embeddings are fixed-dim and non-null,
  * so a mismatch is corruption worth failing on, not propagating.
  */
object VecMath {

  private def isFloatArr(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  def dotCompute(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_dot: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"vec_dot: null element at $i")
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def sqDistCompute(a: ArrayData, b: ArrayData, aF: Boolean, bF: Boolean): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"vec_sq_dist: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(s"vec_sq_dist: null element at $i")
      val x = if (aF) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bF) b.getFloat(i).toDouble else b.getDouble(i)
      val d = x - y
      acc += d * d
      i += 1
    }
    acc
  }

  import org.apache.spark.sql.graftbridge.Bridge

  /** Σ aᵢ·bᵢ as one codegen'd loop (replaces dot composites). */
  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(VecDot(Bridge.expression(a), Bridge.expression(b)))

  /** Σ (aᵢ−bᵢ)² — the k-means assignment metric. */
  def vec_sq_dist(a: Column, b: Column): Column =
    Bridge.column(VecSqDist(Bridge.expression(a), Bridge.expression(b)))

  /** √Σ aᵢ² — L2 norm via the same fold the composites used. */
  def vec_norm(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(vec_dot(a, a))

  private[functions] def floatFlags(l: Expression, r: Expression): (Boolean, Boolean) =
    (isFloatArr(l), isFloatArr(r))
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (af, bf) = VecMath.floatFlags(left, right)
    VecMath.dotCompute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], af, bf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (af, bf) = VecMath.floatFlags(left, right)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecMath.dotCompute($a, $b, $af, $bf);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_dot"
}

case class VecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (af, bf) = VecMath.floatFlags(left, right)
    VecMath.sqDistCompute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], af, bf)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (af, bf) = VecMath.floatFlags(left, right)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecMath.sqDistCompute($a, $b, $af, $bf);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecSqDist =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "vec_sq_dist"
}
