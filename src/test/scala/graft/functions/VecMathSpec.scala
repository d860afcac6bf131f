package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The fused vector folds must be BIT-IDENTICAL to the zip_with +
  * aggregate composites they replaced (same left-to-right IEEE
  * order) — that equivalence is what keeps every DuckDB oracle in
  * the embedding family valid.
  */
class VecMathSpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random float vectors (values exercise
  // non-associativity: widely varying magnitudes)
  private def vecs = (0 until 50).map { i =>
    (i.toLong, (0 until 64).map(j =>
      (math.sin(i * 64 + j) * math.pow(10, (i + j) % 7 - 3)).toFloat))
  }.toDF("id", "v")

  test("vec_dot / vec_norm bit-equal to the composite folds on float arrays") {
    val both = vecs.crossJoin(vecs.select(col("id").as("id2"), col("v").as("w")))
      .filter(col("id") < col("id2"))
      .select(
        VecMath.vec_dot(col("v"), col("w")).as("fused"),
        expr("""aggregate(zip_with(v, w, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
               |CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin).as("composite"),
        VecMath.vec_norm(col("v")).as("nrm_fused"),
        expr("""sqrt(aggregate(v, CAST(0 AS DOUBLE),
               |(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))""".stripMargin)
          .as("nrm_composite"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)), "dot diverged")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2))
        == java.lang.Double.doubleToLongBits(r.getDouble(3)), "norm diverged")
    }
  }

  test("vec_sq_dist bit-equal to the composite on double arrays") {
    val d = vecs.select(col("id"),
      expr("transform(v, x -> CAST(x AS DOUBLE))").as("v"))
    val both = d.crossJoin(d.select(col("id").as("id2"), col("v").as("w")))
      .filter(col("id") < col("id2"))
      .select(
        VecMath.vec_sq_dist(col("v"), col("w")).as("fused"),
        expr("""aggregate(zip_with(v, w, (x, c) -> (x - c) * (x - c)),
               |CAST(0 AS DOUBLE), (acc, v) -> acc + v)""".stripMargin).as("composite"))
      .collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)), "sq_dist diverged")
    }
  }

  test("length mismatch fails fast; nulls pass through the expression") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(VecMath.vec_dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
    val r = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
      .select(VecMath.vec_dot(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("non-array and non-float/double array inputs fail at analysis, not runtime") {
    // r9 advice: a string column used to die with a ClassCastException
    // at plan time, and array<int> silently read int-packed bytes as
    // doubles (garbage). Both must now be clean analysis errors.
    val df = Seq((1L, "oops", Seq(1, 2, 3), Seq(1.0f, 2.0f, 3.0f)))
      .toDF("id", "s", "ints", "fs")
    for (bad <- Seq(col("s"), col("ints"))) {
      val e = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(VecMath.vec_dot(bad, col("fs"))).collect()
      }
      assert(e.getMessage.contains("array<float> or array<double>"), e.getMessage)
      val e2 = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(VecMath.vec_sq_dist(col("fs"), bad)).collect()
      }
      assert(e2.getMessage.contains("array<float> or array<double>"), e2.getMessage)
      val e3 = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(VecMath.vec_nearest_index(bad, Seq(Seq(0.0, 0.0, 0.0)))).collect()
      }
      assert(e3.getMessage.contains("array<float> or array<double>"), e3.getMessage)
      val e4 = intercept[org.apache.spark.sql.AnalysisException] {
        df.select(VecMath.vec_nearest_indices(bad, Seq(Seq(0.0, 0.0, 0.0)), 1)).collect()
      }
      assert(e4.getMessage.contains("array<float> or array<double>"), e4.getMessage)
    }
    // the valid element types still pass analysis
    df.select(VecMath.vec_dot(col("fs"), col("fs"))).collect()
  }

  test("vec_nearest_index: ties to lowest, early exit safe, codegen runs") {
    val cents = Seq(Seq(0.0, 0.0), Seq(10.0, 0.0), Seq(10.0, 0.0))
    val df = Seq(
      (0L, Seq(1.0, 0.0)),   // nearest 0
      (1L, Seq(9.0, 0.0)),   // nearest 1 (tie with 2 → lowest)
      (2L, Seq(10.0, 0.0)),  // exact hit on 1 (tie with 2 → lowest)
      (3L, Seq(5.0, 0.0))    // equidistant 0/1/2 → 0
    ).toDF("id", "v")
    val out = df.select(col("id"),
        VecMath.vec_nearest_index(col("v"), cents).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out == Map(0L -> 0, 1L -> 1, 2L -> 1, 3L -> 0))
  }
}
