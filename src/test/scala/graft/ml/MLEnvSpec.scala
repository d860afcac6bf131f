package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MLEnvSpec extends SparkSpec {
  import spark.implicits._

  test("linear regression recovers a linear relationship") {
    val df = (1 to 100).map(i => (i.toDouble, 3.0 * i + 7.0)).toDF("x", "y")
    val train = MLEnv.assemble(df, Seq("x"))
    val model = MLEnv.linearRegression(train, "y")
    assert(math.abs(model.coefficients(0) - 3.0) < 1e-6)
    assert(math.abs(model.intercept - 7.0) < 1e-4)
    assert(MLEnv.rmse(model.transform(train), "y") < 1e-6)
  }

  test("scalers and polynomial features transform shapes") {
    val df = MLEnv.assemble(Seq((1.0, 2.0), (3.0, 4.0)).toDF("a", "b"), Seq("a", "b"))
    assert(MLEnv.standardScaler(df).columns.contains("scaled"))
    assert(MLEnv.minMaxScaler(df).columns.contains("scaled"))
    val poly = MLEnv.polynomialFeatures(df, degree = 2)
    assert(poly.columns.contains("poly"))
  }

  test("ALS fits on the events-derived ratings without error") {
    val ratings = graft.Tables.t(spark, sf, "events")
      .select(col("user_id").cast("int").as("u"),
        (col("event_id") % 20).cast("int").as("i"),
        col("value").cast("float").as("r"))
    val model = MLEnv.als(ratings, "u", "i", "r", rank = 4, maxIter = 2)
    assert(model.userFactors.count() > 0)
  }

  test("SOS ranks the planted outlier highest") {
    // reference ITSuite shape: a tight cluster plus one far point
    val pts = Seq(
      (0L, Array(1.0, 1.0)), (1L, Array(1.1, 1.0)), (2L, Array(0.9, 1.1)),
      (3L, Array(1.0, 0.9)), (4L, Array(1.1, 1.1)), (5L, Array(8.0, 8.0)))
      .toDF("id", "features")
    val probs = MLEnv.sos(pts, "id", "features", perplexity = 3.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(probs(5L) > 0.9)                       // the outlier
    assert(probs.filter(_._1 != 5L).values.forall(_ < probs(5L)))
  }

  test("SOS refuses inputs above maxPoints with actionable guidance") {
    val pts = (0L until 50L).map(i => (i, Array(i.toDouble, 0.0)))
      .toDF("id", "features")
    val e = intercept[IllegalArgumentException] {
      MLEnv.sos(pts, "id", "features", maxPoints = 10)
    }
    assert(e.getMessage.contains("all-pairs"))
    assert(e.getMessage.contains("df.sample"))
    // and an explicit raise admits the same input
    assert(MLEnv.sos(pts, "id", "features", maxPoints = 50).count() == 50)
  }
}
