package graft.ml

import org.apache.spark.ml.classification.LinearSVC
import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.{MinMaxScaler, PolynomialExpansion, StandardScaler, VectorAssembler}
import org.apache.spark.ml.recommendation.ALS
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.sql.DataFrame

/** FlinkML façade (reference flink-libraries/flink-ml: SVM.scala,
  * MultipleLinearRegression.scala, ALS.scala, preprocessing/
  * StandardScaler|MinMaxScaler|PolynomialFeatures) delegating to
  * spark.ml — the reference's algorithms map 1:1 onto MLlib
  * estimators, which already run distributed.
  */
object MLEnv {

  def assemble(df: DataFrame, cols: Seq[String], out: String = "features"): DataFrame =
    new VectorAssembler().setInputCols(cols.toArray).setOutputCol(out).transform(df)

  /** MultipleLinearRegression analog. */
  def linearRegression(train: DataFrame, labelCol: String,
      maxIter: Int = 20, regParam: Double = 0.0): org.apache.spark.ml.regression.LinearRegressionModel =
    new LinearRegression().setLabelCol(labelCol).setMaxIter(maxIter)
      .setRegParam(regParam).fit(train)

  /** SVM analog (LinearSVC). */
  def svm(train: DataFrame, labelCol: String, maxIter: Int = 20): org.apache.spark.ml.classification.LinearSVCModel =
    new LinearSVC().setLabelCol(labelCol).setMaxIter(maxIter).fit(train)

  /** ALS recommender (reference recommendation/ALS.scala). */
  def als(ratings: DataFrame, userCol: String, itemCol: String,
      ratingCol: String, rank: Int = 8, maxIter: Int = 5): org.apache.spark.ml.recommendation.ALSModel =
    new ALS().setUserCol(userCol).setItemCol(itemCol).setRatingCol(ratingCol)
      .setRank(rank).setMaxIter(maxIter).setSeed(42L).fit(ratings)

  def standardScaler(df: DataFrame, in: String = "features",
      out: String = "scaled"): DataFrame =
    new StandardScaler().setInputCol(in).setOutputCol(out)
      .setWithMean(true).setWithStd(true).fit(df).transform(df)

  def minMaxScaler(df: DataFrame, in: String = "features",
      out: String = "scaled"): DataFrame =
    new MinMaxScaler().setInputCol(in).setOutputCol(out).fit(df).transform(df)

  def polynomialFeatures(df: DataFrame, degree: Int, in: String = "features",
      out: String = "poly"): DataFrame =
    new PolynomialExpansion().setDegree(degree).setInputCol(in)
      .setOutputCol(out).transform(df)

  def rmse(predictions: DataFrame, labelCol: String): Double =
    new RegressionEvaluator().setLabelCol(labelCol).setMetricName("rmse")
      .evaluate(predictions)

  /** StochasticOutlierSelection (reference outlier/
    * StochasticOutlierSelection.scala — Janssens et al.): per point,
    * fit a Gaussian affinity over its distance row by binary-searching
    * beta to the target perplexity, normalize to binding probabilities
    * b_ij, and score f(j) = Π_i (1 − b_ij). Inherently all-pairs (the
    * reference crosses the DataSet too); the distance rows build
    * distributed via crossJoin + groupByKey, one row in memory per key
    * at a time. `featuresCol` is Array[Double|Float].
    *
    * SCALE BOUND: the algorithm is Θ(n²) in points — pairs, shuffle
    * bytes, and per-key distance rows all grow quadratically, and
    * (unlike the dedup/ANN family) there is no exact blocked
    * decomposition: every point's perplexity fit reads its FULL
    * distance row. It is an outlier scorer for samples, not corpora.
    * `maxPoints` (default 100k ≈ 10^10 pairs, the practical single-
    * job ceiling) makes that explicit: the call fails fast with
    * guidance instead of launching an infeasible shuffle. For larger
    * inputs, score a uniform sample (`df.sample`) or pre-block by a
    * coarse cluster key and run SOS per block — both change the
    * estimator's semantics, which is why neither happens implicitly.
    * Returns (id, outlier_probability). */
  def sos(df: DataFrame, idCol: String, featuresCol: String,
      perplexity: Double = 4.5, maxIterations: Int = 100,
      tolerance: Double = 1e-5, maxPoints: Int = 100000): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    import org.apache.spark.sql.functions._
    val n = df.count()
    require(n <= maxPoints,
      s"SOS is all-pairs (Theta(n^2)): $n points exceeds maxPoints=" +
        s"$maxPoints (~${n * n} pairs). Score a sample (df.sample), " +
        "pre-block by a cluster key, or raise maxPoints deliberately.")
    val a = df.select(col(idCol).cast("long").as("i"), col(featuresCol).as("fa"))
    val b = df.select(col(idCol).cast("long").as("j"), col(featuresCol).as("fb"))
    // fused zero-alloc fold (same IEEE order as the former
    // zip_with+aggregate composite — see graft.functions.VecMath)
    val dist = sqrt(graft.functions.VecMath.vec_sq_dist(col("fa"), col("fb")))
    val pairs = a.crossJoin(b).filter(col("i") =!= col("j"))
      .select(col("i"), col("j"), dist.as("d"))
      .as[(Long, Long, Double)]
    val logPerp = math.log(perplexity)
    val binding = pairs.groupByKey(_._1).flatMapGroups { (_, it) =>
      val row = it.toArray.sortBy(_._2)
      val ds = row.map(_._3)
      // reference binarySearch, iterative form
      var beta = 1.0
      var bMin = Double.NegativeInfinity
      var bMax = Double.PositiveInfinity
      var iter = 0
      var done = false
      while (iter < maxIterations && !done) {
        val aff = ds.map(d => math.exp(-d * beta))
        val sumA = aff.sum
        val h = math.log(sumA) +
          beta * ds.zip(aff).map { case (d, ad) => d * ad }.sum / sumA
        val hDiff = h - logPerp
        if (math.abs(hDiff) <= tolerance) done = true
        else if (hDiff.isNaN) beta /= 10.0
        else if (hDiff > 0) {
          bMin = beta
          beta = if (bMax.isInfinite) beta * 2.0 else (beta + bMax) / 2.0
        } else {
          bMax = beta
          beta = if (bMin.isInfinite) beta / 2.0 else (beta + bMin) / 2.0
        }
        iter += 1
      }
      val aff = ds.map(d => math.exp(-d * beta))
      val sumA = aff.sum
      row.zip(aff).iterator.map { case ((_, j, _), af) => (j, af / sumA) }
    }
    binding.toDF("id", "b")
      .groupBy(col("id").as(idCol))
      // Π (1 − b) as exp(Σ log1p(−b)) — distributed product
      .agg(exp(sum(expr("log1p(-b)"))).as("outlier_probability"))
  }
}
