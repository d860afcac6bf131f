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
}
