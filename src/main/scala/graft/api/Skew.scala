package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers (BASELINE north-star: skewed keys must not
  * serialize onto one task at 100 TB).
  *
  * Salted join: the skewed (large) side gets a deterministic salt in
  * [0, salts); the small side is replicated once per salt value; the
  * join key becomes (key, salt) so one hot key spreads across `salts`
  * tasks. Deterministic salting (hash of a high-cardinality column,
  * not rand()) keeps retries/replays consistent.
  */
object Skew {

  def saltedJoin(skewed: DataFrame, small: DataFrame, skewedKey: Column,
      smallKey: Column, saltSource: Column, salts: Int): DataFrame = {
    val salted = skewed.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated,
      skewedKey === smallKey && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Two-phase aggregation with an explicit salt stage — for
    * non-algebraic aggregates (e.g. collect) where Catalyst cannot
    * partial-aggregate; algebraic aggs already get map-side combine. */
  def saltedTwoPhaseCount(df: DataFrame, key: Column, saltSource: Column,
      salts: Int): DataFrame =
    df.withColumn("__salt", pmod(hash(saltSource), lit(salts)))
      .groupBy(key.as("k"), col("__salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy(col("k"))
      .agg(sum(col("partial")).as("n"))
}
