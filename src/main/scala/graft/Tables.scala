package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet star-schema loaders for the driver testdata (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst gets column
  * pruning + filter pushdown into the scan for free — at 100 TB these
  * scans are the dominant cost and must stay prunable.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // The driver's events.parquet stores ts as TIMESTAMP(NANOS),
      // which Spark's TimestampType (µs) refuses outright; read the
      // raw int64 nanos and integer-divide to µs (the data is
      // µs-aligned, so this is lossless — verified against DuckDB's
      // TIMESTAMP_NS cast). Re-written copies (tools.Scale) already
      // store µs and pass through unchanged.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      else raw
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so queries can exercise the
    * SQL surface (the reference's Table/SQL API — SURVEY.md §3.3). */
  def views(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
