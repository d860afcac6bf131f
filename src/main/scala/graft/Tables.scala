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
      // The driver's events.parquet has shipped ts three ways across
      // testdata generations: TIMESTAMP(NANOS) (refused by Spark's
      // µs TimestampType — read as raw int64 nanos and divide; the
      // data is µs-aligned so this is lossless), TIMESTAMP_NTZ(µs)
      // (naive µs — cast through the UTC session zone, which every
      // entry point pins, reproducing the same instants), and plain
      // TIMESTAMP(µs) in tools.Scale rewrites (passthrough). All
      // downstream code sees one type: TimestampType, µs, UTC.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/events.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", raw("ts").cast(org.apache.spark.sql.types.TimestampType))
        case _ => raw
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view so queries can exercise the
    * SQL surface (the reference's Table/SQL API — SURVEY.md §3.3). */
  def views(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
