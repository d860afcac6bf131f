package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class TemporalJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("row-time temporal join: probes see the version valid at their time") {
    implicit val sc = spark.sqlContext
    // (key, ts, seq, isBuild, value, probeId)
    val in = MemoryStream[(Long, Timestamp, Long, Boolean, Double, Long)]
    val df = in.toDF().toDF("key", "ts", "seq", "isBuild", "value", "probeId")
      .withWatermark("ts", "0 seconds")
      .select(col("key"), col("ts"), unix_micros(col("ts")).as("tsUs"),
        col("seq"), col("isBuild"), col("value"), col("probeId"))
      .as[TemporalJoin.TjEvent]
    val query = TemporalJoin.rowTime(df).toDF("probeId", "value")
      .writeStream.format("memory").queryName("graft_test_tj")
      .outputMode("append").start()
    def emitted() = spark.table("graft_test_tj")
      .as[(Long, Double)].collect().toSet
    try {
      // version v1 at t2; probes at t1 (before any version) and t3
      in.addData((1L, ts(2), 1L, true, 10.0, -1L),
        (1L, ts(1), 2L, false, 0.0, 100L),
        (1L, ts(3), 3L, false, 0.0, 101L))
      query.processAllAvailable()
      // watermark is still at 0 for this batch — nothing sealed yet
      // version v2 at t5 supersedes v1; probe at t6; watermark → t6
      in.addData((1L, ts(5), 4L, true, 20.0, -1L),
        (1L, ts(6), 5L, false, 0.0, 102L))
      query.processAllAvailable()
      // wm = t6 now: probes t1 (no version → dropped) and t3 (v1) seal
      assert(emitted() == Set((101L, 10.0)))
      // advance watermark past t6 so the last probe seals against v2
      in.addData((2L, ts(30), 6L, true, 1.0, -1L))
      query.processAllAvailable()
      in.addData((2L, ts(45), 7L, true, 1.0, -1L))
      query.processAllAvailable()
      assert(emitted() == Set((101L, 10.0), (102L, 20.0)))
    } finally query.stop()
  }

  test("same-timestamp version is visible to the probe; latest seq wins") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, Boolean, Double, Long)]
    val df = in.toDF().toDF("key", "ts", "seq", "isBuild", "value", "probeId")
      .withWatermark("ts", "0 seconds")
      .select(col("key"), col("ts"), unix_micros(col("ts")).as("tsUs"),
        col("seq"), col("isBuild"), col("value"), col("probeId"))
      .as[TemporalJoin.TjEvent]
    val query = TemporalJoin.rowTime(df).toDF("probeId", "value")
      .writeStream.format("memory").queryName("graft_test_tj2")
      .outputMode("append").start()
    try {
      // two versions at the same instant as the probe
      in.addData((1L, ts(2), 1L, true, 10.0, -1L),
        (1L, ts(2), 2L, true, 11.0, -1L),
        (1L, ts(2), 3L, false, 0.0, 200L))
      query.processAllAvailable()
      in.addData((2L, ts(30), 4L, true, 1.0, -1L))
      query.processAllAvailable()
      in.addData((2L, ts(45), 5L, true, 1.0, -1L))
      query.processAllAvailable()
      val rows = spark.table("graft_test_tj2").as[(Long, Double)].collect().toSet
      assert(rows == Set((200L, 11.0)))
    } finally query.stop()
  }
}
