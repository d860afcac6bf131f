package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Frame-boundary and eviction tests for the row-time bounded OVER
  * state ops (reference RowTimeBoundedRowsOver.scala /
  * RowTimeBoundedRangeOver.scala). The multi-batch arrivals force the
  * state op through its evict-then-extend path: rows sealed and
  * evicted in an early batch must still satisfy the frames of rows
  * arriving later.
  */
class RowTimeOverSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  // (key, ts, seq=rowId, value)
  private def events(in: MemoryStream[(Long, Timestamp, Long, Double)]) =
    in.toDF().toDF("key", "ts", "seq", "value")
      .withWatermark("ts", "0 seconds")
      .select(col("key"), col("ts"), unix_micros(col("ts")).as("tsUs"),
        col("seq"), col("value"), col("seq").as("rowId"))
      .as[RowTimeOver.OvEvent]

  test("boundedRowsSum: 2-preceding frames survive cross-batch eviction") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val query = RowTimeOver.boundedRowsSum(events(in), nRows = 3)
      .toDF("rowId", "sum")
      .writeStream.format("memory").queryName("graft_test_rows_over")
      .outputMode("append").start()
    def emitted() = spark.table("graft_test_rows_over")
      .as[(Long, java.math.BigDecimal)].collect()
      .map { case (id, s) => id -> BigDecimal(s) }.toMap
    try {
      // batch 1: rows 1..3 (values 1,2,3). processAllAvailable also
      // runs the watermark-advanced no-data batch (wm → 00:03), which
      // fires the event-time timeout and seals rows 1,2.
      in.addData((1L, ts(1), 1L, 1.0), (1L, ts(2), 2L, 2.0), (1L, ts(3), 3L, 3.0))
      query.processAllAvailable()
      assert(emitted() == Map(1L -> BigDecimal(1), 2L -> BigDecimal(3)))
      // batch 2: rows 4,5 join the buffer; wm → 00:05 seals 3,4. Row
      // 4's frame (2,3,4) reaches across the eviction boundary into
      // the 2 sealed history rows the op retained.
      in.addData((1L, ts(4), 4L, 4.0), (1L, ts(5), 5L, 5.0))
      query.processAllAvailable()
      assert(emitted() == Map(1L -> BigDecimal(1), 2L -> BigDecimal(3),
        3L -> BigDecimal(6), 4L -> BigDecimal(9)))
      // batch 3: row 6 arrives; wm → 00:06 seals row 5 (3+4+5)
      in.addData((1L, ts(6), 6L, 6.0))
      query.processAllAvailable()
      assert(emitted() == Map(1L -> BigDecimal(1), 2L -> BigDecimal(3),
        3L -> BigDecimal(6), 4L -> BigDecimal(9), 5L -> BigDecimal(12)))
      // flush: row 6 (4+5+6) seals, then the key-2 flush row itself
      in.addData((2L, ts(50), 99L, 0.0))
      query.processAllAvailable()
      in.addData((2L, ts(55), 100L, 0.0))
      query.processAllAvailable()
      val fin = emitted()
      assert(fin(5L) == BigDecimal(12) && fin(6L) == BigDecimal(15))
      assert(fin(99L) == BigDecimal(0))
    } finally query.stop()
  }

  test("boundedRowsSum: equal timestamps order by seq inside the frame") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    val query = RowTimeOver.boundedRowsSum(events(in), nRows = 2)
      .toDF("rowId", "sum")
      .writeStream.format("memory").queryName("graft_test_rows_over_ties")
      .outputMode("append").start()
    try {
      // three rows at the same instant: ROWS frames split the peers
      // by seq (unlike RANGE, which would sum all three for each)
      in.addData((1L, ts(1), 1L, 10.0), (1L, ts(1), 2L, 20.0), (1L, ts(1), 3L, 30.0))
      query.processAllAvailable()
      in.addData((2L, ts(50), 99L, 0.0))
      query.processAllAvailable()
      in.addData((2L, ts(55), 100L, 0.0))
      query.processAllAvailable()
      val out = spark.table("graft_test_rows_over_ties")
        .as[(Long, java.math.BigDecimal)].collect()
        .map { case (id, s) => id -> BigDecimal(s) }.toMap
      assert(out == Map(1L -> BigDecimal(10), 2L -> BigDecimal(30),
        3L -> BigDecimal(50), 99L -> BigDecimal(0))) // 99 = sealed flush row
    } finally query.stop()
  }

  test("boundedRangeSum: idle fully-emitted key cleans its state up") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, Long, Double)]
    // 2-minute range; key 1 receives two rows then goes idle while
    // key 2 keeps the watermark advancing. The cleanup timeout must
    // re-fire key 1 so its sealed rows age out (no emission change —
    // this guards the state-TTL path added for the idle-key leak).
    val query = RowTimeOver.boundedRangeSum(events(in), rangeUs = 2L * 60 * 1000000)
      .toDF("rowId", "sum")
      .writeStream.format("memory").queryName("graft_test_range_cleanup")
      .outputMode("append").start()
    def emitted() = spark.table("graft_test_range_cleanup")
      .as[(Long, java.math.BigDecimal)].collect()
      .map { case (id, s) => id -> BigDecimal(s) }.toMap
    try {
      in.addData((1L, ts(1), 1L, 1.0), (1L, ts(2), 2L, 2.0))
      query.processAllAvailable()
      in.addData((2L, ts(10), 50L, 5.0))
      query.processAllAvailable() // wm=00:10: key-1 rows seal + emit
      assert(emitted() == Map(1L -> BigDecimal(1), 2L -> BigDecimal(3)))
      // wm far past key-1's last ts + range: its timeout fires, state
      // empties; emissions unchanged
      in.addData((2L, ts(30), 51L, 5.0))
      query.processAllAvailable()
      in.addData((2L, ts(40), 52L, 5.0))
      query.processAllAvailable()
      assert(emitted() == Map(1L -> BigDecimal(1), 2L -> BigDecimal(3),
        50L -> BigDecimal(5), 51L -> BigDecimal(5)))
    } finally query.stop()
  }
}
