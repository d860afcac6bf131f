package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Early-firing windows + count evictor — trigger semantics SS
  * aggregation can't host, driven deterministically via MemoryStream
  * micro-batches. */
class TriggersSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
  private val MIN = 60 * 1000L

  test("earlyFiringTumble emits speculative rows then a final row") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("k", "ts", "v")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp, Double)]

    val fired = Triggers.earlyFiringTumble(events, windowMillis = 10 * MIN)
    val q = fired.toDF("k", "win", "n", "sum", "is_final")
      .writeStream.format("memory").queryName("graft_trig")
      .outputMode("append").start()
    try {
      // batch 1: two events in the 10:00 window → one EARLY row
      input.addData((1L, ts("10:00:10"), 1.0), (1L, ts("10:02:00"), 2.0))
      q.processAllAvailable()
      val afterB1 = spark.table("graft_trig")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      assert(afterB1 == Set((1L, ts("10:00:00").getTime, 2L, 3.0, false)))

      // batch 2: one more event, window still open → updated EARLY row
      input.addData((1L, ts("10:05:00"), 4.0))
      q.processAllAvailable()
      assert(spark.table("graft_trig").where("n = 3 AND NOT is_final").count() == 1)

      // advance watermark past window end → FINAL row with full agg
      input.addData((2L, ts("10:30:00"), 0.0))
      q.processAllAvailable()
      input.addData((2L, ts("10:40:00"), 0.0))
      q.processAllAvailable()
      val finals = spark.table("graft_trig").where("is_final")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      assert(finals.contains((1L, ts("10:00:00").getTime, 3L, 7.0, true)))
    } finally q.stop()
  }

  test("continuousEventTimeTumble fires early only when the watermark crosses a boundary") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("k", "ts", "v")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp, Double)]

    // 10-min window, 3-min fire cadence (boundaries :03, :06, :09)
    val fired = Triggers.continuousEventTimeTumble(events,
      windowMillis = 10 * MIN, fireIntervalMillis = 3 * MIN)
    val q = fired.toDF("k", "win", "n", "sum", "is_final")
      .writeStream.format("memory").queryName("graft_trig_cont")
      .outputMode("append").start()
    try {
      // two events, watermark still at epoch → NO early row (contrast
      // with earlyFiringTumble, which fires on every touched batch)
      input.addData((1L, ts("10:00:10"), 1.0), (1L, ts("10:02:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("graft_trig_cont").isEmpty)

      // wm advances to 10:04 past the 10:03 boundary → exactly one
      // early row carrying the full buffered aggregate
      input.addData((1L, ts("10:04:00"), 4.0))
      q.processAllAvailable()
      input.addData((7L, ts("10:04:30"), 0.0)) // run a batch under the advanced wm
      q.processAllAvailable()
      val early = spark.table("graft_trig_cont").where("k = 1 AND NOT is_final")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      assert(early == Set((1L, ts("10:00:00").getTime, 3L, 7.0, false)))

      // wm jumps straight past window end: the :06/:09 boundaries and
      // the end collapse into ONE final row, no extra early rows
      input.addData((9L, ts("10:30:00"), 0.0))
      q.processAllAvailable()
      input.addData((9L, ts("10:40:00"), 0.0))
      q.processAllAvailable()
      val k1 = spark.table("graft_trig_cont").where("k = 1")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
      assert(k1.count(!_._5) == 1, s"expected exactly one early row, got $k1")
      assert(k1.filter(_._5).toSet ==
        Set((1L, ts("10:00:00").getTime, 3L, 7.0, true)))
    } finally q.stop()
  }

  test("count evictor keeps only the last n elements of the window") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("k", "ts", "v")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp, Double)]

    val fired = Triggers.earlyFiringTumble(events, windowMillis = 10 * MIN,
      evictor = Triggers.CountEvictor(2))
    val q = fired.toDF("k", "win", "n", "sum", "is_final")
      .writeStream.format("memory").queryName("graft_trig_evict")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("10:00:10"), 1.0), (1L, ts("10:01:00"), 2.0),
        (1L, ts("10:02:00"), 4.0))
      q.processAllAvailable()
      input.addData((2L, ts("10:30:00"), 0.0))
      q.processAllAvailable()
      input.addData((2L, ts("10:40:00"), 0.0))
      q.processAllAvailable()
      val finals = spark.table("graft_trig_evict").where("is_final AND k = 1")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      // evictor: only the last 2 of the 3 elements aggregate (2+4)
      assert(finals == Set((1L, ts("10:00:00").getTime, 2L, 6.0, true)))
    } finally q.stop()
  }

  test("delta trigger fires only when a value moves past the threshold") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("k", "ts", "v")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp, Double)]

    val fired = Triggers.earlyFiringTumble(events, windowMillis = 10 * MIN,
      trigger = Triggers.OnDelta(0.5))
    val q = fired.toDF("k", "win", "n", "sum", "is_final")
      .writeStream.format("memory").queryName("graft_trig_delta")
      .outputMode("append").start()
    try {
      // ref arms at 1.0; |1.25 − 1.0| = 0.25 < 0.5 → no early row
      input.addData((1L, ts("10:00:10"), 1.0), (1L, ts("10:01:00"), 1.25))
      q.processAllAvailable()
      assert(spark.table("graft_trig_delta").isEmpty)
      // |2.0 − 1.0| = 1.0 > 0.5 → fire with the full buffered aggregate
      input.addData((1L, ts("10:02:00"), 2.0))
      q.processAllAvailable()
      val early = spark.table("graft_trig_delta").where("NOT is_final")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      assert(early == Set((1L, ts("10:00:00").getTime, 3L, 4.25, false)))
      // flush → final row unchanged by the trigger policy
      input.addData((9L, ts("10:30:00"), 0.0))
      q.processAllAvailable()
      input.addData((9L, ts("10:40:00"), 0.0))
      q.processAllAvailable()
      val finals = spark.table("graft_trig_delta").where("is_final AND k = 1")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      assert(finals == Set((1L, ts("10:00:00").getTime, 3L, 4.25, true)))
    } finally q.stop()
  }

  test("purging turns each early fire into FIRE_AND_PURGE (panes restart)") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("k", "ts", "v")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp, Double)]

    val fired = Triggers.earlyFiringTumble(events, windowMillis = 10 * MIN,
      purging = true)
    val q = fired.toDF("k", "win", "n", "sum", "is_final")
      .writeStream.format("memory").queryName("graft_trig_purge")
      .outputMode("append").start()
    try {
      input.addData((1L, ts("10:00:10"), 1.0), (1L, ts("10:02:00"), 2.0))
      q.processAllAvailable()
      input.addData((1L, ts("10:05:00"), 4.0))
      q.processAllAvailable()
      // each fire covered only the pane since the last purge
      val early = spark.table("graft_trig_purge").where("k = 1 AND NOT is_final")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      assert(early == Set(
        (1L, ts("10:00:00").getTime, 2L, 3.0, false),
        (1L, ts("10:00:00").getTime, 1L, 4.0, false)))
      // the final pane is empty after the last purge → no final row
      input.addData((9L, ts("10:30:00"), 0.0))
      q.processAllAvailable()
      input.addData((9L, ts("10:40:00"), 0.0))
      q.processAllAvailable()
      assert(spark.table("graft_trig_purge").where("k = 1 AND is_final").isEmpty)
    } finally q.stop()
  }

  test("time and delta evictors bound the aggregated elements") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Double)]
    val events = input.toDF().toDF("k", "ts", "v")
      .withWatermark("ts", "0 seconds")
      .as[(Long, Timestamp, Double)]

    // key 1 → time evictor (keep last 3 min of the window),
    // key 2 → delta evictor (keep |v − newest| < 2)
    val timeEv = Triggers.earlyFiringTumble(events.filter(_._1 == 1L),
      windowMillis = 10 * MIN, evictor = Triggers.TimeEvictor(3 * MIN))
    val deltaEv = Triggers.earlyFiringTumble(events.filter(_._1 == 2L),
      windowMillis = 10 * MIN, evictor = Triggers.DeltaEvictor(2.0))
    val fired = timeEv.union(deltaEv)
    val q = fired.toDF("k", "win", "n", "sum", "is_final")
      .writeStream.format("memory").queryName("graft_trig_te")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts("10:00:00"), 1.0), (1L, ts("10:05:00"), 2.0), (1L, ts("10:07:00"), 4.0),
        (2L, ts("10:00:00"), 1.0), (2L, ts("10:01:00"), 8.0), (2L, ts("10:02:00"), 9.0))
      q.processAllAvailable()
      input.addData((9L, ts("10:30:00"), 0.0))
      q.processAllAvailable()
      input.addData((9L, ts("10:40:00"), 0.0))
      q.processAllAvailable()
      val finals = spark.table("graft_trig_te").where("is_final")
        .as[(Long, Long, Long, Double, Boolean)].collect().toSet
      // time: newest 10:07 → keep >= 10:04 → (2.0, 4.0)
      assert(finals.contains((1L, ts("10:00:00").getTime, 2L, 6.0, true)))
      // delta: newest v = 9.0 → keep |v-9| < 2 → (8.0, 9.0)
      assert(finals.contains((2L, ts("10:00:00").getTime, 2L, 17.0, true)))
    } finally q.stop()
  }
}
