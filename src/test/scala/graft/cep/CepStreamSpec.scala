package graft.cep

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.concurrent.duration._

/** CEP over a live stream: matches emit only once the watermark seals
  * their possible span (late events can no longer change them). */
class CepStreamSpec extends SparkSpec {
  import spark.implicits._

  private type Ev = (Long, Long, String, Timestamp)
  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s")

  test("patternStream rejects an optional first stage up front") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = input.toDF().toDF("user_id", "event_id", "typ", "ts")
      .withWatermark("ts", "0 seconds").as[Ev]
    val p = CEP.Pattern.begin[Ev]("view").where(_._3 == "view").optional
      .followedBy("purchase").where(_._3 == "purchase")
      .within(10.seconds)
    val e = intercept[IllegalArgumentException] {
      CEP.patternStream(events, p,
        (e: Ev) => e._1, (e: Ev) => e._4.getTime, (e: Ev) => e._2) {
        (uid, m) => (uid, m.stages("purchase").head._2)
      }
    }
    assert(e.getMessage.contains("non-optional first stage"))
  }

  test("patternStream emits watermark-sealed matches incrementally") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = input.toDF().toDF("user_id", "event_id", "typ", "ts")
      .withWatermark("ts", "0 seconds")
      .as[Ev]

    val p = CEP.Pattern.begin[Ev]("view").where(_._3 == "view")
      .followedBy("purchase").where(_._3 == "purchase")
      .within(10.seconds)

    val matches = CEP.patternStream(events, p,
      (e: Ev) => e._1, (e: Ev) => e._4.getTime, (e: Ev) => e._2) {
      (uid, m) => (uid, m.stages("view").head._2, m.stages("purchase").head._2)
    }

    val q = matches.writeStream.format("memory")
      .queryName("graft_cep_stream").outputMode("append").start()
    try {
      // batch 1: the pattern occurs, but its window is not sealed yet
      input.addData((1L, 100L, "view", ts("10:00:00")), (1L, 101L, "purchase", ts("10:00:05")))
      q.processAllAvailable()
      assert(spark.table("graft_cep_stream").count() == 0)

      // push the watermark far past the window in two steps (the
      // watermark advances at the START of the following batch)
      input.addData((2L, 200L, "view", ts("10:10:00")))
      q.processAllAvailable()
      input.addData((2L, 201L, "view", ts("10:20:00")))
      q.processAllAvailable()

      val rows = spark.table("graft_cep_stream").as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 100L, 101L)))
    } finally q.stop()
  }

  test("SKIP_PAST_LAST fence persists across micro-batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = input.toDF().toDF("user_id", "event_id", "typ", "ts")
      .withWatermark("ts", "0 seconds")
      .as[Ev]

    val p = CEP.Pattern.begin[Ev]("view").where(_._3 == "view")
      .followedBy("purchase").where(_._3 == "purchase")
      .within(10.seconds)
      .afterMatchSkipPastLast

    val matches = CEP.patternStream(events, p,
      (e: Ev) => e._1, (e: Ev) => e._4.getTime, (e: Ev) => e._2) {
      (uid, m) => (uid, m.stages("view").head._2, m.stages("purchase").head._2)
    }

    val q = matches.writeStream.format("memory")
      .queryName("graft_cep_fence").outputMode("append").start()
    try {
      // v1 < v2 < p1 all inside v1's window: skip-past-last must emit
      // (v1,p1) only; (v2,p1) starts inside the emitted match
      input.addData(
        (1L, 100L, "view", ts("10:00:00")),
        (1L, 102L, "view", ts("10:00:08")),
        (1L, 103L, "purchase", ts("10:00:09")))
      q.processAllAvailable()
      // advance the watermark so v1 seals and emits FIRST (v2 still
      // unsealed — the fence must then survive into later triggers)
      input.addData((9L, 900L, "noise", ts("10:00:15")))
      q.processAllAvailable()
      input.addData((9L, 901L, "noise", ts("10:00:30")))
      q.processAllAvailable()
      assert(spark.table("graft_cep_fence").count() == 1)
      // now v2 and p1 seal in a later trigger: without the persisted
      // fence this would wrongly emit (v2,p1)
      input.addData((9L, 902L, "noise", ts("10:00:45")))
      q.processAllAvailable()
      input.addData((9L, 903L, "noise", ts("10:01:00")))
      q.processAllAvailable()

      val rows = spark.table("graft_cep_fence").as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 100L, 103L)))
    } finally q.stop()
  }

  test("timed-out partial matches emit to the timeout side") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = input.toDF().toDF("user_id", "event_id", "typ", "ts")
      .withWatermark("ts", "0 seconds")
      .as[Ev]

    val p = CEP.Pattern.begin[Ev]("view").where(_._3 == "view")
      .followedBy("cart").where(_._3 == "cart")
      .followedBy("purchase").where(_._3 == "purchase")
      .within(10.seconds)

    // matches tagged "M", timeouts "T" with the deepest stage reached
    val out = CEP.patternStreamWithTimeouts(events, p,
      (e: Ev) => e._1, (e: Ev) => e._4.getTime, (e: Ev) => e._2) {
      (uid, m) => (uid, "M", m.stages("view").head._2)
    } { (uid, partial) =>
      (uid, "T:" + partial.stages.keys.toSeq.sorted.mkString(","),
        partial.stages("view").head._2)
    }

    val q = out.writeStream.format("memory")
      .queryName("graft_cep_timeout").outputMode("append").start()
    try {
      input.addData(
        // user 1 completes the pattern
        (1L, 100L, "view", ts("10:00:00")), (1L, 101L, "cart", ts("10:00:02")),
        (1L, 102L, "purchase", ts("10:00:04")),
        // user 2 abandons after cart — view+cart partial must time out
        (2L, 200L, "view", ts("10:00:00")), (2L, 201L, "cart", ts("10:00:03")))
      q.processAllAvailable()
      input.addData((9L, 900L, "noise", ts("10:00:30")))
      q.processAllAvailable()
      input.addData((9L, 901L, "noise", ts("10:01:00")))
      q.processAllAvailable()

      val rows = spark.table("graft_cep_timeout")
        .as[(Long, String, Long)].collect().toSet
      assert(rows == Set(
        (1L, "M", 100L),
        (2L, "T:cart,view", 200L)))
    } finally q.stop()
  }

  test("streaming SkipToLast fence lets the closing row reopen across batches") {
    // v c w chain where each w reopens the next link — the links
    // arrive in SEPARATE batches, so the resume row must survive
    // sealing + eviction in state
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Ev]
    val events = input.toDF().toDF("user_id", "event_id", "typ", "ts")
      .withWatermark("ts", "0 seconds").as[Ev]
    val p = CEP.Pattern.begin[Ev]("v").where(_._3 == "v")
      .next("c").where(_._3 == "c").oneOrMore
      .next("w").where(_._3 == "v")
      .within(30.seconds)
      .copy(skip = CEP.SkipToLast("w"))
    val out = CEP.patternStream(events, p,
      (e: Ev) => e._1, (e: Ev) => e._4.getTime, (e: Ev) => e._2) {
      (uid, m) => (uid, m.stages("v").head._2, m.stages("w").head._2)
    }
    val q = out.writeStream.format("memory")
      .queryName("graft_cep_skipto").outputMode("append").start()
    try {
      // link 1: v100 c101 v102 — v102 is the closing row AND the next
      // link's opener
      input.addData((1L, 100L, "v", ts("10:00:00")), (1L, 101L, "c", ts("10:00:02")),
        (1L, 102L, "v", ts("10:00:04")))
      q.processAllAvailable()
      // link 2 arrives later: c103 v104 — v102 must still be in state
      input.addData((1L, 103L, "c", ts("10:00:06")), (1L, 104L, "v", ts("10:00:08")))
      q.processAllAvailable()
      // seal everything
      input.addData((9L, 900L, "x", ts("10:05:00")))
      q.processAllAvailable()
      input.addData((9L, 901L, "x", ts("10:10:00")))
      q.processAllAvailable()
      val rows = spark.table("graft_cep_skipto")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 100L, 102L), (1L, 102L, 104L)))
    } finally q.stop()
  }
}
