package graft.streaming

import graft.SparkSpec
import graft.sources.Jdbc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Exactly-once semantics of the idempotent foreachBatch JDBC sink
  * (TwoPhaseCommitSinkFunction analog) under replay and
  * crash-mid-append schedules, against embedded Derby. */
class ExactlyOnceJdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:grafteos;create=true"
  private def props = {
    val p = new java.util.Properties
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("stream delivers exactly once; epoch replays and partial appends do not duplicate") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val table = "eos_out"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-eos-ckpt").toString

    val in = MemoryStream[(Long, String)]
    in.addData((1L, "a"), (2L, "b"), (3L, "c"))
    val q = ExactlyOnceJdbc.sink(
      in.toDF().toDF("id", "v"), url, table, ckpt, props)
    q.processAllAvailable()
    in.addData((4L, "d"))
    q.processAllAvailable()
    q.stop()

    def rows() = Jdbc.read(spark, url, table, props)
    assert(rows().count() == 4)
    assert(rows().select(countDistinct(col("id"))).head.getLong(0) == 4)
    val batches = rows().select(col("batch_id")).distinct().count()
    assert(batches == 2, "two epochs expected")

    // REPLAY: the coordinator (checkpoint) failed to advance and the
    // whole epoch runs again with the same batchId — must be a no-op
    // net of itself
    val epoch1 = Seq((4L, "d")).toDF("id", "v")
    ExactlyOnceJdbc.commitBatch(epoch1, 1L, url, table, props)
    assert(rows().count() == 4, "epoch replay duplicated rows")

    // CRASH MID-APPEND: a previous attempt of epoch 2 died after
    // inserting only part of its rows; the successful attempt must
    // scrub the partials and land the full epoch exactly once
    Seq((5L, "e")).toDF("id", "v").withColumn("batch_id", lit(2L))
      .write.mode("append").jdbc(url, table, props)
    val epoch2 = Seq((5L, "e"), (6L, "f")).toDF("id", "v")
    ExactlyOnceJdbc.commitBatch(epoch2, 2L, url, table, props)
    assert(rows().count() == 6)
    assert(rows().filter(col("batch_id") === 2L).count() == 2)
    assert(rows().select(countDistinct(col("id"))).head.getLong(0) == 6)
  }

  test("scrub key is indexed with the table and the scrub runs as an index range delete") {
    import spark.implicits._
    val table = "eos_idx"
    // 100 epochs through the sink primitive — the growth schedule
    // under which an unindexed scrub degrades to a full table scan
    // per epoch (r9 verdict #4)
    (0 until 100).foreach { ep =>
      ExactlyOnceJdbc.commitBatch(
        Seq((ep.toLong, s"v$ep")).toDF("id", "v"), ep.toLong, url, table, props)
    }
    def rows() = Jdbc.read(spark, url, table, props)
    assert(rows().count() == 100)
    assert(rows().select(countDistinct(col("batch_id"))).head.getLong(0) == 100)

    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      // the index exists (auto-created with the table)
      val idx = conn.getMetaData.getIndexInfo(
        null, null, table.toUpperCase, false, false)
      var found = false
      while (idx.next() && !found)
        found = ExactlyOnceJdbc.indexName(table)
          .equalsIgnoreCase(idx.getString("INDEX_NAME"))
      idx.close()
      assert(found, "batch_id index missing after table creation")

      // and the scrub actually USES it: Derby runtime statistics for
      // the epoch delete must show an index scan, not a table scan —
      // the plan-shape guarantee that keeps per-epoch scrub cost
      // independent of sink-table size
      val st = conn.createStatement()
      st.execute("CALL SYSCS_UTIL.SYSCS_SET_RUNTIMESTATISTICS(1)")
      st.executeUpdate(s"""DELETE FROM $table WHERE "batch_id" = 42""")
      val rs = st.executeQuery("VALUES SYSCS_UTIL.SYSCS_GET_RUNTIMESTATISTICS()")
      rs.next()
      val plan = rs.getString(1)
      rs.close(); st.close()
      assert(plan.toUpperCase.contains("INDEX"),
        s"scrub plan shows no index use:\n$plan")
      assert(!plan.toUpperCase.contains("TABLE SCAN"),
        s"scrub degraded to a table scan:\n$plan")
    } finally conn.close()
    // the diagnostic delete removed epoch 42; the sink must restore
    // it idempotently on replay
    ExactlyOnceJdbc.commitBatch(
      Seq((42L, "v42")).toDF("id", "v"), 42L, url, table, props)
    assert(rows().count() == 100)
  }
}
