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
}
