package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Checkpoint/restart semantics (§2.10 checkpointing; the reference's
  * StreamingFileSink exactly-once contract): a file-sink query stopped
  * and restarted against the same checkpoint must pick up exactly
  * where it committed — data arriving while "down" is delivered once,
  * nothing is duplicated, an idle restart emits nothing. */
class CheckpointRecoverySpec extends SparkSpec {
  import spark.implicits._

  test("file sink restarts from its checkpoint exactly once") {
    implicit val sc = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    val (out, ckpt) = (root + "/out", root + "/ckpt")
    val input = MemoryStream[Int]
    def start() = input.toDF().toDF("v").writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt).start()
    def sunk() = spark.read.parquet(out).as[Int].collect().toSeq.sorted

    val q1 = start()
    input.addData(1, 2, 3)
    q1.processAllAvailable()
    q1.stop()
    assert(sunk() == Seq(1, 2, 3))

    input.addData(4, 5) // arrives while the query is down
    val q2 = start()    // resumes from the committed offsets
    q2.processAllAvailable()
    q2.stop()
    assert(sunk() == Seq(1, 2, 3, 4, 5), "restart must deliver 4,5 exactly once")

    val q3 = start()    // idle restart: no replay, no duplicates
    q3.processAllAvailable()
    q3.stop()
    assert(sunk() == Seq(1, 2, 3, 4, 5))
  }
}
