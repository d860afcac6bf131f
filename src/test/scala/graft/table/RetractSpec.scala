package graft.table

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import scala.collection.mutable

class RetractSpec extends SparkSpec {
  import spark.implicits._

  test("toRetractStream emits (accumulate, row) and (retract, oldRow) pairs") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_retract").toString
    val stateDir = dir + "/state"
    val log = mutable.ArrayBuffer[(Boolean, String, Long)]()
    val in = MemoryStream[(String, Int)]
    val agg = in.toDF().toDF("k", "v").groupBy("k").agg(count(lit(1)).as("n"))
    val query = agg.writeStream.outputMode("update")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        if (!batch.isEmpty) {
          val cl = Retract.changelog(batch, stateDir, Seq("k"))
          val rows = cl.select(col("accumulate"), col("k"), col("n"))
            .as[(Boolean, String, Long)].collect()
            .sortBy(r => (r._2, r._1)) // deterministic within batch
          log.synchronized { log ++= rows }
          ()
        }
      }
      .start()
    try {
      in.addData(("a", 1))
      query.processAllAvailable()
      assert(log.toList == List((true, "a", 1L)))
      in.addData(("a", 2), ("b", 7))
      query.processAllAvailable()
      // a changed: retract old count 1, accumulate new count 2; b is new
      assert(log.toList == List(
        (true, "a", 1L),
        (false, "a", 1L), (true, "a", 2L),
        (true, "b", 1L)))
      // final table state reconstructed from the changelog == snapshot
      val replay = log.groupBy(_._2).map { case (k, msgs) =>
        (k, msgs.reverse.find(_._1).get._3)
      }
      assert(replay == Map("a" -> 2L, "b" -> 1L))
    } finally query.stop()
  }
}
