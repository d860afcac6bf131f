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

  test("changelog propagates snapshot read failures instead of treating them as first batch") {
    val stateDir = java.nio.file.Files.createTempDirectory("graft_retract_err").toString + "/state"
    val b = Seq(("a", 1L)).toDF("k", "n")
    Retract.changelog(b, stateDir, Seq("k")).collect()
    // corrupt: pointer names a generation that does not exist — a
    // first-batch fallback here would silently drop every retract AND
    // overwrite the snapshot; it must throw instead
    val pw = new java.io.PrintWriter(stateDir + "/CURRENT")
    try pw.print("999") finally pw.close()
    intercept[Exception] { Retract.changelog(b, stateDir, Seq("k")).collect() }
  }

  test("a crash before the pointer flip leaves the snapshot consistent") {
    val stateDir = java.nio.file.Files.createTempDirectory("graft_retract_crash").toString + "/state"
    val b1 = Seq(("a", 1L)).toDF("k", "n")
    Retract.changelog(b1, stateDir, Seq("k")).collect()
    // simulate a batch that crashed after writing its generation but
    // before flipping CURRENT: an orphan gen dir the next batch must
    // ignore (and GC), deriving its changelog from the pointed-at gen
    Seq(("junk", 99L)).toDF("k", "n").write.parquet(stateDir + "/gen-7")
    val cl = Retract.changelog(Seq(("a", 2L)).toDF("k", "n"), stateDir, Seq("k"))
      .select(col("accumulate"), col("k"), col("n")).as[(Boolean, String, Long)]
      .collect().sortBy(r => (r._2, r._1)).toList
    assert(cl == List((false, "a", 1L), (true, "a", 2L)))
    val cur = scala.io.Source.fromFile(stateDir + "/CURRENT").mkString.trim
    assert(cur == "1")
    assert(!new java.io.File(stateDir + "/gen-7").exists(), "orphan generation not GCed")
    assert(!new java.io.File(stateDir + "/gen-0").exists(), "superseded generation not GCed")
  }
}
