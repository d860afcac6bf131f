package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: measure DedupIndex per-delta probe cost against indexes
  * built from corpora of different ages (sizes), holding the DELTA
  * fixed — the claim under test is that daily-ingest cost tracks the
  * delta, not the standing corpus, because the corpus's
  * shingle+minhash work lives in the persisted index and dynamic
  * partition pruning bounds the probe's index I/O.
  *
  * Usage:
  *   IndexProbe build <corpusDir> <indexPath>   — save() the index
  *   IndexProbe delta <deltaDir> <indexPath>    — time dedupDelta of
  *     deltaDir's doc_id % 10 == 9 slice against the stored index
  */
object IndexProbe {
  def main(args: Array[String]): Unit = {
    val Array(mode, dataDir, indexPath) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mode match {
      case "build" =>
        val t0 = System.nanoTime()
        graft.pipeline.DedupIndex.save(
          graft.Tables.t(spark, dataDir, "documents")
            .filter(col("doc_id") % 10 =!= 9), indexPath)
        println(f"[indexprobe] build ${(System.nanoTime() - t0) / 1e9}%.1f s")
      case "delta" =>
        val delta = graft.Tables.t(spark, dataDir, "documents")
          .filter(col("doc_id") % 10 === 9)
        // warm the session (file listing, codegen) on a trivial action
        delta.limit(1).count()
        val t0 = System.nanoTime()
        graft.pipeline.DedupIndex
          .dedupDelta(spark, delta, indexPath)
          .write.format("noop").mode("overwrite").save()
        println(f"[indexprobe] delta probe ${(System.nanoTime() - t0) / 1e9}%.2f s")
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
