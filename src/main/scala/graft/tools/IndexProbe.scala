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
  *   IndexProbe build <corpusDir> <indexPath> [bandBuckets docBuckets]
  *     — save() the index at the given fan-outs (persisted in the
  *     index metadata; defaults 256/64)
  *   IndexProbe delta <deltaDir> <indexPath>    — time dedupDelta of
  *     deltaDir's doc_id % 10 == 9 slice against the stored index,
  *     and print each parquet scan's partitions/files-read metrics
  *     (the dynamic-partition-pruning evidence)
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
        val bb = args.lift(3).map(_.toInt)
          .getOrElse(graft.pipeline.DedupIndex.bandBuckets)
        val db = args.lift(4).map(_.toInt)
          .getOrElse(graft.pipeline.DedupIndex.docBuckets)
        val layout = args.lift(5).getOrElse("pd")
        val groups = args.lift(6).map(_.toInt).getOrElse(0)
        val t0 = System.nanoTime()
        graft.pipeline.DedupIndex.save(
          graft.Tables.t(spark, dataDir, "documents")
            .filter(col("doc_id") % 10 =!= 9), indexPath, bb, db, layout,
          groups)
        println(f"[indexprobe] build ${(System.nanoTime() - t0) / 1e9}%.1f s bandBuckets=$bb docBuckets=$db shingleLayout=$layout shingleGroups=$groups")
      case "delta" =>
        val delta = graft.Tables.t(spark, dataDir, "documents")
          .filter(col("doc_id") % 10 === 9)
        // warm the session (file listing, codegen) on a trivial action
        delta.limit(1).count()
        val t0 = System.nanoTime()
        val df = graft.pipeline.DedupIndex.dedupDelta(spark, delta, indexPath)
        // full-evaluation action through df's OWN QueryExecution —
        // write.save / Dataset.foreach both re-plan a DERIVED
        // execution whose scan metrics stay zero; toRdd runs the
        // exact plan instance the metrics live on
        df.queryExecution.toRdd.foreach(_ => ())
        println(f"[indexprobe] delta probe ${(System.nanoTime() - t0) / 1e9}%.2f s")
        // pruning evidence: executed-plan scan metrics (partitions and
        // files actually read after dynamic partition pruning)
        org.apache.spark.sql.graftbridge.Bridge.scanMetrics(df)
          .filter(m => m._1.contains("bands") || m._1.contains("shingles"))
          .foreach { case (id, parts, files) =>
            println(s"[indexprobe] scan $id: partitionsRead=$parts filesRead=$files") }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
