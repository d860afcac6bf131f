package graft.table

import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path}
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets
import java.util.EnumSet

/** Explicit retract-stream conversion — the reference's
  * `toRetractStream[T]: DataStream[(Boolean, T)]`
  * (flink-table-planner api/scala/StreamTableEnvironment.scala:148-203):
  * every change to a continuously-updated table is emitted as
  * `(true, newRow)` accumulate and `(false, oldRow)` retract messages.
  *
  * Structured Streaming's update mode delivers only the NEW value of
  * each changed key per micro-batch; the old value needed for the
  * retract message is reconstructed here from a persistent snapshot of
  * the previous table state:
  *
  *   changelog(batch) = (prev ⋉ batch on key) as retracts
  *                    ∪ batch as accumulates
  *   prev'            = (prev ▷ batch on key) ∪ batch
  *
  * Both steps are distributed joins/writes keyed on the group key — no
  * driver-side state — so the conversion scales with the table, and
  * the snapshot is exactly the table's current state (bounded by key
  * cardinality, the same bound Flink's retraction state carries).
  *
  * Snapshot layout (crash-safe): `stateDir/gen-N/` parquet generations
  * plus a `stateDir/CURRENT` pointer file holding N. A batch writes
  * gen-(N+1) fully, then flips the pointer with an atomic rename —
  * a crash at any point leaves CURRENT at a complete generation, so
  * the next batch re-derives its changelog from consistent state
  * (at-least-once, matching foreachBatch replay semantics). Only a
  * MISSING pointer means "first batch": any other read failure
  * (transient IO, corrupt snapshot) propagates instead of being
  * silently treated as an empty table, which would emit a changelog
  * with no retracts and overwrite the real snapshot.
  *
  * Usage: inside `foreachBatch` of an update-mode aggregation,
  * `Retract.changelog(batchDf, dir, keys)` returns the batch's
  * changelog with a leading `accumulate: Boolean` column.
  */
object Retract {

  def changelog(batch: DataFrame, stateDir: String, keys: Seq[String]): DataFrame = {
    val spark = batch.sparkSession
    val cols = batch.columns.toSeq
    val root = new Path(stateDir)
    val fc = FileContext.getFileContext(root.toUri, spark.sparkContext.hadoopConfiguration)
    val pointer = new Path(root, "CURRENT")
    val curGen: Option[Long] =
      if (!fc.util.exists(pointer)) None
      else {
        val in = fc.open(pointer)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
        Some(txt.toLong)
      }
    def genPath(g: Long) = new Path(root, s"gen-$g")
    // errors here (unreadable/incomplete generation) deliberately
    // propagate — see crash-safety note in the Scaladoc
    val prev: Option[DataFrame] = curGen.map(g => spark.read.parquet(genPath(g).toString))
    val keyCols = keys.map(col)
    val retracts = prev match {
      case Some(p) =>
        p.join(batch.select(keyCols: _*), keys, "left_semi")
          .select(lit(false).as("accumulate") +: cols.map(col): _*)
      case None => spark.emptyDataFrame
    }
    val accumulates =
      batch.select(lit(true).as("accumulate") +: cols.map(col): _*)
    val next = prev match {
      case Some(p) => p.join(batch.select(keyCols: _*), keys, "left_anti")
        .unionByName(batch)
      case None => batch
    }
    // the changelog must be MATERIALIZED before superseded generations
    // are deleted under it — localCheckpoint(eager) cuts the lineage
    // back to the pre-rotation parquet (a cache is not a barrier: a
    // cache miss would silently re-read post-GC state). The changelog
    // is batch-sized, so the checkpoint is cheap at any table size.
    val out =
      (if (prev.isDefined) retracts.unionByName(accumulates) else accumulates)
        .localCheckpoint(true)
    val nextGen = curGen.getOrElse(-1L) + 1
    next.write.mode(SaveMode.Overwrite).parquet(genPath(nextGen).toString)
    // atomic pointer flip: readers either see the old or the new
    // generation, never a partial one
    val tmp = new Path(root, "CURRENT.tmp")
    val os = fc.create(tmp, EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
      Options.CreateOpts.createParent())
    try os.write(nextGen.toString.getBytes(StandardCharsets.UTF_8)) finally os.close()
    fc.rename(tmp, pointer, Options.Rename.OVERWRITE)
    // best-effort GC of superseded generations (incl. orphans from a
    // crash before a flip) — failure here only leaks disk, never state
    try {
      val it = fc.util.listStatus(root).iterator
      while (it.hasNext) {
        val st = it.next()
        val n = st.getPath.getName
        if (n.startsWith("gen-") && n != s"gen-$nextGen")
          fc.delete(st.getPath, true)
      }
    } catch { case _: java.io.IOException => () }
    out
  }
}
