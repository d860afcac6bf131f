package graft.table

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

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
  * Usage: inside `foreachBatch` of an update-mode aggregation,
  * `Retract.changelog(batchDf, dir, keys)` returns the batch's
  * changelog with a leading `accumulate: Boolean` column.
  */
object Retract {

  def changelog(batch: DataFrame, stateDir: String, keys: Seq[String]): DataFrame = {
    val spark = batch.sparkSession
    val cols = batch.columns.toSeq
    val prev: Option[DataFrame] =
      try Some(spark.read.parquet(stateDir)) catch { case _: Throwable => None }
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
    // the changelog must be MATERIALIZED before the snapshot rotates
    // under it — localCheckpoint(eager) cuts the lineage back to the
    // pre-rotation parquet (a cache is not a barrier: a cache miss
    // would silently re-read the new snapshot). The changelog is
    // batch-sized, so the checkpoint is cheap at any table size.
    val out =
      (if (prev.isDefined) retracts.unionByName(accumulates) else accumulates)
        .localCheckpoint(true)
    // rotate via .next so the new snapshot is fully written from the
    // old one before the old one is replaced (overwrite-in-place would
    // delete the input of its own scan)
    next.write.mode(SaveMode.Overwrite).parquet(stateDir + ".next")
    spark.read.parquet(stateDir + ".next").write
      .mode(SaveMode.Overwrite).parquet(stateDir)
    out
  }
}
