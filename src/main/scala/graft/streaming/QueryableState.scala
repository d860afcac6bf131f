package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.StreamingQuery

/** Analog of the reference's queryable state (KeyedStream.java:1004
  * `asQueryableState`, flink-queryable-state QueryableStateClient
  * .java:81): a keyed streaming aggregation whose per-key state is
  * continuously published as a named snapshot table that clients can
  * point-query BY KEY WHILE THE JOB RUNS, independently of the
  * stream's own sinks.
  *
  * Spark has no external state-query RPC, so the state is served from
  * a complete-mode memory sink: every trigger atomically replaces the
  * snapshot with the latest committed per-key state (same read
  * semantics as the reference — a client sees some recent consistent
  * state, never a torn one; the reference likewise serves whatever
  * the TM's state backend holds at request time).
  *
  * Scale: the snapshot holds one row per KEY (not per event), i.e.
  * exactly the queryable state itself; the reference holds the same
  * state in task-manager heap/RocksDB. When key cardinality outgrows
  * one process, keep the identical stream and swap the memory sink
  * for a `foreachBatch` KV upsert (the checkpoint-aligned idempotent
  * pattern in [[graft.streaming.ExactlyOnceJdbc]]) — the query-side
  * API then points at the external store; nothing upstream changes.
  */
final class QueryableStateStore private[streaming] (
    spark: SparkSession, val name: String, query: StreamingQuery) {

  /** Block until every available input is reflected in the state. */
  def processAllAvailable(): Unit = query.processAllAvailable()

  /** Latest committed full state snapshot (one row per key). */
  def snapshot(): DataFrame = spark.table(name)

  /** Point lookup — QueryableStateClient.getKvState analog. */
  def get(keyCol: String, key: Any): Option[Row] =
    snapshot().filter(col(keyCol) === key).collect().headOption

  def stop(): Unit = {
    query.stop()
    spark.catalog.dropTempView(name)
  }
}

object QueryableState {

  /** Start serving `keyedAgg` (a streaming aggregation, one row per
    * key) as queryable state under `name`. The caller owns the
    * returned handle's lifecycle, like the reference's
    * QueryableStateStream. */
  def asQueryableState(spark: SparkSession, name: String,
      keyedAgg: DataFrame): QueryableStateStore = {
    spark.catalog.dropTempView(name)
    val q = keyedAgg.writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    new QueryableStateStore(spark, name, q)
  }

  /** External-store variant — the scale escalation the memory-sink
    * path documents: per-key state is UPSERTED into a JDBC table
    * each trigger (update output mode ships only keys whose state
    * changed), and clients query the DATABASE, so key cardinality is
    * bounded by the store, not by any single process. The upsert
    * (delete-by-key + insert, one transaction per partition) is
    * idempotent per key, so epoch replays converge — the same
    * argument as [[ExactlyOnceJdbc]], with the key itself as the
    * idempotency scope. This mirrors the reference's external state
    * serving more faithfully than the snapshot table: reads hit a
    * store fed asynchronously by the job, and see some recent
    * committed state. */
  def asExternalQueryableState(keyedAgg: DataFrame, keyCols: Seq[String],
      url: String, table: String, checkpointDir: String,
      props: java.util.Properties = new java.util.Properties): StreamingQuery =
    keyedAgg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch((batch: DataFrame, _: Long) =>
        upsertBatch(batch, keyCols, url, table, props))
      .start()

  /** Transactional per-partition key upsert; safe under replays. */
  private[streaming] def upsertBatch(batch: DataFrame, keyCols: Seq[String],
      url: String, table: String, props: java.util.Properties): Unit = {
    // ensure the table exists with the batch's schema (0-row append)
    batch.limit(0).write.mode(org.apache.spark.sql.SaveMode.Append)
      .jdbc(url, table, props)
    val schema = batch.schema
    val cols = schema.fieldNames.toSeq
    val del = s"""DELETE FROM $table WHERE ${
      keyCols.map(k => s""""$k" = ?""").mkString(" AND ")}"""
    val ins = s"""INSERT INTO $table (${cols.map(c => s""""$c"""").mkString(", ")})
                 |VALUES (${cols.map(_ => "?").mkString(", ")})""".stripMargin
    val keyIdx = keyCols.map(schema.fieldIndex)
    val propsMap = new java.util.Properties(); propsMap.putAll(props)
    batch.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url, propsMap)
        try {
          conn.setAutoCommit(false)
          val dSt = conn.prepareStatement(del)
          val iSt = conn.prepareStatement(ins)
          rows.foreach { r =>
            keyIdx.zipWithIndex.foreach { case (ki, p) =>
              dSt.setObject(p + 1, r.get(ki)) }
            dSt.executeUpdate()
            cols.indices.foreach(i => iSt.setObject(i + 1, r.get(i)))
            iSt.executeUpdate()
          }
          conn.commit()
          dSt.close(); iSt.close()
        } finally conn.close()
      }
    }
  }
}
