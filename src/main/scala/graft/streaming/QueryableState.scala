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
        // update mode emits each key at most once per micro-batch —
        // the documented uniqueKeys contract, so the hot path skips
        // the safety repartition
        upsertBatch(batch, keyCols, url, table, props, uniqueKeys = true))
      .start()

  /** Transactional per-partition key upsert; safe under replays.
    *
    * Identifier quoting contract: COLUMN names are quoted because
    * Spark's JDBC writer creates them with quoted (case-preserving)
    * identifiers; the TABLE name is deliberately NOT quoted because
    * the same writer issues `CREATE TABLE $table` with the name
    * passed through verbatim (users pass schema-qualified names) —
    * quoting it here would miss the table the 0-row append just
    * created whenever the database case-folds unquoted identifiers
    * (Derby folds to upper). Both statements below resolve the table
    * exactly the way the writer that created it did.
    *
    * Round-trips: one `executeBatch` pair per `jdbcBatchSize` rows
    * (Spark's own JDBC writer batches inserts for the same reason) —
    * at high key-churn this was the latency bound when each row paid
    * a DELETE + INSERT round trip (r9 verdict #3). Delete and insert
    * batches flush in that order per chunk, so the per-key
    * delete-then-insert idempotency argument is unchanged: update
    * mode emits each key at most once per micro-batch. */
  private[streaming] val jdbcBatchSize = 500

  private def ensureKeyIndex(url: String, table: String,
      keyCols: Seq[String], props: java.util.Properties): Unit =
    JdbcIndexes.ensure(url, table, "KIDX",
      keyCols.map(k => s""""$k"""").mkString(", "), props)

  /** Canonical form of a key VALUE for the duplicate-key seen-set:
    * Spark surfaces binary columns as `Array[Byte]`, whose `equals`
    * is reference identity — an array-typed key would never match
    * itself, silently skipping the early flush and keeping both rows
    * (r12 advice finding). Arrays (recursively) become `Seq`, which
    * has structural equality; scalars pass through. */
  private[streaming] def canonKey(v: Any): Any = v match {
    case a: Array[_] => a.toIndexedSeq.map(canonKey)
    case s: Seq[_]   => s.map(canonKey)
    case other       => other
  }

  /** @param uniqueKeys callers that GUARANTEE at most one row per key
    *   (update-mode streaming output — the sink's own path) skip the
    *   key repartition. For everyone else the shuffle is what makes
    *   duplicates safe ACROSS partitions: two partitions holding the
    *   same key upsert over independent connections whose
    *   delete/insert order can interleave, leaving two rows — the
    *   in-partition early-flush alone cannot see that (r11
    *   self-review finding). Which duplicate wins follows the
    *   post-shuffle iterator order: deterministic per source
    *   partitioning, last-in-order for a single-partition source. */
  private[streaming] def upsertBatch(batch0: DataFrame, keyCols: Seq[String],
      url: String, table: String, props: java.util.Properties,
      uniqueKeys: Boolean = false): Unit = {
    val batch =
      if (uniqueKeys) batch0 else batch0.repartition(keyCols.map(col): _*)
    // ensure the table exists with the batch's schema (0-row append)
    batch.limit(0).write.mode(org.apache.spark.sql.SaveMode.Append)
      .jdbc(url, table, props)
    // and that the key is indexed: Spark's writer creates no indexes,
    // so the per-key DELETE would otherwise be a full heap scan —
    // unbounded lock footprint (concurrent partition transactions
    // deadlock on scan read-locks) and per-upsert cost growing with
    // the table. With the index each delete is a point lookup, so
    // transactions touching disjoint keys don't contend.
    ensureKeyIndex(url, table, keyCols, props)
    val schema = batch.schema
    val cols = schema.fieldNames.toSeq
    val del = s"""DELETE FROM $table WHERE ${
      keyCols.map(k => s""""$k" = ?""").mkString(" AND ")}"""
    val ins = s"""INSERT INTO $table (${cols.map(c => s""""$c"""").mkString(", ")})
                 |VALUES (${cols.map(_ => "?").mkString(", ")})""".stripMargin
    val keyIdx = keyCols.map(schema.fieldIndex)
    val propsMap = new java.util.Properties(); propsMap.putAll(props)
    val chunk = jdbcBatchSize
    batch.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = java.sql.DriverManager.getConnection(url, propsMap)
        var dSt: java.sql.PreparedStatement = null
        var iSt: java.sql.PreparedStatement = null
        try {
          conn.setAutoCommit(false)
          dSt = conn.prepareStatement(del)
          iSt = conn.prepareStatement(ins)
          // Chunked flushing runs all of a chunk's DELETEs before its
          // INSERTs, so a key appearing TWICE in one chunk would keep
          // both inserted rows (the second delete precedes the first
          // insert). Update-mode streaming emits each key once per
          // micro-batch, but upsertBatch is also called directly —
          // flush the chunk early whenever a key repeats, restoring
          // per-key delete-then-insert order (last row wins) at zero
          // cost on the duplicate-free path.
          var n = 0
          val seen = scala.collection.mutable.HashSet.empty[Seq[Any]]
          rows.foreach { r =>
            val key = keyIdx.map(i => canonKey(r.get(i))).toList
            if (!seen.add(key)) {
              dSt.executeBatch(); iSt.executeBatch()
              seen.clear(); seen.add(key); n = 0
            }
            keyIdx.zipWithIndex.foreach { case (ki, p) =>
              dSt.setObject(p + 1, r.get(ki)) }
            dSt.addBatch()
            cols.indices.foreach(i => iSt.setObject(i + 1, r.get(i)))
            iSt.addBatch()
            n += 1
            if (n % chunk == 0) {
              dSt.executeBatch(); iSt.executeBatch(); seen.clear(); n = 0
            }
          }
          dSt.executeBatch(); iSt.executeBatch()
          conn.commit()
        } catch { case t: Throwable =>
          try conn.rollback()
          catch { case s: Throwable => t.addSuppressed(s) }
          throw t
        } finally {
          // close in finally: a failed executeBatch used to leak the
          // statements until conn.close with no explicit rollback
          if (dSt != null) { try dSt.close() catch { case _: Throwable => () } }
          if (iSt != null) { try iSt.close() catch { case _: Throwable => () } }
          conn.close()
        }
      }
    }
  }
}
