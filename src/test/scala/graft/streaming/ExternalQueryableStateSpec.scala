package graft.streaming

import graft.SparkSpec
import graft.sources.Jdbc
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The external-store queryable state path: per-key state upserted
  * into a JDBC table each trigger, point-queried from the DATABASE —
  * the serving tier when key cardinality outgrows one process.
  */
class ExternalQueryableStateSpec extends SparkSpec {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftqs;create=true"
  private val props = {
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  test("mid-stream DB lookups see committed state, update-mode upserts converge") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val state = in.toDF().toDF("k", "v")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n"), round(sum(col("v")), 6).as("sum_v"))
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-extqs").toString
    val table = "QSTATE"
    val q = QueryableState.asExternalQueryableState(
      state, Seq("k"), url, table, ckpt, props)
    try {
      in.addData((1L, 1.5), (1L, 2.0), (2L, 10.0))
      q.processAllAvailable()
      def get(k: Long) =
        Jdbc.read(spark, url, table, props).filter(col("k") === k).collect()
      val r1 = get(1L)
      assert(r1.length == 1 && r1(0).getAs[Long]("n") == 2
        && r1(0).getAs[Double]("sum_v") == 3.5)
      assert(get(99L).isEmpty, "unknown key must miss")

      in.addData((1L, 0.5), (3L, 7.0))
      q.processAllAvailable()
      val r2 = get(1L)
      assert(r2.length == 1 && r2(0).getAs[Long]("n") == 3
        && r2(0).getAs[Double]("sum_v") == 4.0)
      assert(get(3L).length == 1)
      assert(Jdbc.read(spark, url, table, props).count() == 3,
        "exactly one state row per key after upserts")

      // replay convergence: re-applying a batch's rows is a no-op
      val snapshot = Jdbc.read(spark, url, table, props)
        .filter(col("k") === 1L)
      QueryableState.upsertBatch(snapshot, Seq("k"), url, table, props)
      assert(Jdbc.read(spark, url, table, props).count() == 3)
      assert(get(1L).length == 1)
    } finally q.stop()
  }

  test("replay convergence survives JDBC batching across chunk boundaries") {
    // r10: upsertBatch flushes addBatch'd deletes+inserts per
    // jdbcBatchSize chunk instead of one round trip per row. The
    // idempotency argument (delete-then-insert per key) must hold
    // across chunk boundaries, so drive it with MORE keys than one
    // chunk and replay the whole batch.
    val table = "QSTATE_BATCHED"
    val n = QueryableState.jdbcBatchSize * 2 + 37 // 3 chunks, last partial
    val batch = spark.range(n.toLong)
      .select(col("id").as("k"), (col("id") * 2).as("doubled"))
    QueryableState.upsertBatch(batch, Seq("k"), url, table, props)
    def all() = Jdbc.read(spark, url, table, props)
    assert(all().count() == n.toLong)
    // replay: same rows again — exactly one row per key, values intact
    QueryableState.upsertBatch(batch, Seq("k"), url, table, props)
    assert(all().count() == n.toLong, "replay duplicated rows across chunks")
    // updated state for a subset replaces, never appends
    val upd = spark.range(10).select(col("id").as("k"), lit(-1L).as("doubled"))
    QueryableState.upsertBatch(upd, Seq("k"), url, table, props)
    assert(all().count() == n.toLong)
    assert(all().filter(col("doubled") === -1L).count() == 10)
  }

  test("duplicate keys within one direct upsertBatch keep exactly one row (last wins)") {
    // Chunked flushing runs a chunk's deletes before its inserts; a
    // repeated key used to survive as TWO rows. The early-flush on
    // key repeat restores per-key delete-then-insert order.
    val table = "QSTATE_DUPKEYS"
    val batch = spark.createDataFrame(Seq(
        (1L, 10L, 0), (2L, 20L, 1), (1L, 11L, 2), (1L, 12L, 3), (3L, 30L, 4)))
      .toDF("k", "v", "ord")
      .coalesce(1).sortWithinPartitions("ord")
      .select(col("k"), col("v"))
    QueryableState.upsertBatch(batch, Seq("k"), url, table, props)
    val rows = Jdbc.read(spark, url, table, props)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[Long]("v")).toMap
    assert(Jdbc.read(spark, url, table, props).count() == 3,
      "duplicate key left extra rows")
    assert(rows == Map(1L -> 12L, 2L -> 20L, 3L -> 30L), s"got $rows")
  }

  test("duplicate keys ACROSS partitions still collapse to one row per key") {
    // without the key repartition, two partitions holding the same
    // key upsert over independent connections whose delete/insert
    // order can interleave — two rows survive
    val table = "QSTATE_XPART"
    val batch = spark.createDataFrame(Seq(
        (1L, 10L), (2L, 20L), (1L, 11L), (3L, 30L), (1L, 12L)))
      .toDF("k", "v").repartition(4) // keys scattered across partitions
    QueryableState.upsertBatch(batch, Seq("k"), url, table, props)
    val rows = Jdbc.read(spark, url, table, props)
    assert(rows.count() == 3, "cross-partition duplicate key left extra rows")
    val v1 = rows.filter(col("k") === 1L).collect().map(_.getAs[Long]("v"))
    assert(v1.length == 1 && Set(10L, 11L, 12L).contains(v1(0)))
  }

  test("schema-qualified table: index ensure is idempotent, not re-attempted each call") {
    // r10 advice: the old metadata probe looked up the UNSPLIT
    // upper-cased name, so on any qualified table the index lookup
    // never matched and the second call's CREATE INDEX threw. Two
    // upserts on a qualified table must succeed and leave the index.
    val table = "GRAFTQ.QSTATE_SCHEMA"
    val batch = spark.range(5).select(col("id").as("k"), col("id").as("v"))
    QueryableState.upsertBatch(batch, Seq("k"), url, table, props)
    QueryableState.upsertBatch(batch, Seq("k"), url, table, props)
    assert(Jdbc.read(spark, url, table, props).count() == 5)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val rs = conn.getMetaData.getIndexInfo(
        null, "GRAFTQ", "QSTATE_SCHEMA", false, false)
      var found = false
      while (rs.next() && !found)
        found = "QSTATE_SCHEMA_KIDX".equalsIgnoreCase(rs.getString("INDEX_NAME"))
      rs.close()
      assert(found, "key index missing on schema-qualified table")
    } finally conn.close()
  }
}
