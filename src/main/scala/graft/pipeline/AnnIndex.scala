package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted standing ANN index with STREAMING ingest — the
  * similarity-search family's analog of [[DedupIndex]] (r15 verdict
  * next-round item 2): a training-data pipeline ingesting vectors
  * continuously cannot re-fit IVF-PQ per batch; it freezes a fitted
  * index (coarse k-means router + per-subspace PQ codebooks, q190's
  * models) and assigns each arriving vector to its cell AT INGEST —
  * a pure per-row map against broadcast-sized model literals (no
  * aggregation, streaming-safe the way q229's DHashSig is), with
  * day-close index-partition commits through the ingestEos 2PC
  * pattern (ExactlyOnceJdbc's idempotent epoch writes + the
  * high-water-mark sidecar).
  *
  * Layout under `path`:
  *  - `model/centroids`  (cluster, cv)   — the 8-row coarse router
  *  - `model/codebooks`  (j, code, cv)   — the m·ks = 16 PQ codewords
  *  - `postings/`        (vec_id, cluster, c0..c3) partitioned by cluster
  *  - `commit_watermark.properties`      — commitAdmitted's hwm
  *
  * The postings partitioning IS the query-time scale story: an IVF
  * probe reads exactly its cluster's partition (the q176 DPP
  * posture applied to vectors), and ingest appends are new files in
  * existing partitions — the standing corpus is never rewritten.
  *
  * ASSIGNMENT SEMANTICS are bit-identical to the batch fit+assign
  * (q135's deterministic Lloyd's conventions: 6-dp rounding, ties to
  * the lowest id — AnnIngestSpec pins stream ≡ batch on the same
  * slice; q238's DuckDB oracle replays fit AND delta assignment):
  * the per-row expression computes the same round(vec_sq_dist, 6)
  * argmin the relational assignFlat aggregate does, just against
  * literal arrays instead of a broadcast join — which is what makes
  * it legal inside a streaming projection.
  *
  * Reference behavior: linweijiang/Flink-1.8-SourceCode has no vector
  * index; this extends the LLM-pipeline family (SURVEY §2 LLM-ops)
  * the way its dedup twin (DedupIndex.scala) does.
  */
object AnnIndex {

  import graft.functions.VecMath

  /** Fit the frozen models on the standing corpus and persist model +
    * corpus postings. The fit is q190's exact recipe (coarse k=8
    * Lloyd's with 2 updates; m=4 × ks=4 PQ codebooks over raw
    * coordinates) — at 100 TB the fit runs on a sample (the
    * kmeansCentroids scaladoc posture); the corpus postings pass is
    * the only full scan and it is the same per-row map ingest uses. */
  def save(s: SparkSession, corpus: DataFrame, path: String): Unit = {
    val cent = Similarity.kmeansCentroids(corpus, 8, 2)
    val (_, cb1, _) = Similarity.pqModel(Similarity.edOf(corpus))
    cent.write.mode("overwrite").parquet(s"$path/model/centroids")
    cb1.write.mode("overwrite").parquet(s"$path/model/codebooks")
    val fn = assigner(s, path)
    fn(corpus)
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster")
      .parquet(s"$path/postings")
  }

  /** Build the PER-ROW assignment function from the PERSISTED model:
    * reads the (broadcast-class) centroid/codebook tables back and
    * compiles them into literal-array expressions — cluster = argmin
    * over 8 centroid distances, c_j = argmin over 4 codeword
    * distances per subspace. Stateless, aggregation-free, usable in a
    * batch projection or a streaming one (doubles round-trip parquet
    * bit-exactly, so a read-back model assigns identically to the
    * in-memory fit). */
  def assigner(s: SparkSession, path: String): DataFrame => DataFrame = {
    val centArr = s.read.parquet(s"$path/model/centroids")
      .select(col("cluster").cast("long"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    val cbArr = s.read.parquet(s"$path/model/codebooks")
      .select(col("j").cast("int"), col("code").cast("long"), col("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .groupBy(_._1)
    require(centArr.nonEmpty && cbArr.nonEmpty,
      s"$path/model is empty — not an AnnIndex (rebuild with AnnIndex.save)")
    def argmin(cands: Seq[(Long, Seq[Double])], v: Column, out: String): Column =
      array_min(array(cands.map { case (id, cv) =>
        struct(round(VecMath.vec_sq_dist(v, typedLit(cv)), 6).as("dist"),
          lit(id).as("id"))
      }: _*)).getField("id").cast("int").as(out)
    df => {
      val withEv = df.withColumn("__ev",
        expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      val cols = col("vec_id") +:
        argmin(centArr.toSeq, col("__ev"), "cluster") +:
        (0 until 4).map { j =>
          argmin(cbArr(j).map(t => (t._2, t._3)).toSeq,
            slice(col("__ev"), j * 16 + 1, 16), s"c$j")
        }
      withEv.select(cols: _*)
    }
  }

  /** Append assigned postings (new files in existing cluster
    * partitions — nothing about the standing index is rewritten). */
  def append(assigned: DataFrame, path: String): Unit =
    assigned
      .repartition(col("cluster"))
      .write.mode("append").partitionBy("cluster")
      .parquet(s"$path/postings")

  /** The CRASH-SAFE ingest loop (the DedupIndex.ingestEos pattern):
    * each micro-batch's assignments commit through ExactlyOnceJdbc's
    * batchId-scrubbed idempotent epoch write, so a foreachBatch
    * replay after a crash lands every assignment exactly once; the
    * day-close [[commitAdmitted]] then reads them back from the
    * store. Crash/replay schedule proven in AnnIngestSpec against
    * embedded Derby. */
  def ingestEos(s: SparkSession, delta: DataFrame, path: String,
      url: String, table: String, checkpointDir: String,
      props: java.util.Properties)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val fn = assigner(s, path)
    delta.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        graft.streaming.ExactlyOnceJdbc
          .commitBatch(fn(batch).localCheckpoint(), id, url, table, props)
      }
      .start()
  }

  /** Day-close for [[ingestEos]]: append the exactly-once store's new
    * epochs to the postings partitions, IDEMPOTENTLY — the same
    * closed-on-both-ends high-water-mark window as
    * [[DedupIndex.commitAdmitted]] (hwm < batch_id <= newHwm sampled
    * up front; the frame is localCheckpoint'd into one snapshot
    * before the append so the write never races the live stream). */
  def commitAdmitted(s: SparkSession, path: String, url: String,
      table: String, props: java.util.Properties): Unit = {
    val hwm = DedupIndex.loadProps(path, "commit_watermark.properties")
      .map(_.getProperty("hwm").toLong).getOrElse(-1L)
    val store = graft.sources.Jdbc.read(s, url, table, props)
    val newHwm = store.filter(col("batch_id") > hwm)
      .agg(max(col("batch_id"))).head().get(0)
    if (newHwm != null) {
      val admitted = store
        .filter(col("batch_id") > hwm &&
          col("batch_id") <= lit(newHwm.asInstanceOf[Long]))
        .drop("batch_id")
        .localCheckpoint()
      try append(admitted, path)
      finally admitted.unpersist()
      DedupIndex.storeProps(path, "commit_watermark.properties",
        Map("hwm" -> newHwm.toString),
        "graft AnnIndex committed-epoch high-water mark")
    }
  }
}
