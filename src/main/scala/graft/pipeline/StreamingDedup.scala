package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Dedup-at-ingest over a document STREAM (the streaming sibling of
  * the batch MinHash+LSH pipeline, q52): every arriving document is
  * checked against all PRIOR documents and, if a verified near-dup
  * exists, emits `(doc_id, dup_of = smallest earlier duplicate)`.
  *
  * Shape: per-row minhash banding (pure array expressions — no
  * aggregation, so it runs on an unbounded stream), shuffle on the
  * (band, bucket) key, and a keyed state op holding the bucket's
  * member shingle sets. A document seals once the watermark passes its
  * event time — every earlier document has then arrived — making the
  * output independent of micro-batch boundaries. State per bucket is
  * its member list: global streaming dedup inherently carries the
  * corpus signature state (bound it in production by windowing the
  * dedup horizon or capping bucket width — degenerate buckets are
  * boilerplate by definition).
  */
object StreamingDedup {

  /** (band, bval) bucket member: micros, doc, SORTED distinct shingles. */
  private type Member = (Long, Long, Seq[String], Boolean) // (tsUs, docId, shingles, emitted)

  private def jaccard(a: Seq[String], b: Seq[String]): Double = {
    var i = 0; var j = 0; var common = 0
    while (i < a.length && j < b.length) {
      val c = a(i).compareTo(b(j))
      if (c == 0) { common += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    common.toDouble / (a.length + b.length - common)
  }

  /** @param horizonSeconds dedup horizon: members sealed longer ago
    *   than this are evicted and can no longer match future arrivals —
    *   the windowed-recall trade-off that bounds state for unbounded
    *   streams (None = global dedup, state grows with the corpus). */
  def minhashDedup(s: SparkSession, dir: String, threshold: Double = 0.1,
      horizonSeconds: Option[Long] = None): DataFrame = {
    import s.implicits._

    val raw = s.read.parquet(s"$dir/documents.parquet").schema
    implicit val sq = s.sqlContext
    // far-future sentinel that drives the watermark past the last real
    // document so it seals too. The sentinel must SURVIVE every filter
    // below the watermark node: Catalyst pushes deterministic filters
    // through the union+watermark down to the sources, and a filtered
    // sentinel never registers its event time — the watermark then
    // stalls at the last real row (exactly the bug this row exists to
    // prevent). It therefore carries 3 words (passes the shingle-length
    // filter) of a reserved token, lives in its own bucket, and — being
    // the stream's maximum timestamp — never seals and is never an
    // "earlier" candidate for anyone.
    val sentinel = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    sentinel.addData((4102444800L, "zsentinela zsentinelb zsentinelc"))
    val fileDocs =
      (if (new java.io.File(s"$dir/documents.parquet").isDirectory)
        s.readStream.schema(raw).parquet(s"$dir/documents.parquet")
      else s.readStream.schema(raw)
        .option("pathGlobFilter", "documents.parquet").parquet(dir))
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    val docs = fileDocs
      .unionByName(sentinel.toDF().toDF("doc_id", "text"))
      // synthetic arrival time: one doc per second in doc_id order,
      // shifted +1s — a ts equal to the INITIAL watermark (epoch 0)
      // is dropped as late before ever reaching the state op
      .withColumn("ts", expr("timestamp_seconds(doc_id + 1)"))
      .withWatermark("ts", "0 seconds")

    // per-row signature: band b's minhash = min over shingles of
    // md5('b:'||shingle) — array expressions only, streaming-safe
    def bandMin(b: Int) = expr(
      s"""array_min(transform(shingles,
         |  x -> CAST(conv(substring(md5(concat('$b:', x)), 1, 8), 16, 10) AS BIGINT)))"""
        .stripMargin)

    val banded = docs
      .withColumn("w", split(lower(col("text")), " "))
      .filter(size(col("w")) >= 3)
      .withColumn("shingles", expr(
        """array_sort(array_distinct(transform(sequence(0, size(w)-3),
          |  i -> concat(w[i], ' ', w[i+1], ' ', w[i+2]))))""".stripMargin))
      .select(col("ts"), unix_micros(col("ts")).as("tsUs"),
        col("doc_id"), col("shingles"),
        posexplode(array((0 to 3).map(bandMin): _*)).as(Seq("band", "bval")))
      .select(col("band"), col("bval"), col("ts"), col("tsUs"),
        col("doc_id"), col("shingles"))
      .as[(Int, Long, java.sql.Timestamp, Long, Long, Seq[String])]

    implicit val stEnc = org.apache.spark.sql.Encoders.kryo[Seq[Member]]
    val pairs = banded
      .groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: (Int, Long), it: Iterator[(Int, Long, java.sql.Timestamp, Long, Long, Seq[String])],
            state: GroupState[Seq[Member]]) => {
          val members = (state.getOption.getOrElse(Seq.empty) ++
            it.map(r => (r._4, r._5, r._6, false)))
            .sortBy(m => (m._1, m._2))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          val updated = members.zipWithIndex.map { case (m @ (ts, doc, sh, emitted), i) =>
            if (emitted || ts >= wmUs) m
            else {
              // all earlier members are present (watermark-sealed):
              // the smallest earlier verified duplicate in this bucket
              // within the horizon of THIS doc's own timestamp (the
              // batching-independent form of the windowed trade-off;
              // state eviction below is its corollary)
              val dup = members.iterator.take(i)
                .filter(e => horizonSeconds.forall(h => e._1 >= ts - h * 1000000L)
                  && jaccard(e._3, sh) >= threshold)
                .map(_._2).minOption
              dup.foreach(d => out += ((doc, d)))
              (ts, doc, sh, true)
            }
          }
          // horizon eviction: only EMITTED members age out (an unsealed
          // row must stay until its own emission)
          val kept = horizonSeconds match {
            case Some(h) => updated.filter(m => !m._4 || m._1 >= wmUs - h * 1000000L)
            case None => updated
          }
          state.update(kept)
          val pending = updated.filter(!_._4)
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(math.max(pending.map(_._1 / 1000L + 1).min,
              state.getCurrentWatermarkMs() + 1))
          out.iterator
        })
      .toDF("doc_id", "dup_of_bucket")

    // one doc can match in several buckets → min over buckets. The
    // stream has completed by here (memory-sink collection), so this
    // final reduction is a plain batch aggregate.
    StreamingDedup.viaMemorySink(s, pairs, "graft_stream_dedup")
      .groupBy(col("doc_id"))
      .agg(min(col("dup_of_bucket")).as("dup_of"))
      .orderBy(col("doc_id"))
  }

  /** Streaming embedding near-dup at ingest — the cosine sibling of
    * [[minhashDedup]]: vectors arrive one per second (vec_id order),
    * block by the coarse bucket (label — swap in a quantizer/k-means
    * assignment freely), and each sealed vector flags the smallest
    * earlier vector in its block with cosine ≥ threshold. Same
    * watermark-sealing determinism argument; state per block is its
    * member vectors with precomputed norms. */
  def embeddingNearDup(s: SparkSession, dir: String, threshold: Double = 0.25): DataFrame = {
    import s.implicits._
    val raw = s.read.parquet(s"$dir/embeddings.parquet").schema
    implicit val sq = s.sqlContext
    // same survival rule as [[minhashDedup]]'s sentinel: no filter may
    // drop it below the watermark node. Label -1 gives it a bucket of
    // its own; as the max-timestamp row it never seals nor serves as
    // an earlier candidate, so the short vector is never compared.
    val sentinel = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Int, Seq[Float])]
    sentinel.addData((4102444800L, -1, Seq(1.0f)))
    val fileVecs =
      (if (new java.io.File(s"$dir/embeddings.parquet").isDirectory)
        s.readStream.schema(raw).parquet(s"$dir/embeddings.parquet")
      else s.readStream.schema(raw)
        .option("pathGlobFilter", "embeddings.parquet").parquet(dir))
        .select(col("vec_id").cast("long").as("vec_id"),
          col("label").cast("int").as("label"), col("embedding"))
    val vecs = fileVecs
      .unionByName(sentinel.toDF().toDF("vec_id", "label", "embedding"))
      .withColumn("ts", expr("timestamp_seconds(vec_id + 1)"))
      .withWatermark("ts", "0 seconds")
      .select(col("label"), col("ts"), unix_micros(col("ts")).as("tsUs"),
        col("vec_id"), col("embedding"))
      .as[(Int, java.sql.Timestamp, Long, Long, Seq[Float])]

    type VMember = (Long, Long, Array[Double], Double, Boolean) // (tsUs, id, vec, norm, emitted)
    implicit val stEnc = org.apache.spark.sql.Encoders.kryo[Seq[VMember]]
    val pairs = vecs.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Int, it: Iterator[(Int, java.sql.Timestamp, Long, Long, Seq[Float])],
            state: GroupState[Seq[VMember]]) => {
          val members = (state.getOption.getOrElse(Seq.empty) ++
            it.map { r =>
              val v = r._5.map(_.toDouble).toArray
              (r._3, r._4, v, math.sqrt(v.map(x => x * x).sum), false)
            }).sortBy(m => (m._1, m._2))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
          val updated = members.zipWithIndex.map { case (m @ (ts, id, v, nrm, emitted), i) =>
            if (emitted || ts >= wmUs) m
            else {
              val dup = members.iterator.take(i).filter { e =>
                var dot = 0.0
                var k = 0
                while (k < v.length) { dot += v(k) * e._3(k); k += 1 }
                // same rounded-score comparison as the batch q96 oracle
                BigDecimal(dot / (nrm * e._4))
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= threshold
              }.map(_._2).minOption
              dup.foreach(d => out += ((id, d)))
              (ts, id, v, nrm, true)
            }
          }
          state.update(updated)
          val pending = updated.filter(!_._5)
          if (pending.nonEmpty)
            state.setTimeoutTimestamp(math.max(pending.map(_._1 / 1000L + 1).min,
              state.getCurrentWatermarkMs() + 1))
          out.iterator
        })
      .toDF("vec_id", "dup_of")

    viaMemorySink(s, pairs, "graft_stream_vec_dedup")
      .orderBy(col("vec_id"))
  }

  private def viaMemorySink(s: SparkSession, df: DataFrame, qname: String): DataFrame = {
    s.catalog.dropTempView(qname)
    val query = df.writeStream.format("memory").queryName(qname)
      .outputMode("append").start()
    query.processAllAvailable()
    query.stop()
    s.table(qname)
  }
}
