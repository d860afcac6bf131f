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
  *  - `model/centroids`  (cluster, cv)   — the k-row coarse router
  *  - `model/codebooks`  (j, code, cv)   — the m·ks PQ codewords
  *  - `model/families`   (cluster, family) — split lineage (absent
  *    until [[splitCell]] runs; identity where unlisted)
  *  - `postings/`  (vec_id, c0..c_{m-1}) partitioned by (cluster,
  *    epoch) — epoch −1 is the base build, committed ingest windows
  *    land as their own epoch directories (see [[commitAdmitted]])
  *  - `commit_watermark.properties`      — commitAdmitted's hwm
  *  - `model_epoch.properties`           — bumped by [[splitCell]]
  *
  * The postings partitioning IS the query-time scale story: an IVF
  * probe reads exactly its cluster's partition (the q176 DPP
  * posture applied to vectors), and ingest appends are new epoch
  * directories under existing cluster partitions — the standing
  * corpus is never rewritten (except the one cell a [[splitCell]]
  * maintenance pass rebalances).
  *
  * GEOMETRY IS PARAMETERIZED (r16 verdict item 2 — the r16 form's
  * k=8/m=4/subDim=16 were hardcoded fixture-scale constants): `save`
  * takes (k, updates, m, ks, subDim, fitLimit) and [[assigner]]
  * derives everything from the PERSISTED model — k from the centroid
  * row count, m from the codebook's j values, subDim from the
  * codeword vector widths — so a 1000-cell index builds and probes
  * through the same code the q190-default oracles pin. `fitLimit`
  * is the fit-on-a-sample posture made real: the models fit on the
  * `vec_id < fitLimit` PREFIX slice (prefix, so the deterministic
  * first-k/first-ks inits stay present) while the postings pass —
  * the only full scan — assigns the whole corpus.
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

  /** The base build's epoch directory; committed windows use their
    * exactly-once-store high-water mark (>= 0), so −1 never collides. */
  private val baseEpoch = -1L

  /** Fit the frozen models on the standing corpus and persist model +
    * corpus postings. The fit is q190's recipe generalized to any
    * geometry (coarse k Lloyd's with `updates` updates; m × ks PQ
    * codebooks over raw coordinates); with `fitLimit` set the models
    * fit on the `vec_id < fitLimit` prefix only — at 100 TB the fit
    * runs on such a sample and the corpus postings pass is the only
    * full scan, and it is the same per-row map ingest uses. */
  def save(s: SparkSession, corpus: DataFrame, path: String,
      k: Int = 8, updates: Int = 2, m: Int = 4, ks: Int = 4,
      subDim: Int = 16, fitLimit: Option[Long] = None): Unit = {
    val fitOn = fitLimit.fold(corpus)(l => corpus.filter(col("vec_id") < l))
    // r18 fix (r17 ADVICE, medium): under the default geometry the
    // fits return driver-local LITERAL frames, but on the
    // over-ceiling / degenerate-fallback paths they are lazy
    // aggregate plans — the write below would execute the fit once
    // and collectModel would RE-execute it, and round(avg, 6) over
    // shuffled doubles is not guaranteed bit-stable across
    // executions, so postings could be assigned with a model
    // differing at rounding boundaries from the persisted one (it
    // also ran the fit twice). One localCheckpoint pins ONE execution
    // to feed both consumers — model/postings consistency by
    // construction, as the pre-r17 read-back gave.
    def pinned(df: DataFrame): DataFrame =
      df.queryExecution.analyzed match {
        case _: org.apache.spark.sql.catalyst.plans.logical.LocalRelation => df
        case _ => df.localCheckpoint()
      }
    val cent = pinned(Similarity.kmeansCentroids(fitOn, k, updates))
    val cb1 = pinned(
      Similarity.pqModelP(Similarity.edOf(fitOn), m, ks, subDim)._2)
    cent.write.mode("overwrite").parquet(s"$path/model/centroids")
    cb1.write.mode("overwrite").parquet(s"$path/model/codebooks")
    // r17 OPT: the postings assigner compiles from the just-fitted
    // model IN MEMORY instead of re-reading the two files it wrote a
    // moment ago — legal because doubles round-trip parquet
    // bit-exactly (the scaladoc contract AnnIngestSpec pins), so the
    // read-back model assigns identically to the in-memory one.
    val fn = assignerFrom(collectModel(cent, cb1))
    fn(corpus)
      .withColumn("epoch", lit(baseEpoch))
      .repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster", "epoch")
      .parquet(s"$path/postings")
  }

  /** The collected (broadcast-class) model: sorted (cluster, centroid)
    * rows plus the per-subspace (code, codeword) tables. */
  private[pipeline] type Model =
    (Array[(Long, Seq[Double])], Map[Int, Array[(Long, Seq[Double])]])

  private def collectModel(cent: DataFrame, cb: DataFrame): Model = {
    val centArr = cent
      .select(col("cluster").cast("long"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1)))
      .sortBy(_._1)
    val cbArr = cb
      .select(col("j").cast("int"), col("code").cast("long"), col("cv"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .groupBy(_._1)
      .map { case (j, rows) =>
        j -> rows.map(t => (t._2, t._3)).sortBy(_._1)
      }
    (centArr, cbArr)
  }

  /** Read the persisted model back ONCE into driver arrays (two tiny
    * parquet reads) — shared by [[assigner]] and the probe side, so a
    * lifecycle phase never re-lists/reads the same model file twice
    * (r17 OPT; pre-r17 the assigner and the probe's LUT/family reads
    * each re-read centroids and codebooks). */
  private[pipeline] def readModel(s: SparkSession, path: String): Model =
    collectModel(
      s.read.parquet(s"$path/model/centroids"),
      s.read.parquet(s"$path/model/codebooks"))

  /** Build the PER-ROW assignment function from the PERSISTED model:
    * reads the (broadcast-class) centroid/codebook tables back and
    * compiles them into literal-array expressions — cluster = argmin
    * over the k centroid distances, c_j = argmin over the ks codeword
    * distances per subspace. The GEOMETRY comes from the model files
    * themselves (k = centroid rows, m = distinct j, subDim = codeword
    * width), never from constants. Stateless, aggregation-free,
    * usable in a batch projection or a streaming one (doubles
    * round-trip parquet bit-exactly, so a read-back model assigns
    * identically to the in-memory fit). */
  def assigner(s: SparkSession, path: String): DataFrame => DataFrame =
    assignerFrom(readModel(s, path))

  private[pipeline] def assignerFrom(model: Model): DataFrame => DataFrame = {
    val (centArr, cbArr) = model
    require(centArr.nonEmpty && cbArr.nonEmpty,
      "model is empty — not an AnnIndex (rebuild with AnnIndex.save)")
    val m = cbArr.keys.max + 1
    require(cbArr.keySet == (0 until m).toSet,
      s"codebook subspaces not contiguous: ${cbArr.keySet}")
    val subDims = (0 until m).map(j => cbArr(j).head._2.length)
    def argmin(cands: Seq[(Long, Seq[Double])], v: Column, out: String): Column =
      array_min(array(cands.map { case (id, cv) =>
        struct(round(VecMath.vec_sq_dist(v, typedLit(cv)), 6).as("dist"),
          lit(id).as("id"))
      }: _*)).getField("id").cast("int").as(out)
    df => {
      val withEv = df.withColumn("__ev",
        expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
      var off = 0
      val codeCols = (0 until m).map { j =>
        val c = argmin(cbArr(j).toSeq,
          slice(col("__ev"), off + 1, subDims(j)), s"c$j")
        off += subDims(j)
        c
      }
      val cols = col("vec_id") +:
        argmin(centArr.toSeq, col("__ev"), "cluster") +: codeCols
      withEv.select(cols: _*)
    }
  }

  /** Append assigned postings as a new epoch directory under the
    * existing cluster partitions — nothing about the standing index
    * is rewritten. */
  def append(assigned: DataFrame, path: String, epoch: Long): Unit =
    assigned
      .withColumn("epoch", lit(epoch))
      .repartition(col("cluster"))
      .write.mode("append").partitionBy("cluster", "epoch")
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
    * epochs to the postings partitions, EXACTLY ONCE across crashes
    * (r16 ADVICE — the r16 form's scaladoc claimed idempotence its
    * plain append did not have: a crash between append and the hwm
    * sidecar write re-appended the whole window on retry). The window
    * [hwm+1, newHwm] writes under its own `epoch=newHwm` partition
    * directories, and every retry FIRST DELETES any epoch directory
    * above the committed hwm (a crash leftover by definition — its
    * batches are still in the store and re-derive into the fresh
    * window, even if more batches committed meanwhile), THEN appends,
    * THEN advances the sidecar. Readers never see duplicates:
    * uncommitted partials are swept before the only append that can
    * land their rows again. */
  def commitAdmitted(s: SparkSession, path: String, url: String,
      table: String, props: java.util.Properties): Unit = {
    val hwm = DedupIndex.loadProps(path, "commit_watermark.properties")
      .map(_.getProperty("hwm").toLong).getOrElse(-1L)
    sweepUncommitted(s, path, hwm)
    val store = graft.sources.Jdbc.read(s, url, table, props)
    val newHwm = store.filter(col("batch_id") > hwm)
      .agg(max(col("batch_id"))).head().get(0)
    if (newHwm != null) {
      val admitted = store
        .filter(col("batch_id") > hwm &&
          col("batch_id") <= lit(newHwm.asInstanceOf[Long]))
        .drop("batch_id")
        .localCheckpoint()
      try append(admitted, path, epoch = newHwm.asInstanceOf[Long])
      finally admitted.unpersist()
      DedupIndex.storeProps(path, "commit_watermark.properties",
        Map("hwm" -> newHwm.toString),
        "graft AnnIndex committed-epoch high-water mark")
    }
  }

  /** Delete postings epoch directories above the committed high-water
    * mark — crash leftovers from an interrupted [[commitAdmitted]]. */
  private def sweepUncommitted(s: SparkSession, path: String,
      hwm: Long): Unit = {
    val root = new java.io.File(s"$path/postings")
    if (root.isDirectory) {
      val stale = Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("cluster="))
        .flatMap(c => Option(c.listFiles()).getOrElse(Array.empty))
        .filter { e =>
          e.isDirectory && e.getName.startsWith("epoch=") &&
            e.getName.drop("epoch=".length).toLong > hwm
        }
      if (stale.nonEmpty) {
        println(s"[ann-commit] sweeping ${stale.length} uncommitted " +
          s"epoch director${if (stale.length == 1) "y" else "ies"} " +
          s"above hwm $hwm (crash leftovers; their batches re-derive " +
          "from the exactly-once store)")
        stale.foreach(deleteRec)
      }
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete(): Unit
  }

  /** The split lineage: (cluster, family) for every centroid, family
    * = the cluster's pre-split ancestor root (identity until
    * [[splitCell]] runs). Probes expand a query's cluster to its
    * whole family, which is what keeps split a pure LAYOUT operation
    * — candidate sets, and so probe results, are bit-identical before
    * and after (AnnMaintSpec pins it). */
  def families(s: SparkSession, path: String): DataFrame = {
    val centArr = s.read.parquet(s"$path/model/centroids")
      .select(col("cluster").cast("long")).collect().map(_.getLong(0))
      .map(c => (c, Seq.empty[Double]))
    famDf(s, familyMap(s, path, centArr).toSeq.sortBy(_._1))
  }

  /** The split lineage as a driver map: identity over the current
    * centroid ids, overridden by the families sidecar where present
    * (r17 OPT — the former DataFrame join form read the centroid file
    * once more per call and shipped a join for a model-sized table). */
  private def familyMap(s: SparkSession, path: String,
      centArr: Array[(Long, Seq[Double])]): Map[Int, Int] = {
    val idMap = centArr.map(c => c._1.toInt -> c._1.toInt).toMap
    val f = new java.io.File(s"$path/model/families")
    if (f.isDirectory)
      idMap ++ s.read.parquet(s"$path/model/families")
        .select(col("cluster").cast("int"), col("family").cast("int"))
        .collect().map(r => r.getInt(0) -> r.getInt(1))
        .filter(kv => idMap.contains(kv._1))
    else idMap
  }

  private def centDf(s: SparkSession,
      rows: Seq[(Long, Seq[Double])]): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2)): _*),
      StructType(Seq(
        StructField("cluster", LongType, nullable = false),
        StructField("cv", ArrayType(DoubleType, containsNull = false),
          nullable = true))))
  }

  private def famDf(s: SparkSession, rows: Seq[(Int, Int)]): DataFrame = {
    import org.apache.spark.sql.types._
    s.createDataFrame(
      java.util.Arrays.asList(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2)): _*),
      StructType(Seq(
        StructField("cluster", IntegerType, nullable = false),
        StructField("family", IntegerType, nullable = false))))
  }

  /** MAINTENANCE: split one cell of the standing index in place —
    * the action q244's hot flag calls for (r16 verdict item 3). The
    * target cell's member vectors re-fit a 2-centroid Lloyd's (q135
    * conventions — init = the cell's two smallest vec_ids' vectors,
    * `updates` iterations, 6-dp rounding, ties to the lower child),
    * child 0 keeps the parent's cluster id, child 1 takes
    * max(cluster)+1; ONLY the parent's postings partition rewrites
    * (child-0 rows back under the parent id, child-1 rows as a new
    * partition), the centroid table swaps one row and gains one, the
    * family sidecar records both children under the parent's family,
    * and the model epoch bumps. Ingest after the split routes
    * against k+1 centroids, draining arrivals away from the hot
    * region — the refit acts on the flag WITHOUT a full-index
    * rebuild, and probes stay family-expanded so results never
    * change. `vectors` is the source-of-truth embedding table (the
    * postings store codes, not coordinates; the refit joins the one
    * cell's vec_ids back — partition-pruned read, cell-sized join).
    * Returns (parent, child1, modelEpoch). */
  def splitCell(s: SparkSession, vectors: DataFrame, path: String,
      cell: Int, updates: Int = 2): (Int, Int, Long) = {
    // r17 OPT: the model reads once into driver arrays (the readModel
    // device) — pre-r17 this pass read centroids twice (maxCl scan +
    // the swap union), codebooks once more inside its assigner call,
    // and centroids a third time inside families(); every derived
    // table below is built locally from the arrays.
    val model @ (centArr, _) = readModel(s, path)
    val maxCl = centArr.map(_._1).max
    val child1 = (maxCl + 1).toInt
    // the one cell's members: partition-pruned postings scan, then a
    // vec_id equi-join back to coordinates (cell-sized, never corpus)
    val memberIds = s.read.parquet(s"$path/postings")
      .filter(col("cluster") === cell)
      .select(col("vec_id"))
    val members = Similarity.edOf(
        vectors.join(memberIds, "vec_id")
          .select(col("vec_id"), col("embedding")))
      .localCheckpoint()
    // within-cell 2-means, q135 conventions with the init generalized
    // to the cell's two smallest ids (vec_id < 2 need not be members)
    val initIds = members.select(col("vec_id")).orderBy(col("vec_id"))
      .limit(2).collect().map(_.getLong(0))
    require(initIds.length == 2,
      s"cell $cell has ${initIds.length} member(s) — nothing to split")
    // r17 OPT (guide §2.4, the Similarity.argminLit device): the
    // within-cell 2-means assigns per row against the two collected
    // child centroids — a projection — instead of the former
    // crossJoin + groupBy(vec_id) exchange per iteration plus the
    // assignment-back-to-members join inside centify. Same
    // round(vec_sq_dist, 6) + lexicographic (dist, child) min, so the
    // assignment (and every downstream row) is output-identical.
    def argmin2(cc: Array[(Int, Seq[Double])]): Column =
      array_min(array(cc.map { case (child, ccv) =>
        struct(round(VecMath.vec_sq_dist(col("ev"), typedLit(ccv)), 6)
          .as("dist"), lit(child).as("id"))
      }.toIndexedSeq: _*)).getField("id")
    def centify(assigned: DataFrame): Array[(Int, Seq[Double])] =
      assigned
        .select(col("child"), posexplode(col("ev")))
        .groupBy(col("child"), col("pos"))
        .agg(round(avg(col("col")), 6).as("c"))
        .groupBy(col("child"))
        .agg(expr("transform(array_sort(collect_list(struct(pos, c))), " +
          "s -> s.c)").as("ccv"))
        .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    var cc = members.filter(col("vec_id").isin(initIds(0), initIds(1)))
      .select(when(col("vec_id") === initIds(0), lit(0))
        .otherwise(lit(1)).as("child"), col("ev").as("ccv"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    for (_ <- 1 to updates)
      cc = centify(members.select(argmin2(cc).as("child"), col("ev")))
    val reassigned = members
      .select(col("vec_id"), argmin2(cc).as("child"))
      .select(col("vec_id"),
        when(col("child") === 0, lit(cell)).otherwise(lit(child1))
          .cast("int").as("cluster"))
    // re-derive the members' PQ codes from the persisted codebooks
    // (codes are cluster-independent; rewriting them bit-identical
    // keeps the partition swap self-contained)
    val fn = assignerFrom(model)
    val rewritten = fn(vectors.join(memberIds, "vec_id")
        .select(col("vec_id"), col("embedding")))
      .drop("cluster")
      .join(reassigned, "vec_id")
      .withColumn("epoch", lit(baseEpoch))
      .localCheckpoint()
    // swap the model row FIRST (a reader racing the swap sees the old
    // centroids with the old layout or new with new — both coherent
    // under family expansion), then rewrite the one partition
    val newCent = centDf(s,
      centArr.filter(_._1 != cell).toSeq ++ cc.map { case (child, ccv) =>
        ((if (child == 0) cell.toLong else child1.toLong), ccv)
      })
    // the parent's family root survives nested splits: the new child
    // joins the PARENT'S family, not the parent's id
    val famPre = familyMap(s, path, centArr)
    val parentFam = famPre(cell)
    newCent.write.mode("overwrite").parquet(s"$path/model/centroids")
    famDf(s, famPre.toSeq.sortBy(_._1) :+ (child1 -> parentFam))
      .write.mode("overwrite").parquet(s"$path/model/families_new")
    swapDir(s"$path/model/families_new", s"$path/model/families")
    // rewrite ONLY the touched partitions: drop the parent's directory
    // (its committed-epoch subdirs collapse into the base epoch of
    // their new cell — every row is re-derived in `rewritten`, which
    // was materialized above) and append the staged rows, which
    // recreate cluster=<cell> and create cluster=<child1>
    deleteRec(new java.io.File(s"$path/postings/cluster=$cell"))
    rewritten
      .repartition(col("cluster"))
      .write.mode("append").partitionBy("cluster", "epoch")
      .parquet(s"$path/postings")
    val epoch = DedupIndex.loadProps(path, "model_epoch.properties")
      .map(_.getProperty("epoch").toLong).getOrElse(0L) + 1
    DedupIndex.storeProps(path, "model_epoch.properties",
      Map("epoch" -> epoch.toString),
      "graft AnnIndex model epoch (bumped per maintenance pass)")
    println(s"[ann-split] cell $cell split -> ($cell, $child1); " +
      s"model epoch $epoch")
    (cell, child1, epoch)
  }

  /** MAINTENANCE: compact the standing index by collapsing EXACT
    * PQ-signature duplicates at rest — the index-side GC a dedup
    * pipeline runs after its keep-list lands (q250; the q133/q167
    * collapse applied to the index instead of the corpus). Two rows
    * with the same (cluster, c0..c_{m-1}) are indistinguishable to
    * every ADC probe (identical codes ⇒ identical approximate
    * distance to any query), so keeping one — the SMALLEST vec_id,
    * the repo's canonical-representative convention — removes pure
    * redundancy from every future probe's candidate set. Scale shape:
    * the signature histogram is a map-side-combinable groupBy whose
    * key space is bounded by k·ksᵐ (a few hundred thousand rows on a
    * 1000-cell index — broadcast-class, NEVER corpus-sized), the
    * keeper join broadcasts that table, and ONLY clusters that
    * actually contain duplicates rewrite (partition-local; untouched
    * cells stay byte-stable — AnnMaintSpec pins it). Keeper rows
    * retain their own commit epoch, so [[annProbe]]-style as-of reads
    * stay meaningful after a compaction. Returns the per-cell report
    * (cluster, n_before, n_after, n_dropped); bumps the model epoch
    * the way [[splitCell]] does. */
  def compact(s: SparkSession, path: String): DataFrame = {
    val p0 = s.read.parquet(s"$path/postings")
    val codeCols = p0.columns.filter(_.matches("c\\d+"))
      .sortBy(_.drop(1).toInt)
    val sig = codeCols.map(col)
    val keep = p0.groupBy((col("cluster") +: sig): _*)
      .agg(min(col("vec_id")).as("keep_id"), count(lit(1)).as("n_rows"))
      .localCheckpoint()
    val pre = keep.groupBy(col("cluster"))
      .agg(sum(col("n_rows")).as("n_before"),
        count(lit(1)).as("n_after"))
      .localCheckpoint()
    val hot = pre.filter(col("n_before") > col("n_after"))
      .select(col("cluster").cast("int")).collect().map(_.getInt(0))
    if (hot.nonEmpty) {
      val kept = p0
        .filter(col("cluster").isin(hot.map(c => c: Any): _*))
        .join(broadcast(keep
            .select((col("cluster") +: sig :+ col("keep_id")): _*)),
          "cluster" +: codeCols.toSeq)
        .filter(col("vec_id") === col("keep_id"))
        .drop("keep_id")
        .localCheckpoint()
      hot.foreach(c =>
        deleteRec(new java.io.File(s"$path/postings/cluster=$c")))
      kept.repartition(col("cluster"))
        .write.mode("append").partitionBy("cluster", "epoch")
        .parquet(s"$path/postings")
    }
    val epoch = DedupIndex.loadProps(path, "model_epoch.properties")
      .map(_.getProperty("epoch").toLong).getOrElse(0L) + 1
    DedupIndex.storeProps(path, "model_epoch.properties",
      Map("epoch" -> epoch.toString),
      "graft AnnIndex model epoch (bumped per maintenance pass)")
    println(s"[ann-compact] ${hot.length} cell(s) rewritten " +
      s"(signature-duplicate collapse); model epoch $epoch")
    pre.select(col("cluster").cast("int").as("cluster"),
        col("n_before").cast("long").as("n_before"),
        col("n_after").cast("long").as("n_after"),
        (col("n_before") - col("n_after")).cast("long").as("n_dropped"))
      .orderBy(col("cluster"))
  }

  /** MAINTENANCE: merge two SAME-FAMILY cells — the inverse of
    * [[splitCell]] and the cold-cell action q244's histogram calls
    * for (a cell whose arrival share collapses after a drift reversal
    * wastes a router slot and a directory; q252). The lower id
    * absorbs: the higher cell's postings move under the survivor's
    * partition (each row KEEPS its commit epoch — as-of reads stay
    * meaningful), the survivor's centroid becomes the member-count-
    * weighted mean of the two (6-dp rounded, the house convention) so
    * future arrivals route to the merged region, the absorbed id
    * leaves the centroid and family tables, and the model epoch
    * bumps. Same-family is REQUIRED: within a family the probe's
    * candidate set is the family union, so moving postings between
    * the family's leaves cannot change any probe result (the same
    * argument that makes split a layout op; AnnMaintSpec pins
    * split→merge probe invariance and that merge(split(x)) restores
    * x's postings exactly). Touches exactly two partitions: the
    * absorbed directory is deleted, the survivor's gains the moved
    * rows as new files (its existing files are never rewritten). */
  def mergeCells(s: SparkSession, path: String, a: Int, b: Int): Long = {
    require(a != b, s"cannot merge cell $a with itself")
    val (lo, hi) = (math.min(a, b), math.max(a, b))
    // r17 OPT: one centroid read feeds the family check, both centroid
    // lookups and the swap (pre-r17: centroids read three times —
    // families(), the checkpointed cent, and the families rewrite)
    val centArr = s.read.parquet(s"$path/model/centroids")
      .select(col("cluster").cast("long"), col("cv")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1))).sortBy(_._1)
    val fams = familyMap(s, path, centArr)
    require(fams(lo) == fams(hi),
      s"cells $lo (family ${fams(lo)}) and $hi (family ${fams(hi)}) " +
        "are not in the same family — merging across families would " +
        "change probe candidate sets")
    val p = s.read.parquet(s"$path/postings")
    val counts = p.filter(col("cluster").isin(lo, hi))
      .groupBy(col("cluster")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val (nLo, nHi) = (counts.getOrElse(lo, 0L), counts.getOrElse(hi, 0L))
    // stage the absorbed cell's rows (epoch preserved) BEFORE deleting
    val moved = p.filter(col("cluster") === hi)
      .withColumn("cluster", lit(lo))
      .localCheckpoint()
    // survivor centroid: count-weighted mean of the two cells' means —
    // the merged region's center for future routing (6-dp rounded)
    val cvLo = centArr.find(_._1 == lo).get._2
    val cvHi = centArr.find(_._1 == hi).get._2
    val merged: Seq[Double] =
      if (nLo + nHi == 0L) cvLo
      else cvLo.zip(cvHi).map { case (x, y) =>
        BigDecimal((x * nLo + y * nHi) / (nLo + nHi))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      }
    // model swap first (the splitCell ordering argument), then layout
    centDf(s, centArr.filter(c => c._1 != lo && c._1 != hi).toSeq :+
        ((lo.toLong, merged)))
      .write.mode("overwrite").parquet(s"$path/model/centroids")
    famDf(s, fams.toSeq.filter(_._1 != hi).sortBy(_._1))
      .write.mode("overwrite").parquet(s"$path/model/families_new")
    swapDir(s"$path/model/families_new", s"$path/model/families")
    deleteRec(new java.io.File(s"$path/postings/cluster=$hi"))
    moved.repartition(col("cluster"))
      .write.mode("append").partitionBy("cluster", "epoch")
      .parquet(s"$path/postings")
    val epoch = DedupIndex.loadProps(path, "model_epoch.properties")
      .map(_.getProperty("epoch").toLong).getOrElse(0L) + 1
    DedupIndex.storeProps(path, "model_epoch.properties",
      Map("epoch" -> epoch.toString),
      "graft AnnIndex model epoch (bumped per maintenance pass)")
    println(s"[ann-merge] cell $hi absorbed into $lo " +
      s"($nHi rows moved); model epoch $epoch")
    epoch
  }

  private def swapDir(from: String, to: String): Unit = {
    val toF = new java.io.File(to)
    if (toF.exists()) deleteRec(toF)
    require(new java.io.File(from).renameTo(toF),
      s"rename $from -> $to failed")
  }
}
