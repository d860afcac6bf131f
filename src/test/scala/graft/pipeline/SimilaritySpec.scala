package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** KMeans-routed IVF: routing really restricts the scan to the
  * probe's cluster, and stage 2 is EXACT within it — checked for both
  * the relational deterministic fit (q135's oracle-checked path) and
  * the MLlib interop path. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def cos(a: Seq[Float], b: Seq[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
    val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
    BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** reported top-3 must equal exact cosine top-3 restricted to the
    * probe's cluster (score DESC, id ASC order). */
  private def assertInClusterExact(
      out: Map[Long, List[(Long, Double)]],
      assigned: Array[(Long, Int, Seq[Float])]): Unit = {
    val byId = assigned.map(r => r._1 -> r).toMap
    out.foreach { case (qid, reported) =>
      val (_, qCluster, qv) = byId(qid)
      val expected = assigned.iterator
        .filter(r => r._2 == qCluster && r._1 != qid)
        .map(r => (r._1, cos(qv, r._3)))
        .toList.sortBy(r => (-r._2, r._1)).take(3)
      assert(reported.map(_._1) == expected.map(_._1),
        s"probe $qid: reported ${reported} vs exact in-cluster ${expected}")
    }
  }

  private def collectTopk(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toList).toMap

  test("relational-kmeans IVF stage 2 equals the in-cluster brute force") {
    val dir = sf
    val out = collectTopk(Similarity.ivfKMeans(spark, dir))
    assert(out.nonEmpty && out.forall(_._2.size <= 3))
    val e = Tables.t(spark, dir, "embeddings")
    val assigned = Similarity.kmeansClusters(e, k = 8, updates = 2)
      .join(e.select(col("vec_id"), col("embedding")), "vec_id")
      .select(col("vec_id"), col("cluster").cast("int"), col("embedding"))
      .as[(Long, Int, Seq[Float])].collect()
    assert(assigned.map(_._2).distinct.length > 1, "fit collapsed to one cluster")
    assertInClusterExact(out, assigned)
  }

  test("kmeansClusters is partition-count independent (the oracle-replay law)") {
    // the q135 oracle replays the fit relationally, so the Spark fit
    // must not depend on physical partitioning: 6-dp rounding makes
    // centroid averages and distances summation-order free
    val e = Tables.t(spark, sf, "embeddings")
    val a = Similarity.kmeansClusters(e.repartition(1), 8, updates = 2)
      .as[(Long, Long)].collect().toMap
    val b = Similarity.kmeansClusters(e.repartition(17), 8, updates = 2)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("kmeansClusters update really moves assignments off the init") {
    val e = Tables.t(spark, sf, "embeddings")
    val a0 = Similarity.kmeansClusters(e, 8, updates = 0)
      .as[(Long, Long)].collect().toMap
    val a2 = Similarity.kmeansClusters(e, 8, updates = 2)
      .as[(Long, Long)].collect().toMap
    assert(a0.keySet == a2.keySet)
    assert(a0.exists { case (id, c) => a2(id) != c },
      "two Lloyd's updates changed nothing — fit is degenerate")
  }

  test("ivfKMeansMllib stage 2 equals the in-cluster brute force") {
    val dir = sf
    val out = collectTopk(Similarity.ivfKMeansMllib(spark, dir))
    assert(out.nonEmpty && out.forall(_._2.size <= 3))
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.t(spark, dir, "embeddings")
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(8).setSeed(7L)
      .setFeaturesCol("features").setPredictionCol("cluster").fit(e)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("cluster"), col("embedding"))
      .as[(Long, Int, Seq[Float])].collect()
    assertInClusterExact(out, assigned)
  }

  test("q200 H·D rotation is orthonormal: pairwise distances survive it") {
    // (H·D)/√64 with H the 64-dim Hadamard and D a ±1 diagonal is an
    // exact isometry — the whole point of the OPQ preconditioner is
    // that PQ quantizes ROTATED coordinates whose geometry is the
    // original's. Pin ‖r(a) − r(b)‖ = ‖a − b‖ (and norms) to fp
    // tolerance on real corpus vectors; a sign/scale bug here would
    // still often produce a plausible-looking top-k.
    val e = Similarity.rotatedTestPair(spark, sf)
    e.foreach { case (origDist, rotDist, origNrm, rotNrm) =>
      assert(math.abs(origDist - rotDist) < 1e-9 * (1.0 + origDist),
        s"rotation distorted a pairwise distance: $origDist vs $rotDist")
      assert(math.abs(origNrm - rotNrm) < 1e-9 * (1.0 + origNrm),
        s"rotation distorted a norm: $origNrm vs $rotNrm")
    }
  }
}
