package graft.pipeline

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** KMeans-routed IVF: routing really restricts the scan to the
  * probe's cluster, and stage 2 is EXACT within it. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("ivfKMeans stage 2 equals the in-cluster brute force") {
    val dir = sf
    val out = Similarity.ivfKMeans(spark, dir)
      .as[(Long, Long, Double, Int)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._4).map(r => (r._2, r._3)).toList).toMap
    assert(out.nonEmpty && out.forall(_._2.size <= 3))

    // recompute the clusters the same deterministic way and verify the
    // reported top-3 equals exact cosine top-3 restricted to the
    // probe's cluster (score DESC, id ASC order)
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val e = Tables.t(spark, dir, "embeddings")
      .withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(8).setSeed(7L)
      .setFeaturesCol("features").setPredictionCol("cluster").fit(e)
    val assigned = model.transform(e)
      .select(col("vec_id"), col("cluster"), col("embedding"))
      .as[(Long, Int, Seq[Float])].collect()
    val byId = assigned.map(r => r._1 -> r).toMap
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
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
}
