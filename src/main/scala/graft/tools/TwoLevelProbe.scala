package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r18, verdict item 8): measure the two-level assignment
  * at the k ≥ 800 scale the route exists for — no registered query
  * exercises it, so the projection rewrite needs its own numbers.
  * Generates a deterministic synthetic corpus (md5-derived coords, no
  * RNG), fits k=800 centroids' worth of ids, and times
  *   (a) the r18 PROJECTION form (Similarity.assignTwoLevel), and
  *   (b) a replica of the pre-r18 member-join + per-vector argmin
  *       aggregate,
  * diffing their outputs (must be 0 rows).
  *
  * Usage: TwoLevelProbe [nVecs] [k] [superK]
  */
object TwoLevelProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(200000)
    val k = args.lift(1).map(_.toInt).getOrElse(800)
    val superK = args.lift(2).map(_.toInt).getOrElse(28)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VecMath

    val dim = 16
    // deterministic coords: md5-slice per (id, dim) scaled to [0, 16)
    def coords(idCol: org.apache.spark.sql.Column) = array((0 until dim).map(
      d => (conv(substring(md5(concat(lit(s"v$d:"), idCol)), 1, 6), 16, 10)
        .cast("double") / lit(1048576.0)).cast("double")): _*)
    val vecs = spark.range(n.toLong)
      .select(col("id").as("vec_id"), coords(col("id")).as("ev"))
      .repartition(cpus.toInt).localCheckpoint()
    val cent = spark.range(k.toLong)
      .select(col("id").as("cluster"),
        coords(col("id") + lit(1000000000L)).as("cv"))
      .localCheckpoint()

    def time(tag: String)(f: => Unit): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"TWOLEVEL $tag ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    val proj = graft.pipeline.Similarity
      .assignTwoLevel(spark, vecs, cent, superK)
    time(s"projection_form n=$n k=$k superK=$superK")(
      proj.write.format("noop").mode("overwrite").save())

    // pre-r18 replica: stage-1 routing map, then member join +
    // per-vector lexicographic-min aggregate (the removed plan)
    def joinAggForm(): DataFrame = {
      val centArr = cent.select(col("cluster").cast("long"), col("cv"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      def sq(a: Array[Double], b: Array[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < dim) { val d = a(i) - b(i); acc += d * d; i += 1 }
        acc
      }
      def nearest(v: Array[Double], sup: IndexedSeq[Array[Double]]): Int = {
        var best = 0; var bd = Double.MaxValue; var i = 0
        while (i < sup.length) {
          val d = sq(v, sup(i)); if (d < bd) { bd = d; best = i }; i += 1
        }
        best
      }
      var sup: IndexedSeq[Array[Double]] =
        centArr.take(superK).map(_._2).toIndexedSeq
      for (_ <- 1 to 2) {
        val byS = centArr.groupBy(c => nearest(c._2, sup))
        sup = (0 until sup.length).map { sId =>
          byS.get(sId).map { ms =>
            val m = new Array[Double](dim)
            ms.foreach(c => (0 until dim).foreach(i => m(i) += c._2(i)))
            m.map(_ / ms.length)
          }.getOrElse(sup(sId))
        }
      }
      import spark.implicits._
      val memberDf = broadcast(
        centArr.map { case (c, v) => (nearest(v, sup), c, v.toSeq) }
          .toSeq.toDF("m_sup", "cluster", "cv"))
      val routed = vecs.withColumn("sup",
        explode(VecMath.vec_nearest_indices(col("ev"),
          sup.map(_.toSeq), 1)))
      routed.join(memberDf, col("sup") === col("m_sup"))
        .withColumn("dist",
          round(VecMath.vec_sq_dist(col("ev"), col("cv")), 6))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("dist"), col("cluster"))).as("m"))
        .select(col("vec_id"), col("m.cluster").as("cluster"))
    }
    val agg = joinAggForm()
    time(s"join_agg_form  n=$n k=$k superK=$superK")(
      agg.write.format("noop").mode("overwrite").save())

    val d = proj.exceptAll(agg).count() + agg.exceptAll(proj).count()
    println(s"TWOLEVEL output diff rows = $d")
    println("TWOLEVEL projection plan exchanges = " +
      "Exchange".r.findAllIn(proj.queryExecution.executedPlan.toString).size)
    spark.stop()
  }
}
