package graft.pipeline

import graft.{Registry, SparkSpec}
import org.apache.spark.sql.functions._

/** Behavioural pins for the Quality module beyond the oracle
  * hash-compare: internal consistency of the rule bitmask, and the
  * learned classifier actually LEARNING (above-majority agreement,
  * both verdicts populated — the r12 first cut admitted everything
  * and scored exactly the majority-class share, which a hash-match
  * alone cannot catch). */
class QualitySpec extends SparkSpec {

  private def run(name: String) =
    Registry.all.find(_.name == name).get.fn(spark, sf)

  test("q208 rule bitmask and verdict are consistent with the measured values") {
    val rows = run("q208_gopher_rules").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nw = r.getAs[Long]("n_words")
      val mwl = r.getAs[Double]("mean_word_len")
      val sym = r.getAs[Double]("symbol_frac")
      val sh = r.getAs[Long]("stop_hits")
      val dup = r.getAs[Double]("dup_word_frac")
      val bits = Seq(nw >= 30 && nw <= 100000,
        mwl >= 3.0 && mwl <= 5.0, sym <= 0.1, sh >= 1, dup <= 0.6)
      val mask = bits.zipWithIndex.map { case (b, i) => if (b) 1 << i else 0 }.sum
      assert(r.getAs[Int]("rules") == mask, s"doc ${r.get(0)}: bitmask")
      assert(r.getAs[Int]("passed") == (if (bits.forall(identity)) 1 else 0))
    }
    // every rule must discriminate on this corpus except r3 (symbol
    // frac — the synthetic text is alphanumeric, documented)
    val masks = rows.map(_.getAs[Int]("rules")).toSet
    Seq(0, 1, 3, 4).foreach { i =>
      assert(masks.exists(m => (m & (1 << i)) == 0), s"rule r${i + 1} never fails")
      assert(masks.exists(m => (m & (1 << i)) != 0), s"rule r${i + 1} never passes")
    }
  }

  test("q209 shard fractions sum to 1 and heads are three distinct docs") {
    val rows = run("q209_shard_manifest").collect()
    assert(rows.length == 8)
    assert(math.abs(rows.map(_.getAs[Double]("frac")).sum - 1.0) < 1e-6)
    rows.foreach { r =>
      val heads = Seq(r.getAs[Long]("d1"), r.getAs[Long]("d2"), r.getAs[Long]("d3"))
      assert(heads.distinct.size == 3, s"shard ${r.get(0)} heads not distinct")
    }
  }

  test("q210 PSI terms are non-negative and the total is their sum") {
    val rows = run("q210_psi_drift").collect()
    assert(rows.length == 10)
    val terms = rows.map(_.getAs[Double]("psi_term"))
    assert(terms.forall(_ >= 0.0), "PSI terms are provably >= 0")
    val total = rows.map(_.getAs[Double]("psi_total")).distinct
    assert(total.length == 1)
    assert(math.abs(terms.sum - total.head) < 1e-9)
  }

  test("q211 keeps exactly one canonical per cluster, and it has the cluster-max quality") {
    val df = run("q211_quality_canonical").cache()
    val perCluster = df.groupBy(col("cluster_id"))
      .agg(sum(col("keep")).as("n_keep"),
        max(col("q")).as("mx"),
        max(when(col("keep") === 1, col("q"))).as("kq"))
      .collect()
    perCluster.foreach { r =>
      assert(r.getAs[Long]("n_keep") == 1L, s"cluster ${r.get(0)}: keep count")
      assert(r.getAs[Double]("kq") == r.getAs[Double]("mx"),
        s"cluster ${r.get(0)}: canonical is not the max-quality member")
    }
    df.unpersist()
  }

  test("preGate dial: default is the q211 path; gated run admits exactly the gate-pass set") {
    val docs = graft.Tables.t(spark, sf, "documents")
    // dial-off identity: canonicalize(docs) IS the registry query
    val a = run("q211_quality_canonical").collect().toSeq
    val b = Quality.canonicalize(docs).collect().toSeq
    assert(a == b, "preGate=false must be byte-identical to q211")
    // dial-on: output ids == gopher-pass ids (gated docs can neither
    // appear nor bridge), one canonical per surviving cluster
    val g = Quality.canonicalize(docs, preGate = true).cache()
    val outIds = g.select("doc_id").collect().map(_.getLong(0)).toSet
    val passIds = docs.filter(Quality.gopherPass)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(outIds == passIds, "gated output must be exactly the pass set")
    assert(passIds.size < docs.count(), "gate must actually cut at test sf")
    g.groupBy(col("cluster_id")).agg(sum(col("keep")).as("k")).collect()
      .foreach(r => assert(r.getAs[Long]("k") == 1L))
    // composition equivalence: the dial is filter-then-canonicalize
    val c = Quality.canonicalize(docs.filter(Quality.gopherPass))
      .collect().toSeq
    assert(g.collect().toSeq == c)
    g.unpersist()
  }

  test("q213 classifier learns past the majority class and issues both verdicts") {
    val rows = run("q213_classifier_gate").collect()
    val n = rows.length.toDouble
    val agree = rows.map(_.getAs[Int]("agree")).sum / n
    val posShare = rows.map(_.getAs[Int]("y")).sum / n
    val majority = math.max(posShare, 1 - posShare)
    assert(agree > majority + 0.05,
      f"classifier stuck at majority class: agree=$agree%.3f vs majority=$majority%.3f")
    val admits = rows.map(_.getAs[Int]("admitted")).toSet
    assert(admits == Set(0, 1), "gate must produce both admit and reject verdicts")
  }

  test("q221 build: every shard accounted, fractions total 1, survivors within the gate") {
    val rows = run("q221_curation_build").collect()
    assert(rows.nonEmpty && rows.length <= 8)
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val gated = graft.Tables.t(spark, sf, "documents")
      .filter(Quality.gopherPass).count()
    assert(total > 0 && total <= gated,
      s"survivors $total must be a non-empty subset of the $gated gated docs")
    assert(math.abs(rows.map(_.getAs[Double]("frac")).sum - 1.0) < 1e-4)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") > 0 && r.getAs[Long]("tot_chars") > 0)
      assert(r.getAs[Long]("d1") != 0 || r.get(4) != null)
    }
  }

  test("sampleFrac dial: neutral at 1.0, and a half-sample gate still serves the full corpus") {
    // r12 verdict item 3: production trains the gate on a sample and
    // serves everywhere. Pin (a) frac >= 1 is the IDENTITY — the
    // registered q212/q213/q219 paths are untouched by the dial;
    // (b) trajectory equality: gateModel() == gateModel(sampleFrac=1);
    // (c) a 50%-content-hash-sample model agrees with the full model
    // on the great majority of serve verdicts (the dial's fitness
    // claim; the PLANS.md probe row records 10% at sf0.01).
    val feats = run("q212_quality_logreg") // any frame; identity check
    assert(Quality.trainSample(feats, 1.0) eq feats,
      "frac >= 1 must return the input frame untouched")
    val full = Quality.gateModel(spark, sf)
    val full1 = Quality.gateModel(spark, sf, 1.0)
    assert(full._1 == full1._1 && full._2 == full1._2,
      "explicit sampleFrac=1 must reproduce the default trajectory exactly")
    val half = Quality.gateModel(spark, sf, 0.5)
    val v = Quality.gateVerdicts(spark, sf, full)
      .withColumnRenamed("admitted", "a_full")
      .join(Quality.gateVerdicts(spark, sf, half)
        .withColumnRenamed("admitted", "a_half"), "doc_id")
    val n = v.count()
    val agree = v.filter(col("a_full") === col("a_half")).count()
    assert(n > 0 && agree.toDouble / n > 0.85,
      s"half-sample gate agreement ${agree.toDouble / n} too low ($agree/$n)")
  }

  test("q219 stream gate is row-identical to the batch gate's serve columns") {
    // the q171↔q172 contract: scoring at ingest must produce exactly
    // the batch relation — same weights, same features, same verdicts
    val batch = run("q213_classifier_gate")
      .select(col("doc_id"), col("score"), col("admitted")).collect()
    val stream = run("q219_stream_classifier_gate").collect()
    assert(stream.length == batch.length)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s.getAs[Long]("doc_id") == b.getAs[Long]("doc_id"))
      assert(s.getAs[Double]("score") == b.getAs[Double]("score"))
      assert(s.getAs[Int]("admitted") == b.getAs[Int]("admitted"))
    }
  }
}
