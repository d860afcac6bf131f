package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q247 / [[AnnIndex.splitCell]]: index maintenance. Pins
  *  - probe INVARIANCE: top-k results are bit-identical before and
  *    after a split (family expansion makes split a pure layout op);
  *  - locality: only the target cell's postings partition rewrites;
  *  - lineage: families map children to the pre-split root across
  *    NESTED splits, and the model epoch bumps per pass.
  */
class AnnMaintSpec extends SparkSpec {

  private def tmp(prefix: String) = java.nio.file.Files
    .createTempDirectory(prefix).toString

  test("split is probe-invariant, rewrites one partition, bumps lineage") {
    val e = graft.Tables.t(spark, sf, "embeddings")
    val corpus = e.filter(col("vec_id") % 10 =!= 9)
    val idx = tmp("graft-annmaint-idx")
    AnnIndex.save(spark, corpus, idx)
    AnnIndex.append(
      AnnIndex.assigner(spark, idx)(e.filter(col("vec_id") % 10 === 9)),
      idx, epoch = 0L)
    val queries = corpus.filter(col("vec_id") < 10)
      .select(col("vec_id"), col("embedding"))
    def probe() = Similarity.annProbe(spark, idx, queries,
      excludeSelf = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
    val before = probe()
    assert(before.nonEmpty)

    // split a cell that actually SERVES results, so invariance has
    // teeth: take the cell of the first query's top hit
    val fn = AnnIndex.assigner(spark, idx)
    val target = fn(e.filter(col("vec_id") === before.head._2))
      .head.getInt(1)
    // snapshot untouched partitions' file listings
    def files(cl: Int) = {
      val d = new java.io.File(s"$idx/postings/cluster=$cl")
      if (!d.isDirectory) Set.empty[String]
      else {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
        walk(d).map(f => f.getPath + ":" + f.lastModified).toSet
      }
    }
    val untouched = (0 until 8).filter(_ != target)
    val snapshots = untouched.map(c => c -> files(c)).toMap

    val (parent, child1, epoch1) = AnnIndex.splitCell(spark, e, idx, target)
    assert(parent == target && child1 == 8 && epoch1 == 1L)
    untouched.foreach { c =>
      assert(files(c) == snapshots(c),
        s"split of cell $target touched partition cluster=$c")
    }
    // both children hold members, parent family spans them
    val fams = AnnIndex.families(spark, idx).collect()
      .map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(fams(child1) == target && fams(target) == target)
    val counts = spark.read.parquet(s"$idx/postings")
      .groupBy(col("cluster")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.contains(child1) && counts(child1) > 0,
      "child cell must receive members")

    val after = probe()
    assert(after == before,
      "probe results must be bit-identical across a split " +
        s"(family expansion): before=${before.take(3)} after=${after.take(3)}")

    // NESTED split: split the child — lineage stays rooted at the
    // original parent, epoch bumps again, probe still invariant
    if (counts(child1) >= 2) {
      val (_, child2, epoch2) = AnnIndex.splitCell(spark, e, idx, child1)
      assert(child2 == 9 && epoch2 == 2L)
      val fams2 = AnnIndex.families(spark, idx).collect()
        .map(r => r.getInt(0) -> r.getInt(1)).toMap
      assert(fams2(child2) == target,
        s"nested split must keep the pre-split root: ${fams2(child2)}")
      assert(probe() == before,
        "probe results must survive a nested split")
    }
  }
}
