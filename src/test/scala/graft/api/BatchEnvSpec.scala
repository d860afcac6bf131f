package graft.api

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BatchEnvSpec extends SparkSpec {
  import spark.implicits._
  private lazy val env = BatchEnv(spark)

  test("fromCollection + map + filter + output") {
    val r = env.fromCollection(Seq(1, 2, 3, 4))
      .map(_ * 2).filter(_ > 4).output().sorted.toSeq
    assert(r == Seq(6, 8))
  }

  test("generateSequence is inclusive") {
    assert(env.generateSequence(1, 5).count() == 5)
  }

  test("groupBy + reduce") {
    val r = env.fromCollection(Seq(("a", 1), ("b", 2), ("a", 3)))
      .groupBy(_._1)
      .reduce((x, y) => (x._1, x._2 + y._2))
      .collect().map(_._2).toSet
    assert(r == Set(("a", 4), ("b", 2)))
  }

  test("sortedReduceGroup sees values in order") {
    val r = env.fromCollection(Seq(("k", 3), ("k", 1), ("k", 2)))
      .groupBy(_._1)
      .sortedReduceGroup((a, b) => a._2 < b._2)((k, it) => (k, it.map(_._2).mkString(",")))
      .collect().toSeq
    assert(r == Seq(("k", "1,2,3")))
  }

  test("coGroup pairs both sides per key") {
    val a = env.fromCollection(Seq(("k1", 1), ("k2", 2)))
    val b = env.fromCollection(Seq(("k1", 10), ("k1", 20)))
    val r = a.coGroup(b)(_._1, _._1)((k, as, bs) =>
      Iterator((k, as.size, bs.size))).output().toSet
    assert(r == Set(("k1", 1, 2), ("k2", 1, 0)))
  }

  test("set operations") {
    val a = env.fromCollection(Seq(1, 2, 2, 3))
    val b = env.fromCollection(Seq(2, 3, 4))
    assert(a.union(b).count() == 7)
    assert(a.intersect(b).output().sorted.toSeq == Seq(2, 3))
    assert(a.minus(b).output().toSeq == Seq(1))
  }

  test("zipWithIndex is dense and order-deterministic") {
    val r = env.fromCollection(Seq("c", "a", "b"))
      .zipWithIndex(col("value"))
      .as[(String, Long)].collect().toSeq.sortBy(_._2)
    assert(r == Seq(("a", 0L), ("b", 1L), ("c", 2L)))
  }

  test("bulk iterate converges (doubling until bound)") {
    val r = env.fromCollection(Seq(1))
      .iterate(10)(ds => ds.map(_ * 2), (_, cur) => cur.head() >= 100)
    assert(r.output().toSeq == Seq(128))
  }

  test("iterateDelta applies keyed deltas until the workset drains") {
    val solution = env.fromCollection(Seq((1, 10), (2, 20), (3, 30)))
    val workset = env.fromCollection(Seq((3, 100)))
    val r = solution.iterateDelta(workset, maxIter = 5)(_._1) { (_, ws) =>
      (ws, ws.filter(_ => false)) // delta = workset, then drain
    }
    assert(r.output().toSet == Set((1, 10), (2, 20), (3, 100)))
  }

  test("sample is deterministic under a seed") {
    val a = env.generateSequence(1, 1000).sample(withReplacement = false, 0.1, seed = 7).count()
    val b = env.generateSequence(1, 1000).sample(withReplacement = false, 0.1, seed = 7).count()
    assert(a == b && a > 50 && a < 200)
  }

  test("sampleWithSize returns exactly n, deterministic under a seed") {
    val a = env.generateSequence(1, 1000).sampleWithSize(25, seed = 7).output().toSet
    val b = env.generateSequence(1, 1000).sampleWithSize(25, seed = 7).output().toSet
    assert(a == b && a.size == 25)
  }

  test("countElementsPerPartition sums to the dataset size") {
    val counts = env.generateSequence(1, 100).rebalance(8)
      .countElementsPerPartition().collect()
    assert(counts.map(_._2).sum == 100L)
    assert(counts.length == 8)
  }

  test("partitionCustom routes rows by the user function") {
    val parted = env.fromCollection((1 to 20).map(_.toLong))
      .partitionCustom(4, t => (t % 4).toInt)
    val perPart = parted.countElementsPerPartition().collect().toMap
    assert(perPart.values.sum == 20L)
    assert(perPart.values.forall(_ == 5L)) // t % 4 balances exactly
  }
}
