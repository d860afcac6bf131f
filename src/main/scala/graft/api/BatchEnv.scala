package graft.api

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** DataSet-like bounded-batch façade (reference flink-java/.../
  * DataSet.java:1, 1803 LoC) over Spark Datasets.
  *
  * Everything lowers to declarative Dataset/DataFrame operations so
  * Catalyst keeps choosing physical strategies; the wrapper adds no
  * execution logic of its own. Iterations (DataSet.java:1156 iterate,
  * :1206 iterateDelta) are driver loops with periodic localCheckpoint
  * to truncate lineage — the Spark-idiomatic replacement for Flink's
  * native iteration operator, safe at scale because each step is a
  * full distributed job.
  */
final class BatchEnv(val spark: SparkSession) {

  def fromCollection[T: Encoder](data: Seq[T]): BatchOps[T] =
    new BatchOps(spark.createDataset(data))

  def fromElements[T: Encoder](data: T*): BatchOps[T] =
    fromCollection(data)

  /** generateSequence (ExecutionEnvironment.java:796). */
  def generateSequence(from: Long, to: Long): BatchOps[java.lang.Long] =
    new BatchOps(spark.range(from, to + 1).as[java.lang.Long](
      org.apache.spark.sql.Encoders.LONG.asInstanceOf[Encoder[java.lang.Long]]))

  def readTextFile(path: String): BatchOps[String] = {
    implicit val e: Encoder[String] = org.apache.spark.sql.Encoders.STRING
    new BatchOps(spark.read.textFile(path))
  }

  def readCsv(path: String, header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.option("header", header).option("delimiter", delimiter)
      .option("inferSchema", true).csv(path)

  def readParquet(path: String): DataFrame = spark.read.parquet(path)

  def readJson(path: String): DataFrame = spark.read.json(path)
}

/** Typed transform surface of DataSet<T>. */
final class BatchOps[T](val ds: Dataset[T]) {
  private implicit def enc: Encoder[T] = ds.encoder
  private def sp = ds.sparkSession

  // ----- row transforms (DataSet.java:210-314) -----
  def map[R: Encoder](f: T => R): BatchOps[R] = new BatchOps(ds.map(f))
  def flatMap[R: Encoder](f: T => IterableOnce[R]): BatchOps[R] =
    new BatchOps(ds.flatMap(f))
  def mapPartition[R: Encoder](f: Iterator[T] => Iterator[R]): BatchOps[R] =
    new BatchOps(ds.mapPartitions(f))
  def filter(f: T => Boolean): BatchOps[T] = new BatchOps(ds.filter(f))
  def distinct(): BatchOps[T] = new BatchOps(ds.distinct())

  // ----- grouping (DataSet.java:670 groupBy) -----
  def groupBy[K: Encoder](key: T => K): GroupedBatch[K, T] =
    new GroupedBatch(ds.groupByKey(key))

  // ----- joins (DataSet.java:751-1118); Catalyst picks the physical
  // strategy, `hint` mirrors Flink's JoinHint surface -----
  def join[U](other: BatchOps[U], cond: Column, joinType: String = "inner"): DataFrame =
    ds.join(other.ds, cond, joinType)
  def joinWithTiny[U](other: BatchOps[U], cond: Column): DataFrame =
    ds.join(broadcast(other.ds), cond)
  def joinWithHuge[U](other: BatchOps[U], cond: Column): DataFrame =
    broadcast(ds).join(other.ds, cond)
  def cross[U](other: BatchOps[U]): DataFrame = ds.crossJoin(other.ds)
  def coGroup[U, K: Encoder, R: Encoder](other: BatchOps[U])(
      thisKey: T => K, otherKey: U => K)(
      f: (K, Iterator[T], Iterator[U]) => IterableOnce[R]): BatchOps[R] =
    new BatchOps(ds.groupByKey(thisKey)
      .cogroup(other.ds.groupByKey(otherKey))((k, a, b) => f(k, a, b).iterator))

  // ----- set ops (DataSet.java:1241, table.scala:838-967) -----
  def union(other: BatchOps[T]): BatchOps[T] = new BatchOps(ds.union(other.ds))
  def intersect(other: BatchOps[T]): BatchOps[T] = new BatchOps(ds.intersect(other.ds))
  def minus(other: BatchOps[T]): BatchOps[T] = new BatchOps(ds.except(other.ds))

  // ----- physical distribution (DataSet.java:1257-1430, §2.9) -----
  def partitionByHash(cols: Column*): BatchOps[T] =
    new BatchOps(ds.repartition(cols: _*))
  def partitionByRange(cols: Column*): BatchOps[T] =
    new BatchOps(ds.repartitionByRange(cols: _*))
  def rebalance(n: Int): BatchOps[T] = new BatchOps(ds.repartition(n))
  def rescale(n: Int): BatchOps[T] = new BatchOps(ds.coalesce(n))
  def sortPartition(cols: Column*): BatchOps[T] =
    new BatchOps(ds.sortWithinPartitions(cols: _*))

  // ----- DataSetUtils (§2.5): zipWithIndex, sample -----
  /** Dense 0-based index; a total sort by the given order then a
    * window row_number — deterministic, unlike monotonically_
    * increasing_id (which is the zipWithUniqueId analog). */
  def zipWithIndex(order: Column*): DataFrame = {
    val w = Window.orderBy(order: _*)
    ds.toDF().withColumn("index", row_number().over(w).cast("long") - 1)
  }
  def zipWithUniqueId(): DataFrame =
    ds.toDF().withColumn("unique_id", monotonically_increasing_id())
  def sample(withReplacement: Boolean, fraction: Double, seed: Long): BatchOps[T] =
    new BatchOps(ds.sample(withReplacement, fraction, seed))

  /** Exact-size sample (DataSetUtils.sampleWithSize): deterministic
    * given the seed — rank by seeded rand, take n. One shuffle; the
    * sort is top-n (TakeOrderedAndProject), not a total sort. */
  def sampleWithSize(n: Int, seed: Long): BatchOps[T] =
    new BatchOps(ds.orderBy(rand(seed)).limit(n))

  /** DataSetUtils.countElementsPerPartition: (partitionId, count)
    * without moving any data. */
  def countElementsPerPartition(): Dataset[(Int, Long)] = {
    implicit val e: Encoder[(Int, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaInt,
        org.apache.spark.sql.Encoders.scalaLong)
    ds.mapPartitions { it =>
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator((org.apache.spark.TaskContext.getPartitionId(), n))
    }
  }

  /** partitionCustom (DataSet.java partitionCustom): route each row by
    * a user partition function. The Dataset API has no custom
    * Partitioner hook, so this is the documented RDD drop-down. */
  def partitionCustom(nParts: Int, f: T => Int): BatchOps[T] = {
    val part = new org.apache.spark.Partitioner {
      override def numPartitions: Int = nParts
      override def getPartition(key: Any): Int =
        ((key.asInstanceOf[Int] % nParts) + nParts) % nParts
    }
    implicit val ctT: scala.reflect.ClassTag[T] =
      scala.reflect.ClassTag.AnyRef.asInstanceOf[scala.reflect.ClassTag[T]]
    val rdd = new org.apache.spark.rdd.PairRDDFunctions(
      ds.rdd.map(t => (f(t), t))).partitionBy(part).values
    new BatchOps(sp.createDataset(rdd))
  }

  /** summarize (DataSetUtils.java ~summarize): per-numeric-column
    * min/max/mean/stddev/count over one distributed pass. */
  def summarize(): DataFrame = ds.toDF().summary("count", "min", "max", "mean", "stddev")

  // ----- iterations (DataSet.java:1156/1206) as driver loops -----
  /** Bulk iteration: apply step until maxIter or converged(prev, cur). */
  def iterate(maxIter: Int, checkpointEvery: Int = 5)(
      step: Dataset[T] => Dataset[T],
      converged: (Dataset[T], Dataset[T]) => Boolean = (_, _) => false): BatchOps[T] = {
    var cur = ds
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      var next = step(cur)
      if ((i + 1) % checkpointEvery == 0) next = next.localCheckpoint()
      done = converged(cur, next)
      cur = next
      i += 1
    }
    new BatchOps(cur)
  }

  /** Delta iteration (DataSet.java:1206 iterateDelta): a solution set
    * updated by keyed deltas plus a shrinking workset; terminates when
    * the workset empties or maxIter is hit. The solution merge is a
    * distributed keyed cogroup (delta wins), never a driver collect. */
  def iterateDelta[K: Encoder](workset0: BatchOps[T], maxIter: Int,
      checkpointEvery: Int = 3)(keyOf: T => K)(
      step: (Dataset[T], Dataset[T]) => (Dataset[T], Dataset[T])): BatchOps[T] = {
    // materialize both entry frames: every iteration runs actions
    // (workset emptiness, delta checkpoint), which would otherwise
    // re-evaluate an expensive input lineage until the first
    // in-loop checkpoint lands (the Pregel vertex-set lesson)
    var solution = ds.localCheckpoint()
    var workset = workset0.ds.localCheckpoint()
    var i = 0
    while (i < maxIter && !workset.isEmpty) {
      val (delta, nextWs) = step(solution, workset)
      val d = delta.localCheckpoint()
      solution = solution.groupByKey(keyOf).cogroup(d.groupByKey(keyOf)) {
        (_, sIt, dIt) => if (dIt.hasNext) dIt else sIt
      }
      if ((i + 1) % checkpointEvery == 0) solution = solution.localCheckpoint()
      workset = nextWs.localCheckpoint()
      i += 1
    }
    new BatchOps(solution)
  }

  // ----- sinks (DataSet.java:1492-1780) -----
  def writeAsText(path: String): Unit =
    ds.toDF().write.mode("overwrite").text(path)
  def writeAsCsv(path: String, delimiter: String = ","): Unit =
    ds.toDF().write.mode("overwrite").option("delimiter", delimiter).csv(path)
  def writeParquet(path: String): Unit =
    ds.toDF().write.mode("overwrite").parquet(path)
  def output(): Array[T] = ds.collect()
  def print(): Unit = ds.show(20, truncate = false)
  def count(): Long = ds.count()
}

/** UnsortedGrouping<T> analog (flink-java/.../UnsortedGrouping.java). */
final class GroupedBatch[K, T](val kv: org.apache.spark.sql.KeyValueGroupedDataset[K, T]) {

  /** reduce (DataSet.java:443): associative pairwise reduce per key —
    * Spark applies it map-side first (partial aggregation). */
  def reduce(f: (T, T) => T)(implicit e: Encoder[(K, T)]): Dataset[(K, T)] =
    kv.reduceGroups(f)

  /** reduceGroup (UnsortedGrouping.java:143): whole-group function. */
  def reduceGroup[R: Encoder](f: (K, Iterator[T]) => R): Dataset[R] =
    kv.mapGroups(f)

  /** sortGroup + reduceGroup (UnsortedGrouping.java:271): values are
    * sorted in memory per group before the function sees them; at
    * scale prefer agg() forms that avoid materializing the group. */
  def sortedReduceGroup[R: Encoder](lt: (T, T) => Boolean)(
      f: (K, Iterator[T]) => R): Dataset[R] =
    kv.mapGroups((k, it) => f(k, it.toSeq.sortWith(lt).iterator))

  def flatReduceGroup[R: Encoder](f: (K, Iterator[T]) => IterableOnce[R]): Dataset[R] =
    kv.flatMapGroups((k, it) => f(k, it).iterator)

  def agg[A](c: org.apache.spark.sql.TypedColumn[T, A]): DataFrame =
    kv.agg(c).toDF()
  def agg[A, B](c1: org.apache.spark.sql.TypedColumn[T, A],
      c2: org.apache.spark.sql.TypedColumn[T, B]): DataFrame =
    kv.agg(c1, c2).toDF()
  def agg[A, B, C](c1: org.apache.spark.sql.TypedColumn[T, A],
      c2: org.apache.spark.sql.TypedColumn[T, B],
      c3: org.apache.spark.sql.TypedColumn[T, C]): DataFrame =
    kv.agg(c1, c2, c3).toDF()

  def count()(implicit e: Encoder[(K, Long)]): Dataset[(K, Long)] = kv.count()
}

object BatchEnv {
  def apply(spark: SparkSession): BatchEnv = new BatchEnv(spark)
}
