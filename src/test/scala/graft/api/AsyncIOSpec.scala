package graft.api

import graft.SparkSpec
import scala.concurrent.Future
import scala.concurrent.duration._
import scala.concurrent.ExecutionContext.Implicits.global

class AsyncIOSpec extends SparkSpec {
  import spark.implicits._

  test("orderedMapAsync preserves partition order under concurrency") {
    val ds = spark.range(0, 100, 1, 2).as[Long]
    val out = AsyncIO.orderedMapAsync(ds, capacity = 8, timeout = 30.seconds) { n =>
      Future {
        // variable latency to scramble completion order
        Thread.sleep((n % 3) * 2)
        n * 10
      }
    }
    val perPartition = out.mapPartitions(it => Iterator(it.toSeq)).collect()
    perPartition.foreach(seq => assert(seq == seq.sorted))
    assert(perPartition.map(_.size).sum == 100)
  }

  test("unorderedMapAsync emits on completion — slow head doesn't block") {
    val ds = spark.range(0, 8, 1, 1).as[Long] // one partition: order observable
    val out = AsyncIO.unorderedMapAsync(ds, capacity = 8, timeout = 30.seconds) { n =>
      Future {
        Thread.sleep(if (n == 0) 400 else 5) // head is the slowest request
        n
      }
    }
    val seq = out.collect().toSeq
    assert(seq.toSet == (0L until 8L).toSet, "all requests complete exactly once")
    assert(seq.last == 0L, "the slow head emits last, not first")
  }
}
