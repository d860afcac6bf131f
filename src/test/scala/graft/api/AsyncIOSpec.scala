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
}
