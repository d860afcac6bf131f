package graft.api

import org.apache.spark.sql.{Dataset, Encoder}
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Async I/O enrichment (reference AsyncDataStream.java:102
  * orderedWait/unorderedWait, AsyncWaitOperator.java): per partition,
  * up to `capacity` requests are in flight concurrently; `ordered`
  * preserves input order within the partition (the reference's
  * orderedWait), matching its documented capacity model (default
  * example: 100 in flight).
  *
  * Spark-idiomatic shape: mapPartitions with a bounded sliding window
  * of Futures — executors each run their partition's async client; no
  * driver involvement, so throughput scales with the cluster.
  */
object AsyncIO {

  def orderedMapAsync[T, R: Encoder](ds: Dataset[T], capacity: Int,
      timeout: Duration)(f: T => Future[R])(
      implicit ec: ExecutionContext): Dataset[R] =
    ds.mapPartitions { it =>
      // sliding buffer: launch up to `capacity` ahead, emit in order
      new Iterator[R] {
        private val queue = scala.collection.mutable.Queue.empty[Future[R]]
        private val source = it
        override def hasNext: Boolean = queue.nonEmpty || source.hasNext
        override def next(): R = {
          while (queue.size < capacity && source.hasNext) queue.enqueue(f(source.next()))
          Await.result(queue.dequeue(), timeout)
        }
      }
    }

  /** unorderedWait: results emit as they COMPLETE, so one slow request
    * never blocks the `capacity − 1` behind it (the reference's
    * unordered mode trades order for latency; AsyncDataStream.java:134). */
  def unorderedMapAsync[T, R: Encoder](ds: Dataset[T], capacity: Int,
      timeout: Duration)(f: T => Future[R])(
      implicit ec: ExecutionContext): Dataset[R] =
    ds.mapPartitions { it =>
      new Iterator[R] {
        private val buf = scala.collection.mutable.ArrayBuffer.empty[Future[R]]
        private val source = it
        override def hasNext: Boolean = buf.nonEmpty || source.hasNext
        override def next(): R = {
          while (buf.size < capacity && source.hasNext) buf += f(source.next())
          // prefer an already-finished request; otherwise block until
          // the first of the window completes
          val idx = buf.indexWhere(_.isCompleted) match {
            case -1 =>
              // parasitic EC: runs on the completing thread and, unlike
              // a captured pool EC, doesn't drag an unserializable
              // executor into the task closure
              Await.ready(Future.firstCompletedOf(buf.toSeq)(
                ExecutionContext.parasitic), timeout)
              buf.indexWhere(_.isCompleted)
            case i => i
          }
          Await.result(buf.remove(idx), timeout)
        }
      }
    }
}
