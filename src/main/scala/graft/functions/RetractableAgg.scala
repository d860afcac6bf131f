package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Retractable aggregate functions — the reference's UDAGG contract
  * with `retract` (flink-table/flink-table-common-style
  * AggregateFunction: createAccumulator/accumulate/retract/merge/
  * getValue, used by GroupAggProcessFunction to consume retract
  * streams). Spark's Aggregator has no retract slot, so inputs carry
  * an explicit accumulate flag — exactly the `(Boolean, row)` shape
  * `Retract.changelog` emits — and `reduce` dispatches on it.
  *
  * The accumulator must absorb retractions exactly:
  *  - sum/count: signed accumulation (a retract is a negative add);
  *  - min/max: a value→count multiset (dropping to a plain running
  *    min would be wrong the moment the current extremum retracts —
  *    the reason the reference keeps a MapState for retractable
  *    min/max).
  * All are associative and commutative over (flag, value) pairs, so
  * partial aggregation (map-side combine) stays available: the merge
  * of two partial multisets/sums is independent of message order.
  */
object RetractableAgg {

  /** The reference's retractable-UDAGG surface, 1:1. */
  trait RetractableAggregateFunction[IN, ACC, OUT] extends Serializable {
    def createAccumulator(): ACC
    def accumulate(acc: ACC, in: IN): ACC
    def retract(acc: ACC, in: IN): ACC
    def merge(a: ACC, b: ACC): ACC
    def getValue(acc: ACC): OUT
  }

  object RetractableSum extends RetractableAggregateFunction[Double, Double, Double] {
    def createAccumulator(): Double = 0.0
    def accumulate(acc: Double, in: Double): Double = acc + in
    def retract(acc: Double, in: Double): Double = acc - in
    def merge(a: Double, b: Double): Double = a + b
    def getValue(acc: Double): Double = acc
  }

  object RetractableCount extends RetractableAggregateFunction[Double, Long, Long] {
    def createAccumulator(): Long = 0L
    def accumulate(acc: Long, in: Double): Long = acc + 1
    def retract(acc: Long, in: Double): Long = acc - 1
    def merge(a: Long, b: Long): Long = a + b
    def getValue(acc: Long): Long = acc
  }

  /** value→count multiset; counts may go transiently negative when a
    * retraction is merged before its accumulation (message order
    * inside one batch is arbitrary) — entries cancel at zero, so the
    * merged result is order-independent. */
  final case class MultisetAcc(counts: Map[Double, Int])

  final class RetractableMax
      extends RetractableAggregateFunction[Double, MultisetAcc, Option[Double]] {
    def createAccumulator(): MultisetAcc = MultisetAcc(Map.empty)
    private def bump(acc: MultisetAcc, in: Double, by: Int): MultisetAcc = {
      val n = acc.counts.getOrElse(in, 0) + by
      MultisetAcc(if (n == 0) acc.counts - in else acc.counts.updated(in, n))
    }
    def accumulate(acc: MultisetAcc, in: Double): MultisetAcc = bump(acc, in, 1)
    def retract(acc: MultisetAcc, in: Double): MultisetAcc = bump(acc, in, -1)
    def merge(a: MultisetAcc, b: MultisetAcc): MultisetAcc =
      b.counts.foldLeft(a) { case (acc, (v, n)) =>
        val m = acc.counts.getOrElse(v, 0) + n
        MultisetAcc(if (m == 0) acc.counts - v else acc.counts.updated(v, m))
      }
    def getValue(acc: MultisetAcc): Option[Double] = {
      val live = acc.counts.collect { case (v, n) if n > 0 => v }
      if (live.isEmpty) None else Some(live.max)
    }
  }

  /** Lift a retractable function into a Spark Aggregator over
    * (accumulate, value) pairs — the changelog consumption path. */
  def asAggregator[ACC: Encoder, OUT: Encoder](
      f: RetractableAggregateFunction[Double, ACC, OUT]): Aggregator[(Boolean, Double), ACC, OUT] =
    new Aggregator[(Boolean, Double), ACC, OUT] {
      def zero: ACC = f.createAccumulator()
      def reduce(acc: ACC, in: (Boolean, Double)): ACC =
        if (in._1) f.accumulate(acc, in._2) else f.retract(acc, in._2)
      def merge(a: ACC, b: ACC): ACC = f.merge(a, b)
      def finish(acc: ACC): OUT = f.getValue(acc)
      def bufferEncoder: Encoder[ACC] = implicitly[Encoder[ACC]]
      def outputEncoder: Encoder[OUT] = implicitly[Encoder[OUT]]
    }

  /** Untyped-column forms for DataFrame use: `(flag, value)`. */
  def retractableSum(flag: Column, value: Column): Column = {
    implicit val accEnc: Encoder[Double] = Encoders.scalaDouble
    udaf(asAggregator(RetractableSum), ExpressionEncoder[(Boolean, Double)]())
      .apply(flag, value)
  }

  def retractableCount(flag: Column, value: Column): Column = {
    implicit val accEnc: Encoder[Long] = Encoders.scalaLong
    implicit val inEnc: Encoder[Double] = Encoders.scalaDouble
    udaf(asAggregator(RetractableCount), ExpressionEncoder[(Boolean, Double)]())
      .apply(flag, value)
  }

  def retractableMax(flag: Column, value: Column): Column = {
    implicit val accEnc: Encoder[MultisetAcc] = Encoders.kryo[MultisetAcc]
    implicit val outEnc: Encoder[Option[Double]] = ExpressionEncoder()
    udaf(asAggregator(new RetractableMax), ExpressionEncoder[(Boolean, Double)]())
      .apply(flag, value)
  }
}
