package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded partial top-k aggregate — the scale-safe alternative to
  * `row_number().over(Window.partitionBy(...))` for per-group top-k:
  * the window form range-shuffles EVERY candidate row to sort whole
  * partitions, while this aggregate keeps at most k rows of state per
  * group per task (map-side combine), so the exchange carries
  * groups × k rows instead of the full candidate set. At a 100 TB
  * corpus that is the difference between shuffling kilobytes and
  * shuffling the dataset.
  *
  * Ordering: score DESC, id ASC (a total order whenever ids are
  * unique, making the result independent of partitioning and merge
  * order). Output is the sorted top-k array; `posexplode` it to
  * recover (rank, row).
  */
object TopK {

  case class Scored(score: Double, id: Long)

  private[graft] class TopKAgg(k: Int)
      extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {

    private def better(a: Scored, b: Scored): Boolean =
      a.score > b.score || (a.score == b.score && a.id < b.id)

    // buffers stay tiny (≤ k) — sorted-insert keeps merge O(k)
    private def insert(buf: Seq[Scored], v: Scored): Seq[Scored] = {
      val (pre, post) = buf.span(better(_, v))
      val grown = pre ++ (v +: post)
      if (grown.length > k) grown.take(k) else grown
    }

    def zero: Seq[Scored] = Vector.empty
    def reduce(buf: Seq[Scored], v: Scored): Seq[Scored] = insert(buf, v)
    def merge(b1: Seq[Scored], b2: Seq[Scored]): Seq[Scored] =
      b2.foldLeft(b1)(insert)
    def finish(buf: Seq[Scored]): Seq[Scored] = buf
    def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder()
  }

  /** `topK(3)(col("score"), col("id"))` → array<struct<score,id>> of
    * the group's k best rows, ordered (score DESC, id ASC). */
  def topK(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKAgg(k), ExpressionEncoder[Scored]()).apply(score, id)
}
