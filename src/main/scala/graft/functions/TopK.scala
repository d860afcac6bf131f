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

  /** String-id variant — same bounded-state contract, for groups
    * keyed by terms/labels rather than numeric ids (q193's sealed
    * trending-window rank). Ordering: score DESC, id ASC
    * (lexicographic), a total order when ids are unique within the
    * group, so results are partitioning- and merge-order-free. */
  case class ScoredS(score: Double, id: String)

  private[graft] class TopKStrAgg(k: Int)
      extends Aggregator[ScoredS, Seq[ScoredS], Seq[ScoredS]] {

    // Tie-break in UTF-8 byte order (unsigned), NOT JVM String `<`
    // (UTF-16 code-unit order): both Spark's UTF8String sort and
    // DuckDB's default collation are UTF-8-byte/code-point order, and
    // the two diverge from UTF-16 for supplementary-plane ids
    // (surrogates 0xD800+ sort below BMP 0xE000+ in UTF-16 but 4-byte
    // UTF-8 sorts above all BMP). Keeps q193/q202 oracle-stable for
    // any vocab.
    private def utf8Less(a: String, b: String): Boolean = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val xa = x(i) & 0xff; val yb = y(i) & 0xff
        if (xa != yb) return xa < yb
        i += 1
      }
      x.length < y.length
    }

    private def better(a: ScoredS, b: ScoredS): Boolean =
      a.score > b.score || (a.score == b.score && utf8Less(a.id, b.id))

    private def insert(buf: Seq[ScoredS], v: ScoredS): Seq[ScoredS] = {
      val (pre, post) = buf.span(better(_, v))
      val grown = pre ++ (v +: post)
      if (grown.length > k) grown.take(k) else grown
    }

    def zero: Seq[ScoredS] = Vector.empty
    def reduce(buf: Seq[ScoredS], v: ScoredS): Seq[ScoredS] = insert(buf, v)
    def merge(b1: Seq[ScoredS], b2: Seq[ScoredS]): Seq[ScoredS] =
      b2.foldLeft(b1)(insert)
    def finish(buf: Seq[ScoredS]): Seq[ScoredS] = buf
    def bufferEncoder: Encoder[Seq[ScoredS]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[ScoredS]] = ExpressionEncoder()
  }

  /** `topKStr(3)(col("n"), col("word"))` → array<struct<score,id>>
    * of the group's k best (score DESC, id ASC). */
  def topKStr(k: Int)(score: Column, id: Column): Column =
    udaf(new TopKStrAgg(k), ExpressionEncoder[ScoredS]()).apply(score, id)
}
