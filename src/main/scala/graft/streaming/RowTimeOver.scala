package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming row-time bounded-RANGE OVER aggregate — the reference's
  * RowTimeBoundedRangeOver.scala (flink-table-planner runtime/
  * aggregate): for every input row, emit an aggregate over the same
  * key's rows in `[row.ts − range, row.ts]` (RANGE frame: equal-time
  * peers included), in event time, exactly once.
  *
  * The reference keeps a MapState[ts → rows] plus a cleanup timer; this
  * keeps the same sorted buffer in `GroupState` and follows the same
  * protocol:
  *  - a row is EMITTED once the watermark passes its timestamp (its
  *    frame can no longer grow — all peers and predecessors arrived);
  *  - a row is EVICTED once `ts < watermark − range` (it can no longer
  *    be a frame member of any future row), so state per key is
  *    bounded by the rows inside one range span — the same bound the
  *    reference's cleanup timer enforces.
  *
  * Sums ride as BigDecimal(scale 4, HALF_EVEN) — exact, associative,
  * identical to the SQL `CAST(value AS decimal(18,4))` window sum.
  */
object RowTimeOver {

  /** (key, tsUs, seq, value, rowId); ts is the watermarked column. */
  case class OvEvent(key: Long, ts: java.sql.Timestamp, tsUs: Long, seq: Long,
      value: Double, rowId: Long)

  /** (tsUs, seq, valueScaled4, rowId, emitted) */
  case class OvState(rows: List[(Long, Long, BigDecimal, Long, Boolean)])

  def boundedRangeSum(in: Dataset[OvEvent], rangeUs: Long): Dataset[(Long, BigDecimal)] = {
    import in.sparkSession.implicits._
    in.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, it: Iterator[OvEvent], state: GroupState[OvState]) => {
          val prev = state.getOption.map(_.rows).getOrElse(Nil)
          val buf = (prev ++ it.map(e =>
              (e.tsUs, e.seq,
                BigDecimal(e.value).setScale(4, BigDecimal.RoundingMode.HALF_EVEN),
                e.rowId, false)))
            .sortBy(r => (r._1, r._2))
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          // emit every not-yet-emitted row strictly below the watermark:
          // its whole frame [ts−range, ts] is complete. Frames of
          // successive rows are nested ranges of the sorted buffer, so
          // one two-pointer pass with a running sum emits ALL sealed
          // rows in O(|buffer|) — a per-row frame scan would be
          // quadratic per key per batch and collapses at scale.
          val arr = buf.toIndexedSeq
          var start = 0
          var end = 0
          var running = BigDecimal(0)
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, BigDecimal)]
          for (i <- arr.indices if !arr(i)._5 && arr(i)._1 < wmUs) {
            val ts = arr(i)._1
            while (end < arr.length && arr(end)._1 <= ts) {
              running += arr(end)._3; end += 1
            }
            while (arr(start)._1 < ts - rangeUs) {
              running -= arr(start)._3; start += 1
            }
            out += ((arr(i)._4, running))
          }
          val marked = buf.map(r => if (r._1 < wmUs) r.copy(_5 = true) else r)
          // evict rows that can't be frame members of any future row
          val kept = marked.filter(_._1 >= wmUs - rangeUs)
          if (kept.isEmpty) state.remove()
          else {
            state.update(OvState(kept))
            val pending = kept.filter(!_._5)
            if (pending.nonEmpty)
              state.setTimeoutTimestamp(math.max(pending.map(_._1 / 1000L + 1).min,
                state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
        })
  }
}
