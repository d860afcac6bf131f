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
            else
              // nothing left to emit, but emitted rows are still held
              // for future frames: wake once the last of them ages out
              // of the range so eviction (and state.remove) can run —
              // the reference's cleanup timer (RowTimeBoundedRangeOver
              // .scala registerProcessingCleanupTimer analog). Without
              // this an idle key retains a range-span of rows forever.
              state.setTimeoutTimestamp(
                math.max(kept.map(_._1 / 1000L).max + rangeUs / 1000L + 1,
                  state.getCurrentWatermarkMs() + 1))
          }
          out.iterator
        })
  }

  /** Streaming row-time bounded-ROWS OVER aggregate — the reference's
    * RowTimeBoundedRowsOver.scala: per input row, aggregate over the
    * same key's last `nRows` rows (current row + nRows−1 preceding) in
    * (event-time, seq) order, emitted exactly once when the watermark
    * seals the row.
    *
    * State protocol (count-based sibling of [[boundedRangeSum]]):
    *  - EMIT a row once `ts < watermark`: every possible predecessor
    *    (smaller ts, or equal ts with smaller seq) has arrived;
    *  - EVICT emitted rows that can no longer be among the nRows−1
    *    predecessors of any future row: keep all unsealed rows plus
    *    the last nRows−1 sealed ones — state per key is bounded by
    *    nRows−1 + the unsealed tail, the same retract-oldest bound
    *    the reference enforces with its row-count MapState.
    * A fully-emitted idle key keeps exactly nRows−1 history rows (they
    * are frame members of any future row, so they cannot be dropped
    * without a lossy idle-state TTL — the reference makes that
    * trade-off configurable via state retention; we keep accuracy).
    */
  def boundedRowsSum(in: Dataset[OvEvent], nRows: Int): Dataset[(Long, BigDecimal)] = {
    import in.sparkSession.implicits._
    require(nRows >= 1)
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
          // prefix sums make every count-based frame a two-term
          // difference — one O(|buffer|) pass, like the RANGE variant
          val arr = buf.toIndexedSeq
          val prefix = new Array[BigDecimal](arr.length + 1)
          prefix(0) = BigDecimal(0)
          for (i <- arr.indices) prefix(i + 1) = prefix(i) + arr(i)._3
          val out = scala.collection.mutable.ArrayBuffer.empty[(Long, BigDecimal)]
          for (i <- arr.indices if !arr(i)._5 && arr(i)._1 < wmUs)
            out += ((arr(i)._4, prefix(i + 1) - prefix(math.max(0, i + 1 - nRows))))
          val marked = buf.map(r => if (r._1 < wmUs) r.copy(_5 = true) else r)
          val (sealed_, unsealed) = marked.partition(_._5)
          val kept = sealed_.takeRight(nRows - 1) ++ unsealed
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
