package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Flink-style window triggers and evictors (reference
  * flink-streaming-java/.../windowing/triggers/ and evictors/) — the
  * semantics Structured Streaming's windowed aggregation cannot
  * express, run as a keyed custom state op (the same escape hatch the
  * reference uses for custom triggers: a keyed process function).
  *
  * - Early firing (ContinuousEventTimeTrigger / Trigger.onElement
  *   FIRE): every micro-batch in which an open window received data
  *   emits a speculative row (isFinal = false) with the window's
  *   current aggregate.
  * - Final firing: when the watermark passes window end, the window
  *   emits its final row (isFinal = true) and is purged — state per
  *   key is bounded by the number of open windows.
  * - Count evictor (CountEvictor.of(n)): only the LAST n elements (in
  *   (ts, tie) order) of the window participate in the aggregate —
  *   the evictor semantics that force keeping raw elements, which is
  *   exactly why SS aggregation cannot host them.
  *
  * Emitted row: (key, winStart, count, sum, isFinal) — winStart in
  * epoch millis. Early rows are speculative by design (their cadence
  * follows micro-batch boundaries, like the reference's per-element
  * FIRE); only isFinal rows are deterministic, and downstream exactly-
  * once consumers should filter on isFinal.
  */
object Triggers {

  /** Window evictors (reference evictors/{Count,Time,Delta}Evictor
    * .java): which buffered elements participate in the aggregate.
    * All operate on the window's (ts, value) elements in (ts, value)
    * order, evicting before the aggregate function runs — the
    * reference's evictBefore path. */
  sealed trait Evictor
  case object NoEvictor extends Evictor
  /** Keep only the LAST n elements. */
  final case class CountEvictor(keepLast: Int) extends Evictor
  /** Keep only elements within keepMillis of the window's newest. */
  final case class TimeEvictor(keepMillis: Long) extends Evictor
  /** Keep elements whose |value − newestValue| < threshold (the
    * reference's DeltaEvictor with an absolute-difference delta). */
  final case class DeltaEvictor(threshold: Double) extends Evictor

  /** Early-firing policy (when a still-open window emits speculative
    * rows). Final firing at window end is common to all. */
  sealed trait EarlyTrigger
  /** Fire on every micro-batch that delivered data to the window —
    * the per-element FIRE cadence (Trigger.onElement). */
  case object OnBatch extends EarlyTrigger
  /** Reference DeltaTrigger.java: fire when an arriving element's
    * value differs from the value at the LAST fire (initially the
    * window's first element) by more than `threshold` — an
    * absolute-difference delta function. */
  final case class OnDelta(threshold: Double) extends EarlyTrigger

  /** Tumbling event-time window with early firing and an optional
    * evictor. The Timestamp column must be the one carrying the
    * stream's watermark (projecting it away upstream would disable
    * event-time timeouts). */
  def earlyFiringTumble[K: Encoder](
      events: Dataset[(K, java.sql.Timestamp, Double)], // (key, ts, value)
      windowMillis: Long,
      evictor: Evictor = NoEvictor,
      trigger: EarlyTrigger = OnBatch,
      purging: Boolean = false): Dataset[(K, Long, Long, Double, Boolean)] = {
    require(windowMillis > 0, "windowMillis must be positive")
    evictor match {
      case CountEvictor(n) => require(n > 0, "evictor keep-n must be positive")
      case TimeEvictor(ms) => require(ms > 0, "evictor keep-millis must be positive")
      case DeltaEvictor(t) => require(t > 0, "evictor threshold must be positive")
      case NoEvictor => ()
    }
    trigger match {
      case OnDelta(t) => require(t > 0, "delta-trigger threshold must be positive")
      case OnBatch => ()
    }

    // winStart -> (buffered (ts, value), delta-trigger reference value).
    // The reference value lives OUTSIDE the buffer — a purge clears the
    // pane but not the trigger's memory, matching PurgingTrigger
    // wrapping DeltaTrigger in the reference.
    type Win = (Long, Seq[(Long, Double)], Option[Double])
    implicit val stEnc: Encoder[Seq[Win]] = Encoders.kryo[Seq[Win]]
    implicit val outEnc: Encoder[(K, Long, Long, Double, Boolean)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaBoolean)

    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: K, it: Iterator[(K, java.sql.Timestamp, Double)], state: GroupState[Seq[Win]]) => {
          val wm = state.getCurrentWatermarkMs()
          val windows =
            scala.collection.mutable.Map.empty[Long, (Vector[(Long, Double)], Option[Double])]
          state.getOption.getOrElse(Seq.empty).foreach { case (ws, evs, ref) =>
            windows(ws) = (evs.toVector, ref)
          }
          val fired = scala.collection.mutable.Set.empty[Long]
          it.foreach { case (_, t, v) =>
            val ts = t.getTime
            val ws = Math.floorDiv(ts, windowMillis) * windowMillis
            var (evs, ref) = windows.getOrElse(ws, (Vector.empty[(Long, Double)], None))
            evs :+= ((ts, v))
            trigger match {
              case OnBatch => fired += ws
              case OnDelta(th) => ref match {
                // first element arms the trigger without firing
                case None => ref = Some(v)
                case Some(r) if math.abs(v - r) > th => ref = Some(v); fired += ws
                case _ => ()
              }
            }
            windows(ws) = (evs, ref)
          }

          def agg(evs: Vector[(Long, Double)]): (Long, Double) = {
            // sum in (ts, value) order: deterministic across replays
            // and partitionings (double addition is order-sensitive)
            val sorted = evs.sortBy(identity)
            val kept = evictor match {
              case NoEvictor => sorted
              case CountEvictor(n) => sorted.takeRight(n)
              case TimeEvictor(ms) =>
                val newest = sorted.last._1
                sorted.filter(_._1 >= newest - ms)
              case DeltaEvictor(t) =>
                val ref = sorted.last._2
                sorted.filter(e => math.abs(e._2 - ref) < t)
            }
            (kept.size.toLong, kept.foldLeft(0.0)(_ + _._2))
          }

          val out = Vector.newBuilder[(K, Long, Long, Double, Boolean)]
          val (closed, open) = windows.partition { case (ws, _) => ws + windowMillis <= wm }
          closed.toSeq.sortBy(_._1).foreach { case (ws, (evs, _)) =>
            // a purge may have emptied the pane; an empty pane is not
            // evaluated (reference: no FIRE on empty window contents)
            if (evs.nonEmpty) {
              val (n, sum) = agg(evs)
              out += ((key, ws, n, sum, true)) // final fire + purge
            }
          }
          fired.toSeq.sorted.foreach { ws =>
            if (!closed.contains(ws)) {
              val (evs, ref) = open(ws)
              val (n, sum) = agg(evs)
              out += ((key, ws, n, sum, false)) // early (speculative) fire
              if (purging) open(ws) = (Vector.empty, ref) // FIRE_AND_PURGE
            }
          }

          if (open.isEmpty) state.remove()
          else {
            state.update(open.toSeq.map { case (ws, (evs, ref)) =>
              (ws, evs: Seq[(Long, Double)], ref)
            })
            // wake when the earliest open window can final-fire
            state.setTimeoutTimestamp(open.keys.min + windowMillis)
          }
          out.result().iterator
        })
  }

  /** Tumbling event-time window with PERIODIC early firing — the
    * reference's ContinuousEventTimeTrigger(interval)
    * (flink-streaming-java/.../triggers/ContinuousEventTimeTrigger
    * .java): rather than fire on every element (earlyFiringTumble's
    * cadence), each open window holds a timer on the next
    * interval-aligned event-time boundary and emits a speculative row
    * only when the WATERMARK crosses it, re-arming until the window's
    * end fires the final row. For long windows this trades per-batch
    * speculative output for a fixed early-result cadence — the
    * reference's stated use case.
    *
    * One early row per crossed boundary set per micro-batch (several
    * boundaries passed at once collapse into one row — they would all
    * carry the identical buffered aggregate); the next arm point is the
    * first boundary strictly above the current watermark. Final rows
    * (isFinal = true) are identical to earlyFiringTumble's.
    */
  def continuousEventTimeTumble[K: Encoder](
      events: Dataset[(K, java.sql.Timestamp, Double)], // (key, ts, value)
      windowMillis: Long,
      fireIntervalMillis: Long): Dataset[(K, Long, Long, Double, Boolean)] = {
    require(windowMillis > 0, "windowMillis must be positive")
    require(fireIntervalMillis > 0 && fireIntervalMillis < windowMillis,
      "fire interval must be positive and shorter than the window")

    type Win = (Long, Long, Seq[(Long, Double)]) // (winStart, nextFire, (ts, value)*)
    implicit val stEnc: Encoder[Seq[Win]] = Encoders.kryo[Seq[Win]]
    implicit val outEnc: Encoder[(K, Long, Long, Double, Boolean)] =
      Encoders.tuple(implicitly[Encoder[K]], Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaDouble, Encoders.scalaBoolean)

    def alignedAbove(t: Long): Long =
      (Math.floorDiv(t, fireIntervalMillis) + 1) * fireIntervalMillis

    events.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: K, it: Iterator[(K, java.sql.Timestamp, Double)], state: GroupState[Seq[Win]]) => {
          val wm = state.getCurrentWatermarkMs()
          val windows = scala.collection.mutable.Map.empty[Long, (Long, Vector[(Long, Double)])]
          state.getOption.getOrElse(Seq.empty).foreach { case (ws, nf, evs) =>
            windows(ws) = (nf, evs.toVector)
          }
          it.foreach { case (_, t, v) =>
            val ts = t.getTime
            val ws = Math.floorDiv(ts, windowMillis) * windowMillis
            val (nf, evs) = windows.getOrElse(ws, (alignedAbove(ts), Vector.empty))
            windows(ws) = (nf, evs :+ ((ts, v)))
          }

          def agg(evs: Vector[(Long, Double)]): (Long, Double) = {
            val sorted = evs.sortBy(identity) // deterministic double-sum order
            (sorted.size.toLong, sorted.foldLeft(0.0)(_ + _._2))
          }

          val out = Vector.newBuilder[(K, Long, Long, Double, Boolean)]
          val open = scala.collection.mutable.Map.empty[Long, (Long, Vector[(Long, Double)])]
          windows.toSeq.sortBy(_._1).foreach { case (ws, (nextFire, evs)) =>
            if (ws + windowMillis <= wm) {
              val (n, sum) = agg(evs)
              out += ((key, ws, n, sum, true)) // final fire + purge
            } else {
              if (nextFire <= wm) {
                val (n, sum) = agg(evs)
                out += ((key, ws, n, sum, false)) // periodic early fire
              }
              open(ws) = (math.max(nextFire, alignedAbove(wm)), evs)
            }
          }

          if (open.isEmpty) state.remove()
          else {
            state.update(open.toSeq.map { case (ws, (nf, evs)) =>
              (ws, nf, evs: Seq[(Long, Double)])
            })
            // wake at the earlier of: any window's next boundary, the
            // earliest window end (final fire)
            state.setTimeoutTimestamp(open.map { case (ws, (nf, _)) =>
              math.min(nf, ws + windowMillis)
            }.min)
          }
          out.result().iterator
        })
  }
}
