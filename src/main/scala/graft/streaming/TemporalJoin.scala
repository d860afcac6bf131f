package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time row-versioned temporal join — the reference's
  * FOR SYSTEM_TIME AS OF on a row-time versioned table
  * (flink-table-planner runtime/join/TemporalRowtimeJoin.scala:1,
  * registered via createTemporalTableFunction, table.scala:188-215).
  *
  * Semantics: each probe row joins the LATEST build-side version whose
  * timestamp is ≤ the probe's timestamp (inner: probes before the
  * first version emit nothing). The reference buffers both sides in
  * keyed state and emits when the watermark passes the probe row;
  * this implementation does the same on Structured Streaming:
  *
  *  - both sides are tagged and unioned so ONE watermark covers them
  *    (the same trick the reference plays by running the two-input
  *    operator under the combined watermark, min of both inputs);
  *  - `flatMapGroupsWithState` keeps, per key, the sorted version list
  *    and the buffered probes;
  *  - a probe is sealed once `probe.ts <= watermark` — every build
  *    version at or before it has then arrived, so the lookup is
  *    final and the row is emitted exactly once (append mode);
  *  - versions strictly older than the newest version at-or-under the
  *    watermark are evicted (that newest one stays: it is still the
  *    valid version for future probes), so state is bounded by the
  *    version churn inside the watermark delay — the same cleanup
  *    TemporalRowtimeJoin runs on its registered cleanup timer.
  *
  * At 100 TB this is shuffle-once by key, state-bounded, and emits
  * monotonically in event time — no driver involvement.
  */
object TemporalJoin {

  /** One tagged input row: build rows carry the new version value,
    * probe rows carry the id to emit. `ts` stays present because it is
    * the watermarked event-time column (Spark requires it to survive
    * into the state op); `tsUs` is the same instant in MICROS (full
    * source resolution — never collapse distinct timestamps). */
  case class TjEvent(key: Long, ts: java.sql.Timestamp, tsUs: Long, seq: Long,
      isBuild: Boolean, value: Double, probeId: Long)

  case class TjState(
      versions: List[(Long, Long, Double)], // (tsUs, seq, value) ascending
      probes: List[(Long, Long, Long)])     // (tsUs, seq, probeId) unordered

  /** probe ⋈ FOR SYSTEM_TIME AS OF probe.ts versionedBuild.
    *
    * @param tagged  union of both sides, already `.withWatermark` on
    *                the event-time column backing `tsMs`
    * @return (probeId, value) pairs, append-mode sealed
    */
  def rowTime(tagged: Dataset[TjEvent]): Dataset[(Long, Double)] = {
    import tagged.sparkSession.implicits._
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (_: Long, it: Iterator[TjEvent], state: GroupState[TjState]) => {
          val st = state.getOption.getOrElse(TjState(Nil, Nil))
          val (builds, probes) = it.toList.partition(_.isBuild)
          val versions =
            (st.versions ++ builds.map(b => (b.tsUs, b.seq, b.value)))
              .sortBy(v => (v._1, v._2))
          val allProbes = st.probes ++ probes.map(p => (p.tsUs, p.seq, p.probeId))
          // Spark treats rows with ts >= watermark as still possible, so
          // seal strictly below it (µs-floor of the ms watermark).
          // Batch execution has no watermark: everything has already
          // arrived, so the effective watermark is +inf and every probe
          // seals in this single invocation — the same op then serves
          // batch AS OF joins (Table.joinLateralAsOf on plain frames).
          val wmUs = (try state.getCurrentWatermarkMs() catch {
            case _: UnsupportedOperationException => Long.MaxValue / 2000L
          }) * 1000L
          val (sealedP, openP) = allProbes.partition(_._1 < wmUs)
          val out = sealedP.sortBy(p => (p._1, p._2)).flatMap { case (ts, _, id) =>
            // latest version at or before the probe row's time; equal-ts
            // versions ARE visible, ties resolve to the highest sequence
            // (list is (ts, seq)-ascending, so lastOption is that)
            versions.takeWhile(_._1 <= ts)
              .lastOption.map(v => (id, v._3))
          }
          // evict versions superseded at the watermark: drop everything
          // strictly before the last version still below it
          val cut = versions.lastIndexWhere(_._1 < wmUs)
          val keptVersions = if (cut <= 0) versions else versions.drop(cut)
          if (keptVersions.isEmpty && openP.isEmpty) state.remove()
          else {
            state.update(TjState(keptVersions, openP))
            // open probes seal when the watermark passes them, which can
            // happen in a no-data batch — register an event-time wake so
            // the function re-fires then (Spark only re-invokes keys with
            // new data or a fired timeout). A key holding only its
            // current version sets no timer: that version must outlive
            // any idle period for future probes.
            if (openP.nonEmpty) {
              val wake = openP.map(_._1 / 1000L + 1).min
              state.setTimeoutTimestamp(math.max(wake, state.getCurrentWatermarkMs() + 1))
            }
          }
          out.iterator
        })
  }

  /** DataFrame convenience: tag, union, watermark, run, name columns.
    * Columns: probe(key, ts, probeId), build(key, ts, value). */
  def rowTime(probe: DataFrame, build: DataFrame, delay: String): DataFrame = {
    val s = probe.sparkSession
    import s.implicits._
    val taggedB = build.select(col("key"), col("ts"), col("seq"),
      lit(true).as("isBuild"), col("value"),
      lit(-1L).as("probeId"))
    val taggedP = probe.select(col("key"), col("ts"), col("seq"),
      lit(false).as("isBuild"), lit(0.0).as("value"),
      col("probeId"))
    val tagged = taggedB.unionByName(taggedP)
      .withWatermark("ts", delay)
      .select(col("key"), col("ts"), unix_micros(col("ts")).as("tsUs"),
        col("seq"), col("isBuild"), col("value"), col("probeId"))
      .as[TjEvent]
    rowTime(tagged).toDF("probeId", "value")
  }
}
