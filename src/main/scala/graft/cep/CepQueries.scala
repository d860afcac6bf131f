package graft.cep

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._
import scala.concurrent.duration._

/** CEP patterns over the events table, verified against window-
  * function oracles (each oracle is an independent SQL formulation of
  * the same match semantics — SURVEY §2.12).
  */
object CepQueries extends QueryModule {

  /** (user_id, event_id, event_type, ts_us)
    *
    * Sequencing convention (matcher and oracles agree): "after" means
    * later in the TOTAL per-key order (ts, event_id) — a same-ts pair
    * is ordered by event_id — while within() bounds compare ts only.
    */
  private type Ev = (Long, Long, String, Long)

  private def typedEvents(s: org.apache.spark.sql.SparkSession, dir: String) = {
    import s.implicits._
    Tables.t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .as[Ev]
  }

  override def queries: Seq[QueryDef] = Seq(

    // ----- followedBy (relaxed contiguity) + within: view → purchase
    // within 1h, earliest completion per start event -----
    q("q64_cep_followed_by",
      """WITH pairs AS (
        |  SELECT v.event_id AS view_id, p.event_id AS purchase_id,
        |    row_number() OVER (PARTITION BY v.event_id
        |                       ORDER BY p.ts, p.event_id) AS rn
        |  FROM events v JOIN events p ON v.user_id = p.user_id
        |   AND v.event_type = 'view' AND p.event_type = 'purchase'
        |   AND (p.ts > v.ts OR (p.ts = v.ts AND p.event_id > v.event_id))
        |   AND p.ts < v.ts + INTERVAL 1 HOUR)
        |SELECT view_id, purchase_id FROM pairs WHERE rn = 1
        |ORDER BY view_id""") { (s, dir) =>
      import s.implicits._
      val p = CEP.Pattern.begin[Ev]("view").where(_._3 == "view")
        .followedBy("purchase").where(_._3 == "purchase")
        .withinUnits(1.hour.toMicros)
      CEP.pattern(typedEvents(s, dir), p, (e: Ev) => e._1, (e: Ev) => e._4, (e: Ev) => e._2) {
        (_, m) => (m.stages("view").head._2, m.stages("purchase").head._2)
      }.toDF("view_id", "purchase_id")
        .orderBy(col("view_id"))
    },

    // ----- next (strict contiguity): signup immediately followed by
    // click in the user's stream -----
    q("q65_cep_strict_next",
      """WITH seq AS (
        |  SELECT event_id, event_type,
        |    lead(event_type) OVER w AS nt, lead(event_id) OVER w AS nid
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id AS signup_id, nid AS click_id
        |FROM seq WHERE event_type = 'signup' AND nt = 'click'
        |ORDER BY signup_id""") { (s, dir) =>
      import s.implicits._
      val p = CEP.Pattern.begin[Ev]("signup").where(_._3 == "signup")
        .next("click").where(_._3 == "click")
      CEP.pattern(typedEvents(s, dir), p, (e: Ev) => e._1, (e: Ev) => e._4, (e: Ev) => e._2) {
        (_, m) => (m.stages("signup").head._2, m.stages("click").head._2)
      }.toDF("signup_id", "click_id")
        .orderBy(col("signup_id"))
    },

    // ----- times(3) quantifier: three consecutive errors (every start
    // position reported — NO_SKIP) -----
    q("q66_cep_times",
      """WITH seq AS (
        |  SELECT event_id, event_type,
        |    lead(event_type, 1) OVER w AS t1, lead(event_type, 2) OVER w AS t2,
        |    lead(event_id, 1) OVER w AS id1, lead(event_id, 2) OVER w AS id2
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT event_id AS e0, id1 AS e1, id2 AS e2
        |FROM seq WHERE event_type = 'error' AND t1 = 'error' AND t2 = 'error'
        |ORDER BY e0""") { (s, dir) =>
      import s.implicits._
      val p = CEP.Pattern.begin[Ev]("errs").where(_._3 == "error").times(3)
      CEP.pattern(typedEvents(s, dir), p, (e: Ev) => e._1, (e: Ev) => e._4, (e: Ev) => e._2) {
        (_, m) =>
          val ids = m.stages("errs").map(_._2)
          (ids(0), ids(1), ids(2))
      }.toDF("e0", "e1", "e2")
        .orderBy(col("e0"))
    },

    // ----- followedByAny (non-deterministic relaxed contiguity,
    // NFA.java shared-buffer multi-match): EVERY view→purchase pair
    // within the hour, not just the earliest completion -----
    q("q92_cep_followed_by_any",
      """SELECT v.event_id AS view_id, p.event_id AS purchase_id
        |FROM events v JOIN events p ON v.user_id = p.user_id
        | AND v.event_type = 'view' AND p.event_type = 'purchase'
        | AND (p.ts > v.ts OR (p.ts = v.ts AND p.event_id > v.event_id))
        | AND p.ts < v.ts + INTERVAL 1 HOUR
        |ORDER BY view_id, purchase_id""") { (s, dir) =>
      import s.implicits._
      val p = CEP.Pattern.begin[Ev]("view").where(_._3 == "view")
        .followedByAny("purchase").where(_._3 == "purchase")
        .withinUnits(1.hour.toMicros)
      CEP.pattern(typedEvents(s, dir), p, (e: Ev) => e._1, (e: Ev) => e._4, (e: Ev) => e._2) {
        (_, m) => (m.stages("view").head._2, m.stages("purchase").head._2)
      }.toDF("view_id", "purchase_id")
        .orderBy(col("view_id"), col("purchase_id"))
    },

    // ----- followedByAny + SKIP_PAST_LAST (reference prune-after-emit,
    // AfterMatchSkipStrategy.prune over the shared buffer): the first-
    // emitted branch from each start prunes its sibling branches and
    // every candidate starting at or before its last event — the
    // result is the per-user CHAIN of non-overlapping (view, earliest
    // purchase within the hour) links, which the oracle computes with
    // a recursive CTE. Contrast q92: the same pattern under NO_SKIP
    // emits every overlapping pair. -----
    q("q147_cep_any_skip_prune",
      """WITH RECURSIVE seq AS (
        |  SELECT user_id, event_id, event_type, ts,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |pairs AS (
        |  SELECT v.user_id, v.rn AS vrn, v.event_id AS view_id, min(p.rn) AS prn
        |  FROM seq v JOIN seq p ON p.user_id = v.user_id AND p.rn > v.rn
        |    AND p.event_type = 'purchase' AND p.ts < v.ts + INTERVAL 1 HOUR
        |  WHERE v.event_type = 'view'
        |  GROUP BY v.user_id, v.rn, v.event_id),
        |chain AS (
        |  (SELECT user_id, vrn, view_id, prn FROM
        |    (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY vrn) AS r
        |     FROM pairs) WHERE r = 1)
        |  UNION ALL
        |  SELECT l.user_id, l.vrn, l.view_id, l.prn
        |  FROM chain c, LATERAL (
        |    SELECT * FROM pairs p
        |    WHERE p.user_id = c.user_id AND p.vrn > c.prn
        |    ORDER BY p.vrn LIMIT 1) l)
        |SELECT c.user_id, c.view_id, s.event_id AS purchase_id
        |FROM chain c JOIN seq s ON s.user_id = c.user_id AND s.rn = c.prn
        |ORDER BY c.user_id, c.view_id""") { (s, dir) =>
      import s.implicits._
      val p = CEP.Pattern.begin[Ev]("view").where(_._3 == "view")
        .followedByAny("purchase").where(_._3 == "purchase")
        .withinUnits(1.hour.toMicros)
        .afterMatchSkipPastLast
      CEP.pattern(typedEvents(s, dir), p, (e: Ev) => e._1, (e: Ev) => e._4, (e: Ev) => e._2) {
        (uid, m) => (uid, m.stages("view").head._2, m.stages("purchase").head._2)
      }.toDF("user_id", "view_id", "purchase_id")
        .orderBy(col("user_id"), col("view_id"))
    },

    // ----- times(2).allowCombinations (Quantifier.java combinations):
    // the quantified block is ANY in-order subsequence, so every
    // ordered pair of errors within the window matches — the oracle is
    // the equivalent self-join -----
    q("q95_cep_times_combinations",
      """SELECT a.event_id AS e0, b.event_id AS e1
        |FROM events a JOIN events b ON a.user_id = b.user_id
        | AND a.event_type = 'error' AND b.event_type = 'error'
        | AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))
        | AND b.ts < a.ts + INTERVAL 30 MINUTE
        |ORDER BY e0, e1""") { (s, dir) =>
      import s.implicits._
      val p = CEP.Pattern.begin[Ev]("errs").where(_._3 == "error")
        .times(2).allowCombinations
        .withinUnits(30.minutes.toMicros)
      CEP.pattern(typedEvents(s, dir), p, (e: Ev) => e._1, (e: Ev) => e._4, (e: Ev) => e._2) {
        (_, m) =>
          val ids = m.stages("errs").map(_._2)
          (ids(0), ids(1))
      }.toDF("e0", "e1")
        .orderBy(col("e0"), col("e1"))
    },

    // ----- notFollowedBy (NFACompiler NOT state): view reaching its
    // first purchase within the hour with NO error in between. Oracle:
    // earliest qualifying purchase per view + NOT EXISTS on the gap
    // (strictly between in the total (ts, event_id) order). -----
    q("q100_cep_not_followed_by",
      """WITH pairs AS (
        |  SELECT v.event_id AS view_id, v.user_id, v.ts AS v_ts,
        |    p.event_id AS purchase_id, p.ts AS p_ts,
        |    row_number() OVER (PARTITION BY v.event_id
        |                       ORDER BY p.ts, p.event_id) AS rn
        |  FROM events v JOIN events p ON v.user_id = p.user_id
        |   AND v.event_type = 'view' AND p.event_type = 'purchase'
        |   AND (p.ts > v.ts OR (p.ts = v.ts AND p.event_id > v.event_id))
        |   AND p.ts < v.ts + INTERVAL 1 HOUR),
        |f AS (SELECT * FROM pairs WHERE rn = 1)
        |SELECT view_id, purchase_id FROM f
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM events e
        |  WHERE e.user_id = f.user_id AND e.event_type = 'error'
        |    AND (e.ts > f.v_ts OR (e.ts = f.v_ts AND e.event_id > f.view_id))
        |    AND (e.ts < f.p_ts OR (e.ts = f.p_ts AND e.event_id < f.purchase_id)))
        |ORDER BY view_id""") { (s, dir) =>
      import s.implicits._
      val p = CEP.Pattern.begin[Ev]("view").where(_._3 == "view")
        .notFollowedBy("err").where(_._3 == "error")
        .followedBy("purchase").where(_._3 == "purchase")
        .withinUnits(1.hour.toMicros)
      CEP.pattern(typedEvents(s, dir), p, (e: Ev) => e._1, (e: Ev) => e._4, (e: Ev) => e._2) {
        (_, m) => (m.stages("view").head._2, m.stages("purchase").head._2)
      }.toDF("view_id", "purchase_id")
        .orderBy(col("view_id"))
    },

    // ----- MATCH_RECOGNIZE aggregate measures over a quantified
    // symbol (DataStreamMatch.scala MEASURES with FINAL aggregates):
    // maximal runs of high-value events per user — the matcher's
    // greedy UP+ with SKIP PAST LAST ROW is exactly the relational
    // gaps-and-islands the oracle computes. Sums ride as exact cents
    // (BIGINT) so no float-order boundary can flip a value. -----
    q("q132_match_recognize_agg",
      """WITH seq AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    CASE WHEN value > 250 THEN 1 ELSE 0 END AS ok
        |  FROM events),
        |isl AS (SELECT user_id, event_id, value, rn,
        |    rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |  FROM seq WHERE ok = 1)
        |SELECT user_id, count(*) AS len,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
        |  arg_min(event_id, rn) AS first_id, arg_max(event_id, rn) AS last_id
        |FROM isl GROUP BY user_id, grp
        |ORDER BY user_id, first_id""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
        .withColumn("value_cents", round(col("value") * lit(100)).cast("long"))
      MatchRecognize(ev,
        """PARTITION BY user_id
          |ORDER BY ts, event_id
          |MEASURES COUNT(UP.*) AS len, SUM(UP.value_cents) AS total_cents,
          |         FIRST(UP.event_id) AS first_id, LAST(UP.event_id) AS last_id
          |PATTERN (UP+)
          |DEFINE UP AS UP.value > 250""".stripMargin)
        .orderBy(col("user_id"), col("first_id"))
    },

    // ----- ALL ROWS PER MATCH + CLASSIFIER()/MATCH_NUMBER(): every
    // row of every match, tagged with its symbol and per-partition
    // match ordinal — the reference's allRows output mode
    // (DataStreamMatch.scala translateToPlan ALL ROWS branch) -----
    q("q134_match_recognize_all_rows",
      """WITH seq AS (SELECT user_id, ts, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    CASE WHEN value > 250 THEN 1 ELSE 0 END AS ok FROM events),
        |isl AS (SELECT user_id, event_id, rn,
        |    rn - row_number() OVER (PARTITION BY user_id ORDER BY rn) AS grp
        |  FROM seq WHERE ok = 1)
        |SELECT user_id, event_id, 'UP' AS classifier,
        |  CAST(dense_rank() OVER (PARTITION BY user_id ORDER BY grp) AS BIGINT) AS match_num
        |FROM isl ORDER BY user_id, event_id""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      MatchRecognize(ev,
        """PARTITION BY user_id
          |ORDER BY ts, event_id
          |ALL ROWS PER MATCH
          |PATTERN (UP+)
          |DEFINE UP AS UP.value > 250""".stripMargin)
        .select(col("user_id"), col("event_id"), col("classifier"), col("match_num"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // ----- AFTER MATCH SKIP TO LAST <symbol> (reference flink-cep
    // nfa/aftermatch/SkipToLastStrategy.java): view→click+→view
    // chains where each match's closing view REOPENS the next match —
    // PAST LAST ROW would emit only every other link of a chain; the
    // skip-to fence resumes AT the closing view, so every link emits.
    // Relationally: every (view a, view b) pair whose gap is a
    // non-empty pure click run. -----
    q("q140_match_skip_to_last",
      """WITH seq AS (SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events)
        |SELECT a.user_id, a.event_id AS start_id, b.event_id AS end_id
        |FROM seq a JOIN seq b ON a.user_id = b.user_id AND b.rn > a.rn + 1
        |WHERE a.event_type = 'view' AND b.event_type = 'view'
        |  AND NOT EXISTS (SELECT 1 FROM seq m
        |    WHERE m.user_id = a.user_id AND m.rn > a.rn AND m.rn < b.rn
        |      AND m.event_type <> 'click')
        |ORDER BY a.user_id, start_id""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      MatchRecognize(ev,
        """PARTITION BY user_id
          |ORDER BY ts, event_id
          |MEASURES V.event_id AS start_id, W.event_id AS end_id
          |AFTER MATCH SKIP TO LAST W
          |PATTERN (V C+ W)
          |DEFINE V AS V.event_type = 'view', C AS C.event_type = 'click',
          |       W AS W.event_type = 'view'""".stripMargin)
        .orderBy(col("user_id"), col("start_id"))
    },

    // ----- reluctant SQL quantifier (reference Quantifier.java greedy
    // flag, surfaced as B{1,3}? in MATCH_RECOGNIZE): the block takes
    // the SHORTEST length that completes the match, so each view pairs
    // with its EARLIEST purchase 2–4 rows later — the greedy form
    // would consume 3 rows unconditionally and demand the purchase at
    // exactly the 4th. -----
    q("q141_match_reluctant",
      """WITH seq AS (SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |m AS (SELECT v.user_id, v.event_id AS view_id, v.rn AS vrn, min(p.rn) AS prn
        |      FROM seq v JOIN seq p ON p.user_id = v.user_id
        |        AND p.rn BETWEEN v.rn + 2 AND v.rn + 4
        |      WHERE v.event_type = 'view' AND p.event_type = 'purchase'
        |      GROUP BY v.user_id, v.event_id, v.rn)
        |SELECT m.user_id, m.view_id, s.event_id AS purchase_id,
        |  CAST(m.prn - m.vrn - 1 AS BIGINT) AS gap_len
        |FROM m JOIN seq s ON s.user_id = m.user_id AND s.rn = m.prn
        |ORDER BY m.user_id, m.view_id""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      MatchRecognize(ev,
        """PARTITION BY user_id
          |ORDER BY ts, event_id
          |MEASURES V.event_id AS view_id, P.event_id AS purchase_id,
          |         COUNT(B.*) AS gap_len
          |AFTER MATCH SKIP TO NEXT ROW
          |PATTERN (V B{1,3}? P)
          |DEFINE V AS V.event_type = 'view', P AS P.event_type = 'purchase'"""
          .stripMargin)
        .orderBy(col("user_id"), col("view_id"))
    },

    // ----- WITHIN in the SQL form (Pattern.within surfaced through
    // MATCH_RECOGNIZE): adjacent view→purchase pairs only count when
    // the purchase lands inside one hour of the view — the span bound
    // evaluated against real event times from the ORDER BY column. -----
    q("q142_match_within",
      """WITH seq AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lead(event_type) OVER w AS nt, lead(event_id) OVER w AS nid,
        |    lead(ts) OVER w AS nts
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS view_id, nid AS purchase_id
        |FROM seq WHERE event_type = 'view' AND nt = 'purchase'
        |  AND nts < ts + INTERVAL 1 HOUR
        |ORDER BY view_id""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      MatchRecognize(ev,
        """PARTITION BY user_id
          |ORDER BY ts, event_id
          |MEASURES A.event_id AS view_id, B.event_id AS purchase_id
          |PATTERN (A B)
          |WITHIN INTERVAL '1' HOUR
          |DEFINE A AS A.event_type = 'view', B AS B.event_type = 'purchase'"""
          .stripMargin)
        .orderBy(col("view_id"))
    },

    // ----- SQL grouped quantifier (standard MATCH_RECOGNIZE pattern
    // grouping; executes on the matcher's GroupPattern stages): TWO
    // back-to-back view→click pairs. Consecutive-rows semantics +
    // SKIP PAST LAST = per maximal chain of adjacent (view,click)
    // pairs, matches pair up the chain's pairs two at a time —
    // exactly the islands-and-offsets relation the oracle computes. -----
    q("q144_match_grouped",
      """WITH seq AS (SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nt,
        |    lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nid
        |  FROM events),
        |p AS (SELECT user_id, rn, event_id AS v_id, nid AS c_id,
        |        row_number() OVER (PARTITION BY user_id ORDER BY rn) AS pi
        |      FROM seq WHERE event_type = 'view' AND nt = 'click'),
        |isl AS (SELECT *, rn - 2 * pi AS grp FROM p),
        |ord AS (SELECT *, row_number() OVER (PARTITION BY user_id, grp
        |          ORDER BY rn) - 1 AS off FROM isl)
        |SELECT a.user_id, a.v_id AS first_view, b.c_id AS last_click
        |FROM ord a JOIN ord b ON a.user_id = b.user_id AND a.grp = b.grp
        |  AND b.off = a.off + 1
        |WHERE a.off % 2 = 0
        |ORDER BY a.user_id, first_view""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
      MatchRecognize(ev,
        """PARTITION BY user_id
          |ORDER BY ts, event_id
          |MEASURES FIRST(V.event_id) AS first_view, LAST(C.event_id) AS last_click
          |PATTERN ( (V C){2} )
          |DEFINE V AS V.event_type = 'view', C AS C.event_type = 'click'"""
          .stripMargin)
        .orderBy(col("user_id"), col("first_view"))
    },

    // ----- ALL ROWS PER MATCH over a GROUPED pattern: every row of
    // every (V C){2} match, tagged with its symbol and per-partition
    // match ordinal, emitted in temporal order (group repeats
    // interleave V and C, so stage order alone would reorder). -----
    q("q145_match_grouped_all_rows",
      """WITH seq AS (SELECT user_id, event_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nt,
        |    lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nid
        |  FROM events),
        |p AS (SELECT user_id, rn, event_id AS v_id, nid AS c_id,
        |        row_number() OVER (PARTITION BY user_id ORDER BY rn) AS pi
        |      FROM seq WHERE event_type = 'view' AND nt = 'click'),
        |isl AS (SELECT *, rn - 2 * pi AS grp FROM p),
        |ord AS (SELECT *, row_number() OVER (PARTITION BY user_id, grp
        |          ORDER BY rn) - 1 AS off FROM isl),
        |m AS (SELECT a.user_id, a.v_id AS v1, a.c_id AS c1,
        |        b.v_id AS v2, b.c_id AS c2,
        |        row_number() OVER (PARTITION BY a.user_id ORDER BY a.rn) AS mn
        |      FROM ord a JOIN ord b ON a.user_id = b.user_id AND a.grp = b.grp
        |        AND b.off = a.off + 1
        |      WHERE a.off % 2 = 0)
        |SELECT user_id, event_id, classifier, CAST(mn AS BIGINT) AS match_num
        |FROM (
        |  SELECT user_id, v1 AS event_id, 'V' AS classifier, mn FROM m
        |  UNION ALL SELECT user_id, c1, 'C', mn FROM m
        |  UNION ALL SELECT user_id, v2, 'V', mn FROM m
        |  UNION ALL SELECT user_id, c2, 'C', mn FROM m)
        |ORDER BY user_id, event_id""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      MatchRecognize(ev,
        """PARTITION BY user_id
          |ORDER BY ts, event_id
          |ALL ROWS PER MATCH
          |PATTERN ( (V C){2} )
          |DEFINE V AS V.event_type = 'view', C AS C.event_type = 'click'"""
          .stripMargin)
        .select(col("user_id"), col("event_id"), col("classifier"), col("match_num"))
        .orderBy(col("user_id"), col("event_id"))
    },

    // ----- SQL MATCH_RECOGNIZE surface (DataStreamMatch.scala:65):
    // restricted clause parsed and compiled onto the same matcher -----
    q("q87_match_recognize",
      """WITH seq AS (
        |  SELECT user_id, event_id, value, event_type,
        |    lead(event_type) OVER w AS nt, lead(event_id) OVER w AS nid,
        |    lead(value) OVER w AS nv
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |SELECT user_id, event_id AS view_id, nid AS purchase_id,
        |  round(nv, 6) AS purchase_value
        |FROM seq WHERE event_type = 'view' AND nt = 'purchase'
        |ORDER BY view_id""") { (s, dir) =>
      val ev = Tables.t(s, dir, "events")
        .withColumn("value", round(col("value"), 6))
      MatchRecognize(ev,
        """PARTITION BY user_id
          |ORDER BY ts, event_id
          |MEASURES A.event_id AS view_id, B.event_id AS purchase_id,
          |         B.value AS purchase_value
          |PATTERN (A B)
          |DEFINE A AS A.event_type = 'view', B AS B.event_type = 'purchase'"""
          .stripMargin)
        .orderBy(col("view_id"))
    }
  )
}
