package graft.cep

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import scala.concurrent.duration.Duration

/** Complex event processing — the reference's flink-cep surface
  * (Pattern.java:155-479 builder; NFA.java match semantics)
  * re-expressed for Spark: the pattern compiles to a per-key matcher
  * that runs inside flatMapGroupsWithState (streaming) or mapGroups
  * (batch), i.e. keyed state is the execution substrate, exactly as
  * the reference runs its NFA inside a keyed operator.
  *
  * Supported v1 semantics (documented subset):
  *  - stage contiguity: strict (`next`) / relaxed (`followedBy`);
  *  - quantifiers: `times(n)` (contiguous block), `optional`,
  *    `oneOrMore` (greedy contiguous block);
  *  - `within(d)`: first→last event-time span per match must be
  *    STRICTLY less than d (the reference NFA prunes at
  *    timestamp - startTimestamp >= windowTime, NFA.java:277);
  *  - after-match skip: NO_SKIP (a match may start at every event) or
  *    SKIP_PAST_LAST_EVENT;
  *  - match selection per start event: earliest completion for
  *    deterministic patterns; `followedByAny` (branch on every
  *    qualifying continuation) and `allowCombinations` (every
  *    in-order subsequence fills a quantified block) emit ALL
  *    matches, reproducing the reference's shared-buffer
  *    multi-match semantics (NFA.java, Quantifier.java);
  *  - branching + a skip strategy composes via the reference's
  *    prune-after-emit (AfterMatchSkipStrategy.prune): candidates
  *    emit in (start, completion) order and every emission prunes
  *    later candidates whose START falls at/before the strategy's
  *    pruning event — so an emitted match discards its own
  *    still-pending sibling branches under SKIP_PAST_LAST.
  */
object CEP {

  sealed trait Contiguity
  case object Strict extends Contiguity
  case object Relaxed extends Contiguity
  /** followedByAny: branch to EVERY qualifying continuation (the
    * reference's non-deterministic relaxed contiguity). Only valid
    * for single-element stages (times 1). */
  case object RelaxedAny extends Contiguity

  sealed trait AfterMatchSkip
  case object NoSkip extends AfterMatchSkip
  case object SkipPastLast extends AfterMatchSkip
  /** Resume scanning AT the first row the named variable matched
    * (reference flink-cep nfa/aftermatch/SkipToFirstStrategy.java):
    * overlapping matches are allowed from that row on. Implements the
    * reference's NON-throwing variant (shouldThrowException = false):
    * a match where the variable matched NO rows (optional target)
    * falls back to no-skip for that match, and a target equal to the
    * match's own first row prunes nothing (the scan cannot loop —
    * unlike the reference NFA, the start index always advances).
    * Matches variables by exact stage name or by SQL symbol (stage
    * `sym#i`). */
  final case class SkipToFirst(sym: String) extends AfterMatchSkip
  /** Resume scanning AT the last row the named variable matched
    * (reference SkipToLastStrategy.java). */
  final case class SkipToLast(sym: String) extends AfterMatchSkip

  final case class Stage[T](
      name: String,
      pred: T => Boolean,
      contiguity: Contiguity,
      minTimes: Int,
      maxTimes: Int, // maxTimes == Int.MaxValue for oneOrMore
      // allowCombinations: the quantified block is ANY in-order
      // subsequence of qualifying events (non-deterministic internal
      // contiguity, Quantifier.java combinations()), not the greedy
      // contiguous run
      combinations: Boolean = false,
      // negation (NotCondition / NFACompiler NOT states): Strict =
      // notNext (the event directly after must not match), Relaxed =
      // notFollowedBy (no matching event in the gap before the next
      // stage's first element). Negated stages consume nothing.
      negated: Boolean = false,
      // until (Pattern.java until()): stop consuming the quantified
      // block at the first event satisfying this (event not consumed)
      untilPred: Option[T => Boolean] = None,
      // IterativeCondition (flink-cep conditions/IterativeCondition
      // .java): the predicate also sees the events matched by EARLIER
      // stages (ctx.getEventsForPattern) — e.g. B.price > A.price.
      // The context excludes the current stage's own partial block.
      ctxPred: Option[(T, Map[String, Seq[T]]) => Boolean] = None,
      // reluctant quantifier (reference Quantifier.java greedy flag,
      // inverted): the block takes the SHORTEST length that lets the
      // rest of the pattern complete, trying longer blocks only when
      // shorter ones fail — unlike the greedy default, this
      // backtracks over block sizes.
      reluctant: Boolean = false,
      // group pattern (reference pattern/GroupPattern.java,
      // Pattern.begin(Pattern)): this stage is a quantified
      // SUB-SEQUENCE — minTimes..maxTimes back-to-back repetitions of
      // the inner stages; inner stage names collect their events
      // across repeats. pred/negated/combinations are unused on a
      // group stage.
      group: Option[Vector[Stage[T]]] = None)

  /** Immutable fluent builder — Pattern.begin("a").where(p)
    * .followedBy("b").where(q).within(1.hour) */
  final case class Pattern[T](
      stages: Vector[Stage[T]],
      withinSpan: Option[Long],
      skip: AfterMatchSkip) {

    private def updLast(f: Stage[T] => Stage[T]): Pattern[T] =
      copy(stages = stages.init :+ f(stages.last))

    def where(p: T => Boolean): Pattern[T] =
      updLast(s => s.copy(pred = t => s.pred(t) && p(t)))
    /** Keep only events of runtime class S (Pattern.java subtype) —
      * ANDs with any existing condition, and the select sees T. */
    def subtype[S <: T](implicit ct: scala.reflect.ClassTag[S]): Pattern[T] =
      where(t => ct.runtimeClass.isInstance(t))
    def or(p: T => Boolean): Pattern[T] =
      updLast(s => s.copy(pred = t => s.pred(t) || p(t)))
    /** IterativeCondition: the predicate also receives the events of
      * all EARLIER completed stages by name (B.where((b, ctx) =>
      * b.price > ctx("A").head.price)). ANDs with any plain where. */
    def whereCtx(p: (T, Map[String, Seq[T]]) => Boolean): Pattern[T] =
      updLast { s =>
        require(!s.negated, "whereCtx is not supported on negated stages")
        s.copy(ctxPred = s.ctxPred match {
          case Some(prev) => Some((t, c) => prev(t, c) && p(t, c))
          case None => Some(p)
        })
      }
    def next(name: String): Pattern[T] =
      copy(stages = stages :+ Stage[T](name, _ => true, Strict, 1, 1))
    def followedBy(name: String): Pattern[T] =
      copy(stages = stages :+ Stage[T](name, _ => true, Relaxed, 1, 1))
    /** Append a quantified GROUP (reference Pattern.followedBy(Pattern)
      * / GroupPattern.java): the sub-pattern's stage sequence becomes
      * one quantifiable unit — `.times(n)` / `.oneOrMore` /
      * `.optional` on the result repeat the whole group. */
    def followedBy(sub: Pattern[T]): Pattern[T] =
      copy(stages = stages :+ Stage[T](s"group#${stages.length}", _ => true,
        Relaxed, 1, 1, group = Some(sub.stages)))
    /** Strictly-contiguous group: the first repeat must start at the
      * very next event (Pattern.next(Pattern)). */
    def next(sub: Pattern[T]): Pattern[T] =
      copy(stages = stages :+ Stage[T](s"group#${stages.length}", _ => true,
        Strict, 1, 1, group = Some(sub.stages)))
    def followedByAny(name: String): Pattern[T] =
      copy(stages = stages :+ Stage[T](name, _ => true, RelaxedAny, 1, 1))
    /** The event directly after the previous stage must NOT match
      * (Pattern.java notNext). Consumes nothing. */
    def notNext(name: String): Pattern[T] =
      copy(stages = stages :+ Stage[T](name, _ => true, Strict, 1, 1, negated = true))
    /** No matching event may occur between the previous stage and the
      * following stage's first element (Pattern.java notFollowedBy).
      * May not terminate a pattern. */
    def notFollowedBy(name: String): Pattern[T] =
      copy(stages = stages :+ Stage[T](name, _ => true, Relaxed, 1, 1, negated = true))
    def times(n: Int): Pattern[T] = updLast(_.copy(minTimes = n, maxTimes = n))
    /** Between from and to occurrences (Pattern.java times(from, to)). */
    def times(from: Int, to: Int): Pattern[T] = {
      require(0 <= from && from <= to, s"bad times($from, $to)")
      updLast(_.copy(minTimes = from, maxTimes = to))
    }
    def oneOrMore: Pattern[T] = updLast(_.copy(minTimes = 1, maxTimes = Int.MaxValue))
    /** n or more contiguous occurrences (Pattern.java timesOrMore). */
    def timesOrMore(n: Int): Pattern[T] =
      updLast(_.copy(minTimes = n, maxTimes = Int.MaxValue))
    def optional: Pattern[T] = updLast(_.copy(minTimes = 0))
    /** Quantified block branches over every in-order subsequence of
      * qualifying events instead of the greedy contiguous run. */
    def allowCombinations: Pattern[T] = updLast(_.copy(combinations = true))
    /** Stop consuming the quantified block at the first event matching
      * p — the block ends just before it (Pattern.java until). */
    def until(p: T => Boolean): Pattern[T] =
      updLast(_.copy(untilPred = Some(p)))
    /** Reference consecutive(): strict internal block contiguity —
      * already this matcher's default block semantics. */
    def consecutive: Pattern[T] = this
    /** Reference greedy(): prefer the longest block — already the
      * default (deterministic blocks consume greedily). */
    def greedy: Pattern[T] = updLast(_.copy(reluctant = false))
    /** Prefer the SHORTEST block that lets the rest of the pattern
      * complete (the reference's non-greedy quantifier; SQL `B+?`). */
    def reluctant: Pattern[T] = updLast(_.copy(reluctant = true))
    def within(d: Duration): Pattern[T] = copy(withinSpan = Some(d.toMillis))
    /** within() in raw time-axis units (e.g. micros when tsOf is micros). */
    def withinUnits(span: Long): Pattern[T] = copy(withinSpan = Some(span))
    def afterMatchSkipPastLast: Pattern[T] = copy(skip = SkipPastLast)
  }

  object Pattern {
    def begin[T](name: String): Pattern[T] =
      Pattern(Vector(Stage[T](name, _ => true, Relaxed, 1, 1)), None, NoSkip)
    /** Begin with a quantified group (Pattern.begin(Pattern)). */
    def begin[T](sub: Pattern[T]): Pattern[T] =
      Pattern(Vector(Stage[T]("group#0", _ => true, Relaxed, 1, 1,
        group = Some(sub.stages))), None, NoSkip)
  }

  /** One match: per-stage matched element indices resolved to events. */
  final case class Match[T](stages: Map[String, Seq[T]])

  /** Core matcher over one key's time-ordered events. O(starts × scan)
    * — runs distributed per key; key cardinality is the scale axis. */
  def matchSequence[T](events: IndexedSeq[T], pattern: Pattern[T])(
      tsOf: T => Long): Seq[Match[T]] = {
    require(pattern.stages.forall(st =>
      st.contiguity != RelaxedAny || (st.minTimes == 1 && st.maxTimes == 1)),
      "followedByAny supports single-element stages only")
    require(!pattern.stages.last.negated,
      "a pattern may not end in notNext/notFollowedBy (reference NFACompiler rule)")
    pattern.stages.headOption.foreach(h =>
      require(h.group.isEmpty || h.minTimes >= 1,
        "an optional group may not lead a pattern (start anchoring)"))
    val out = Vector.newBuilder[Match[T]]
    var blockedBelow = -1 // skip fence: no new match may start at or before this idx
    val branchingPat = pattern.stages.exists(st =>
      st.contiguity == RelaxedAny || (st.combinations && st.maxTimes > 1))

    type Acc = List[(String, Seq[Int])]
    type Completions = Iterator[(Acc, Int)]
    /** Continuation receives (pos, firstTs, acc, pending ban). */
    type Cont = (Int, Long, Acc, Option[T => Boolean]) => Completions

    /** All completions of `stages` from (si, pos), feeding each into
      * `cont`: deterministic stages yield at most one continuation;
      * RelaxedAny branches to every qualifying element; reluctant
      * blocks branch over block sizes ascending; GROUP stages repeat
      * their sub-sequence. `ban` is a pending notFollowedBy predicate:
      * no event in the gap [pos, entry-of-this-stage) may satisfy it.
      * `anchor` marks a top-level scan-start expansion: while NOTHING
      * has been consumed yet (firstTs0 < 0 — leading optional stages
      * may consume zero events), relaxed stages may not skip forward,
      * so every match's FIRST consumed event is the scan start and the
      * same match is never re-found from a later start. Accs carry
      * per-stage event INDICES so skip-to strategies can place their
      * resume fence. */
    def expandSeq(stages: Vector[Stage[T]], si: Int, pos: Int, firstTs0: Long,
        acc: Acc, ban: Option[T => Boolean], anchor: Boolean,
        cont: Cont): Completions = {
      if (si == stages.length)
        return cont(pos, firstTs0, acc, ban)
      val st = stages(si)
      val anchored = anchor && firstTs0 < 0
      // IterativeCondition context: earlier completed stages by name
      // (a group's repeated inner names concatenate chronologically)
      lazy val ctx: Map[String, Seq[T]] =
        acc.reverse.groupBy(_._1)
          .map { case (n, es) => n -> es.flatMap(_._2.map(events)) }
      def ok(e: T): Boolean = st.pred(e) && st.ctxPred.forall(_(e, ctx))
      // STRICT bound: the reference NFA prunes at
      // timestamp - startTimestamp >= windowTime (NFA.java:277), so a
      // match spanning exactly the window is rejected
      def inWindow(i: Int, firstTs: Long): Boolean =
        pattern.withinSpan.isEmpty || firstTs < 0 ||
          tsOf(events(i)) - firstTs < pattern.withinSpan.get
      def gapClean(from: Int, until: Int): Boolean =
        ban.forall(b => (from until until).forall(j => !b(events(j))))

      if (st.group.isDefined) {
        val sub = st.group.get
        require(sub.nonEmpty, "empty group pattern")
        require(!sub.last.negated, "a group may not end negated")
        require(sub.forall(x => x.contiguity != RelaxedAny
          && !(x.combinations && x.maxTimes > 1)),
          "branching stages (followedByAny/allowCombinations) inside a " +
            "group are unsupported")
        // one repetition = the sub-sequence run to completion; between
        // repeats the gap rule is the sub head's own contiguity. A
        // Strict group pins the FIRST repeat's head to pos.
        val subHeadStrict = sub.updated(0, sub(0).copy(contiguity = Strict))
        def repeats(k: Int, pos2: Int, fTs: Long, acc2: Acc,
            ban2: Option[T => Boolean]): Completions = {
          lazy val stop =
            if (k >= st.minTimes)
              expandSeq(stages, si + 1, pos2, fTs, acc2, ban2, anchor, cont)
            else Iterator.empty
          lazy val more =
            if (k < st.maxTimes && pos2 < events.length)
              expandSeq(
                if (k == 0 && st.contiguity == Strict) subHeadStrict else sub,
                0, pos2, fTs, acc2, ban2, anchor = anchor,
                (p3, f3, a3, b3) =>
                  // zero-progress prune: an all-optional sub-sequence
                  // consuming nothing must not repeat forever
                  if (p3 == pos2) Iterator.empty
                  else repeats(k + 1, p3, f3, a3, b3))
            else Iterator.empty
          // greedy default: prefer MORE repeats; reluctant inverts
          if (st.reluctant) stop ++ more else more ++ stop
        }
        repeats(0, pos, firstTs0, acc, ban)
      } else if (st.negated) {
        if (st.contiguity == Strict) {
          // notNext: the event directly at pos must not match
          if (pos < events.length && st.pred(events(pos))) Iterator.empty
          else expandSeq(stages, si + 1, pos, firstTs0, acc, ban, anchor, cont)
        } else {
          // notFollowedBy: defer — the next positive stage checks the
          // gap (compose if bans stack back-to-back)
          val b = ban match {
            case Some(prev) => Some((t: T) => prev(t) || st.pred(t))
            case None => Some(st.pred)
          }
          expandSeq(stages, si + 1, pos, firstTs0, acc, b, anchor, cont)
        }
      } else st.contiguity match {
        case RelaxedAny =>
          // branch on every qualifying element at or after pos (pinned
          // to pos itself while the scan start is still unconsumed)
          Iterator.range(pos, if (anchored) math.min(pos + 1, events.length)
            else events.length)
            .filter(i => ok(events(i)) && inWindow(i, firstTs0)
              && gapClean(pos, i))
            .flatMap { i =>
              val fTs = if (firstTs0 < 0) tsOf(events(i)) else firstTs0
              expandSeq(stages, si + 1, i + 1, fTs,
                (st.name -> Seq(i)) :: acc, None, anchor, cont)
            }
        case _ if st.combinations && st.maxTimes > 1 =>
          // entry element per the stage's contiguity, then every
          // in-order subsequence of qualifying events fills the block
          var entry = pos
          if (st.contiguity == Relaxed && !anchored)
            while (entry < events.length && !ok(events(entry))) entry += 1
          if (entry >= events.length || !ok(events(entry)) ||
              !inWindow(entry, firstTs0) || !gapClean(pos, entry)) Iterator.empty
          else {
            val fTs = if (firstTs0 < 0) tsOf(events(entry)) else firstTs0
            // until: the block may not reach past the first stop event
            val stopIdx = st.untilPred match {
              case Some(u) => Iterator.range(entry, events.length)
                .find(j => u(events(j))).getOrElse(events.length)
              case None => events.length
            }
            def pick(from: Int, taken: Vector[Int]): Completions = {
              val stop =
                if (taken.size >= st.minTimes)
                  expandSeq(stages, si + 1, from, fTs,
                    (st.name -> taken) :: acc, None, anchor, cont)
                else Iterator.empty
              val grow =
                if (taken.size < st.maxTimes)
                  Iterator.range(from, stopIdx)
                    .filter(j => ok(events(j)) && inWindow(j, fTs))
                    .flatMap(j => pick(j + 1, taken :+ j))
                else Iterator.empty
              stop ++ grow
            }
            pick(entry + 1, Vector(entry))
          }
        case _ =>
          var i = pos
          if (st.contiguity == Relaxed && !anchored)
            while (i < events.length && !ok(events(i))) i += 1
          if (st.maxTimes > st.minTimes && (st.reluctant || !branchingPat)) {
            // variable-size block: measure the maximal qualifying
            // contiguous run once, then BRANCH over block sizes —
            // DESCENDING for the greedy default (prefer the longest
            // block, but backtrack when greed starves the tail — the
            // group stages' repeat behavior, and the reference finds
            // these matches too), ASCENDING for reluctant (shortest
            // completing block wins). k == 0 consumes nothing: the
            // stage is skipped from the ORIGINAL pos with the ban
            // carried forward — a relaxed optional stage with no
            // qualifying event ahead no longer swallows the scan to
            // the end of the buffer. Earliest-completion selection
            // evaluates the sizes lazily, so completing starts pay
            // for one size only. (Branching patterns keep the single
            // greedy continuation for non-reluctant stages so their
            // every-match set is not multiplied by block sizes.)
            var runLen = 0
            while (i + runLen < events.length && runLen < st.maxTimes
                && ok(events(i + runLen))
                && inWindow(i + runLen,
                  if (firstTs0 < 0) { if (runLen == 0) -1L else tsOf(events(i)) }
                  else firstTs0)
                && !st.untilPred.exists(_(events(i + runLen)))) runLen += 1
            if (runLen < st.minTimes) Iterator.empty
            else {
              val sizes =
                if (st.reluctant) Iterator.range(st.minTimes, runLen + 1)
                else Iterator.range(runLen, st.minTimes - 1, -1)
              sizes.flatMap { k =>
                if (k == 0) // nothing consumed: stage skipped entirely
                  expandSeq(stages, si + 1, pos, firstTs0, acc, ban, anchor, cont)
                else if (!gapClean(pos, i)) Iterator.empty
                else {
                  val fTs = if (firstTs0 < 0) tsOf(events(i)) else firstTs0
                  expandSeq(stages, si + 1, i + k, fTs,
                    (st.name -> (i until i + k)) :: acc, None, anchor, cont)
                }
              }
            }
          } else if (!gapClean(pos, math.min(i, events.length))) Iterator.empty
          else {
            var taken = 0
            var firstTs = firstTs0
            val buf = Vector.newBuilder[Int]
            while (i < events.length && taken < st.maxTimes && ok(events(i))
                && inWindow(i, firstTs)
                && !st.untilPred.exists(_(events(i)))) {
              if (firstTs < 0) firstTs = tsOf(events(i))
              buf += i
              i += 1
              taken += 1
            }
            if (taken < st.minTimes) Iterator.empty
            else {
              val acc2 = if (taken > 0) (st.name -> buf.result()) :: acc else acc
              expandSeq(stages, si + 1, i, firstTs, acc2, None, anchor, cont)
            }
          }
      }
    }

    // start pre-filter: the predicates of every stage a match could
    // consume its FIRST event from — the head stage plus, while stages
    // are skippable (minTimes == 0, or negated: consumes nothing), each
    // following stage up to and including the first unskippable one.
    // Group heads recurse into their sub-sequence the same way. An
    // optional leading symbol — PATTERN ((A? B){2}) — legally starts a
    // match on its second symbol; anchoring on the head pred alone
    // silently missed those.
    def firstPreds(stages: Vector[Stage[T]]): List[T => Boolean] = {
      var collected = List.empty[T => Boolean]
      var i = 0
      var open = true
      while (open && i < stages.length) {
        val st = stages(i)
        if (!st.negated) st.group match {
          case Some(sub) =>
            collected = collected ::: firstPreds(sub)
            // a group consumes nothing only by taking zero repeats
            // (a zero-consuming repeat is zero-progress-pruned)
            open = st.minTimes == 0
          case None =>
            collected = collected :::
              List((t: T) => st.pred(t) && st.ctxPred.forall(_(t, Map.empty)))
            open = st.minTimes == 0
        }
        i += 1
      }
      collected
    }
    val headCandidates = firstPreds(pattern.stages)
    val headPred: T => Boolean = t => headCandidates.exists(_(t))
    var s = 0
    while (s < events.length) {
      if (s > blockedBelow && headPred(events(s))) {
        val completions = expandSeq(pattern.stages, 0, s, -1L, Nil, None,
          anchor = true, (pos, _, acc, _) => Iterator((acc, pos - 1)))
        val selected =
          if (branchingPat && pattern.skip != NoSkip)
            // reference prune-after-emit (AfterMatchSkipStrategy.prune,
            // NFA.processMatchesAccordingToSkipStrategy): same-start
            // candidates emit in COMPLETION order — the earliest-
            // completing branch reaches the completed-matches queue
            // first — and each emission prunes its later siblings
            // through the fence re-check below
            completions.toSeq.sortBy(_._2)
          else if (branchingPat) completions.toSeq // all non-deterministic matches
          else completions.take(1).toSeq        // earliest completion
        // re-check the fence per candidate: an emitted same-start
        // sibling prunes the rest (reference shouldPrune on the
        // candidate's START event — all candidates here start at s)
        selected.foreach { case (accList, lastIdx) => if (s > blockedBelow) {
          // a group's repeated inner stage names concatenate their
          // events chronologically (unique names are unaffected)
          out += Match(accList.reverse.groupBy(_._1)
            .map { case (n, es) => n -> es.flatMap(_._2.map(events)) })
          // skip strategies place the resume fence; max, not
          // assignment: even though completions from one start arrive
          // in order, the fence must never move backward
          def varIdxs(v: String): Seq[Int] = accList.collect {
            case (n, is) if n == v || n.takeWhile(_ != '#') == v => is
          }.flatten
          pattern.skip match {
            case SkipPastLast =>
              blockedBelow = math.max(blockedBelow, lastIdx)
            // skip-to implements the reference's NON-throwing variant
            // (SkipToElementStrategy with shouldThrowException =
            // false): an empty target (the variable matched no rows —
            // an optional symbol) falls back to no-skip for that
            // match, and a pruning event equal to the match's own
            // first row prunes nothing (strict start < pruningId).
            // Unlike the reference NFA, the scan index always
            // advances, so the self-target case cannot loop.
            case SkipToFirst(v) =>
              val is = varIdxs(v)
              if (is.nonEmpty)
                blockedBelow = math.max(blockedBelow, is.min - 1)
            case SkipToLast(v) =>
              val is = varIdxs(v)
              if (is.nonEmpty)
                blockedBelow = math.max(blockedBelow, is.max - 1)
            case NoSkip => ()
          }
        }}
      }
      s += 1
    }
    out.result()
  }

  private def liftStage[T](s: Stage[T]): Stage[(T, Long)] =
    Stage(s.name, e => s.pred(e._1), s.contiguity, s.minTimes, s.maxTimes,
      s.combinations, s.negated,
      s.untilPred.map(u => (e: (T, Long)) => u(e._1)),
      s.ctxPred.map(c => (e: (T, Long), m: Map[String, Seq[(T, Long)]]) =>
        c(e._1, m.map { case (k, v) => k -> v.map(_._1) })),
      s.reluctant, s.group.map(_.map(liftStage)))

  /** [[matchSequence]] over one key's already time-ordered row
    * iterator with memory BOUNDED by the within() span — the streaming
    * path's sealing discipline applied to a batch scan. Rows buffer
    * only while a match starting at them could still grow (a start
    * seals once the scan reaches start.ts + span: every possible
    * member has arrived); the matcher runs on the live buffer each
    * time it spans 2× the window, emits the sealed-start matches, and
    * evicts sealed rows. The after-match skip fence carries across
    * chunk boundaries as a (ts, arrival-index) threshold exactly like
    * the streaming state fence — only EMITTED (sealed) matches advance
    * it, and unsealed matches recompute on the next chunk, so the
    * output equals the unbounded scan's. Without within() this
    * degrades to the unbounded scan (nothing ever seals mid-stream).
    * A key whose rows all fall inside one span window still buffers
    * them all — that bound is semantic, not an implementation limit.
    */
  def matchSequenceBounded[T](rows: Iterator[T], pattern: Pattern[T])(
      tsOf: T => Long): Iterator[Match[T]] = pattern.withinSpan match {
    case None => matchSequence(rows.toIndexedSeq, pattern)(tsOf).iterator
    case Some(win) => new scala.collection.AbstractIterator[Match[T]] {
      // events carry their per-key arrival index: the unique, order-
      // consistent tie the fence threshold needs at equal timestamps
      private val lifted = pattern.copy[(T, Long)](
        stages = pattern.stages.map(liftStage))
      private def ts(e: (T, Long)): Long = tsOf(e._1)
      private val in = rows.zipWithIndex.map { case (e, i) => (e, i.toLong) }
      private val buf = scala.collection.mutable.ArrayBuffer.empty[(T, Long)]
      private var fenceTs = Long.MinValue
      private var fenceIdx = Long.MinValue
      private val usesFence = pattern.skip != NoSkip
      private var pending: Iterator[Match[T]] = Iterator.empty
      private var exhausted = false

      private def pastFence(e: (T, Long)): Boolean =
        ts(e) > fenceTs || (ts(e) == fenceTs && e._2 > fenceIdx)

      /** Match the buffer, keep sealed-start matches, advance the
        * fence from them, evict sealed rows (mirrors one streaming
        * trigger with watermark == maxSeen). */
      private def drain(maxSeen: Long): Iterator[Match[T]] = {
        def isSealed(e: (T, Long)): Boolean =
          maxSeen == Long.MaxValue || ts(e) + win <= maxSeen
        val out = matchSequence(buf.toIndexedSeq, lifted)(ts)
          .filter(m => isSealed(m.stages.values.flatten.minBy(_._2)))
        def advance(t: Long, i: Long): Unit =
          if (t > fenceTs || (t == fenceTs && i > fenceIdx)) {
            fenceTs = t; fenceIdx = i
          }
        def skipTo(v: String, takeFirst: Boolean): Unit = out.foreach { m =>
          val rs = m.stages.collect {
            case (n, es) if n == v || n.takeWhile(_ != '#') == v => es
          }.flatten
          if (rs.nonEmpty) { // empty target: no-skip for that match
            val r = if (takeFirst) rs.minBy(_._2) else rs.maxBy(_._2)
            advance(ts(r), r._2 - 1) // strictly below: resume row stays
          }
        }
        pattern.skip match {
          case SkipPastLast => out.foreach { m =>
            val last = m.stages.values.flatten.maxBy(_._2)
            advance(ts(last), last._2)
          }
          case SkipToFirst(v) => skipTo(v, takeFirst = true)
          case SkipToLast(v) => skipTo(v, takeFirst = false)
          case NoSkip => ()
        }
        buf.filterInPlace(e => !isSealed(e) && (!usesFence || pastFence(e)))
        out.iterator.map(m =>
          Match(m.stages.map { case (n, es) => n -> es.map(_._1) }))
      }

      override def hasNext: Boolean = {
        while (!pending.hasNext && !exhausted) {
          if (in.hasNext) {
            val e = in.next()
            // 2× window: each drain seals (and evicts) at least one
            // span's worth, so a row is re-scanned O(1) times
            if (buf.nonEmpty && win < Long.MaxValue / 2 &&
                ts(e) - ts(buf.head) >= 2 * win)
              pending = drain(ts(e))
            if (!usesFence || pastFence(e)) buf += e
          } else {
            exhausted = true
            pending = drain(Long.MaxValue)
          }
        }
        pending.hasNext
      }
      override def next(): Match[T] =
        if (hasNext) pending.next() else Iterator.empty.next()
    }
  }

  /** Batch PatternStream: key + event-time sort + match per key. */
  def pattern[T, K: Encoder, R: Encoder](events: Dataset[T], p: Pattern[T],
      keyFn: T => K, tsOf: T => Long, tieBreak: T => Long)(
      select: (K, Match[T]) => R): Dataset[R] = {
    implicit val te: Encoder[T] = events.encoder
    events.groupByKey(keyFn).flatMapGroups { (k, it) =>
      val sorted = it.toIndexedSeq.sortBy(e => (tsOf(e), tieBreak(e)))
      matchSequence(sorted, p)(tsOf).iterator.map(m => select(k, m))
    }
  }

  /** Streaming PatternStream: the per-key buffer lives in GroupState;
    * a match is emitted exactly once its START event is sealed — the
    * watermark has passed start.ts + within, so every event that could
    * participate in that match has arrived. Events older than
    * watermark - within can no longer start or join any future match
    * and are evicted (state is watermark-bounded). An event-time
    * timeout re-fires idle keys when their next start seals.
    *
    * SKIP_PAST_LAST progress is part of the keyed state (reference:
    * the NFA's computation-state prune on AfterMatchSkipStrategy,
    * flink-cep/.../nfa/NFA.java): the (ts, tie) of the last EMITTED
    * match's final event is persisted as a fence, and every event at
    * or before the fence — buffered or newly arriving — is discarded,
    * so a start inside an already-emitted match can never fire in a
    * later micro-batch. Only emitted (sealed) matches advance the
    * fence: an unsealed match's shape may still change, so it must
    * not block anything across triggers.
    *
    * `tsMillis` MUST be epoch millis (it is compared to the
    * watermark), and the pattern MUST have within() — an unbounded
    * pattern would need unbounded state and can never seal.
    */
  def patternStream[T, K: Encoder, R: Encoder](events: Dataset[T], p: Pattern[T],
      keyFn: T => K, tsMillis: T => Long, tieBreak: T => Long)(
      select: (K, Match[T]) => R)(
      implicit bufEnc: Encoder[Seq[T]]): Dataset[R] =
    patternStreamImpl(events, p, keyFn, tsMillis, tieBreak, select, None)

  /** The longest partial match of a PROPER prefix of `p`'s stages,
    * anchored at `tail.head` (trailing negated stages are dropped from
    * each candidate prefix — a pattern may not end negated). Falls
    * back to the bare start event when even the first stage's
    * quantifier cannot complete. Used for timed-out partial matches
    * (reference: TimedOutPartialMatchHandler, flink-cep
    * PatternProcessFunction). */
  def longestPartial[T](tail: IndexedSeq[T], p: Pattern[T])(
      tsOf: T => Long): Match[T] = {
    val head = tail.head
    Iterator.range(p.stages.length - 1, 0, -1)
      .flatMap { k =>
        val trimmed = p.stages.take(k).reverse.dropWhile(_.negated).reverse
        if (trimmed.isEmpty) None
        else matchSequence(tail, p.copy(stages = trimmed, skip = NoSkip))(tsOf)
          // .get: a completion may omit a stage key entirely when an
          // optional stage matched zero events
          .find(_.stages.get(trimmed.head.name).exists(_.headOption.contains(head)))
      }
      .nextOption()
      .getOrElse(Match(Map(p.stages.head.name -> Seq(head))))
  }

  /** patternStream with the reference's timed-out side output
    * (PatternStream.flatSelect timeout variant, PatternStream.java:
    * 243): when a start event's window seals WITHOUT a completed
    * match, `timeoutSelect` receives the longest partial match
    * anchored at it. Under SKIP_PAST_LAST, starts consumed by an
    * emitted match are skipped, not timed out. */
  def patternStreamWithTimeouts[T, K: Encoder, R: Encoder](
      events: Dataset[T], p: Pattern[T],
      keyFn: T => K, tsMillis: T => Long, tieBreak: T => Long)(
      select: (K, Match[T]) => R)(timeoutSelect: (K, Match[T]) => R)(
      implicit bufEnc: Encoder[Seq[T]]): Dataset[R] =
    patternStreamImpl(events, p, keyFn, tsMillis, tieBreak, select,
      Some(timeoutSelect))

  private def patternStreamImpl[T, K: Encoder, R: Encoder](
      events: Dataset[T], p: Pattern[T],
      keyFn: T => K, tsMillis: T => Long, tieBreak: T => Long,
      select: (K, Match[T]) => R,
      timeoutSelect: Option[(K, Match[T]) => R])(
      implicit bufEnc: Encoder[Seq[T]]): Dataset[R] = {
    require(p.withinSpan.isDefined,
      "patternStream requires within() — unbounded patterns cannot seal")
    require(timeoutSelect.isEmpty ||
      p.skip == NoSkip || p.skip == SkipPastLast,
      "timed-out partials are defined for NO_SKIP / SKIP_PAST_LAST only")
    require(p.stages.head.minTimes >= 1,
      "patternStream requires a non-optional first stage: a zero-event " +
        "start has no timestamp to seal or fence on")
    val span = p.withinSpan.get
    implicit val te: Encoder[T] = events.encoder
    // state = (fenceTs, fenceTie, buffer); Long.MinValue = no fence yet
    implicit val stEnc: Encoder[(Long, Long, Seq[T])] =
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.scalaLong, bufEnc)
    events.groupByKey(keyFn)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (k: K, it: Iterator[T], state: GroupState[(Long, Long, Seq[T])]) => {
          val (fenceTs, fenceTie, prev) =
            state.getOption.getOrElse((Long.MinValue, Long.MinValue, Seq.empty[T]))
          val usesFence = p.skip != NoSkip
          def pastFence(e: T): Boolean = {
            val t = tsMillis(e)
            t > fenceTs || (t == fenceTs && tieBreak(e) > fenceTie)
          }
          val buf = (prev ++ it)
            .filter(e => !usesFence || pastFence(e))
            .sortBy(e => (tsMillis(e), tieBreak(e)))
          val wm = state.getCurrentWatermarkMs()
          def isSealed(e: T): Boolean = tsMillis(e) + span < wm
          val out =
            if (buf.headOption.exists(isSealed))
              matchSequence(buf.toIndexedSeq, p)(tsMillis)
                .filter { m =>
                  val first = m.stages.values.flatten
                    .minBy(e => (tsMillis(e), tieBreak(e)))
                  isSealed(first)
                }
            else Seq.empty
          var (nfTs, nfTie) = (fenceTs, fenceTie)
          def advanceFence(ts: Long, tie: Long): Unit =
            if (ts > nfTs || (ts == nfTs && tie > nfTie)) { nfTs = ts; nfTie = tie }
          def skipToAdvance(v: String, takeFirst: Boolean): Unit = out.foreach { m =>
            val rows = m.stages.collect {
              case (n, es) if n == v || n.takeWhile(_ != '#') == v => es
            }.flatten
            // empty target (optional symbol matched no rows): no-skip
            // for that match, the reference default
            if (rows.nonEmpty) {
              val r = if (takeFirst) rows.minBy(e => (tsMillis(e), tieBreak(e)))
                else rows.maxBy(e => (tsMillis(e), tieBreak(e)))
              // fence strictly below the resume row: that row stays
              // matchable across triggers (rows inside the emitted match
              // but before it are discarded; a sealed resume row's
              // matches already emitted this invocation — all rows below
              // its window have arrived — so eviction stays sound)
              advanceFence(tsMillis(r), tieBreak(r) - 1)
            }
          }
          if (out.nonEmpty) p.skip match {
            case SkipPastLast =>
              val last = out.flatMap(_.stages.values.flatten)
                .maxBy(e => (tsMillis(e), tieBreak(e)))
              advanceFence(tsMillis(last), tieBreak(last))
            case SkipToFirst(v) => skipToAdvance(v, takeFirst = true)
            case SkipToLast(v) => skipToAdvance(v, takeFirst = false)
            case NoSkip => ()
          }
          val keep = buf.filterNot(isSealed).filter { e =>
            !usesFence || {
              val t = tsMillis(e)
              t > nfTs || (t == nfTs && tieBreak(e) > nfTie)
            }
          }
          // the fence itself expires once no event at or before it can
          // still arrive (wm has passed fence + span ≥ fence + delay)
          if (keep.isEmpty && (nfTs == Long.MinValue || wm > nfTs + span))
            state.remove()
          else {
            state.update((nfTs, nfTie, keep))
            val wake =
              if (keep.nonEmpty) tsMillis(keep.head) + span + 1
              else nfTs + span + 1 // re-fire solely to clean up the fence
            state.setTimeoutTimestamp(wake)
          }
          // timed-out partials: starts sealing NOW, past the (new)
          // fence, that no completed match began at
          val timedOut = timeoutSelect match {
            case Some(tf) =>
              val matchedStarts = out.map { m =>
                val first = m.stages.values.flatten
                  .minBy(e => (tsMillis(e), tieBreak(e)))
                (tsMillis(first), tieBreak(first))
              }.toSet
              val arr = buf.toIndexedSeq
              arr.indices.iterator
                .filter { i =>
                  val e = arr(i)
                  isSealed(e) && p.stages.head.pred(e) &&
                    !matchedStarts((tsMillis(e), tieBreak(e))) &&
                    (p.skip != SkipPastLast || {
                      val t = tsMillis(e)
                      t > nfTs || (t == nfTs && tieBreak(e) > nfTie)
                    })
                }
                .map(i => tf(k, longestPartial(arr.drop(i), p)(tsMillis)))
                .toSeq
            case None => Seq.empty
          }
          out.iterator.map(m => select(k, m)) ++ timedOut.iterator
        })
  }
}
