package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.duration._
import CEP._

/** Pure matcher semantics (reference NFA.java behaviors, port of the
  * shapes in flink-cep pattern tests). Events: (id, type, ts). */
class CepSpec extends AnyFunSuite {

  private type E = (Long, String, Long)
  private def ev(s: String): IndexedSeq[E] =
    s.split(" ").zipWithIndex.map { case (t, i) => (i.toLong, t, i.toLong * 10) }.toIndexedSeq

  private def ids(m: Match[E], stage: String): Seq[Long] = m.stages(stage).map(_._1)

  test("strict next matches only adjacent events") {
    val p = Pattern.begin[E]("a").where(_._2 == "a").next("b").where(_._2 == "b")
    val ms = matchSequence(ev("a x b a b"), p)(_._3)
    assert(ms.map(m => (ids(m, "a").head, ids(m, "b").head)) == Seq((3L, 4L)))
  }

  test("relaxed followedBy skips intervening events") {
    val p = Pattern.begin[E]("a").where(_._2 == "a").followedBy("b").where(_._2 == "b")
    val ms = matchSequence(ev("a x b a b"), p)(_._3)
    assert(ms.map(m => (ids(m, "a").head, ids(m, "b").head)) == Seq((0L, 2L), (3L, 4L)))
  }

  test("times(n) requires a contiguous block") {
    val p = Pattern.begin[E]("e").where(_._2 == "e").times(3)
    val ms = matchSequence(ev("e e e e x e e"), p)(_._3)
    assert(ms.map(m => ids(m, "e")) == Seq(Seq(0L, 1, 2), Seq(1L, 2, 3)))
  }

  test("oneOrMore is greedy over the contiguous block") {
    val p = Pattern.begin[E]("e").where(_._2 == "e").oneOrMore
      .followedBy("x").where(_._2 == "x")
    val ms = matchSequence(ev("e e x"), p)(_._3)
    assert(ms.map(m => (ids(m, "e"), ids(m, "x"))) ==
      Seq((Seq(0L, 1), Seq(2L)), (Seq(1L), Seq(2L))))
  }

  test("optional stage may be empty") {
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .next("opt").where(_._2 == "o").optional
      .followedBy("b").where(_._2 == "b")
    val ms = matchSequence(ev("a b a o b"), p)(_._3)
    assert(ms.size == 2)
    assert(!ms.head.stages.contains("opt"))
    assert(ids(ms(1), "opt") == Seq(3L))
  }

  test("within bounds the first-to-last span") {
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .followedBy("b").where(_._2 == "b").withinUnits(15)
    // b at ts 20 is 20 units after a at ts 0 → out of window
    val ms = matchSequence(ev("a x b"), p)(_._3)
    assert(ms.isEmpty)
    val ms2 = matchSequence(ev("a b"), p)(_._3)
    assert(ms2.size == 1)
  }

  test("within is a STRICT bound: a span equal to the window is pruned") {
    // reference NFA prunes at timestamp - startTimestamp >= windowTime
    // (NFA.java:277) — b at ts 20 with within(20) is rejected
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .followedBy("b").where(_._2 == "b")
    val exact = matchSequence(ev("a x b"), p.withinUnits(20))(_._3)
    assert(exact.isEmpty)
    val above = matchSequence(ev("a x b"), p.withinUnits(21))(_._3)
    assert(above.size == 1)
  }

  test("optional head: matches may start on the first NON-optional stage") {
    // the scan-start pre-filter must accept events matching any stage
    // reachable as the first consumed event (leading minTimes == 0)
    val p = Pattern.begin[E]("opt").where(_._2 == "o").optional
      .followedBy("b").where(_._2 == "b")
    val ms = matchSequence(ev("b o b"), p)(_._3)
    // starts: b@0 (opt empty), o@1 (opt = o, b skips to b@2), b@2
    assert(ms.map(m => (m.stages.get("opt").map(_.map(_._1)), ids(m, "b"))) ==
      Seq((None, Seq(0L)), (Some(Seq(1L)), Seq(2L)), (None, Seq(2L))))
  }

  test("optional leading inner symbol of a group starts on the second symbol") {
    // PATTERN ((A? B){2}) shape: a match may legally begin on B
    val sub = Pattern.begin[E]("A").where(_._2 == "a").optional
      .next("B").where(_._2 == "b")
    val p = Pattern.begin(sub).times(2)
    val ms = matchSequence(ev("b a b"), p)(_._3)
    // repeat 1 = B@0 (A empty), repeat 2 = A@1 B@2
    assert(ms.size == 1)
    assert(ids(ms.head, "A") == Seq(1L) && ids(ms.head, "B") == Seq(0L, 2L))
  }

  test("skip-to with an empty optional target falls back to no-skip") {
    // reference SkipToElementStrategy default (no throwExceptionOnMiss):
    // a match where the target variable matched no rows does not move
    // the fence — and must not fail the job
    val p = Pattern.begin[E]("v").where(_._2 == "v")
      .next("w").where(_._2 == "w").optional
      .followedBy("c").where(_._2 == "c")
      .copy(skip = SkipToFirst("w"))
    val ms = matchSequence(ev("v c v w c"), p)(_._3)
    // v@0: w empty (c@1 directly follows) → no fence; v@2: w@3 c@4 → fence
    assert(ms.size == 2)
    assert(!ms.head.stages.contains("w") && ids(ms(1), "w") == Seq(3L))
  }

  test("relaxed optional stage with no qualifying event ahead is skipped") {
    // v w? c with no w anywhere: the optional stage must consume
    // nothing (k == 0 branch) instead of swallowing the scan to the
    // end of the buffer and starving c
    val p = Pattern.begin[E]("v").where(_._2 == "v")
      .followedBy("w").where(_._2 == "w").optional
      .followedBy("c").where(_._2 == "c")
    val ms = matchSequence(ev("v x c"), p)(_._3)
    assert(ms.size == 1)
    assert(!ms.head.stages.contains("w") && ids(ms.head, "c") == Seq(2L))
  }

  test("greedy quantified block backtracks when it starves the tail") {
    // stage 1 accepts e AND b, so the greedy run swallows the final b;
    // the tail then fails and the block must retry one shorter — the
    // group-repeat behavior, now on symbol stages too
    val p = Pattern.begin[E]("run").where(t => t._2 == "e" || t._2 == "b")
      .oneOrMore
      .next("b").where(_._2 == "b")
    val ms = matchSequence(ev("e e b"), p)(_._3)
    assert(ms.nonEmpty)
    assert(ids(ms.head, "run") == Seq(0L, 1L) && ids(ms.head, "b") == Seq(2L))
  }

  test("matchSequenceBounded: a million-row hot key stays bounded under within") {
    // alternating a b a b ... at ts step 10 with within(15): each a
    // pairs with its adjacent b only. The live buffer holds just the
    // rows inside a 2x window (~4), never the whole key run.
    val n = 1000000
    val rows = Iterator.range(0, n)
      .map(i => (i.toLong, if (i % 2 == 0) "a" else "b", i.toLong * 10))
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .followedBy("b").where(_._2 == "b").withinUnits(15)
    var count = 0L
    matchSequenceBounded(rows, p)(_._3).foreach(_ => count += 1)
    assert(count == n / 2)
  }

  test("afterMatchSkipPastLast suppresses overlapping matches") {
    val p = Pattern.begin[E]("e").where(_._2 == "e").times(2).afterMatchSkipPastLast
    val ms = matchSequence(ev("e e e e"), p)(_._3)
    assert(ms.map(m => ids(m, "e")) == Seq(Seq(0L, 1), Seq(2L, 3)))
  }

  test("followedByAny + SKIP_PAST_LAST prunes sibling branches (prune-after-emit)") {
    // NoSkip emits (a0,b1) and (a0,b2); under SKIP_PAST_LAST the first
    // emitted branch's last event (b1) prunes every candidate starting
    // at or before it — including its own sibling (a0,b2) — the
    // reference AfterMatchSkipStrategy.prune over the shared buffer
    val p0 = Pattern.begin[E]("a").where(_._2 == "a")
      .followedByAny("b").where(_._2 == "b")
    val noSkip = matchSequence(ev("a b b a b"), p0)(_._3)
    assert(noSkip.map(m => (ids(m, "a").head, ids(m, "b").head)) ==
      Seq((0L, 1L), (0L, 2L), (0L, 4L), (3L, 4L)))
    val pruned = matchSequence(ev("a b b a b"), p0.afterMatchSkipPastLast)(_._3)
    assert(pruned.map(m => (ids(m, "a").head, ids(m, "b").head)) ==
      Seq((0L, 1L), (3L, 4L)))
  }

  test("allowCombinations + SKIP_PAST_LAST keeps only non-overlapping blocks") {
    val p0 = Pattern.begin[E]("e").where(_._2 == "e").times(2).allowCombinations
    // NoSkip: every in-order pair (0,1) (0,2) (1,2) ...
    assert(matchSequence(ev("e e e"), p0)(_._3).size == 3)
    val pruned = matchSequence(ev("e e e e"), p0.afterMatchSkipPastLast)(_._3)
    assert(pruned.map(m => ids(m, "e")) == Seq(Seq(0L, 1L), Seq(2L, 3L)))
  }

  test("followedByAny + SKIP TO FIRST of the head emits every branch") {
    // pruningId == each match's own start and the skip-to prune is
    // STRICT (start < pruningId), so nothing is discarded — reference
    // SkipToElementStrategy.shouldPrune semantics
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .followedByAny("b").where(_._2 == "b")
      .copy(skip = SkipToFirst("a"))
    val ms = matchSequence(ev("a b b"), p)(_._3)
    assert(ms.map(m => (ids(m, "a").head, ids(m, "b").head)) ==
      Seq((0L, 1L), (0L, 2L)))
  }

  test("longestPartial tolerates optional stages that matched zero events") {
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .next("opt").where(_._2 == "o").optional
      .followedBy("b").where(_._2 == "b")
      .followedBy("c").where(_._2 == "c").withinUnits(100)
    // prefix (a, opt, b) completes with opt empty — the stage key is
    // absent from the match and must not crash the anchored lookup
    val m = longestPartial(ev("a b x"), p)(_._3)
    assert(ids(m, "a") == Seq(0L) && ids(m, "b") == Seq(1L))
    assert(!m.stages.contains("opt"))
  }

  test("followedByAny branches to every qualifying continuation") {
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .followedByAny("b").where(_._2 == "b")
    val ms = matchSequence(ev("a b x b"), p)(_._3)
    assert(ms.map(m => (ids(m, "a").head, ids(m, "b").head)) ==
      Seq((0L, 1L), (0L, 3L)))
  }

  test("notNext rejects a directly-following match") {
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .notNext("bad").where(_._2 == "x")
      .followedBy("b").where(_._2 == "b")
    // a@0 is directly followed by x → rejected; a@3 → b@5 survives
    val ms = matchSequence(ev("a x b a y b"), p)(_._3)
    assert(ms.map(m => (ids(m, "a").head, ids(m, "b").head)) == Seq((3L, 5L)))
  }

  test("notNext with a predicate overlapping the next stage rejects the shared event") {
    // the reference NOT state checks the banned predicate on the very
    // event the following stage then consumes: when both predicates
    // hold (here: any event counts as "bad", b also matches "b"), the
    // match must be rejected — the ban is NOT vacuous just because the
    // next stage wants the same position
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .notNext("bad").where(t => t._2 == "b" || t._2 == "x")
      .next("b").where(_._2 == "b")
    assert(matchSequence(ev("a b"), p)(_._3).isEmpty)
    // disjoint ban at that position still matches
    val p2 = Pattern.begin[E]("a").where(_._2 == "a")
      .notNext("bad").where(_._2 == "x")
      .next("b").where(_._2 == "b")
    assert(matchSequence(ev("a b"), p2)(_._3).size == 1)
  }

  test("notFollowedBy bans the gap before the next stage") {
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .notFollowedBy("bad").where(_._2 == "x")
      .followedBy("b").where(_._2 == "b")
    // a@0: gap to b@3 contains x → rejected; a@4: gap clean → (4,6)
    val ms = matchSequence(ev("a y x b a y b"), p)(_._3)
    assert(ms.map(m => (ids(m, "a").head, ids(m, "b").head)) == Seq((4L, 6L)))
    // terminating a pattern with a negation is rejected
    val bad = Pattern.begin[E]("a").where(_._2 == "a").notFollowedBy("x")
    assertThrows[IllegalArgumentException](matchSequence(ev("a"), bad)(_._3))
  }

  test("until stops the quantified block before the stop event") {
    val p = Pattern.begin[E]("e").where(_._2 == "e").oneOrMore
      .until(_._2 == "s")
      .followedBy("x").where(_._2 == "x")
    // block must end before s: e@0,e@1 | s | e@3 ... x@4
    val ms = matchSequence(ev("e e s e x"), p)(_._3)
    assert(ms.map(m => (ids(m, "e"), ids(m, "x"))) ==
      Seq((Seq(0L, 1), Seq(4L)), (Seq(1L), Seq(4L)), (Seq(3L), Seq(4L))))
  }

  test("timesOrMore takes at least n, greedily") {
    val p = Pattern.begin[E]("e").where(_._2 == "e").timesOrMore(2)
    val ms = matchSequence(ev("e e e x e"), p)(_._3)
    assert(ms.map(m => ids(m, "e")) == Seq(Seq(0L, 1, 2), Seq(1L, 2)))
  }

  test("allowCombinations branches over every in-order subsequence") {
    // oneOrMore+combinations over "a a x a": starts at each a, any
    // subsequence from that start
    val p = Pattern.begin[E]("as").where(_._2 == "a")
      .oneOrMore.allowCombinations
    val ms = matchSequence(ev("a a x a"), p)(_._3)
    val sets = ms.map(m => ids(m, "as"))
    assert(sets.toSet == Set(
      Seq(0L), Seq(0L, 1L), Seq(0L, 3L), Seq(0L, 1L, 3L),
      Seq(1L), Seq(1L, 3L), Seq(3L)))
    // times(2)+combinations: exactly the ordered pairs
    val p2 = Pattern.begin[E]("as").where(_._2 == "a")
      .times(2).allowCombinations
    val ms2 = matchSequence(ev("a a x a"), p2)(_._3)
    assert(ms2.map(m => ids(m, "as")).toSet ==
      Set(Seq(0L, 1L), Seq(0L, 3L), Seq(1L, 3L)))
  }

  test("where conjuncts and or disjuncts compose") {
    val p = Pattern.begin[E]("ab").where(e => e._2 == "a").or(_._2 == "b")
    val ms = matchSequence(ev("a b c"), p)(_._3)
    assert(ms.size == 2)
  }

  test("whereCtx sees earlier stages (IterativeCondition)") {
    // b must have a LATER id than twice a's id: with a=(0,2) only
    // b-events with id > 2*a qualify. Events: a0 b1 a2 b3 b5-ish
    val events = IndexedSeq[E](
      (0L, "a", 0), (1L, "b", 10), (2L, "a", 20), (3L, "b", 30), (5L, "b", 40))
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .followedBy("b").where(_._2 == "b")
      .whereCtx((b, ctx) => b._1 > 2 * ctx("a").head._1)
    val ms = matchSequence(events, p)(_._3)
    // a=0: first b with id>0 is b1; a=2: needs id>4 → b5
    assert(ms.map(m => (ids(m, "a").head, ids(m, "b").head))
      == Seq((0L, 1L), (2L, 5L)))
  }

  test("SkipToLast fences starts inside the match that NoSkip would take") {
    // v v c w: NoSkip starts a second match at the inner v (relaxed
    // gap skips it in match 1); SkipToLast("w")'s fence at w blocks it
    val events = ev("v v c w")
    def p(skip: AfterMatchSkip) = Pattern.begin[E]("v").where(_._2 == "v")
      .followedBy("c").where(_._2 == "c")
      .followedBy("w").where(_._2 == "w")
      .copy(skip = skip)
    val all = matchSequence(events, p(NoSkip))(_._3)
      .map(m => ids(m, "v").head)
    assert(all == Seq(0L, 1L))
    val fenced = matchSequence(events, p(SkipToLast("w")))(_._3)
      .map(m => ids(m, "v").head)
    assert(fenced == Seq(0L))
  }

  test("SkipToFirst resumes at the variable's first row, allowing overlap") {
    // v c v c w: match 1 = (v0, cs=[c1], w4) — its relaxed gap spans
    // v2. SkipPastLast fences past w4 (one match total); SkipToFirst
    // of the block resumes at c1, so v2 starts the overlapping match 2
    val events = ev("v c v c w")
    def p(skip: AfterMatchSkip) = Pattern.begin[E]("v").where(_._2 == "v")
      .followedBy("cs").where(_._2 == "c").oneOrMore
      .followedBy("w").where(_._2 == "w")
      .copy(skip = skip)
    val past = matchSequence(events, p(SkipPastLast))(_._3)
      .map(m => (ids(m, "v").head, ids(m, "cs")))
    assert(past == Seq((0L, Seq(1L))))
    val first = matchSequence(events, p(SkipToFirst("cs")))(_._3)
      .map(m => (ids(m, "v").head, ids(m, "cs")))
    assert(first == Seq((0L, Seq(1L)), (2L, Seq(3L))))
  }

  test("reluctant oneOrMore takes the shortest block that completes") {
    // a e e e b: greedy es+ consumes e e e then b; reluctant stops at
    // the first e because the following stage (any row) completes
    val events = ev("a e e e b")
    val base = Pattern.begin[E]("a").where(_._2 == "a")
      .followedBy("es").where(_._2 == "e").oneOrMore
      .followedBy("z").where(_._2 == "b")
    val greedy = matchSequence(events, base)(_._3)
    assert(ids(greedy.head, "es") == Seq(1L, 2L, 3L))
    val rel = matchSequence(events, base.copy(stages =
      base.stages.updated(1, base.stages(1).copy(reluctant = true))))(_._3)
    // shortest block: just e1 — but z demands a 'b', which only
    // follows the full run... z is Relaxed, so it skips e2 e3 and
    // finds b: the single-e block completes
    assert(ids(rel.head, "es") == Seq(1L))
    assert(ids(rel.head, "z") == Seq(4L))
  }

  test("group pattern times(2) repeats the whole sub-sequence") {
    // (a b){2}: two back-to-back a→b pairs; inner names collect
    // events across repeats (reference GroupPattern.java)
    val sub = Pattern.begin[E]("a").where(_._2 == "a")
      .followedBy("b").where(_._2 == "b")
    val p = Pattern.begin(sub).times(2)
    val ms = matchSequence(ev("a b a b a"), p)(_._3)
    assert(ms.size == 1)
    assert(ids(ms.head, "a") == Seq(0L, 2L))
    assert(ids(ms.head, "b") == Seq(1L, 3L))
  }

  test("group oneOrMore is greedy and a following stage still completes") {
    // (a b)+ z: greedy takes both pairs, then z; PAST LAST suppresses
    // the overlapping single-pair match from the second a
    val sub = Pattern.begin[E]("a").where(_._2 == "a")
      .followedBy("b").where(_._2 == "b")
    val p = Pattern.begin(sub).oneOrMore
      .followedBy("z").where(_._2 == "z")
      .afterMatchSkipPastLast
    val ms = matchSequence(ev("a b a b z"), p)(_._3)
    assert(ms.size == 1)
    assert(ids(ms.head, "a") == Seq(0L, 2L) && ids(ms.head, "z") == Seq(4L))
  }

  test("group quantifier backtracks when greed starves the tail") {
    // (a b)+ then b: greedy wants both pairs but then no b remains —
    // it must back off to one pair so the trailing b can match
    val sub = Pattern.begin[E]("a").where(_._2 == "a")
      .followedBy("b").where(_._2 == "b")
    val p = Pattern.begin(sub).oneOrMore
      .next("tail").where(_._2 == "a")
    val ms = matchSequence(ev("a b a b"), p)(_._3)
    assert(ms.size == 1)
    // one repeat (a0 b1), tail = a2 strictly next
    assert(ids(ms.head, "a") == Seq(0L) && ids(ms.head, "tail") == Seq(2L))
  }

  test("mid-pattern group with relaxed entry skips the gap") {
    val sub = Pattern.begin[E]("b").where(_._2 == "b")
      .next("c").where(_._2 == "c")
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .followedBy(sub).times(2)
    val ms = matchSequence(ev("a x b c b c"), p)(_._3)
    assert(ms.size == 1)
    assert(ids(ms.head, "b") == Seq(2L, 4L) && ids(ms.head, "c") == Seq(3L, 5L))
  }

  test("times(from, to) bounds the block to the range") {
    def p(from: Int, to: Int) = Pattern.begin[E]("a").where(_._2 == "a")
      .next("es").where(_._2 == "e").times(from, to)
      .next("z").where(_._2 == "b")
    // a e e b: the greedy run is 2 e's, inside [1,3] → match
    val ms = matchSequence(ev("a e e b"), p(1, 3))(_._3)
    assert(ms.size == 1 && ids(ms.head, "es") == Seq(1L, 2L))
    // [3,4] demands at least 3 → no match
    assert(matchSequence(ev("a e e b"), p(3, 4))(_._3).isEmpty)
    // [1,1] caps the block at one e, z must follow directly → no match
    assert(matchSequence(ev("a e e b"), p(1, 1))(_._3).isEmpty)
  }

  test("subtype keeps only events of the requested runtime class") {
    // events as Any: Longs and Strings interleaved; subtype[String]
    // restricts the stage to strings
    val events: IndexedSeq[Any] = IndexedSeq(1L, "x", 2L, "y")
    val p = CEP.Pattern.begin[Any]("s").subtype[String]
      .followedBy("t").subtype[String]
    val ms = matchSequence(events, p)(_ => 0L)
    assert(ms.head.stages("s") == Seq("x") && ms.head.stages("t") == Seq("y"))
  }

  test("nested groups compose: ( x (y){2} ){2}") {
    // inner group (y){2} repeats inside the outer group, which itself
    // repeats twice — the CPS expansion recurses uniformly
    val innerY = Pattern.begin[E]("y").where(_._2 == "y")
    val outer = Pattern.begin[E]("x").where(_._2 == "x")
      .next(innerY).times(2)
    val p = Pattern.begin(outer).times(2)
    val ms = matchSequence(ev("x y y x y y"), p)(_._3)
    assert(ms.size == 1)
    assert(ids(ms.head, "x") == Seq(0L, 3L))
    assert(ids(ms.head, "y") == Seq(1L, 2L, 4L, 5L))
  }

  test("optional group may match zero repeats") {
    val sub = Pattern.begin[E]("b").where(_._2 == "b")
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .followedBy(sub).optional
      .followedBy("z").where(_._2 == "z")
    val ms = matchSequence(ev("a z"), p)(_._3)
    assert(ms.size == 1)
    assert(!ms.head.stages.contains("b") && ids(ms.head, "z") == Seq(1L))
  }

  test("whereCtx gates quantified blocks against the anchor stage") {
    // block elements must exceed the anchor's id
    val events = IndexedSeq[E](
      (2L, "a", 0), (1L, "e", 10), (3L, "e", 20), (4L, "e", 30))
    val p = Pattern.begin[E]("a").where(_._2 == "a")
      .followedBy("es").where(_._2 == "e")
      .whereCtx((e, ctx) => e._1 > ctx("a").head._1)
      .oneOrMore
    val ms = matchSequence(events, p)(_._3)
    // relaxed entry skips e1 (fails ctx), block = contiguous e3 e4
    assert(ids(ms.head, "es") == Seq(3L, 4L))
  }
}
