package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.FlinkFunctions
import graft.cep.CEP
import scala.util.Random

/** Aggregator/matcher laws (FIXTURES.md layer 3) — property-style
  * over seeded random inputs (scalatest+scalacheck bridge is not on
  * the offline classpath, so generation is hand-rolled). */
class PropertySpec extends AnyFunSuite {

  private val agg = new FlinkFunctions.CollectAggregator[Int]
  private def lists(r: Random) = List.fill(r.nextInt(30))(r.nextInt(10))

  test("CollectAggregator: merge commutative/associative, zero identity, counts exact") {
    val r = new Random(42)
    for (_ <- 1 to 200) {
      val (xs, ys, zs) = (lists(r), lists(r), lists(r))
      val (a, b, c) = (xs.foldLeft(agg.zero)(agg.reduce),
        ys.foldLeft(agg.zero)(agg.reduce), zs.foldLeft(agg.zero)(agg.reduce))
      assert(agg.merge(a, b) == agg.merge(b, a))
      assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)))
      assert(agg.merge(a, agg.zero) == a)
      assert(agg.finish(a) == xs.groupBy(identity).view.mapValues(_.size).toMap)
    }
  }

  test("TopKAgg: any partitioning + merge order equals global sorted take-k") {
    val r = new Random(11)
    val agg = new graft.functions.TopK.TopKAgg(3)
    import graft.functions.TopK.Scored
    for (_ <- 1 to 200) {
      // unique ids → total order → result independent of partitioning
      val rows = r.shuffle((0 until r.nextInt(40)).toList)
        .map(id => Scored(math.round(r.nextDouble() * 100) / 10.0, id.toLong))
      val expected = rows.sortBy(s => (-s.score, s.id)).take(3)
      // split into random partitions, reduce each, merge in random order
      val parts = rows.grouped(math.max(1, r.nextInt(7))).toList
      val buffers = parts.map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = r.shuffle(buffers).foldLeft(agg.zero)(agg.merge)
      assert(agg.finish(merged) == expected, s"rows=$rows parts=$parts")
    }
  }

  test("RetractableMax: message order and partitioning never change the result") {
    val r = new Random(23)
    val f = new graft.functions.RetractableAgg.RetractableMax
    for (_ <- 1 to 200) {
      val base = List.fill(r.nextInt(20) + 1)((r.nextInt(8).toDouble, true))
      val retracted = r.shuffle(base).take(r.nextInt(base.size)).map(v => (v._1, false))
      val messages = r.shuffle(base ++ retracted)
      // survivors = multiset difference
      val counts = messages.foldLeft(Map.empty[Double, Int]) { case (m, (v, acc)) =>
        m.updated(v, m.getOrElse(v, 0) + (if (acc) 1 else -1))
      }
      val expected = counts.collect { case (v, n) if n > 0 => v } match {
        case vs if vs.isEmpty => None
        case vs => Some(vs.max)
      }
      val parts = messages.grouped(math.max(1, r.nextInt(5))).toList
      val accs = parts.map(_.foldLeft(f.createAccumulator()) { case (a, (v, acc)) =>
        if (acc) f.accumulate(a, v) else f.retract(a, v)
      })
      val merged = r.shuffle(accs).foldLeft(f.createAccumulator())(f.merge)
      assert(f.getValue(merged) == expected, s"messages=$messages")
    }
  }

  test("similarToRegex: wildcard laws over random alphanumerics") {
    val r = new Random(7)
    for (_ <- 1 to 200) {
      val s = Random.alphanumeric.take(r.nextInt(12)).mkString
      assert(s.matches(FlinkFunctions.similarToRegex("%")))
      if (s.nonEmpty) {
        assert(s.matches(FlinkFunctions.similarToRegex(s)))
        assert(s.matches(FlinkFunctions.similarToRegex(s.head.toString + "%")))
        assert((s.length == 1) == s.matches(FlinkFunctions.similarToRegex("_")))
      }
    }
  }

  test("CEP matchSequence: matches time-ordered, within respected, count exact") {
    type E = (Long, String, Long)
    val r = new Random(13)
    for (_ <- 1 to 300) {
      val flags = List.fill(r.nextInt(25))(r.nextBoolean())
      val evs = flags.zipWithIndex.map { case (f, i) =>
        (i.toLong, if (f) "a" else "x", i.toLong * 10)
      }.toIndexedSeq
      val p = CEP.Pattern.begin[E]("a").where(_._2 == "a")
        .followedBy("b").where(_._2 == "a").withinUnits(30)
      val ms = CEP.matchSequence(evs, p)(_._3)
      ms.foreach { m =>
        val fst = m.stages("a").head
        val snd = m.stages("b").head
        assert(snd._3 > fst._3, "stage order must follow event time")
        // STRICT bound (reference NFA prunes at span >= window)
        assert(snd._3 - fst._3 < 30, "within bound violated")
      }
      val expected = evs.zipWithIndex.count { case (e, i) =>
        e._2 == "a" && evs.drop(i + 1).takeWhile(_._3 - e._3 < 30).exists(_._2 == "a")
      }
      assert(ms.size == expected)
    }
  }

  test("CEP matchSequenceBounded equals the unbounded scan under every skip") {
    type E = (Long, String, Long)
    val r = new Random(41)
    val skips = Seq[CEP.AfterMatchSkip](CEP.NoSkip, CEP.SkipPastLast,
      CEP.SkipToFirst("b"), CEP.SkipToLast("b"))
    for (trial <- 1 to 240) {
      // ts strictly increasing (i*7 + [0,5)) so sort order == arrival
      val evs = (0 until r.nextInt(40)).map { i =>
        (i.toLong, Seq("a", "b", "c", "x")(r.nextInt(4)),
          i.toLong * 7 + r.nextInt(5))
      }.toIndexedSeq
      val p = CEP.Pattern.begin[E]("a").where(_._2 == "a")
        .followedBy("b").where(_._2 == "b").oneOrMore
        .followedBy("c").where(_._2 == "c")
        .withinUnits(30)
        .copy(skip = skips(trial % skips.length))
      val unbounded = CEP.matchSequence(evs, p)(_._3).map(_.stages)
      val bounded =
        CEP.matchSequenceBounded(evs.iterator, p)(_._3).map(_.stages).toSeq
      assert(bounded == unbounded)
    }
  }

  test("CEP whereCtx: earliest completion equals the brute-force reference") {
    type E = (Long, String, Long)
    val r = new Random(29)
    for (_ <- 1 to 300) {
      val evs = List.fill(r.nextInt(20))(
        (r.nextInt(50).toLong, if (r.nextBoolean()) "a" else "b"))
        .zipWithIndex.map { case ((v, t), i) => (v, t, i.toLong * 10) }
        .toIndexedSeq
      val p = CEP.Pattern.begin[E]("a").where(_._2 == "a")
        .followedBy("b").where(_._2 == "b")
        .whereCtx((b, ctx) => b._1 > ctx("a").head._1)
      val got = CEP.matchSequence(evs, p)(_._3)
        .map(m => (m.stages("a").head._3, m.stages("b").head._3))
      val want = evs.zipWithIndex.flatMap { case (a, i) =>
        if (a._2 != "a") None
        else evs.drop(i + 1).find(b => b._2 == "b" && b._1 > a._1)
          .map(b => (a._3, b._3))
      }
      assert(got == want)
    }
  }

  test("CEP deterministic matcher: match existence equals a java.util.regex reference") {
    // Independent differential oracle: every deterministic pattern from
    // the builder grammar below translates to an anchored regex whose
    // semantics provably coincide on EXISTENCE of a match starting at a
    // given row —
    //   begin block        ->  c{n,m}            (anchored at the start)
    //   next block         ->  c{n,m}            (no gap)
    //   followedBy block   ->  [^c]*c{n,m}       (SKIP_TILL_NEXT pins the
    //                                             block to the FIRST
    //                                             qualifying event)
    //   notFollowedBy(b)
    //     before followedBy c -> [^bc]*c{n,m}    (gap also excludes b)
    //   optional followedBy -> (?:[^c]*c{1,m})?  (absent group consumes
    //                                             nothing and no gap)
    // java.util.regex backtracks block sizes freely, so this directly
    // cross-checks the matcher's greedy-descending/reluctant-ascending
    // block branching and k=0 skip-from-original-pos semantics against
    // an engine that shares no code with it. NoSkip + deterministic
    // stages => exactly one match per start with a completion, so
    // match-start sets must be EQUAL.
    type E = (Long, Char, Long)
    val r = new Random(211)
    for (_ <- 1 to 400) {
      val alphabet = "abc"
      def quant(head: Boolean): (Int, Int) = r.nextInt(6) match {
        case 0 | 1 => (1, 1)
        case 2 => (2, 2)
        case 3 => (1, 3)
        case 4 => if (head) (1, 1) else (0, 1)
        case 5 => (2, 4)
      }
      val nStages = 2 + r.nextInt(3)
      var pat = null.asInstanceOf[CEP.Pattern[E]]
      val rx = new StringBuilder
      for (i <- 0 until nStages) {
        val c = alphabet(r.nextInt(alphabet.length))
        val (mn, mx) = quant(head = i == 0)
        val strict = i > 0 && r.nextBoolean()
        // a ban is only sound before an unconditionally-consuming
        // relaxed stage: on a skipped optional stage the matcher
        // carries the ban forward, which the regex form can't express
        val ban: Option[Char] =
          if (!strict && i > 0 && mn >= 1 && r.nextInt(4) == 0)
            Some(alphabet(r.nextInt(alphabet.length)))
          else None
        val name = s"s$i"
        pat =
          if (i == 0) CEP.Pattern.begin[E](name).where(_._2 == c)
          else {
            val withBan = ban match {
              case Some(b) => pat.notFollowedBy(s"n$i").where(_._2 == b)
              case None => pat
            }
            if (strict) withBan.next(name).where(_._2 == c)
            else withBan.followedBy(name).where(_._2 == c)
          }
        if ((mn, mx) != (1, 1)) {
          pat = pat.times(mn, mx)
          if (mx > mn && r.nextBoolean()) pat = pat.reluctant
        }
        val gap =
          if (i == 0 || strict) ""
          else ban match {
            case Some(b) => s"[^${(Set(b, c)).mkString}]*"
            case None => s"[^$c]*"
          }
        val block = if ((mn, mx) == (1, 1)) s"$c" else s"$c{$mn,$mx}"
        rx ++= (if (mn == 0 && gap.nonEmpty) s"(?:$gap$c{1,$mx})?"
                else if (mn == 0) s"$c{0,$mx}"
                else s"$gap$block")
      }
      val s = List.fill(r.nextInt(30))("abcx"(r.nextInt(4))).mkString
      val evs = s.zipWithIndex.map { case (ch, i) =>
        (i.toLong, ch, i.toLong * 10)
      }.toIndexedSeq
      val got = CEP.matchSequence(evs, pat)(_._3)
        .map(_.stages.values.flatten.map(_._1).min).toSet
      val jre = java.util.regex.Pattern.compile(rx.toString)
      val want = evs.indices.filter { start =>
        val m = jre.matcher(s)
        m.region(start, s.length)
        m.lookingAt()
      }.map(_.toLong).toSet
      assert(got == want,
        s"pattern /$rx/ on \"$s\": matcher starts $got, regex starts $want")
    }
  }

  test("CEP branching matcher: match existence equals a java.util.regex reference") {
    // The branching extension of the differential oracle above:
    // followedByAny (SKIP_TILL_ANY) translates to a free `.*` gap —
    // the stage may take ANY later qualifying event, not just the
    // first. Branching patterns emit every completion, so existence
    // per start is still the regex question. Variable-size blocks in
    // branching patterns are constrained to RELUCTANT (the matcher's
    // greedy default deliberately keeps a single continuation there to
    // preserve the reference's match SET; reluctant blocks branch over
    // sizes in every mode, which is what existence-equality needs).
    type E = (Long, Char, Long)
    val r = new Random(503)
    for (_ <- 1 to 300) {
      val alphabet = "abc"
      val nStages = 2 + r.nextInt(3)
      var pat = null.asInstanceOf[CEP.Pattern[E]]
      val rx = new StringBuilder
      var sawAny = false
      for (i <- 0 until nStages) {
        val c = alphabet(r.nextInt(alphabet.length))
        val kind = if (i == 0) 0 else r.nextInt(3) // 0 relaxed, 1 strict, 2 any
        if (kind == 2) sawAny = true
        val name = s"s$i"
        pat =
          if (i == 0) CEP.Pattern.begin[E](name).where(_._2 == c)
          else kind match {
            case 1 => pat.next(name).where(_._2 == c)
            case 2 => pat.followedByAny(name).where(_._2 == c)
            case _ => pat.followedBy(name).where(_._2 == c)
          }
        // quantifiers: followedByAny stages are single-element (the
        // builder's rule); variable blocks are reluctant-only here
        val (mn, mx) =
          if (kind == 2) (1, 1)
          else r.nextInt(4) match {
            case 0 | 1 => (1, 1)
            case 2 => (2, 2)
            case 3 => (1, 3)
          }
        if ((mn, mx) != (1, 1)) {
          pat = pat.times(mn, mx)
          if (mx > mn) pat = pat.reluctant
        }
        val gap = kind match {
          case _ if i == 0 => ""
          case 1 => ""
          case 2 => ".*"
          case _ => s"[^$c]*"
        }
        rx ++= (if ((mn, mx) == (1, 1)) s"$gap$c" else s"$gap$c{$mn,$mx}")
      }
      if (sawAny) { // only branching trials exercise this test's claim
        val s = List.fill(r.nextInt(25))("abcx"(r.nextInt(4))).mkString
        val evs = s.zipWithIndex.map { case (ch, i) =>
          (i.toLong, ch, i.toLong * 10)
        }.toIndexedSeq
        val got = CEP.matchSequence(evs, pat)(_._3)
          .map(_.stages.values.flatten.map(_._1).min).toSet
        val jre = java.util.regex.Pattern.compile(rx.toString, java.util.regex.Pattern.DOTALL)
        val want = evs.indices.filter { start =>
          val m = jre.matcher(s)
          m.region(start, s.length)
          m.lookingAt()
        }.map(_.toLong).toSet
        assert(got == want,
          s"pattern /$rx/ on \"$s\": matcher starts $got, regex starts $want")
      }
    }
  }

  test("CEP group patterns: match existence equals a java.util.regex reference") {
    // Third leg of the differential oracle: quantified GROUP stages
    // (sub-sequence repeats, reference GroupPattern.java). A group of
    // inner single-element stages translates repeat-wise —
    //   followedBy(sub){n,m} -> (?:[^c1]*c1 g2 c2){n,m}
    //   next(sub){n,m}       -> c1 g2 c2 (?:[^c1]*c1 g2 c2){n-1,m-1}
    //     (strict groups pin the FIRST repeat to the scan position;
    //      later repeats re-enter through the inner head's relaxed gap)
    // where g2 is the second inner stage's own gap ("" strict,
    // [^c2]* relaxed). The group matcher explores every repeat count,
    // as does the regex engine. Inner stages stay (1,1) so the
    // zero-progress prune never fires.
    type E = (Long, Char, Long)
    val r = new Random(907)
    for (_ <- 1 to 300) {
      val alphabet = "abc"
      val nStages = 1 + r.nextInt(2) // 1-2 top-level stages
      var pat = null.asInstanceOf[CEP.Pattern[E]]
      val rx = new StringBuilder
      var sawGroup = false
      for (i <- 0 until nStages) {
        val isGroup = r.nextInt(2) == 0 || (i == nStages - 1 && !sawGroup)
        if (!isGroup) {
          val c = alphabet(r.nextInt(alphabet.length))
          val strict = i > 0 && r.nextBoolean()
          pat =
            if (i == 0) CEP.Pattern.begin[E](s"s$i").where(_._2 == c)
            else if (strict) pat.next(s"s$i").where(_._2 == c)
            else pat.followedBy(s"s$i").where(_._2 == c)
          rx ++= (if (i == 0 || strict) s"$c" else s"[^$c]*$c")
        } else {
          sawGroup = true
          val c1 = alphabet(r.nextInt(alphabet.length))
          val c2 = alphabet(r.nextInt(alphabet.length))
          val inner2strict = r.nextBoolean()
          val sub = {
            val b = CEP.Pattern.begin[E](s"g${i}a").where(_._2 == c1)
            if (inner2strict) b.next(s"g${i}b").where(_._2 == c2)
            else b.followedBy(s"g${i}b").where(_._2 == c2)
          }
          val strictGroup = i > 0 && r.nextBoolean()
          pat =
            if (i == 0) CEP.Pattern.begin[E](sub)
            else if (strictGroup) pat.next(sub)
            else pat.followedBy(sub)
          val (mn, mx) = Seq((1, 1), (1, 2), (2, 2), (1, 3))(r.nextInt(4))
          if ((mn, mx) != (1, 1)) pat = pat.times(mn, mx)
          val g2 = if (inner2strict) "" else s"[^$c2]*"
          val rep = s"[^$c1]*$c1$g2$c2"
          val first = s"$c1$g2$c2"
          rx ++= (if (i == 0 || strictGroup)
            // anchored/strict: first repeat has no entry gap
            s"$first(?:$rep){${mn - 1},${mx - 1}}"
          else s"(?:$rep){$mn,$mx}")
        }
      }
      val s = List.fill(r.nextInt(25))("abcx"(r.nextInt(4))).mkString
      val evs = s.zipWithIndex.map { case (ch, i) =>
        (i.toLong, ch, i.toLong * 10)
      }.toIndexedSeq
      val got = CEP.matchSequence(evs, pat)(_._3)
        .map(_.stages.values.flatten.map(_._1).min).toSet
      val jre = java.util.regex.Pattern.compile(rx.toString)
      val want = evs.indices.filter { start =>
        val m = jre.matcher(s)
        m.region(start, s.length)
        m.lookingAt()
      }.map(_.toLong).toSet
      assert(got == want,
        s"pattern /$rx/ on \"$s\": matcher starts $got, regex starts $want")
    }
  }

  test("CEP until(): block truncation equals a java.util.regex reference") {
    // Fourth leg: quantified blocks with CLASS predicates (char in
    // {c1, c2}) and until(c2). The matcher stops the block at the
    // first until event (not consumed), so the effective block body is
    // the class MINUS the until char — but gap entry pinning still
    // uses the FULL class (an until-char event is a qualifying event,
    // so a relaxed gap cannot skip it):
    //   followedBy [c1c2]{n,m} until c2  ->  [^c1c2]*[c1]{n,m}
    // This separates the two roles a predicate char can play (entry
    // anchor vs block member), which single-char predicates never do.
    type E = (Long, Char, Long)
    val r = new Random(1301)
    for (_ <- 1 to 300) {
      val alphabet = "abc"
      val c1 = alphabet(r.nextInt(3))
      val c2 = alphabet((alphabet.indexOf(c1) + 1 + r.nextInt(2)) % 3)
      val (mn, mx) = Seq((1, 2), (1, 3), (2, 3))(r.nextInt(3))
      val head = alphabet(r.nextInt(3))
      val tail = alphabet(r.nextInt(3))
      val tailStrict = r.nextBoolean()
      var pat = CEP.Pattern.begin[E]("h").where(_._2 == head)
        .followedBy("blk").where(t => t._2 == c1 || t._2 == c2)
        .times(mn, mx).until(_._2 == c2)
      pat = if (tailStrict) pat.next("t").where(_._2 == tail)
        else pat.followedBy("t").where(_._2 == tail)
      val gapT = if (tailStrict) "" else s"[^$tail]*"
      val rx = s"$head[^$c1$c2]*[$c1]{$mn,$mx}$gapT$tail"
      val s = List.fill(r.nextInt(28))("abcx"(r.nextInt(4))).mkString
      val evs = s.zipWithIndex.map { case (ch, i) =>
        (i.toLong, ch, i.toLong * 10)
      }.toIndexedSeq
      val got = CEP.matchSequence(evs, pat)(_._3)
        .map(_.stages.values.flatten.map(_._1).min).toSet
      val jre = java.util.regex.Pattern.compile(rx)
      val want = evs.indices.filter { start =>
        val m = jre.matcher(s)
        m.region(start, s.length)
        m.lookingAt()
      }.map(_.toLong).toSet
      assert(got == want,
        s"pattern /$rx/ on \"$s\": matcher starts $got, regex starts $want")
    }
  }

  test("sorted_intersect_size_long equals set-intersect cardinality") {
    import graft.functions.SortedIntersectSize
    import org.apache.spark.sql.functions.col
    val spark = TestSpark.spark
    import spark.implicits._
    val r = new Random(47)
    val rows = List.fill(200) {
      def arr() = List.fill(r.nextInt(30))(r.nextInt(40).toLong)
        .distinct.sorted
      (arr(), arr())
    }
    val got = rows.toDF("a", "b")
      .select(SortedIntersectSize
        .sorted_intersect_size_long(col("a"), col("b")).as("n"))
      .as[Int].collect().toSeq
    val want = rows.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(got == want)
  }
}
