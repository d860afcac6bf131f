package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** r13 verdict item 5: the quant-guard's float-surface coverage was
  * partial (q212/q213/q219's sigmoid sites were green but unguarded).
  * This spec makes the coverage MECHANICAL:
  *
  *  1. re-scan src/main/scala/graft for transcendental call sites
  *     (exp/log/log2/log10/ln/pow/`**`, outside comments) with the
  *     same attribution rules QuantGuard.classification documents,
  *     and assert exact key-set equality with the classification —
  *     a new, moved, or removed site fails here until classified;
  *  2. run every measured margin at the spec corpus and assert every
  *     margin name a Covered(...) entry references actually exists —
  *     a classification cannot claim coverage by a margin nobody
  *     measures;
  *  3. assert no measured margin on this corpus is inside the 1e-7
  *     libm flip zone (the same fence graft.Verify prints).
  *
  * The plan-walk alternative (df.queryExecution.analyzed) was
  * rejected deliberately: localCheckpoint() and memory-sink
  * materialization TRUNCATE lineage, so exactly the sites that were
  * missed in r13 (q212's driver-built weight table, q219's stream)
  * are invisible to plan inspection — the source scan sees them.
  */
class QuantGuardCompletenessSpec extends SparkSpec {

  // the same token set the round-14 audit used: transcendental (not
  // IEEE-correctly-rounded) functions plus DuckDB's `**` pow operator.
  // `(?<![\w.])` keeps expr(/explode(/regexp_ from matching; the
  // explicit math.* alternative catches driver-side scala.math calls.
  private val tokenRe =
    ("(?<![\\w.])(exp|log|log1p|log2|log10|ln|pow)\\(" +
      "|\\*\\*|(?<!\\w)math\\.(exp|log|log1p|pow)\\(").r
  private val encRe = "q(?:NoOracle)?\\(\"(q[^\"]+)\"|def (\\w+)".r

  /** site-key -> hit count, scanned fresh from the sources. Excludes
    * tools/ (dev probes, no oracle surface) and QuantGuard.scala
    * itself (the classification's own reason strings name the
    * functions they exempt). */
  private def scanSites(): Map[String, Int] = {
    val root = Paths.get("src/main/scala/graft")
    val files = Files.walk(root).iterator().asScala
      .filter { p =>
        val s = p.toString
        s.endsWith(".scala") && !s.contains("/tools/") &&
          !s.endsWith("/QuantGuard.scala")
      }
      .toSeq.sortBy(_.toString)
    val out = scala.collection.mutable.Map[String, Int]()
    for (f <- files) {
      var cur = "<top>"
      val rel = root.relativize(f).toString
      for (line <- Files.readAllLines(f).asScala) {
        val s = line.trim
        if (!(s.startsWith("//") || s.startsWith("*") ||
            s.startsWith("/*"))) {
          encRe.findAllMatchIn(line).foreach { m =>
            cur = Option(m.group(1)).getOrElse(m.group(2))
          }
          if (tokenRe.findFirstIn(line).isDefined) {
            val k = s"$rel#$cur"
            out(k) = out.getOrElse(k, 0) + 1
          }
        }
      }
    }
    out.toMap
  }

  test("every transcendental site is classified (covered or exempt)") {
    val found = scanSites().keySet
    val classified = QuantGuard.classification.keySet
    val unclassified = (found -- classified).toSeq.sorted
    val stale = (classified -- found).toSeq.sorted
    assert(unclassified.isEmpty,
      "UNCLASSIFIED transcendental sites — add a margin entry or an " +
        s"exemption to QuantGuard.classification: ${unclassified.mkString(", ")}")
    assert(stale.isEmpty,
      s"stale classification entries (site moved/removed): ${stale.mkString(", ")}")
  }

  test("every Covered margin is measured and outside the flip zone") {
    val measured = QuantGuard.margins(spark, sf).toMap
    val referenced = QuantGuard.classification.values.collect {
      case QuantGuard.Covered(names) => names
    }.flatten.toSet
    val missing = (referenced -- measured.keySet).toSeq.sorted
    assert(missing.isEmpty,
      s"classification claims margins nobody measures: ${missing.mkString(", ")}")
    measured.foreach { case (n, m) =>
      assert(m > 1e-7, s"margin $n = $m is inside the 1e-7 libm flip zone")
    }
  }
}
