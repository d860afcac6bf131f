package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Retractable UDAGG semantics: exact retraction of the current
  * extremum and order-independence of merge (the properties a plain
  * running aggregate cannot provide). */
class RetractableAggSpec extends SparkSpec {
  import spark.implicits._
  import RetractableAgg._

  test("retracting the current max falls back to the remaining multiset") {
    val f = new RetractableMax
    var acc = f.createAccumulator()
    acc = f.accumulate(acc, 5.0)
    acc = f.accumulate(acc, 3.0)
    acc = f.accumulate(acc, 5.0)
    assert(f.getValue(acc).contains(5.0))
    acc = f.retract(acc, 5.0)
    assert(f.getValue(acc).contains(5.0), "one copy of 5.0 still live")
    acc = f.retract(acc, 5.0)
    assert(f.getValue(acc).contains(3.0), "max must fall back after full retraction")
    acc = f.retract(acc, 3.0)
    assert(f.getValue(acc).isEmpty, "empty multiset has no max")
  }

  test("merge tolerates a retraction arriving before its accumulation") {
    val f = new RetractableMax
    val left = f.retract(f.createAccumulator(), 7.0) // count goes -1
    val right = f.accumulate(f.accumulate(f.createAccumulator(), 7.0), 2.0)
    val merged = f.merge(left, right) // 7.0 cancels
    assert(f.getValue(merged).contains(2.0))
  }

  test("changelog aggregation nets out retracted rows in a DataFrame") {
    val changelog = Seq(
      (true, "a", 10.0), (true, "a", 4.0), (false, "a", 10.0), // 10 retracted
      (true, "b", 1.0), (true, "b", 2.0)
    ).toDF("accumulate", "k", "v")
    val out = changelog.groupBy($"k")
      .agg(
        retractableSum($"accumulate", $"v").as("s"),
        retractableCount($"accumulate", $"v").as("n"),
        retractableMax($"accumulate", $"v").as("mx"))
      .orderBy($"k")
      .as[(String, Double, Long, Option[Double])]
      .collect().toSeq
    assert(out == Seq(("a", 4.0, 1L, Some(4.0)), ("b", 3.0, 2L, Some(2.0))))
  }
}
