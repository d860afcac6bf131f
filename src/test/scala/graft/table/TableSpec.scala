package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fluent Table-API veneer: the reference table.scala methods beyond
  * what q80 exercises (outer joins, multiset set ops, column ops). */
class TableSpec extends SparkSpec {
  import spark.implicits._

  private def t(rows: (Int, String)*) = Table(rows.toDF("id", "name"))

  test("right/full outer joins keep the unmatched side") {
    val l = Table(Seq((1, "a"), (2, "b")).toDF("lid", "ln"))
    val r = Table(Seq((2, "x"), (3, "y")).toDF("rid", "rn"))
    assert(l.rightOuterJoin(r, "lid = rid").toDF.count() == 2)
    val full = l.fullOuterJoin(r, "lid = rid")
      .select("coalesce(lid, rid) AS id").toDF.as[Int].collect().sorted
    assert(full.toSeq == Seq(1, 2, 3))
  }

  test("intersectAll/minusAll keep multiset multiplicity; distinct collapses") {
    val a = Table(Seq(1, 1, 2, 2, 3).toDF("v"))
    val b = Table(Seq(1, 2, 2).toDF("v"))
    assert(a.intersectAll(b).toDF.count() == 3) // 1,2,2
    assert(a.minusAll(b).toDF.count() == 2)     // 1,3
    assert(a.distinct.toDF.count() == 3)
  }

  test("addColumns / renameColumns / dropColumns") {
    val out = t((1, "a"), (2, "b"))
      .addColumns("id * 10 AS big, upper(name) AS up")
      .renameColumns("name AS label")
      .dropColumns("up")
      .toDF
    assert(out.columns.toSeq == Seq("id", "label", "big"))
    assert(out.where(col("id") === 2).select("big").as[Int].head() == 20)
    val e = intercept[IllegalArgumentException] {
      t((1, "a")).addColumns("id + 1") // no alias
    }
    assert(e.getMessage.contains("AS"))
  }

  test("createTemporalTableFunction + joinLateralAsOf resolve AS OF versions") {
    // rates for key 7: 1.0 @10s, 2.0 @30s; probes at 5s/20s/40s →
    // no version / 1.0 / 2.0 (batch frames run the same state op)
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val rates = Table(Seq((7L, ts(10), 1L, 1.0), (7L, ts(30), 2L, 2.0))
      .toDF("cur", "rtime", "rseq", "rate"))
      .createTemporalTableFunction("rtime", "cur", seqColumn = "rseq")
    assert(rates.payload == "rate")
    val out = Table(Seq((7L, ts(5), 100L), (7L, ts(20), 101L), (7L, ts(40), 102L))
      .toDF("cur", "ptime", "oid"))
      .joinLateralAsOf(rates, "ptime", "cur", "oid", "0 seconds")
      .toDF.as[(Long, Double)].collect().toMap
    assert(out == Map(101L -> 1.0, 102L -> 2.0))
  }

  test("createTemporalTableFunction rejects multi-column payloads") {
    val e = intercept[IllegalArgumentException] {
      Table(Seq((7L, 1L, 1.0, "x")).toDF("k", "t", "v", "extra"))
        .createTemporalTableFunction("t", "k")
    }
    assert(e.getMessage.contains("one payload column"))
  }
}
