package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Loader-level guard for the events.ts dtype drift: the driver's
  * testdata has shipped ts as TIMESTAMP(NANOS), naive µs
  * (TIMESTAMP_NTZ), and plain µs TimestampType across generations.
  * Tables.t must hand every downstream operator ONE type —
  * TimestampType, µs, UTC — whatever generation is on disk.
  * (The NTZ flip silently broke 11 streaming/CEP queries in round 7;
  * this spec pins the normalization.)
  */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(dir: String, ntz: Boolean): Unit = {
    val df = Seq((1L, "2024-03-01 10:00:00", 7L, "click", 1.5, "{}"),
        (2L, "2024-03-01 11:30:00", 8L, "purchase", 2.5, "{}"))
      .toDF("event_id", "s", "user_id", "event_type", "value", "props")
      .withColumn("ts",
        if (ntz) col("s").cast(TimestampNTZType) else col("s").cast(TimestampType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("Tables.t normalizes NTZ and µs events.ts to the same UTC TimestampType") {
    val ntzDir = java.nio.file.Files.createTempDirectory("graft_ev_ntz").toString
    val usDir = java.nio.file.Files.createTempDirectory("graft_ev_us").toString
    writeEvents(ntzDir, ntz = true)
    writeEvents(usDir, ntz = false)
    val a = Tables.t(spark, ntzDir, "events")
    val b = Tables.t(spark, usDir, "events")
    assert(a.schema("ts").dataType == TimestampType, "NTZ generation must normalize")
    assert(b.schema("ts").dataType == TimestampType, "µs generation must pass through")
    val va = a.select(col("event_id"), unix_micros(col("ts"))).as[(Long, Long)].collect().toMap
    val vb = b.select(col("event_id"), unix_micros(col("ts"))).as[(Long, Long)].collect().toMap
    assert(va == vb, "both generations must yield identical UTC instants")
  }

  test("the real testdata events load as TimestampType at every sf") {
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val t = Tables.t(spark, s"/root/testdata/sf$sf", "events")
      assert(t.schema("ts").dataType == TimestampType, s"sf$sf")
    }
  }
}
