package graft.functions

import graft.SparkSpec
import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.functions._

/** Avro binary record serde: full-type roundtrip, wire compatibility
  * with the vanilla Avro library, and the SQL registration. */
class AvroSerdeSpec extends SparkSpec {
  import spark.implicits._

  private val fullSchema =
    """{"type":"record","name":"R","fields":[
      |  {"name":"id","type":"long"},
      |  {"name":"name","type":["null","string"],"default":null},
      |  {"name":"xs","type":{"type":"array","items":"long"}},
      |  {"name":"m","type":{"type":"map","values":"double"}},
      |  {"name":"payload","type":"bytes"},
      |  {"name":"inner","type":{"type":"record","name":"Inner","fields":[
      |    {"name":"a","type":"int"},
      |    {"name":"b","type":["null","double"],"default":null}]}}
      |]}""".stripMargin

  test("roundtrip covers nested records, arrays, maps, bytes and null unions") {
    val df = Seq(
      (1L, Some("alpha"), Seq(1L, 2L, 3L), Map("x" -> 1.5), "ab".getBytes("UTF-8"), (10, Some(2.5))),
      (2L, None, Seq.empty[Long], Map.empty[String, Double], Array.empty[Byte], (20, None: Option[Double]))
    ).toDF("id", "name", "xs", "m", "payload", "inner")

    val round = df
      .select(AvroSerde.to_avro_record(
        struct(col("id"), col("name"), col("xs"), col("m"), col("payload"),
          col("inner").cast("struct<a:int,b:double>")), fullSchema).as("avro"))
      .select(AvroSerde.from_avro_record(col("avro"), fullSchema).as("r"))
      .select(col("r.id"), col("r.name"), col("r.xs"), col("r.m"),
        col("r.payload"), col("r.inner.a"), col("r.inner.b"))
      .as[(Long, Option[String], Seq[Long], Map[String, Double], Array[Byte], Int, Option[Double])]
      .collect().sortBy(_._1)

    assert(round.map(_._1).toSeq == Seq(1L, 2L))
    assert(round(0)._2.contains("alpha") && round(1)._2.isEmpty)
    assert(round(0)._3 == Seq(1L, 2L, 3L) && round(1)._3.isEmpty)
    assert(round(0)._4 == Map("x" -> 1.5) && round(1)._4.isEmpty)
    assert(new String(round(0)._5, "UTF-8") == "ab" && round(1)._5.isEmpty)
    assert(round(0)._6 == 10 && round(0)._7.contains(2.5))
    assert(round(1)._6 == 20 && round(1)._7.isEmpty)
  }

  test("decodes bytes produced by the vanilla Avro library (wire compat)") {
    val json =
      """{"type":"record","name":"P","fields":[
        |  {"name":"id","type":"long"},
        |  {"name":"name","type":"string"}]}""".stripMargin
    val schema = new Schema.Parser().parse(json)
    val rec: GenericRecord = new GenericData.Record(schema)
    rec.put("id", 7L)
    rec.put("name", "seven")
    val baos = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(baos, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()

    val out = Seq(Tuple1(baos.toByteArray)).toDF("avro")
      .select(AvroSerde.from_avro_record(col("avro"), json).as("r"))
      .select(col("r.id"), col("r.name")).as[(Long, String)].collect()
    assert(out.toSeq == Seq((7L, "seven")))
  }

  test("SQL surface: from_avro_record/to_avro_record with literal schemas") {
    AvroSerde.register(spark)
    val json = """{"type":"record","name":"P","fields":[{"name":"id","type":"long"},{"name":"name","type":"string"}]}"""
    Seq((5L, "five")).toDF("id", "name").createOrReplaceTempView("graft_avro_in")
    val out = spark.sql(
      s"""SELECT from_avro_record(to_avro_record(struct(id, name), '$json'), '$json').name AS n
         |FROM graft_avro_in""".stripMargin).as[String].collect()
    assert(out.toSeq == Seq("five"))
  }
}
