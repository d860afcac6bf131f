package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericFixed, GenericRecord}
import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro record serde — the reference's AvroRowSerializationSchema /
  * AvroRowDeserializationSchema (flink-formats/flink-avro/src/main/
  * java/org/apache/flink/formats/avro/AvroRowDeserializationSchema
  * .java): encode a row to Avro binary against a writer schema and
  * back. The spark-avro datasource jar is absent in this environment,
  * so the serde rides the core avro jar (present in the Spark
  * distribution) as two Catalyst expressions — codegen'd through a
  * shared reference object, one virtual call per row, with the serde
  * cost itself dominating.
  *
  * Supported schema surface (the reference's basic-type matrix):
  * record (nested too), ["null", T] unions, string, enum (as string),
  * int, long, float, double, boolean, bytes, fixed, array, map.
  * Logical types (decimal/timestamp) are out of scope — encode them
  * as long/bytes fields upstream.
  */
object AvroSerde {

  // ---- Avro schema → Spark type ---------------------------------------

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** The single non-null branch of a ["null", T] union; identity
    * otherwise. General (multi-type) unions are rejected up front. */
  private def resolve(s: Schema): Schema =
    if (s.getType != Schema.Type.UNION) s
    else {
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1,
        s"only [\"null\", T] unions are supported, got $s")
      nonNull.head
    }

  def sparkType(s0: Schema): DataType = {
    val s = resolve(s0)
    s.getType match {
      case Schema.Type.STRING | Schema.Type.ENUM => StringType
      case Schema.Type.INT => IntegerType
      case Schema.Type.LONG => LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
      case Schema.Type.ARRAY =>
        ArrayType(sparkType(s.getElementType), isNullable(s.getElementType))
      case Schema.Type.MAP =>
        MapType(StringType, sparkType(s.getValueType), isNullable(s.getValueType))
      case Schema.Type.RECORD =>
        StructType(s.getFields.asScala.toSeq.map(f =>
          StructField(f.name, sparkType(f.schema), isNullable(f.schema))))
      case t => throw new IllegalArgumentException(s"unsupported Avro type $t")
    }
  }

  // ---- value conversion ------------------------------------------------

  private def toCatalyst(v: Any, s0: Schema): Any =
    if (v == null) null
    else {
      val s = resolve(s0)
      s.getType match {
        case Schema.Type.STRING | Schema.Type.ENUM => UTF8String.fromString(v.toString)
        case Schema.Type.INT | Schema.Type.LONG | Schema.Type.FLOAT |
            Schema.Type.DOUBLE | Schema.Type.BOOLEAN => v
        case Schema.Type.BYTES =>
          val bb = v.asInstanceOf[ByteBuffer]
          val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
        case Schema.Type.FIXED => v.asInstanceOf[GenericFixed].bytes().clone()
        case Schema.Type.ARRAY =>
          new GenericArrayData(v.asInstanceOf[java.util.Collection[Any]].asScala
            .map(toCatalyst(_, s.getElementType)).toArray)
        case Schema.Type.MAP =>
          val m = v.asInstanceOf[java.util.Map[Any, Any]].asScala.toSeq
          new ArrayBasedMapData(
            new GenericArrayData(m.map(kv => UTF8String.fromString(kv._1.toString)).toArray[Any]),
            new GenericArrayData(m.map(kv => toCatalyst(kv._2, s.getValueType)).toArray[Any]))
        case Schema.Type.RECORD =>
          val rec = v.asInstanceOf[GenericRecord]
          val fields = s.getFields.asScala
          val row = new Array[Any](fields.size)
          fields.zipWithIndex.foreach { case (f, i) =>
            row(i) = toCatalyst(rec.get(f.pos), f.schema)
          }
          new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(row)
      }
    }

  private def toAvro(v: Any, s0: Schema, dt: DataType): Any =
    if (v == null) null
    else {
      val s = resolve(s0)
      (s.getType, dt) match {
        case (Schema.Type.STRING, StringType) => v.toString
        case (Schema.Type.ENUM, StringType) => new GenericData.EnumSymbol(s, v.toString)
        case (Schema.Type.INT, IntegerType) | (Schema.Type.LONG, LongType) |
            (Schema.Type.FLOAT, FloatType) | (Schema.Type.DOUBLE, DoubleType) |
            (Schema.Type.BOOLEAN, BooleanType) => v
        // the Avro-spec widening promotions (writer side)
        case (Schema.Type.LONG, IntegerType) => v.asInstanceOf[Int].toLong
        case (Schema.Type.DOUBLE, IntegerType) => v.asInstanceOf[Int].toDouble
        case (Schema.Type.DOUBLE, LongType) => v.asInstanceOf[Long].toDouble
        case (Schema.Type.DOUBLE, FloatType) => v.asInstanceOf[Float].toDouble
        case (Schema.Type.BYTES, BinaryType) => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
        case (Schema.Type.FIXED, BinaryType) =>
          new GenericData.Fixed(s, v.asInstanceOf[Array[Byte]])
        case (Schema.Type.ARRAY, ArrayType(et, _)) =>
          val in = v.asInstanceOf[ArrayData]
          val out = new java.util.ArrayList[Any](in.numElements())
          in.foreach(et, (_, e) => out.add(toAvro(e, s.getElementType, et)))
          out
        case (Schema.Type.MAP, MapType(StringType, vt, _)) =>
          val in = v.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
          val out = new java.util.HashMap[String, Any](in.numElements())
          val ks = in.keyArray(); val vs = in.valueArray()
          var i = 0
          while (i < in.numElements()) {
            out.put(ks.getUTF8String(i).toString, toAvro(vs.get(i, vt), s.getValueType, vt))
            i += 1
          }
          out
        case (Schema.Type.RECORD, st: StructType) =>
          val row = v.asInstanceOf[InternalRow]
          val rec = new GenericData.Record(s)
          val fields = s.getFields.asScala
          fields.zipWithIndex.foreach { case (f, i) =>
            rec.put(f.pos, toAvro(row.get(i, st(i).dataType), f.schema, st(i).dataType))
          }
          rec
        case (at, sdt) => throw new IllegalArgumentException(
          s"Avro $at does not accept Spark $sdt")
      }
    }

  // ---- per-row serde (shared across task threads → ThreadLocal IO) -----

  final class RecordSerde(schemaJson: String, rowType: StructType) extends Serializable {
    @transient private lazy val schema = new Schema.Parser().parse(schemaJson)
    // GenericDatumReader/Writer are thread-safe per read/write call
    @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
    @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
    @transient private lazy val buffers = ThreadLocal.withInitial[ByteArrayOutputStream](
      () => new ByteArrayOutputStream(256))

    def encode(row: InternalRow): Array[Byte] = {
      val rec = toAvro(row, schema, rowType).asInstanceOf[GenericRecord]
      val baos = buffers.get(); baos.reset()
      val enc = org.apache.avro.io.EncoderFactory.get().directBinaryEncoder(baos, null)
      writer.write(rec, enc)
      enc.flush()
      baos.toByteArray
    }

    def decode(bytes: Array[Byte]): InternalRow = {
      val dec = org.apache.avro.io.DecoderFactory.get().binaryDecoder(bytes, null)
      toCatalyst(reader.read(null, dec), schema).asInstanceOf[InternalRow]
    }
  }

  // ---- expressions -----------------------------------------------------

  case class ToAvroRecord(child: Expression, schemaJson: String) extends UnaryExpression {
    override def dataType: DataType = BinaryType
    // input check must wait for analysis — child.dataType throws on an
    // unresolved child at construction time
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType.isInstanceOf[StructType])
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"to_avro_record expects a struct, got ${child.dataType}")
    @transient private lazy val serde =
      new RecordSerde(schemaJson, child.dataType.asInstanceOf[StructType])

    override protected def nullSafeEval(in: Any): Any =
      serde.encode(in.asInstanceOf[InternalRow])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("avroSerde", serde, classOf[RecordSerde].getName)
      nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.encode($in);")
    }
    override protected def withNewChildInternal(newChild: Expression): ToAvroRecord =
      copy(child = newChild)
    override def prettyName: String = "to_avro_record"
  }

  case class FromAvroRecord(child: Expression, schemaJson: String) extends UnaryExpression {
    @transient private lazy val parsed = new Schema.Parser().parse(schemaJson)
    override def dataType: DataType = sparkType(parsed)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == BinaryType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"from_avro_record expects binary, got ${child.dataType}")
    @transient private lazy val serde =
      new RecordSerde(schemaJson, dataType.asInstanceOf[StructType])

    override protected def nullSafeEval(in: Any): Any =
      serde.decode(in.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("avroSerde", serde, classOf[RecordSerde].getName)
      nullSafeCodeGen(ctx, ev, in => s"${ev.value} = $ref.decode($in);")
    }
    override protected def withNewChildInternal(newChild: Expression): FromAvroRecord =
      copy(child = newChild)
    override def prettyName: String = "from_avro_record"
  }

  // ---- column + SQL surface --------------------------------------------

  import org.apache.spark.sql.graftbridge.Bridge

  def to_avro_record(c: Column, schemaJson: String): Column =
    Bridge.column(ToAvroRecord(Bridge.expression(c), schemaJson))

  def from_avro_record(c: Column, schemaJson: String): Column =
    Bridge.column(FromAvroRecord(Bridge.expression(c), schemaJson))

  /** SQL registration: `from_avro_record(bytes, '<schema json>')` /
    * `to_avro_record(struct, '<schema json>')` with a foldable schema
    * literal, mirroring the reference's format-descriptor string. */
  def register(spark: SparkSession): Unit = {
    def lit1(e: Expression, fn: String): String = {
      require(e.foldable, s"$fn: the schema argument must be a string literal")
      e.eval().toString
    }
    Bridge.registerFunction(spark, "from_avro_record", { exprs =>
      require(exprs.length == 2, "from_avro_record(bytes, 'schema json')")
      FromAvroRecord(exprs.head, lit1(exprs(1), "from_avro_record"))
    })
    Bridge.registerFunction(spark, "to_avro_record", { exprs =>
      require(exprs.length == 2, "to_avro_record(struct, 'schema json')")
      ToAvroRecord(exprs.head, lit1(exprs(1), "to_avro_record"))
    })
  }
}
