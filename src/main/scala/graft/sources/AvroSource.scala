package graft.sources

import org.apache.avro.generic.GenericRecord
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file ingest built directly on the bundled
  * `avro-mapred` input format — this distribution ships Avro's Java
  * core but NOT the `spark-avro` DataSource module, so the engine
  * provides the reader itself: an `AvroKeyInputFormat` Hadoop RDD
  * (container blocks split like any Hadoop input — parallel, 100 TB
  * path identical to every other file source) converted to rows
  * against a DECLARED Spark schema, same contract as the CSV/JSON/ORC
  * readers (no inference pass).
  *
  * Field resolution is by name against each record's writer schema;
  * missing fields surface as null (schema evolution's add-a-column
  * case) and a null in a non-nullable target field fails loudly.
  * Values are copied out of Avro's reused record objects inside the
  * input partition (Utf8 → String, ByteBuffer → fresh Array[Byte])
  * before anything crosses a stage boundary.
  *
  * Supported Avro types: the primitives (boolean, int, long, float,
  * double, string, bytes) plus `[null, T]` unions — the wire shapes a
  * Kafka-style ingest actually produces for flat records. Nested
  * records/arrays/maps are rejected explicitly rather than silently
  * mangled.
  */
object AvroSource {

  /** Read Avro container files at `path` as a DataFrame with the
    * declared `schema`.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val fields = schema.fields // serializable (StructType is)
    val rows = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable])
      .map { case (k, _) =>
        val rec = k.datum()
        val vals = new Array[Any](fields.length)
        var i = 0
        while (i < fields.length) {
          val f = fields(i)
          val has = rec.getSchema.getField(f.name) != null
          val v = if (has) convert(rec.get(f.name), f.dataType, f.name)
                  else null
          if (v == null && !f.nullable)
            throw new IllegalArgumentException(
              s"Avro record is missing non-nullable field '${f.name}' " +
                s"(writer schema: ${rec.getSchema.getFullName})")
          vals(i) = v
          i += 1
        }
        Row.fromSeq(vals.toIndexedSeq)
      }
    spark.createDataFrame(rows, schema)
  }

  /** Copy one Avro value into the Spark-external representation of
    * `dt`, widening integrals/floats where the declared schema asks
    * for it.
    */
  private def convert(v: Any, dt: DataType, name: String): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => convert(u.toString, dt, name)
    case s: String =>
      dt match {
        case StringType => s
        case other => mismatch(name, "string", other)
      }
    case i: java.lang.Integer =>
      dt match {
        case IntegerType => i
        case LongType    => java.lang.Long.valueOf(i.longValue())
        case other       => mismatch(name, "int", other)
      }
    case l: java.lang.Long =>
      dt match {
        case LongType => l
        case other    => mismatch(name, "long", other)
      }
    case f: java.lang.Float =>
      dt match {
        case FloatType  => f
        case DoubleType => java.lang.Double.valueOf(f.doubleValue())
        case other      => mismatch(name, "float", other)
      }
    case d: java.lang.Double =>
      dt match {
        case DoubleType => d
        case other      => mismatch(name, "double", other)
      }
    case b: java.lang.Boolean =>
      dt match {
        case BooleanType => b
        case other       => mismatch(name, "boolean", other)
      }
    case bb: java.nio.ByteBuffer =>
      dt match {
        case BinaryType =>
          val out = new Array[Byte](bb.remaining())
          bb.duplicate().get(out)
          out
        case other => mismatch(name, "bytes", other)
      }
    case other =>
      throw new IllegalArgumentException(
        s"Avro field '$name': unsupported Avro value type " +
          s"${other.getClass.getName} — this reader ingests flat " +
          "primitive records (nested records/arrays/maps are out of " +
          "its contract)")
  }

  private def mismatch(name: String, avro: String, spark: DataType): Nothing =
    throw new IllegalArgumentException(
      s"Avro field '$name': writer type $avro does not fit declared " +
        s"Spark type ${spark.simpleString}")
}
