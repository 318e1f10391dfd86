package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.generic.{GenericData, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.{AvroJob, AvroKeyInputFormat, AvroKeyOutputFormat}
import org.apache.hadoop.io.NullWritable
import org.apache.hadoop.mapreduce.Job
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink for flat primitive schemas, built
  * directly on avro-core + avro-mapred (this distribution ships no
  * spark-avro module, and the format is too common an interchange to
  * leave uncovered — it's the classic Kafka-archive / Hive-era ingest
  * format).
  *
  * Scale shape: the write is `saveAsNewAPIHadoopFile` with
  * [[AvroKeyOutputFormat]] (one container file per partition, written
  * executor-side — no driver funnel) and the read is
  * `newAPIHadoopFile` with [[AvroKeyInputFormat]]; Avro container
  * files carry sync markers, so the input format SPLITS them — reader
  * parallelism survives big files, the property CSV-with-newlines
  * loses. Records are converted to immutable Rows inside the same map
  * step because Hadoop record readers REUSE the AvroKey instance —
  * buffering raw keys would alias every row to the last record read.
  *
  * Column types cover the engine's flat tables (long/int/double/
  * float/string/boolean/binary, nullable via Avro unions). Nested
  * arrays/structs would extend `toAvro`/`toRow` the same way; the
  * declared-query face ([[SourceQueries.avroDocStats]]) needs exactly
  * the documents shape.
  */
object AvroFormat {

  /** Avro record schema mirroring a flat StructType: every field an
    * ["null", primitive] union, so null round-trips losslessly. */
  def avroSchemaFor(st: StructType, name: String): Schema = {
    val fields = st.fields.foldLeft(
      SchemaBuilder.record(name).namespace("graft").fields()) { (b, f) =>
      val fb = b.name(f.name).`type`()
      f.dataType match {
        case LongType => fb.optional().longType()
        case IntegerType => fb.optional().intType()
        case DoubleType => fb.optional().doubleType()
        case FloatType => fb.optional().floatType()
        case StringType => fb.optional().stringType()
        case BooleanType => fb.optional().booleanType()
        case BinaryType => fb.optional().bytesType()
        case other =>
          throw new IllegalArgumentException(
            s"AvroFormat: unsupported column type $other for field ${f.name}")
      }
    }
    fields.endRecord()
  }

  private def toAvro(row: Row, i: Int, dt: DataType): AnyRef = dt match {
    case _ if row.isNullAt(i) => null
    case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
    case _ => row.get(i).asInstanceOf[AnyRef]
  }

  private def toRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.map { f =>
      val v = rec.get(f.name)
      (v, f.dataType) match {
        case (null, _) => null
        // Avro strings arrive as Utf8 (a mutable view) and bytes as a
        // ByteBuffer — copy both out to immutable JVM values
        case (s, StringType) => s.toString
        case (b: java.nio.ByteBuffer, BinaryType) =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case (x, _) => x
      }
    }.toSeq)

  /** Write one Avro container file per partition via the Hadoop
    * committer (executor-side, crash-safe, no driver funnel). The
    * target must not exist — Hadoop output-format semantics. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val st = df.schema
    val schemaJson = avroSchemaFor(st, "row").toString
    val job = Job.getInstance(df.sparkSession.sparkContext.hadoopConfiguration)
    AvroJob.setOutputKeySchema(job, new Schema.Parser().parse(schemaJson))
    df.rdd.mapPartitions { it =>
      // Schema is parsed per partition from JSON: cheaper than making
      // the task closure drag a Schema through serialization
      val schema = new Schema.Parser().parse(schemaJson)
      it.map { row =>
        val rec = new GenericData.Record(schema)
        st.fields.zipWithIndex.foreach { case (f, i) =>
          rec.put(f.name, toAvro(row, i, f.dataType))
        }
        (new AvroKey[GenericRecord](rec), NullWritable.get())
      }
    }.saveAsNewAPIHadoopFile(
      path,
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      classOf[AvroKeyOutputFormat[GenericRecord]],
      job.getConfiguration)
  }

  /** Read a directory of Avro container files with an explicit target
    * schema (reader-schema projection is Avro's own evolution
    * mechanism; inference would re-open a file on the driver). */
  def readAvro(spark: SparkSession, path: String, st: StructType): DataFrame = {
    val job = Job.getInstance(spark.sparkContext.hadoopConfiguration)
    AvroJob.setInputKeySchema(job, avroSchemaFor(st, "row"))
    val stLocal = st
    val rows = spark.sparkContext.newAPIHadoopFile(
        path,
        classOf[AvroKeyInputFormat[GenericRecord]],
        classOf[AvroKey[GenericRecord]],
        classOf[NullWritable],
        job.getConfiguration)
      .map { case (k, _) => toRow(k.datum(), stLocal) }
    spark.createDataFrame(rows, st)
  }
}
