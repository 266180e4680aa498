package graft.core

import scala.jdk.CollectionConverters._

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{CodecFactory, DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Avro Object Container File interchange — the row-oriented sibling
  * of [[OrcTable]]: Kafka/schema-registry estates hand corpora around
  * as Avro, and this engine must read and write them without a
  * parquet detour. Spark 4 does not bundle the spark-avro DataSource,
  * but avro core is ALREADY a Spark dependency (the jar ships in
  * every distribution), so this table speaks the container format
  * directly through the public avro-java API in one narrow
  * per-partition pass each way — the [[TarTable]]/[[ZipTable]]
  * discipline, with the schema translated from the DataFrame's own
  * StructType (long/int/double/string/boolean/binary and
  * array&lt;float&gt;/array&lt;double&gt;/array&lt;long&gt; — the corpus
  * interchange surface).
  *
  * Scale notes: one .avro container per partition (writer-side
  * parallelism = partition count); readers parallelize per FILE
  * (container blocks after a deflate codec are not split here — size
  * shards like gzip JSONL, the documented q122 trade); deflate-6
  * blocks keep text corpora compact. Lossless round-trip of both the
  * documents and embeddings tables is oracled by q243 against the
  * untouched parquet sources (q131's checksums).
  */
object AvroTable {

  /** StructType → Avro record schema (nullable unions with null). */
  private[core] def avroSchema(st: StructType, name: String): Schema = {
    var fields = SchemaBuilder.record(name).namespace("graft").fields()
    st.fields.foreach { f =>
      def base(dt: DataType): Schema = dt match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case BinaryType => Schema.create(Schema.Type.BYTES)
        case ArrayType(et, _) => Schema.createArray(base(et))
        case other => throw new IllegalArgumentException(
          s"unsupported avro interchange type: ${other.simpleString}")
      }
      fields =
        if (f.nullable)
          fields.name(f.name).`type`(Schema.createUnion(java.util.List.of(
            Schema.create(Schema.Type.NULL), base(f.dataType))))
            .withDefault(null)
        else fields.name(f.name).`type`(base(f.dataType)).noDefault()
    }
    fields.endRecord()
  }

  /** Write `df` as one Avro container per partition (deflate-6). */
  def write(df: DataFrame, path: String): Unit = {
    val out = new Path(path)
    val fs = out.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    fs.delete(out, true)
    fs.mkdirs(out)
    val st = df.schema
    val schemaJson = avroSchema(st, "GraftRecord").toString
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val pid = TaskContext.getPartitionId()
        val part = new Path(out, f"part-$pid%05d.avro")
        val efs = part.getFileSystem(new Configuration())
        val os = efs.create(part, true)
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](schema))
        w.setCodec(CodecFactory.deflateCodec(6))
        w.create(schema, os)
        try rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          st.fields.zipWithIndex.foreach { case (f, i) =>
            val v = r.get(i)
            val av: AnyRef = (v, f.dataType) match {
              case (null, _) => null
              // collection.Seq, not Seq: Row.get hands back a MUTABLE
              // ArraySeq, which is not scala.Seq in 2.13
              case (s: scala.collection.Seq[_], ArrayType(_, _)) =>
                new java.util.ArrayList[AnyRef](
                  s.map(_.asInstanceOf[AnyRef]).asJava)
              case (b: Array[Byte], BinaryType) =>
                java.nio.ByteBuffer.wrap(b)
              case (x, _) => x.asInstanceOf[AnyRef]
            }
            rec.put(f.name, av)
          }
          w.append(rec)
        } finally w.close()
      }
    }
  }

  /** Read every .avro container under `path` into rows of `schema`
    * (the [[OrcTable]] explicit-schema discipline — the reader pins
    * the expected shape; drifted containers fail loudly).
    */
  def read(spark: SparkSession, path: String,
      schema: StructType): DataFrame = {
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro").load(path)
      .select(col("content"))
    val enc = Encoders.row(schema)
    files.mapPartitions { rows =>
      rows.flatMap { r =>
        val in = new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](0))
        val rd = new DataFileStream[GenericRecord](in,
          new GenericDatumReader[GenericRecord]())
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        try while (rd.hasNext) {
          val rec = rd.next()
          out += Row.fromSeq(schema.fields.toSeq.map { f =>
            def conv(v: AnyRef, dt: DataType): Any = (v, dt) match {
              case (null, _) => null
              case (u: org.apache.avro.util.Utf8, StringType) => u.toString
              case (s: CharSequence, StringType) => s.toString
              case (bb: java.nio.ByteBuffer, BinaryType) =>
                val a = new Array[Byte](bb.remaining()); bb.get(a); a
              case (l: java.util.Collection[_], ArrayType(et, _)) =>
                l.asScala.toSeq.map(e => conv(e.asInstanceOf[AnyRef], et))
              case (x, _) => x
            }
            conv(rec.get(f.name), f.dataType)
          })
        } finally rd.close()
        out.iterator
      }
    }(enc)
  }

  /** Write `df` as Avro and read it back under the same schema — the
    * lossless-interchange primitive q243 oracles.
    */
  def roundTrip(df: DataFrame, path: String): DataFrame = {
    write(df, path)
    read(df.sparkSession, path, df.schema)
  }
}
