package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container-file source/sink built directly on avro-core's
  * DataFile API (the first-party `spark-avro` module is not on this
  * classpath; the Avro RUNTIME — avro/avro-mapred, shipped with Spark
  * for its internal shuffle/serializer uses — is). Completes the
  * lake-format axis next to parquet scans and the CSV/JSONL/ORC
  * round-trips: Avro is the row-oriented interchange format of Kafka/
  * schema-registry pipelines, the usual LANDING format that a 100-TB
  * ingest compacts into parquet.
  *
  * Shape, deliberately Spark-parallel:
  *  - '''write''': one Avro Object Container File per input partition
  *    (`part-NNNNN.avro`), written executor-side through the Hadoop
  *    FileSystem resolved from the path — N partitions write N files
  *    concurrently, the same layout contract as every Spark file sink.
  *    Deflate-codec blocks with sync markers, so downstream readers can
  *    split on block boundaries. Filenames are keyed by partition id
  *    ONLY and created with overwrite=true: a retried task rewrites its
  *    own file idempotently (same rows — the input partition is
  *    deterministic) rather than leaking attempt-suffixed duplicates.
  *  - '''read''': list `part-*.avro`, one input partition per file,
  *    each decoded with DataFileReader over [[FsInput]] (seekable,
  *    any Hadoop filesystem). Avro files are self-describing: the
  *    schema rides in the container header, so the read costs zero
  *    inference passes; the caller may also pass the expected schema
  *    to get a declared-read contract (mismatch fails fast).
  *
  * Type coverage is the engine's nested-output surface: the scalar
  * primitives, struct (Avro record), and array — nullable fields map
  * to `union {null, T}`. Binary/map/decimal are out of declared scope
  * (the reference emits none; extend the two `toAvro`/`fromAvro`
  * matches to add them).
  *
  * Executor-side Hadoop conf is the default `new Configuration()`
  * (the ReportSink boundary, ReportSink.scala:181): correct for
  * file:// and default-configured HDFS; a cluster with custom FS conf
  * would thread a serialized conf through the closure instead.
  */
object AvroIO {

  // ---------------------------------------------------------------- schema

  /** StructType → Avro record schema. Record names must be unique in a
    * schema tree, so nested records are named by their field path.
    */
  def toAvroSchema(schema: StructType, name: String = "graft_row"): Schema = {
    val rec = Schema.createRecord(name, null, "graft.avro", false)
    rec.setFields(schema.fields.map { f =>
      new Schema.Field(f.name, fieldSchema(f.dataType, f.nullable, s"${name}_${f.name}"),
        null, null)
    }.toList.asJava)
    rec
  }

  private def fieldSchema(dt: DataType, nullable: Boolean, path: String): Schema = {
    val base = dt match {
      case LongType    => Schema.create(Schema.Type.LONG)
      case IntegerType => Schema.create(Schema.Type.INT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case StringType  => Schema.create(Schema.Type.STRING)
      case st: StructType => toAvroSchema(st, path)
      case ArrayType(et, containsNull) =>
        Schema.createArray(fieldSchema(et, containsNull, s"${path}_item"))
      case other =>
        throw new IllegalArgumentException(s"AvroIO: unsupported type $other at $path")
    }
    if (nullable) Schema.createUnion(Schema.create(Schema.Type.NULL), base) else base
  }

  /** Avro → Spark, for the self-describing read path. */
  def toSparkType(s: Schema): DataType = nonNull(s) match {
    case b if b.getType == Schema.Type.LONG    => LongType
    case b if b.getType == Schema.Type.INT     => IntegerType
    case b if b.getType == Schema.Type.DOUBLE  => DoubleType
    case b if b.getType == Schema.Type.FLOAT   => FloatType
    case b if b.getType == Schema.Type.BOOLEAN => BooleanType
    case b if b.getType == Schema.Type.STRING  => StringType
    case b if b.getType == Schema.Type.RECORD  => toStructType(b)
    case b if b.getType == Schema.Type.ARRAY =>
      ArrayType(toSparkType(b.getElementType), isNullable(b.getElementType))
    case other =>
      throw new IllegalArgumentException(s"AvroIO: unsupported Avro type $other")
  }

  def toStructType(record: Schema): StructType = StructType(
    nonNull(record).getFields.asScala.map(f =>
      StructField(f.name(), toSparkType(f.schema()), isNullable(f.schema()))).toSeq)

  private def nonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(s)
    else s

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION && s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  // ----------------------------------------------------------- value codec

  private def toAvro(v: Any, dt: DataType, schema: Schema): AnyRef = v match {
    case null => null
    case _ => dt match {
      case st: StructType => rowToRecord(v.asInstanceOf[Row], st, nonNull(schema))
      case ArrayType(et, _) =>
        val es = nonNull(schema).getElementType
        val items = v.asInstanceOf[scala.collection.Seq[Any]]
          .map(toAvro(_, et, es)).asJava
        new GenericData.Array[AnyRef](nonNull(schema), items)
      case _ => v.asInstanceOf[AnyRef] // scalar primitives box 1:1
    }
  }

  private def rowToRecord(row: Row, st: StructType, schema: Schema): GenericRecord = {
    val rec = new GenericData.Record(schema)
    st.fields.zipWithIndex.foreach { case (f, i) =>
      rec.put(f.name, toAvro(row.get(i), f.dataType, schema.getField(f.name).schema()))
    }
    rec
  }

  private def fromAvro(v: AnyRef, dt: DataType): Any = v match {
    case null => null
    case _ => dt match {
      case StringType => v.toString // Utf8 → String
      case st: StructType => recordToRow(v.asInstanceOf[GenericRecord], st)
      case ArrayType(et, _) =>
        v.asInstanceOf[java.util.Collection[AnyRef]].asScala.map(fromAvro(_, et)).toSeq
      case _ => v
    }
  }

  private def recordToRow(rec: GenericRecord, st: StructType): Row =
    Row.fromSeq(st.fields.map(f => fromAvro(rec.get(f.name), f.dataType)).toSeq)

  // ------------------------------------------------------------------- IO

  /** Write `df` as a directory of Avro container files, one per input
    * partition, deflate-compressed. Distributed: each partition's rows
    * never leave their executor.
    */
  def write(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val avroJson = toAvroSchema(sparkSchema).toString
    // clear prior contents (mode=overwrite semantics, matching the
    // roundtrip sinks' usage)
    val root = new Path(path)
    val fs = root.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    if (fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    df.rdd.foreachPartition { rows =>
      val pid = TaskContext.getPartitionId()
      val schema = new Schema.Parser().parse(avroJson)
      val out = new Path(path, f"part-$pid%05d.avro")
      val efs = out.getFileSystem(new Configuration())
      val stream = efs.create(out, true)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
      writer.create(schema, stream)
      try rows.foreach(r => writer.append(rowToRecord(r, sparkSchema, schema)))
      finally writer.close() // closes the stream
    }
    // Commit marker, AFTER the action returns (i.e. after every
    // partition's task succeeded): a failed/killed job leaves the dir
    // WITHOUT _SUCCESS and [[read]] refuses it — the same visibility
    // contract Spark's own file sinks give, without pretending the
    // per-file writes are transactional (they are idempotent per
    // partition instead; a retried task overwrites its own file).
    fs.create(new Path(root, "_SUCCESS"), true).close()
  }

  /** Read a directory written by [[write]] — self-describing (schema
    * from the first file's container header), one input partition per
    * file. Passing `expected` declares the schema instead: the header
    * schema must convert to exactly it (fail-fast, no silent coercion).
    */
  def read(spark: SparkSession, path: String,
      expected: Option[StructType] = None): DataFrame = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    require(fs.exists(new Path(root, "_SUCCESS")),
      s"$path has no _SUCCESS marker — uncommitted or partial Avro output " +
        "(the write failed or is still in flight); refusing to read it")
    val files = fs.listStatus(root).map(_.getPath)
      .filter(p => p.getName.startsWith("part-") && p.getName.endsWith(".avro"))
      .map(_.toString).sorted
    require(files.nonEmpty, s"no Avro part files under $path")
    val headerSchema = {
      val in = new FsInput(new Path(files.head), spark.sessionState.newHadoopConf())
      val r = new DataFileReader[GenericRecord](in, new GenericDatumReader[GenericRecord]())
      try toStructType(r.getSchema) finally r.close()
    }
    val sparkSchema = expected match {
      case Some(st) =>
        require(headerSchema == st,
          s"declared schema mismatch: file carries $headerSchema, declared $st")
        st
      case None => headerSchema
    }
    val rowsRdd = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap { file =>
        val st = sparkSchema
        val in = new FsInput(new Path(file), new Configuration())
        val reader = new DataFileReader[GenericRecord](
          in, new GenericDatumReader[GenericRecord]())
        // DataFileReader is an iterator; drain eagerly-per-block via the
        // iterator contract (flatMap streams it, closing on exhaustion)
        new Iterator[Row] {
          override def hasNext: Boolean = {
            val h = reader.hasNext
            if (!h) reader.close()
            h
          }
          override def next(): Row = recordToRow(reader.next(), st)
        }
      }
    spark.createDataFrame(rowsRdd, sparkSchema)
  }
}
