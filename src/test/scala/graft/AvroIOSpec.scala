package graft

import java.nio.file.Files

import graft.sources.AvroIO
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Avro container-file source/sink (q_avro_roundtrip): nested struct +
  * array + nullable fields survive the write/read byte-exactly, the
  * container header makes the read self-describing, the layout is one
  * valid Object Container File per input partition, and a declared-
  * schema read fails fast on mismatch.
  */
class AvroIOSpec extends AnyFunSuite with SharedSpark {

  private val nestedSchema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("lang", StringType),
      StructField("score", DoubleType))), nullable = true),
    StructField("toks", ArrayType(StringType, containsNull = false), nullable = true),
    StructField("n", LongType, nullable = true)))

  private def nestedDf = {
    val rows = Seq(
      Row(1L, Row("en", 0.5), Seq("a", "b"), 10L),
      Row(2L, Row("de", null), Seq.empty[String], null), // null inside struct + null long
      Row(3L, null, null, 7L)) // null struct, null array
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), nestedSchema)
  }

  test("nested struct/array/null round-trip is value-exact") {
    val dir = Files.createTempDirectory("graft_avro_rt").toString
    AvroIO.write(nestedDf, dir)
    val back = AvroIO.read(spark, dir)
    assert(back.schema == nestedSchema, s"self-described schema drifted: ${back.schema}")
    assert(back.collect().toSet == nestedDf.collect().toSet)
  }

  test("one valid container file per input partition (Obj magic + avro.schema header)") {
    val dir = Files.createTempDirectory("graft_avro_parts").toString
    AvroIO.write(nestedDf, dir) // 2 partitions
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    assert(parts.length == 2, s"expected one file per partition: ${parts.toSeq}")
    parts.foreach { f =>
      val head = Files.readAllBytes(f.toPath).take(4)
      assert(head.sameElements(Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte)),
        s"${f.getName} is not an Avro Object Container File")
    }
  }

  test("declared-schema read accepts the exact schema and rejects a drifted one") {
    val dir = Files.createTempDirectory("graft_avro_decl").toString
    AvroIO.write(nestedDf, dir)
    assert(AvroIO.read(spark, dir, Some(nestedSchema)).count() == 3)
    val drifted = StructType(nestedSchema.fields.map {
      case f if f.name == "n" => f.copy(dataType = DoubleType)
      case f => f
    })
    val e = intercept[IllegalArgumentException](
      AvroIO.read(spark, dir, Some(drifted)).count())
    assert(e.getMessage.contains("schema mismatch"))
  }

  test("read refuses a dir without the _SUCCESS commit marker (partial output)") {
    val dir = Files.createTempDirectory("graft_avro_partial").toString
    AvroIO.write(nestedDf, dir)
    Files.delete(java.nio.file.Paths.get(dir, "_SUCCESS")) // simulate a crashed job
    val e = intercept[IllegalArgumentException](AvroIO.read(spark, dir))
    assert(e.getMessage.contains("_SUCCESS"))
  }

  test("concurrent attempts of one partition: one committed file, byte-identical read-back") {
    val dir = Files.createTempDirectory("graft_avro_spec").toString
    val rowsData = Seq(Row(1L, Row("en", 0.5), Seq("a", "b"), 10L),
      Row(2L, Row("de", 0.1), Seq("c"), 4L))
    val avroJson = AvroIO.toAvroSchema(nestedSchema).toString
    val conf = spark.sessionState.newHadoopConf()
    // two SIMULTANEOUS attempts of partition 0 (speculation / a zombie
    // racing the winner) — each must stage privately and publish a
    // complete copy, never interleave
    val attempts = Seq(7L, 8L).map { att =>
      new Thread(() => AvroIO.writePartitionAttempt(
        rowsData.iterator, nestedSchema, avroJson, dir, 0, att, conf))
    }
    attempts.foreach(_.start()); attempts.foreach(_.join())
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.count(_ == "part-00000.avro") == 1, files.mkString(","))
    assert(!files.exists(_.endsWith(".avro.tmp")),
      s"staging residue: ${files.mkString(",")}")
    // the committed file is one attempt's COMPLETE copy: valid container
    // magic and exactly the partition's rows
    val head = Files.readAllBytes(
      java.nio.file.Paths.get(dir, "part-00000.avro")).take(4)
    assert(head.sameElements(Array('O'.toByte, 'b'.toByte, 'j'.toByte, 1.toByte)))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(conf)
    fs.create(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"), true).close()
    assert(AvroIO.read(spark, dir).collect().toSet ==
      spark.createDataFrame(spark.sparkContext.parallelize(rowsData, 1),
        nestedSchema).collect().toSet)
  }

  test("write leaves no staging residue; a late zombie's stray staging file is invisible to read") {
    val dir = Files.createTempDirectory("graft_avro_resid").toString
    AvroIO.write(nestedDf, dir)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.endsWith(".avro.tmp")), names.mkString(","))
    // a zombie attempt re-staging AFTER job commit: readers never match
    // *.avro.tmp, so the committed dataset is unaffected
    Files.write(java.nio.file.Paths.get(dir, "part-00000-attempt-99.avro.tmp"),
      "ZOMBIE".getBytes("UTF-8"))
    assert(AvroIO.read(spark, dir).collect().toSet == nestedDf.collect().toSet)
  }

  test("early-terminated read (limit 1 over a multi-file dir) closes every opened reader") {
    val dir = Files.createTempDirectory("graft_avro_leak").toString
    AvroIO.write(nestedDf.repartition(3), dir)
    val opened = new java.util.concurrent.atomic.AtomicInteger(0)
    val closed = new java.util.concurrent.atomic.AtomicInteger(0)
    AvroIO.ReadHooks.onOpen = _ => { opened.incrementAndGet(); () }
    AvroIO.ReadHooks.onClose = _ => { closed.incrementAndGet(); () }
    try {
      assert(AvroIO.read(spark, dir).limit(1).collect().length == 1)
      assert(opened.get() > 0, "limit(1) should still open at least one file")
      assert(closed.get() == opened.get(),
        s"leaked readers: opened=${opened.get()} closed=${closed.get()}")
    } finally {
      AvroIO.ReadHooks.onOpen = _ => ()
      AvroIO.ReadHooks.onClose = _ => ()
    }
  }

  test("executor-side writers see the DRIVER's Hadoop conf (broadcast, not classpath defaults)") {
    // a custom conf key set on the session must be visible where the
    // executor-side FileSystem is resolved — the SerializableConfiguration
    // path; a bare `new Configuration()` would drop it
    val key = "graft.test.avro.conf.probe"
    spark.sparkContext.hadoopConfiguration.set(key, "prisma42")
    try {
      // the exact mechanism AvroIO.write/read use: broadcast the
      // driver's session conf, resolve it INSIDE an executor task — a
      // bare executor-side `new Configuration()` reads null here
      val confBc = spark.sparkContext.broadcast(
        new org.apache.spark.util.SerializableConfiguration(
          spark.sessionState.newHadoopConf()))
      val observed = spark.sparkContext.parallelize(Seq(1), 1)
        .map { _ =>
          (confBc.value.value.get(key),
            new org.apache.hadoop.conf.Configuration().get(key))
        }.collect().head
      assert(observed._1 == "prisma42", s"broadcast conf lost the key: $observed")
      assert(observed._2 == null,
        "classpath-default Configuration unexpectedly carries the session key " +
          "— this test can no longer distinguish the two paths")
      // and the write/read round-trip runs through that broadcast path
      val dir = Files.createTempDirectory("graft_avro_conf").toString
      AvroIO.write(nestedDf, dir)
      assert(AvroIO.read(spark, dir).count() == 3)
    } finally spark.sparkContext.hadoopConfiguration.unset(key)
  }

  test("q_avro_roundtrip equals the same projection straight off parquet") {
    val direct = graft.Tables.documents(spark, sf)
      .select(col("doc_id"),
        col("lang"), col("source"),
        array_join(slice(split(col("text"), " "), 1, 3), " ").as("head_txt"),
        col("n_chars"))
      .orderBy(col("doc_id"))
    val viaAvro = SparkEntry.queries("q_avro_roundtrip")(spark, sf)
    assert(viaAvro.collect().toSeq == direct.collect().toSeq)
  }
}
