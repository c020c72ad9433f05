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
