package graft

import graft.sources.SchemaRegistry
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** SchemaRegistry contract (q_schema_evo_cat): catalog-declared reads
  * are EQUIVALENT to mergeSchema footer sampling — same union schema,
  * same null-fill, same rows — while type conflicts fail the declare()
  * loudly instead of poisoning the lake.
  */
class SchemaRegistrySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def tmpBatches(): (String, String, java.nio.file.Path) = {
    val base = java.nio.file.Files.createTempDirectory("graft_schemareg")
    val v1 = s"$base/v1"; val v2 = s"$base/v2"
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "amount")
      .write.parquet(v1)
    Seq((3L, 30.0, "a"), (4L, 40.0, "b")).toDF("k", "amount", "tag")
      .write.parquet(v2)
    (v1, v2, base)
  }

  private def rmTree(p: java.nio.file.Path): Unit = {
    import scala.util.Try
    val walk = java.nio.file.Files.walk(p)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(q => { Try(java.nio.file.Files.deleteIfExists(q)); () })
    finally walk.close()
  }

  test("declare-vs-merge equivalence: same schema, same null-filled rows") {
    val (v1, v2, base) = tmpBatches()
    try {
      SchemaRegistry.drop("t_eq")
      SchemaRegistry.declare("t_eq", spark.read.parquet(v1).schema)
      SchemaRegistry.declare("t_eq", spark.read.parquet(v2).schema)
      val declared = SchemaRegistry.readDeclared(spark, "t_eq", v1, v2)
      val merged = spark.read.option("mergeSchema", "true").parquet(v1, v2)
      assert(declared.schema.map(f => (f.name, f.dataType)) ==
        merged.schema.map(f => (f.name, f.dataType)))
      assert(declared.exceptAll(merged).isEmpty && merged.exceptAll(declared).isEmpty)
      // the pre-evolution batch reads tag as null, both paths
      assert(declared.filter(col("k") <= 2 && col("tag").isNull).count() == 2)
    } finally rmTree(base)
  }

  test("union keeps first-appearance order and appends new fields") {
    SchemaRegistry.drop("t_ord")
    SchemaRegistry.declare("t_ord", StructType(Seq(
      StructField("b", LongType), StructField("a", DoubleType))))
    val u = SchemaRegistry.declare("t_ord", StructType(Seq(
      StructField("a", DoubleType), StructField("c", StringType))))
    assert(u.fieldNames.toSeq == Seq("b", "a", "c"))
    assert(u.fields.forall(_.nullable), "unioned fields must be nullable")
  }

  test("a type conflict fails the declare loudly") {
    SchemaRegistry.drop("t_conf")
    SchemaRegistry.declare("t_conf", StructType(Seq(StructField("x", LongType))))
    val e = intercept[IllegalArgumentException] {
      SchemaRegistry.declare("t_conf", StructType(Seq(StructField("x", StringType))))
    }
    assert(e.getMessage.contains("schema conflict"))
  }

  test("q_schema_evo_cat matches q_schema_evo row for row") {
    val cat = SparkEntry.queries("q_schema_evo_cat")(spark, sf).collect().toSeq
    val evo = SparkEntry.queries("q_schema_evo")(spark, sf).collect().toSeq
    assert(cat.nonEmpty && cat == evo)
  }
}
