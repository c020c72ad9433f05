package graft

import graft.functions.WeightedMean
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UdxSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("WeightedMean == sum(v*w)/sum(w); zero total weight yields 0.0") {
    val wmean = udaf(WeightedMean)
    val df = Seq((1.0, 2.0), (3.0, 1.0), (5.0, 1.0)).toDF("v", "w")
    val got = df.agg(wmean(col("v"), col("w"))).as[Double].head()
    assert(math.abs(got - (1.0 * 2 + 3 + 5) / 4.0) < 1e-12)
    val zero = Seq((1.0, 0.0), (2.0, 0.0)).toDF("v", "w")
    assert(zero.agg(wmean(col("v"), col("w"))).as[Double].head() == 0.0)
  }

  test("csv roundtrip preserves rows and types (R22/R23)") {
    val fn = SparkEntry.queries("q_csv_roundtrip")
    val back = fn(spark, sf)
    val orig = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 4).as("value_r"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      orig.schema.map(f => (f.name, f.dataType)))
  }

  test("json roundtrip preserves nested struct and array columns (q_json_roundtrip)") {
    val back = graft.queries.Udx.jsonRoundtripNested(spark, sf)
    val orig = Tables.documents(spark, sf)
      .select(col("doc_id"),
        struct(col("lang"), col("source")).as("meta"),
        slice(split(col("text"), " "), 1, 3).as("head_toks"),
        col("n_chars"))
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
    assert(back.schema("meta").dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
  }

  test("q_json_roundtrip declared output is scalar-only and matches the nested source") {
    val q = SparkEntry.queries("q_json_roundtrip")(spark, sf)
    // every column scalar (driver's pandas sort/hash requires it)
    assert(q.schema.forall(f => f.dataType match {
      case _: org.apache.spark.sql.types.ArrayType |
           _: org.apache.spark.sql.types.StructType |
           _: org.apache.spark.sql.types.MapType => false
      case _ => true
    }), "declared q_json_roundtrip output must be flat scalars")
    val expect = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"),
        array_join(slice(split(col("text"), " "), 1, 3), " ").as("head_txt"),
        col("n_chars"))
    assert(q.exceptAll(expect).isEmpty && expect.exceptAll(q).isEmpty)
  }

  test("JSON-lines and ORC sinks roundtrip rows and schema") {
    val slice = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 4).as("value_r"))
    for (fmt <- Seq("json", "orc")) {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_rt_$fmt").toString
      slice.write.mode("overwrite").format(fmt).save(dir)
      val back = spark.read.schema(slice.schema).format(fmt).load(dir)
      assert(back.count() == slice.count(), s"$fmt count")
      assert(back.exceptAll(slice).isEmpty && slice.exceptAll(back).isEmpty, s"$fmt rows")
    }
  }

  test("observe() collects pipeline metrics without a second pass") {
    val obs = new org.apache.spark.sql.Observation("q1_metrics")
    val out = Tables.lineitem(spark, sf)
      .observe(obs, count(lit(1)).as("rows_in"), sum(col("l_quantity")).as("qty_in"))
      .filter(col("l_quantity") > 25)
    val kept = out.count()
    val metrics = obs.get
    assert(metrics("rows_in").asInstanceOf[Long] > kept)
    assert(metrics("qty_in").asInstanceOf[Double] > 0)
  }

  test("scalar udf matches its CASE re-expression (oracle form)") {
    val fn = SparkEntry.queries("q_udf_scalar")
    val viaUdf = fn(spark, sf).select("event_id", "bucket")
    val viaCase = Tables.events(spark, sf).select(col("event_id"),
      when(col("value") < 50, "low").when(col("value") < 150, "medium")
        .otherwise("high").as("bucket"))
    assert(viaUdf.exceptAll(viaCase).isEmpty && viaCase.exceptAll(viaUdf).isEmpty)
  }

  test("pos_tokens LATERAL VIEW matches posexplode(split) exactly") {
    val lateral = SparkEntry.queries("q_lateral_view")(spark, sf)
    val builtin = SparkEntry.queries("q_udtf_gen")(spark, sf)
    assert(lateral.schema.fieldNames.toSeq == builtin.schema.fieldNames.toSeq)
    assert(lateral.exceptAll(builtin).isEmpty && builtin.exceptAll(lateral).isEmpty,
      "custom Generator must match the built-in generator row-for-row")
    assert(lateral.count() > 0)
  }

  test("pos_tokens handles null and empty text") {
    graft.functions.GraftFunctions.register(spark)
    Seq((1L, Some("a b")), (2L, Some("")), (3L, None))
      .toDF("id", "text").createOrReplaceTempView("pt_edge")
    val got = spark.sql(
      "SELECT id, t.pos, t.token FROM pt_edge LATERAL VIEW pos_tokens(text) t AS pos, token ORDER BY id, pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSeq
    // null text generates no rows; empty text is one empty token
    assert(got == Seq((1L, 0, "a"), (1L, 1, "b"), (2L, 0, "")))
  }
}
