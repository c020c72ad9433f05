package graft

import graft.queries.TimeWindows
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Operator edge cases from SURVEY.md §5.2.2: 0-row inputs (R21),
  * all-null columns (R9), mismatched-schema unions (R12), and the
  * fan-out ≡ single-groupBy equivalence (R11).
  */
class RelationalSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", TimestampType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  test("0-row input: windowed aggregation and groupBy yield empty, not errors (R21)") {
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], eventsSchema)
    assert(TimeWindows.tumbleAgg(empty).count() == 0)
    assert(TimeWindows.sessionAgg(empty).count() == 0)
    assert(empty.groupBy("event_type").agg(count(lit(1))).count() == 0)
  }

  test("all-null column: na.fill(0) replaces every null (R9)") {
    val df = Seq((1L, None: Option[Double]), (2L, None), (3L, None))
      .toDF("id", "v").na.fill(0)
    assert(df.filter(col("v").isNull).count() == 0)
    assert(df.agg(sum("v")).as[Double].head() == 0.0)
  }

  test("mismatched-schema union: unionByName(allowMissingColumns) + fill matches reference concat semantics (R12)") {
    val a = Seq((1L, "x", 10.0)).toDF("id", "name", "m1")
    val b = Seq((2L, "y", 20.0)).toDF("id", "name", "m2")
    val u = a.unionByName(b, allowMissingColumns = true).na.fill(0.0)
    assert(u.count() == 2)
    val r = u.orderBy("id").collect()
    assert(r(0).getDouble(2) == 10.0 && r(0).getDouble(3) == 0.0)
    assert(r(1).getDouble(2) == 0.0 && r(1).getDouble(3) == 20.0)
  }

  test("per-key fan-out + union ≡ single groupBy (R11/R12) on seeded random data") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(500)((rnd.nextInt(7), rnd.nextDouble() * 100))
    val df = rows.toDF("k", "v").cache()
    val single = df.groupBy("k").agg(count(lit(1)).as("n"), round(sum("v"), 6).as("s"))
    val keys = rows.map(_._1).distinct.sorted
    val fanout = keys.map(k => df.filter(col("k") === k)
        .groupBy("k").agg(count(lit(1)).as("n"), round(sum("v"), 6).as("s")))
      .reduce(_.unionByName(_))
    assert(single.exceptAll(fanout).isEmpty && fanout.exceptAll(single).isEmpty)
    df.unpersist()
  }

  test("empty-groupedAggregates guard: aggregation over empty relation returns typed empty frame (R21)") {
    val empty = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], eventsSchema)
    val out = empty.groupBy("event_type")
      .agg(count(lit(1)).as("n"), first("user_id").as("u"))
    assert(out.schema.fieldNames.toSeq == Seq("event_type", "n", "u"))
    assert(out.count() == 0)
  }
}
