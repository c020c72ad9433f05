package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks (SURVEY.md §5.2.3) against naive recomputation
  * on seeded random data.
  */
class WindowPropSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("3-row moving sum over window frame == naive O(n²) recompute") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map(i => (i.toLong, rnd.nextInt(5).toLong, rnd.nextDouble() * 10))
    val df = rows.toDF("id", "user", "v")
    val w = Window.partitionBy("user").orderBy("id").rowsBetween(-2, Window.currentRow)
    val got = df.withColumn("ms", sum("v").over(w))
      .select("user", "id", "ms").as[(Long, Long, Double)].collect()
      .map { case (u, i, m) => (u, i) -> m }.toMap
    // naive recompute
    val byUser = rows.groupBy(_._2)
    byUser.foreach { case (u, rs) =>
      val sortedRs = rs.sortBy(_._1)
      sortedRs.zipWithIndex.foreach { case ((id, _, _), idx) =>
        val expect = sortedRs.slice(math.max(0, idx - 2), idx + 1).map(_._3).sum
        assert(math.abs(got((u, id)) - expect) < 1e-9, s"user $u id $id")
      }
    }
  }

  test("rank/dense_rank are deterministic under unique tiebreak and match scala sort") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 200).map(i => (i.toLong, s"t${rnd.nextInt(3)}", rnd.nextInt(20).toDouble))
    val df = rows.toDF("id", "typ", "v")
    val w = Window.partitionBy("typ").orderBy(col("v").desc, col("id"))
    val got = df.withColumn("rn", row_number().over(w))
      .as[(Long, String, Double, Int)].collect()
      .map { case (id, _, _, rn) => id -> rn }.toMap
    rows.groupBy(_._2).foreach { case (_, rs) =>
      rs.sortBy(r => (-r._3, r._1)).zipWithIndex.foreach { case ((id, _, _), i) =>
        assert(got(id) == i + 1, s"row $id")
      }
    }
  }

  test("approx_count_distinct is within 10% of exact on events") {
    val e = Tables.events(spark, sf)
    val exact = e.groupBy("event_type").agg(countDistinct("user_id").as("x"))
      .as[(String, Long)].collect().toMap
    val approx = e.groupBy("event_type").agg(approx_count_distinct("user_id").as("a"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, x) =>
      assert(math.abs(approx(k) - x).toDouble / x <= 0.10, s"$k: approx ${approx(k)} vs $x")
    }
  }

  test("q_sessionize assignment agrees with the session_window aggregate") {
    val assigned = SparkEntry.queries("q_sessionize")(spark, sf)
      .groupBy("user_id").agg(max("sess_id").as("n"))
      .as[(Long, Long)].collect().toMap
    val windows = graft.queries.TimeWindows.sessionAgg(Tables.events(spark, sf))
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(assigned == windows,
      "per-event session ids must partition exactly like session_window")
  }

  test("count-min sketch estimates never undercount and overcount within eps*N") {
    val rows = SparkEntry.queries("q_sketch_cms")(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(rows.nonEmpty)
    val n = rows.map(_._2).sum
    rows.foreach { case (t, exact, est) =>
      assert(est >= exact, s"$t: CMS must never undercount ($est < $exact)")
      assert(est <= exact + math.max(1L, (0.001 * n * 3).toLong),
        s"$t: overcount too large ($est vs $exact, N=$n)")
    }
  }

  test("bloom pre-filter passes every true key and mostly rejects non-keys") {
    import org.apache.spark.sql.functions._
    val buyers = Tables.orders(spark, sf).filter(col("o_totalprice") > 400000)
    val bloom = buyers
      .agg(graft.functions.SketchExprs.bloomFilterAgg(col("o_custkey"), 10000L))
      .head().getAs[Array[Byte]](0)
    val marked = Tables.customer(spark, sf)
      .withColumn("hit", graft.functions.SketchExprs.mightContain(bloom, col("c_custkey")))
    val truth = Tables.customer(spark, sf)
      .join(buyers, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey").as[Long].collect().toSet
    val hits = marked.filter(col("hit")).select("c_custkey").as[Long].collect().toSet
    assert(truth.subsetOf(hits), "bloom must have no false negatives")
    val fpRate = (hits.size - truth.size).toDouble /
      math.max(1L, marked.count() - truth.size)
    assert(fpRate < 0.05, s"false-positive rate too high: $fpRate")
  }

  test("q_agg_percentile_approx tracks the exact percentiles per group") {
    val exact = SparkEntry.queries("q_agg_percentile")(spark, sf)
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val approx = SparkEntry.queries("q_agg_percentile_approx")(spark, sf)
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, (p50, p90)) =>
      // ε = 1e-4 rank accuracy: on the fixture's value range a small
      // absolute tolerance is ample (exact percentile interpolates,
      // the sketch returns an observed value).
      assert(math.abs(approx(k)._1 - p50) <= math.max(0.05, 0.02 * math.abs(p50)),
        s"$k p50: ${approx(k)._1} vs $p50")
      assert(math.abs(approx(k)._2 - p90) <= math.max(0.05, 0.02 * math.abs(p90)),
        s"$k p90: ${approx(k)._2} vs $p90")
    }
  }
}
