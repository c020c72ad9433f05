package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Single-pass data-quality audit: every check's metric is computed in
  * ONE aggregation over the table (no per-check scan), returning a
  * (check, observed, threshold, passed) report frame. The gate a
  * training-data pipeline runs before publishing a snapshot.
  */
object DataQuality {

  /** A named expectation: `metric` is an aggregate column; `passed` is a
    * predicate over the metric value.
    */
  final case class Check(name: String, metric: Column, passed: Column => Column,
      expectation: String)

  def nullRate(c: String, maxRate: Double): Check =
    Check(s"null_rate($c) <= $maxRate",
      avg(when(col(c).isNull, 1.0).otherwise(0.0)),
      m => m <= maxRate, s"<= $maxRate")

  /** Duplicate count among NON-NULL values (countDistinct ignores nulls,
    * so nulls are excluded from both sides — pair with [[nullRate]] to
    * police nulls).
    */
  def unique(c: String): Check =
    Check(s"unique($c)",
      (count(col(c)) - countDistinct(col(c))).cast("double"),
      m => m === 0.0, "= 0 duplicates")

  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"range($c) in [$lo, $hi]",
      sum(when(col(c) < lo || col(c) > hi, 1.0).otherwise(0.0)),
      m => m === 0.0, "= 0 out-of-range rows")

  def minRows(n: Long): Check =
    Check(s"rows >= $n", count(lit(1)).cast("double"), m => m >= n.toDouble, s">= $n")

  /** Run all checks in one aggregation; returns
    * (check, observed double, expectation, passed boolean) rows.
    * A NULL metric (e.g. avg/sum over ZERO rows) counts as FAILED — an
    * empty snapshot must never vacuously pass its gate.
    */
  def audit(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "audit requires at least one check")
    val metrics = checks.zipWithIndex.map { case (c, i) => c.metric.as(s"m$i") }
    val agged = df.agg(metrics.head, metrics.tail: _*)
    val cols = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"),
        col(s"m$i").cast("double").as("observed"),
        lit(c.expectation).as("expectation"),
        coalesce(c.passed(col(s"m$i")), lit(false)).as("passed"))
    }
    agged.select(explode(array(cols: _*)).as("r")).select("r.*")
  }

  /** True iff every check passes. */
  def passes(df: DataFrame, checks: Seq[Check]): Boolean =
    audit(df, checks).filter(!col("passed")).isEmpty
}
