package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine query (SURVEY.md §2b).
  *
  * @param name   stable id, the key in `SparkEntry.queries`
  * @param fn     Spark implementation; args are (session, sfDir)
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables, or None for non-SQL-expressible ops
  *               (those are verified by scalatest instead, SURVEY.md §5.2).
  *
  * Oracle determinism contract (SURVEY.md §7.5 H1–H5): every oracle query
  * ends in a total-order ORDER BY, rounds floating aggregates to 4
  * decimals, renders timestamps as strings, and casts DuckDB's widened
  * result types (HUGEINT sums, BIGINT year/len/ceil) back to the exact
  * Spark-side type so the driver's schema compare passes.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    approxOracle: Option[ApproxOracle] = None)

/** Tolerance-checked oracle for the approx/sketch query family (HLL
  * distinct counts, GK percentiles): estimates are engine-specific, so
  * a hash-match against DuckDB is impossible BY DESIGN — but the
  * estimate is still checkable against the exact answer within the
  * sketch's published error bound. `sql` computes the EXACT values
  * under the same column names; `colTol` maps each approx column to its
  * allowed relative error (columns not listed compare exactly). Dumped
  * by Verify as oracle_bounds.json; tools/compare_oracle.py enforces
  * it, so these queries report a checked-within-ε record instead of a
  * bare no_oracle.
  */
final case class ApproxOracle(sql: String, colTol: Map[String, Double])
