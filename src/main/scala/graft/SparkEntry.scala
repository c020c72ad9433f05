package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => Q}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared engine query (SURVEY.md §2b) lives in a pack under
  * `graft.queries` as a [[QueryDef]]; this object aggregates them into
  * the `queries` / `oracleSql` maps the driver's Verify/Bench harness
  * consumes.
  */
object SparkEntry {

  /** All declared queries, every pack. Names must be unique — asserted
    * so a silently-shadowed map entry can't drop a query from the gate.
    */
  val defs: Seq[QueryDef] =
    Q.Relational.defs ++ Q.Scalars.defs ++ Q.Windows.defs ++
      Q.TimeWindows.defs ++ Q.TextOps.defs ++ Q.Similarity.defs ++
      Q.Udx.defs ++ Q.Multimodal.defs ++ Q.Extras.defs ++ Q.Pipeline.defs ++
      Q.Corpus.defs ++ Q.Curation.defs ++ Q.Graph.defs ++ Q.Vocab.defs ++
      Q.Layout.defs ++ Q.Geo.defs ++ Q.Versioning.defs ++ Q.Privacy.defs

  require(defs.map(_.name).distinct.size == defs.size,
    s"duplicate query names: ${defs.map(_.name).diff(defs.map(_.name).distinct)}")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * q_agg_q1 — the TPC-H-Q1-style minimum slice (SURVEY.md §7.2).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q_agg_q1")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (scalatest-verified instead — SURVEY.md §5.2).
    */
  def oracleSql: Map[String, String] =
    defs.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Tolerance-checked oracles for the approx/sketch family (exact SQL
    * + per-column relative error bound) — see [[ApproxOracle]].
    */
  def approxOracles: Map[String, ApproxOracle] =
    defs.flatMap(q => q.approxOracle.map(q.name -> _)).toMap
}
