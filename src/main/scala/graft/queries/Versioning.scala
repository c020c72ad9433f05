package graft.queries

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dataset-version operations (SURVEY.md §2b q_snapshot_diff /
  * q_cdc_apply) — the data-ops layer a continuously-rebuilt corpus
  * needs around its snapshots: diff two versions, and materialize the
  * current state from an ordered changelog.
  *
  * Version fixtures are derived deterministically from the orders
  * table (the q_drift_psi ref/cur convention — the fixture has no real
  * second version): v_old drops o_orderkey % 101 == 0 (rows "inserted
  * later"), v_new drops o_orderkey % 97 == 0 (rows "deleted since")
  * and shifts open-status prices by +10.0 (an EXACT double add on a
  * 2-dp value — no rounding-mode hazard, SURVEY.md §7.5 H1), so both
  * engines derive bit-identical versions and the diff is exact.
  */
object Versioning {

  /** Last-writer-wins changelog apply (q_cdc_apply body) — factored so
    * the incremental form (streaming.IncrementalCdc, q_cdc_inc) reuses
    * the identical aggregation over its accumulated store and answers
    * the same oracle.
    */
  def cdcStateOf(changelog: DataFrame): DataFrame =
    changelog
      .groupBy(col("user_id"))
      .agg(
        max_by(struct(col("event_type"), col("value")),
          struct(col("ts"), col("event_id"))).as("last"),
        count(lit(1)).as("n_ops"))
      .select(col("user_id"),
        col("last.event_type").as("last_op"),
        col("last.value").as("cur_value"),
        col("n_ops"))
      .filter(col("last_op") =!= "error") // deleted keys are absent
      .orderBy(col("user_id"))

  /** q_cdc_apply / q_cdc_inc shared oracle: the definitional
    * row_number-window form. q_cdc_inc answering it to the hash proves
    * the micro-batch store reproduces the one-shot state (the
    * q_substr_inc contract).
    */
  val CdcOracle: String =
    """WITH ranked AS (
      |  SELECT user_id, event_type, value,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY ts DESC, event_id DESC) AS rn,
      |         count(*) OVER (PARTITION BY user_id) AS n_ops
      |  FROM events)
      |SELECT user_id, event_type AS last_op, value AS cur_value,
      |       CAST(n_ops AS BIGINT) AS n_ops
      |FROM ranked WHERE rn = 1 AND event_type <> 'error'
      |ORDER BY user_id""".stripMargin

  /** (old, new) simulated versions of orders. */
  def versionsOf(orders: DataFrame): (DataFrame, DataFrame) = {
    val vOld = orders.filter(col("o_orderkey") % 101 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val vNew = orders.filter(col("o_orderkey") % 97 =!= 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        when(col("o_orderstatus") === "O", col("o_totalprice") + 10.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    (vOld, vNew)
  }

  val defs: Seq[QueryDef] = Seq(

    // Snapshot diff: one full-outer key join classifies every key as
    // added / removed / changed / unchanged — the audit a pipeline
    // runs before publishing a rebuilt snapshot (q_dq_audit's sibling:
    // WHAT changed, not whether it passes). At 100 TB both sides
    // shuffle once on the snapshot key — or zero times from bucketed
    // snapshot layouts (q_join_bucketed); the output is 4 rows.
    QueryDef("q_snapshot_diff",
      (s, d) => {
        val (vOld, vNew) = versionsOf(T.orders(s, d))
        val o = vOld.select(col("o_orderkey").as("k"),
          col("o_totalprice").as("p_old"))
        val n = vNew.select(col("o_orderkey").as("k"),
          col("o_totalprice").as("p_new"))
        o.join(n, Seq("k"), "full_outer")
          .select(col("k"),
            when(col("p_old").isNull, "added")
              .when(col("p_new").isNull, "removed")
              .when(col("p_old") =!= col("p_new"), "changed")
              .otherwise("unchanged").as("category"))
          .groupBy(col("category"))
          .agg(count(lit(1)).as("n"),
            min(col("k")).as("min_key"), max(col("k")).as("max_key"))
          .orderBy(col("category"))
      },
      Some("""WITH v_old AS (
             |  SELECT o_orderkey AS k, o_totalprice AS p_old
             |  FROM orders WHERE o_orderkey % 101 <> 0),
             |v_new AS (
             |  SELECT o_orderkey AS k,
             |         CASE WHEN o_orderstatus = 'O' THEN o_totalprice + 10.0
             |              ELSE o_totalprice END AS p_new
             |  FROM orders WHERE o_orderkey % 97 <> 0),
             |diff AS (
             |  SELECT COALESCE(o.k, n.k) AS k,
             |         CASE WHEN o.k IS NULL THEN 'added'
             |              WHEN n.k IS NULL THEN 'removed'
             |              WHEN p_old <> p_new THEN 'changed'
             |              ELSE 'unchanged' END AS category
             |  FROM v_old o FULL OUTER JOIN v_new n ON o.k = n.k)
             |SELECT category, CAST(count(*) AS BIGINT) AS n,
             |       min(k) AS min_key, max(k) AS max_key
             |FROM diff GROUP BY category ORDER BY category""".stripMargin)),

    // CDC apply: materialize current state from an ordered changelog
    // (events as ops on the user key: signup=insert, error=delete,
    // everything else=update; total order (ts, event_id)). The naive
    // plan is a per-key row_number window — a full sort of every
    // partition; the engine instead takes the last writer with ONE
    // max_by aggregation keyed by the struct (ts, event_id) order —
    // partially aggregatable, so at 100 TB the map side reduces each
    // key to one candidate row before the shuffle. The oracle states
    // the definitional window form (algorithm ≠ oracle).
    QueryDef("q_cdc_apply",
      (s, d) => cdcStateOf(T.events(s, d)),
      Some(CdcOracle)),

    // The SAME current-state materialization maintained across real
    // foreachBatch micro-batches: each batch's changelog rows land in a
    // batch_id-partitioned store (replay-idempotent dynamic overwrite,
    // cross-batch redelivery deduped on event_id), snapshot = the
    // identical cdcStateOf aggregation over the accumulated rows.
    // Shares q_cdc_apply's oracle VERBATIM (the q_substr_inc contract).
    QueryDef("q_cdc_inc",
      (s, d) => graft.streaming.IncrementalCdc.fixtureRun(s, d),
      Some(CdcOracle))
  )
}
