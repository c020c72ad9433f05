package graft.queries

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions, top-k, and the as-of join (SURVEY.md §2b
  * q_window_* / q_topk_* / q_join_asof).
  *
  * Determinism: every window ORDER BY carries a unique tiebreak key
  * (event_id / o_orderkey) so rank/lag/frame results are stable across
  * engines and partitionings (FIXTURES.md edge case: identical ts per
  * user).
  */
object Windows {

  val defs: Seq[QueryDef] = Seq(

    // R15's sortBy as a window: rank + dense_rank per event_type.
    QueryDef("q_window_rank",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("value").desc)
        T.events(s, d)
          .select(col("event_id"), col("event_type"), round(col("value"), 4).as("value_r"),
            rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
          .orderBy(col("event_type"), col("rnk"), col("event_id"))
      },
      Some("""SELECT event_id, event_type, round(value, 4) AS value_r,
             |       CAST(rank() OVER w AS INTEGER) AS rnk,
             |       CAST(dense_rank() OVER w AS INTEGER) AS drnk
             |FROM events
             |WINDOW w AS (PARTITION BY event_type ORDER BY value DESC)
             |ORDER BY event_type, rnk, event_id""".stripMargin)),

    // Per-user inter-event gap via lag(ts), in whole seconds.
    QueryDef("q_window_lag",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        T.events(s, d)
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .select(col("event_id"), col("user_id"),
            date_format(date_trunc("second", col("ts")), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))).as("gap_s"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s,
             |       CAST(epoch(date_trunc('second', ts)) AS BIGINT)
             |         - CAST(epoch(date_trunc('second', lag(ts, 1) OVER w)) AS BIGINT) AS gap_s
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // Explicit frame spec: 3-row moving sum per user.
    QueryDef("q_window_frame",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(-2, Window.currentRow)
        T.events(s, d)
          .select(col("event_id"), col("user_id"),
            round(sum(col("value")).over(w), 4).as("moving_sum"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
             |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_sum
             |FROM events ORDER BY event_id""".stripMargin)),

    // Top-3 orders by totalprice per priority (row_number + filter —
    // plans as a windowed scan, no global sort of the fact table).
    QueryDef("q_topk_group",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        T.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
            round(col("o_totalprice"), 4).as("price"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, CAST(rn AS INTEGER) AS rn, o_orderkey,
             |       round(o_totalprice, 4) AS price
             |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
             |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_orderpriority, rn""".stripMargin)),

    // The SAME top-3-per-priority answer through the custom grouped
    // top-k operator (graft.plans.GroupedTopK: logical node + strategy
    // + partial/final bounded-heap physical plan). Where q_topk_group's
    // window shuffles and sorts EVERY order row, this exchange carries
    // ≤ partitions × 5 priorities × 3 rows; identical output = the
    // window query's oracle checks a custom SparkPlan end-to-end. The
    // rn window runs over the 15 surviving rows, not the fact table.
    QueryDef("q_topk_group_fast",
      (s, d) => {
        val top = graft.plans.GroupedTopKOp.topK(T.orders(s, d), 3,
          Seq("o_orderpriority"),
          Seq("o_totalprice" -> true, "o_orderkey" -> false))
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        top.withColumn("rn", row_number().over(w))
          .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
            round(col("o_totalprice"), 4).as("price"))
          .orderBy(col("o_orderpriority"), col("rn"))
      },
      Some("""SELECT o_orderpriority, CAST(rn AS INTEGER) AS rn, o_orderkey,
             |       round(o_totalprice, 4) AS price
             |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
             |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_orderpriority, rn""".stripMargin)),

    // The optimizer-rule deployment of the custom operator: the query
    // text IS the idiomatic window form of q_topk_group — the scoped
    // RewriteWindowTopK rule (Rule[LogicalPlan] on the extraOptimizations
    // hook) swaps the full-table window shuffle for GroupedTopK
    // underneath it. Rows are materialized inside the rule's scope
    // (15 rows — groups × k, bounded) so the rewritten plan is what
    // produced the answer; RewriteTopKSpec pins the plan shape and
    // no-fire guards.
    QueryDef("q_topk_rewrite",
      (s, d) => {
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val windowForm = T.orders(s, d)
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_orderpriority"), col("rn"), col("o_orderkey"),
            round(col("o_totalprice"), 4).as("price"))
          .orderBy(col("o_orderpriority"), col("rn"))
        graft.plans.RewriteWindowTopK.withRule(s) {
          val rows = windowForm.collect() // groups × k = 15 rows
          s.createDataFrame(java.util.Arrays.asList(rows: _*), windowForm.schema)
        }
      },
      Some("""SELECT o_orderpriority, CAST(rn AS INTEGER) AS rn, o_orderkey,
             |       round(o_totalprice, 4) AS price
             |FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
             |        ORDER BY o_totalprice DESC, o_orderkey) AS rn FROM orders)
             |WHERE rn <= 3
             |ORDER BY o_orderpriority, rn""".stripMargin)),

    // Global top-10: plans as TakeOrderedAndProject (no full sort/shuffle
    // of all rows — each partition keeps 10, driver merges).
    QueryDef("q_topk_global",
      (s, d) => T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice"), 4).as("price"))
        .orderBy(col("price").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(10),
      Some("""SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS price
             |FROM lineitem
             |ORDER BY price DESC, l_orderkey, l_linenumber
             |LIMIT 10""".stripMargin)),

    // SCD2 history build (gaps-and-islands): collapse each customer's
    // consecutive same-priority orders into type-2 validity intervals
    // — lag-change flag → running-sum island id → per-island min/count
    // → lead() for the exclusive valid_to. The dimension-table shape a
    // warehouse maintains from an append-only fact stream; at 100 TB
    // everything is windowed per customer (one shuffle on o_custkey),
    // never a global sort.
    QueryDef("q_scd2",
      (s, d) => scd2Intervals(T.orders(s, d))
          .select(col("o_custkey"), col("island"), col("o_orderpriority"),
            date_format(date_trunc("second", col("vf")), "yyyy-MM-dd HH:mm:ss").as("valid_from_s"),
            date_format(date_trunc("second", col("vt")), "yyyy-MM-dd HH:mm:ss").as("valid_to_s"),
            col("vt").isNull.as("is_current"), col("n_orders"))
          .orderBy(col("o_custkey"), col("island")),
      Some("""WITH seq AS (
             |  SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
             |         CASE WHEN lag(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
             |              THEN 1 ELSE 0 END AS chg
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |isl AS (
             |  SELECT *, CAST(sum(chg) OVER (PARTITION BY o_custkey
             |           ORDER BY o_orderdate, o_orderkey
             |           ROWS UNBOUNDED PRECEDING) AS INTEGER) AS island
             |  FROM seq),
             |grp AS (
             |  SELECT o_custkey, island, o_orderpriority, min(o_orderdate) AS vf,
             |         CAST(count(*) AS BIGINT) AS n_orders
             |  FROM isl GROUP BY 1, 2, 3)
             |SELECT o_custkey, island, o_orderpriority,
             |       strftime(date_trunc('second', vf), '%Y-%m-%d %H:%M:%S') AS valid_from_s,
             |       strftime(date_trunc('second', lead(vf) OVER w2), '%Y-%m-%d %H:%M:%S') AS valid_to_s,
             |       (lead(vf) OVER w2 IS NULL) AS is_current,
             |       n_orders
             |FROM grp
             |WINDOW w2 AS (PARTITION BY o_custkey ORDER BY island)
             |ORDER BY o_custkey, island""".stripMargin)),

    // POINT-IN-TIME join (the feature-store correctness op): each
    // lineitem joins the SCD2 priority version of its customer that was
    // ACTIVE AT SHIP TIME — shipdate lands months after orderdate, so
    // the interval at ship frequently differs from the priority the
    // order was placed under; joining "current" or "at-order" versions
    // instead is the classic training/serving leakage bug. Facts
    // timestamped BEFORE the customer's first version have no dimension
    // truth at their time and are excluded by the inner join (the
    // fixture ships ~8% of lineitems before their customer's first
    // order; GraphSpec asserts every in-coverage fact matches exactly
    // once). Scale shape:
    // this is the range join a feature store actually needs, and unlike
    // q_join_range it carries an EQUI key (custkey) — both sides
    // shuffle once on the customer, intervals-per-customer are small,
    // and the validity predicate is just the join residual; no bins, no
    // nested loop, no window over facts.
    QueryDef("q_join_pit",
      (s, d) => {
        val dim = scd2Intervals(T.orders(s, d))
          .select(col("o_custkey").as("d_custkey"),
            col("o_orderpriority").as("prio_at_ship"), col("vf"), col("vt"))
        val facts = T.lineitem(s, d)
          .join(T.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey"), col("l_shipdate"),
            (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("rev"))
        facts.join(dim, col("o_custkey") === col("d_custkey") &&
            col("l_shipdate") >= col("vf") &&
            (col("vt").isNull || col("l_shipdate") < col("vt")))
          .groupBy(col("prio_at_ship"))
          .agg(count(lit(1)).as("n_items"),
            round(sum(col("rev")), 4).as("revenue"))
          .orderBy(col("prio_at_ship"))
      },
      Some("""WITH seq AS (
             |  SELECT o_custkey, o_orderkey, o_orderpriority, o_orderdate,
             |         CASE WHEN lag(o_orderpriority) OVER w IS DISTINCT FROM o_orderpriority
             |              THEN 1 ELSE 0 END AS chg
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
             |isl AS (
             |  SELECT *, sum(chg) OVER (PARTITION BY o_custkey
             |           ORDER BY o_orderdate, o_orderkey
             |           ROWS UNBOUNDED PRECEDING) AS island
             |  FROM seq),
             |grp AS (
             |  SELECT o_custkey, island, o_orderpriority, min(o_orderdate) AS vf
             |  FROM isl GROUP BY 1, 2, 3),
             |dim AS (
             |  SELECT o_custkey, o_orderpriority AS prio_at_ship, vf,
             |         lead(vf) OVER (PARTITION BY o_custkey ORDER BY island) AS vt
             |  FROM grp),
             |facts AS (
             |  SELECT o.o_custkey, l.l_shipdate,
             |         l.l_extendedprice * (1 - l.l_discount) AS rev
             |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
             |SELECT prio_at_ship, CAST(count(*) AS BIGINT) AS n_items,
             |       round(sum(rev), 4) AS revenue
             |FROM facts f JOIN dim d
             |  ON f.o_custkey = d.o_custkey
             | AND f.l_shipdate >= d.vf
             | AND (d.vt IS NULL OR f.l_shipdate < d.vt)
             |GROUP BY prio_at_ship ORDER BY prio_at_ship""".stripMargin)),

    // As-of join (SURVEY.md §7.4): each purchase to the same user's latest
    // prior-or-equal signup. Spark has no batch ASOF JOIN; composed as
    // union + per-user running last-signup (ONE shuffle on user_id, no
    // purchase×signup pair blow-up — the range-join + row_number
    // formulation is quadratic for hot users at 100 TB). Tie rule:
    // signup at exactly the purchase ts counts (kind orders signups
    // first). Purchases with no prior signup keep NULL (left semantics).
    // The oracle uses the ANSI correlated max() form.
    QueryDef("q_join_asof",
      (s, d) => {
        val e = T.events(s, d)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"), lit(1).as("kind"))
        val signups = e.filter(col("event_type") === "signup")
          .select(lit(null).cast("long").as("event_id"), col("user_id"),
            col("ts"), lit(0).as("kind"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("kind"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        purchases.unionByName(signups)
          .withColumn("s_ts",
            last(when(col("kind") === 0, col("ts")), ignoreNulls = true).over(w))
          .filter(col("kind") === 1)
          .select(col("event_id"), col("user_id"),
            date_format(date_trunc("second", col("ts")), "yyyy-MM-dd HH:mm:ss").as("purchase_ts"),
            date_format(date_trunc("second", col("s_ts")), "yyyy-MM-dd HH:mm:ss").as("signup_ts"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT e.event_id, e.user_id,
             |       strftime(date_trunc('second', e.ts), '%Y-%m-%d %H:%M:%S') AS purchase_ts,
             |       strftime(date_trunc('second',
             |         (SELECT max(s.ts) FROM events s
             |          WHERE s.user_id = e.user_id AND s.event_type = 'signup'
             |            AND s.ts <= e.ts)), '%Y-%m-%d %H:%M:%S') AS signup_ts
             |FROM events e
             |WHERE e.event_type = 'purchase'
             |ORDER BY e.event_id""".stripMargin))
  )

  /** The SCD2 interval core shared by q_scd2 (which formats it as the
    * dimension-history report) and q_join_pit (which joins facts to the
    * version active at fact time): per customer, the gaps-and-islands
    * collapse of consecutive same-priority orders into
    * (o_custkey, island, o_orderpriority, vf, vt exclusive, n_orders)
    * validity intervals. One shuffle on o_custkey; all windows
    * per-customer.
    */
  def scd2Intervals(orders: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val seq = orders
      .withColumn("chg",
        when(lag(col("o_orderpriority"), 1).over(w).isNull ||
             lag(col("o_orderpriority"), 1).over(w) =!= col("o_orderpriority"), 1)
          .otherwise(0))
      .withColumn("island",
        sum(col("chg")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)).cast("int"))
    val grp = seq.groupBy(col("o_custkey"), col("island"), col("o_orderpriority"))
      .agg(min(col("o_orderdate")).as("vf"), count(lit(1)).as("n_orders"))
    val w2 = Window.partitionBy(col("o_custkey")).orderBy(col("island"))
    grp.withColumn("vt", lead(col("vf"), 1).over(w2))
  }
}
