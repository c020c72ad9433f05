package graft.queries

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Headline analytical queries + deterministic data-management operators
  * a training-data pipeline needs (hash sampling, hash splits, PII
  * redaction, normalization, n-gram language-model counts, repetition
  * scoring, value histograms).
  *
  * The reference's pipeline fans a source table out into per-group
  * reports and concatenates them (modules/src/prisma_report/lambda.py:
  * 394-405); these queries generalize that into the multi-join +
  * aggregate + top-k reporting shapes of TPC-H Q3/Q5, plus the
  * selection/splitting/cleaning steps a 100-TB corpus build runs before
  * training.
  *
  * Determinism: every sampling/splitting decision is a pure function of
  * the row key via md5 — stable under repartition, append, and engine
  * (DuckDB computes the identical digest), unlike `rand(seed)` which is
  * partition-layout dependent. That is the property that makes samples
  * and train/val/test splits reproducible on a 1000-executor cluster.
  */
object Pipeline {

  /** Token bigrams of `text`, one row per (adjacent word pair).
    * Map-side flatMap (explode over a transform(sequence) — no shuffle,
    * no UDF); the guard keeps 0/1-token docs out of sequence()'s
    * descending-range edge case. Carries doc_id for per-doc stats.
    * Tokenized by the canonical [[TextOps.unicodeWords]] (round 12) —
    * identical to the whitespace split on the ASCII fixture, but a
    * space-free CJK doc no longer collapses to a single giant "bigram
    * source" token for the LM/perplexity/repetition family.
    */
  private def bigrams(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), TextOps.unicodeWords(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"),
        expr("explode(transform(sequence(0, size(t)-2), i -> struct(t[i] AS w1, t[i+1] AS w2)))").as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2"))

  /** Deterministic md5-bucket predicate: ~30% of rows (0x4ccc/0x10000),
    * keyed on (l_orderkey, l_linenumber). Lowercase-hex string compare
    * is identical in Spark and DuckDB.
    */
  private val sampleKey =
    substring(md5(concat(col("l_orderkey").cast("string"), lit(":"),
      col("l_linenumber").cast("string"))), 1, 4)

  val defs: Seq[QueryDef] = Seq(

    // TPC-H Q3 shape (shipping priority): 3-way join, filtered on both
    // fact sides, grouped per order, global top-10 by revenue.
    // Scale plan: customer⋈orders and orders⋈lineitem are key-partitioned
    // SMJ at 100 TB (AQE picks broadcast at test SF); the final top-10 is
    // TakeOrderedAndProject — no global sort materializes.
    QueryDef("q_tpch_q3",
      (s, d) => {
        val cutoff = to_timestamp(lit("1998-03-15 00:00:00"))
        T.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
          .join(T.orders(s, d).filter(col("o_orderdate") < cutoff),
            col("c_custkey") === col("o_custkey"))
          .join(T.lineitem(s, d).filter(col("l_shipdate") > cutoff),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_orderkey").as("okey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("odate"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("okey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey AS okey, strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
             |       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |              JOIN lineitem ON l_orderkey = o_orderkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
             |  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
             |GROUP BY l_orderkey, o_orderdate
             |ORDER BY revenue DESC, okey LIMIT 10""".stripMargin)),

    // TPC-H Q5 shape (local-supplier volume): 6-way join where the
    // customer and supplier nations must coincide. nation/region are
    // broadcast dims; the c_nationkey = s_nationkey residual rides the
    // l_suppkey equi-join instead of forcing an extra shuffle.
    QueryDef("q_tpch_q5",
      (s, d) => {
        val lo = to_timestamp(lit("1996-01-01 00:00:00"))
        val hi = to_timestamp(lit("1997-01-01 00:00:00"))
        T.customer(s, d)
          .join(T.orders(s, d).filter(col("o_orderdate") >= lo && col("o_orderdate") < hi),
            col("c_custkey") === col("o_custkey"))
          .join(T.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(T.supplier(s, d),
            col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
          .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
            col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
          .orderBy(col("revenue").desc, col("n_name"))
      },
      Some("""SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM customer JOIN orders   ON c_custkey = o_custkey
             |              JOIN lineitem ON l_orderkey = o_orderkey
             |              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
             |              JOIN nation   ON s_nationkey = n_nationkey
             |              JOIN region   ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin)),

    // TPC-H Q18 shape (large-volume customers): the HAVING subquery is a
    // self-aggregation of the fact table, then customer/orders/lineitem
    // re-join the surviving keys. Scale plan: the qualifying-order set is
    // tiny relative to lineitem (874 of 14.7k orders at sf0.01), so it
    // re-enters as a broadcast LEFT SEMI on l_orderkey; the final global
    // top-100 is TakeOrderedAndProject, never a full sort. AQE's
    // runtime-size estimate (not a planner guess) is what makes the
    // semi-join side broadcastable at any SF where the threshold keeps
    // qualifying orders rare.
    QueryDef("q_tpch_q18",
      (s, d) => {
        val li = T.lineitem(s, d)
        val big = li.groupBy(col("l_orderkey"))
          .agg(sum(col("l_quantity")).as("sum_qty"))
          .filter(col("sum_qty") > 200)
        T.orders(s, d)
          .join(big, col("o_orderkey") === big("l_orderkey"))
          .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
          .select(col("c_name"), col("c_custkey").as("custkey"),
            col("o_orderkey").as("okey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("odate"),
            round(col("o_totalprice"), 4).as("totalprice"),
            round(col("sum_qty"), 4).as("sum_qty"))
          .orderBy(col("totalprice").desc, col("okey"))
          .limit(100)
      },
      Some("""SELECT c_name, c_custkey AS custkey, o_orderkey AS okey,
             |       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS odate,
             |       round(o_totalprice, 4) AS totalprice,
             |       round(sum_qty, 4) AS sum_qty
             |FROM orders
             |JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
             |      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200) big
             |  ON o_orderkey = big.l_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |ORDER BY totalprice DESC, okey LIMIT 100""".stripMargin)),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    // join so zero-order customers stay, per-customer count, then the
    // histogram of counts — the double-aggregation shape. Scale plan:
    // the first agg is map-side-combined on o_custkey (the join's own
    // key, so AQE coalesces one shuffle); the second groups the
    // already-tiny (customer-count rows) count table. No filter clause
    // on comments here — the fixture has no comment column; the
    // structural point is outer-join + re-aggregation.
    QueryDef("q_tpch_q13",
      (s, d) => {
        val perCust = T.customer(s, d)
          .join(T.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count")) // count skips nulls
        perCust.groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
             |FROM (SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
             |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |      GROUP BY c_custkey) cc
             |GROUP BY c_count
             |ORDER BY custdist DESC, c_count DESC""".stripMargin)),

    // TPC-H Q17 shape (small-quantity-order revenue): the correlated
    // scalar subquery — each lineitem compared against ITS part's
    // average quantity — decorrelated into a pre-aggregation join, the
    // rewrite Catalyst itself applies to the SQL form. Scale plan: the
    // brand filter semi-joins lineitem FIRST (one broadcast of ~4% of
    // partkeys), so the per-part average aggregates only qualifying
    // rows — at 100 TB that is 25× less aggregation input than the
    // naive bound-then-filter order; the resulting per-part bounds
    // table is partkey-sized and broadcasts back. The 4-decimal round
    // on the bound pins the float boundary so Spark's and DuckDB's
    // summation orders cannot flip a `<` comparison.
    QueryDef("q_tpch_q17",
      (s, d) => {
        val brandKeys = T.part(s, d).filter(col("p_brand") === "Brand#4")
          .select(col("p_partkey"))
        val qualifying = T.lineitem(s, d)
          .join(broadcast(brandKeys), col("l_partkey") === col("p_partkey"), "left_semi")
        val bounds = qualifying.groupBy(col("l_partkey").as("b_partkey"))
          .agg(round(lit(0.2) * avg(col("l_quantity")), 4).as("qty_bound"))
        qualifying
          .join(broadcast(bounds), col("l_partkey") === col("b_partkey"))
          .filter(col("l_quantity") < col("qty_bound"))
          .agg(round(sum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"))
      },
      Some("""SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |JOIN (SELECT l_partkey AS b_partkey, round(0.2*avg(l_quantity), 4) AS qty_bound
             |      FROM lineitem GROUP BY 1) b ON b_partkey = p_partkey
             |WHERE p_brand = 'Brand#4' AND l_quantity < qty_bound""".stripMargin)),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the EXISTS /
    // NOT EXISTS pair over the same fact table — a supplier is counted
    // when it shipped late into a finished multi-supplier order and was
    // the ONLY late supplier of that order. Lateness here is shipdate
    // more than 60 days past the order date (the fixture has no
    // commit/receipt dates; the semi+anti correlation structure is the
    // point). Scale plan: EXISTS becomes a LEFT SEMI and NOT EXISTS a
    // LEFT ANTI, both equi-keyed on l_orderkey with the supplier
    // inequality as a residual predicate — one key's partitioning
    // reused across both joins, never a per-order window or explode;
    // the 100-row supplier dim broadcasts; the top-100 is
    // TakeOrderedAndProject.
    QueryDef("q_tpch_q21",
      (s, d) => {
        def late = T.lineitem(s, d)
          .join(T.orders(s, d).filter(col("o_orderstatus") === "F"),
            col("l_orderkey") === col("o_orderkey"))
          .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .select(col("l_orderkey"), col("l_suppkey"))
        val others = T.lineitem(s, d)
          .select(col("l_orderkey").as("lo2"), col("l_suppkey").as("ls2"))
        val lateOthers = late
          .select(col("l_orderkey").as("lo3"), col("l_suppkey").as("ls3"))
        late
          .join(others,
            col("l_orderkey") === col("lo2") && col("l_suppkey") =!= col("ls2"), "left_semi")
          .join(lateOthers,
            col("l_orderkey") === col("lo3") && col("l_suppkey") =!= col("ls3"), "left_anti")
          .join(broadcast(T.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("numwait"))
          .orderBy(col("numwait").desc, col("s_name"))
          .limit(100)
      },
      Some("""WITH late AS (
             |  SELECT l_orderkey, l_suppkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |  WHERE o_orderstatus = 'F' AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
             |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
             |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
             |WHERE EXISTS (SELECT 1 FROM lineitem l2
             |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (SELECT 1 FROM late l3
             |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
             |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)),

    // TPC-H Q22 shape (dormant high-balance customers): a scalar
    // subquery (global positive-balance average) gating an anti join
    // (customers with no order since 1999 — the fixture's last ~2.5
    // years), grouped by nation. Scale plan: the scalar reduces to ONE
    // broadcast row (never a per-row recompute); the anti join's right
    // side is date-filtered BEFORE its shuffle so only recent order
    // keys move; the nation dim broadcasts. The 4-decimal round on the
    // average pins the float comparison boundary across engines.
    QueryDef("q_tpch_q22",
      (s, d) => {
        val cust = T.customer(s, d)
        val avgBal = cust.filter(col("c_acctbal") > 0)
          .agg(round(avg(col("c_acctbal")), 4).as("avg_bal"))
        val recent = T.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1999-01-01 00:00:00")))
          .select(col("o_custkey"))
        cust.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("cntry"))
          .agg(count(lit(1)).as("numcust"),
            round(sum(col("c_acctbal")), 4).as("totacctbal"))
          .orderBy(col("cntry"))
      },
      Some("""WITH ab AS (SELECT round(avg(c_acctbal), 4) AS avg_bal
             |            FROM customer WHERE c_acctbal > 0)
             |SELECT n_name AS cntry, CAST(count(*) AS BIGINT) AS numcust,
             |       round(sum(c_acctbal), 4) AS totacctbal
             |FROM customer JOIN nation ON c_nationkey = n_nationkey, ab
             |WHERE c_acctbal > avg_bal
             |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                  AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q4 shape (order-priority checking): the priority histogram
    // of one quarter's orders that had at least one slow lineitem
    // (shipdate 30+ days past the order date — the fixture carries no
    // commit/receipt dates). Scale plan: EXISTS is a LEFT SEMI keyed on
    // the order key; the quarter filter cuts orders BEFORE the join, and
    // the semi join's probe side carries only (orderkey, orderdate) —
    // the correlated date inequality rides the equi-join as a residual.
    QueryDef("q_tpch_q4",
      (s, d) => {
        val o = T.orders(s, d)
          .filter(col("o_orderdate") >= to_timestamp(lit("1996-04-01 00:00:00")) &&
            col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00")))
        val li = T.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        o.join(li,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
            "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
             |FROM orders
             |WHERE o_orderdate >= TIMESTAMP '1996-04-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
             |  AND EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey
             |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q14 shape (promotion effect): conditional aggregation over a
    // month of shipments — promo share of revenue as one ratio. Scale
    // plan: the ship-month filter prunes lineitem FIRST (at 100 TB with
    // a date-partitioned fact this is partition pruning, cf. q_join_dpp);
    // the part dim broadcasts; one row out, no shuffle beyond the final
    // 1-row agg.
    QueryDef("q_tpch_q14",
      (s, d) => {
        val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
        T.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-09-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1996-10-01 00:00:00")))
          .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
          .agg(round(lit(100.0) *
              sum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) / sum(rev), 4)
            .as("promo_revenue"))
      },
      Some("""SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
             |                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             |             / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'""".stripMargin)),

    // TPC-H Q16 shape (parts/supplier relationship): distinct-supplier
    // counts per part attribute group, with a NOT IN supplier exclusion
    // (negative balance stands in for the reference's complaint filter;
    // the fixture has no partsupp table, so lineitem is the
    // part↔supplier association). Scale plan: the exclusion list is a
    // tiny broadcast LEFT ANTI; part attribute filters cut the dim
    // before its broadcast join; count(DISTINCT) runs as the standard
    // two-phase Expand aggregation on (brand,type,size)-bounded keys;
    // top-40 via TakeOrderedAndProject.
    QueryDef("q_tpch_q16",
      (s, d) => {
        val sizes = Seq(1, 9, 14, 19, 23, 36, 45, 49).map(lit(_))
        val badSupp = T.supplier(s, d).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        val p = T.part(s, d)
          .filter(col("p_brand") =!= "Brand#1" && col("p_size").isin(sizes: _*))
        T.lineitem(s, d)
          .join(broadcast(badSupp), col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(broadcast(p), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
          .limit(40)
      },
      Some("""SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
             |FROM lineitem JOIN part ON l_partkey = p_partkey
             |WHERE p_brand <> 'Brand#1' AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
             |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
             |GROUP BY 1, 2, 3
             |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 40""".stripMargin)),

    // TPC-H Q19 shape (discounted revenue): three OR'd brand/size/
    // quantity clause groups — the disjunctive-predicate join. Scale
    // plan: Catalyst extracts the common equi-key (partkey) so this is
    // ONE broadcast hash join with the disjunction as a post-join
    // residual, never a cartesian; the brand/size arms also push to the
    // part scan as (brand IN …) ∧ (size ≤ 15) bounds via constraint
    // propagation.
    QueryDef("q_tpch_q19",
      (s, d) => {
        val li = T.lineitem(s, d)
        val p = T.part(s, d)
        val arm1 = col("p_brand") === "Brand#4" &&
          col("p_size").between(1, 5) && col("l_quantity").between(1, 11)
        val arm2 = col("p_brand") === "Brand#12" &&
          col("p_size").between(1, 10) && col("l_quantity").between(10, 20)
        val arm3 = col("p_brand") === "Brand#23" &&
          col("p_size").between(1, 15) && col("l_quantity").between(20, 30)
        li.join(broadcast(p), col("p_partkey") === col("l_partkey"))
          .filter(arm1 || arm2 || arm3)
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
      },
      Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
             |FROM lineitem JOIN part ON p_partkey = l_partkey
             |WHERE (p_brand = 'Brand#4'  AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
             |   OR (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
             |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""".stripMargin)),

    // TPC-H Q6 shape (forecasting revenue change): the pure filter+agg
    // fact scan — no join at all. Scale plan: every predicate pushes to
    // the parquet scan (shipdate range prunes row groups via min/max;
    // at 100 TB with date partitioning it prunes partitions); one 1-row
    // partial agg per task, no shuffle of data rows.
    QueryDef("q_tpch_q6",
      (s, d) => T.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
          col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 4).as("revenue")),
      Some("""SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin)),

    // TPC-H Q7 shape (volume shipping): bidirectional nation-pair trade
    // by year — the double-dimension-alias join. Scale plan: BOTH nation
    // copies are prefiltered to the two nations of interest BEFORE their
    // broadcasts (the supplier/customer joins then drop out-of-pair rows
    // early); the OR pairing survives as a cheap residual; one grouped
    // agg on (nation,nation,year)-bounded keys.
    QueryDef("q_tpch_q7",
      (s, d) => {
        val pair = Seq("NATION_3", "NATION_7")
        val n1 = T.nation(s, d).filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
        val n2 = T.nation(s, d).filter(col("n_name").isin(pair: _*))
          .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
        T.supplier(s, d)
          .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
          .join(T.lineitem(s, d), col("s_suppkey") === col("l_suppkey"))
          .join(T.orders(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(T.customer(s, d), col("c_custkey") === col("o_custkey"))
          .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
          .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).as("l_year"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
             |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             |             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             |             l_extendedprice * (1 - l_discount) AS volume
             |      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
             |           JOIN orders ON o_orderkey = l_orderkey
             |           JOIN customer ON c_custkey = o_custkey
             |           JOIN nation n1 ON s_nationkey = n1.n_nationkey
             |           JOIN nation n2 ON c_nationkey = n2.n_nationkey
             |      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             |          OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))) v
             |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin)),

    // TPC-H Q8 shape (national market share): one nation's share of a
    // region's PROMO-part order volume per year — the conditional-share
    // aggregation over a 7-table star. Scale plan: part (type-filtered),
    // region (name-filtered), and both nation copies broadcast; the
    // customer-side region filter cuts orders before the fact join; the
    // share is a single grouped conditional agg, never two passes.
    QueryDef("q_tpch_q8",
      (s, d) => {
        val n1 = T.nation(s, d)
          .select(col("n_nationkey").as("n1_key"), col("n_regionkey").as("n1_region"))
        val n2 = T.nation(s, d)
          .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
        val vol = col("l_extendedprice") * (lit(1) - col("l_discount"))
        T.part(s, d).filter(col("p_type") === "PROMO")
          .join(T.lineitem(s, d), col("p_partkey") === col("l_partkey"))
          .join(T.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
          .join(T.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(T.customer(s, d), col("o_custkey") === col("c_custkey"))
          .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
          .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
            col("n1_region") === col("r_regionkey"))
          .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
          .groupBy(year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(when(col("supp_nation") === "NATION_3", vol).otherwise(0.0)) /
              sum(vol), 4).as("mkt_share"))
          .orderBy(col("o_year"))
      },
      Some("""SELECT o_year, round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             |                     / sum(volume), 4) AS mkt_share
             |FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |             l_extendedprice * (1 - l_discount) AS volume,
             |             n2.n_name AS supp_nation
             |      FROM part JOIN lineitem ON p_partkey = l_partkey
             |           JOIN supplier ON s_suppkey = l_suppkey
             |           JOIN orders ON l_orderkey = o_orderkey
             |           JOIN customer ON o_custkey = c_custkey
             |           JOIN nation n1 ON c_nationkey = n1.n_nationkey
             |           JOIN region ON n1.n_regionkey = r_regionkey
             |           JOIN nation n2 ON s_nationkey = n2.n_nationkey
             |      WHERE r_name = 'ASIA' AND p_type = 'PROMO') v
             |GROUP BY o_year ORDER BY o_year""".stripMargin)),

    // TPC-H Q9 shape (product-type profit): per-nation yearly profit on
    // a part-name-matched product line. The fixture has no partsupp
    // supplycost, so cost is the documented proxy 5% of retail price ×
    // quantity — the LIKE-driven star join + two-level agg shape is the
    // point. Scale plan: the name-filtered part dim broadcasts; profit
    // is computed map-side; one grouped agg on (nation,year)-bounded
    // keys.
    QueryDef("q_tpch_q9",
      (s, d) => {
        val amount = col("l_extendedprice") * (lit(1) - col("l_discount")) -
          lit(0.05) * col("p_retailprice") * col("l_quantity")
        T.part(s, d).filter(col("p_name").like("%widget%"))
          .join(T.lineitem(s, d), col("p_partkey") === col("l_partkey"))
          .join(broadcast(T.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
          .join(T.orders(s, d), col("o_orderkey") === col("l_orderkey"))
          .join(broadcast(T.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
          .agg(round(sum(amount), 4).as("sum_profit"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT nation, o_year, round(sum(amount), 4) AS sum_profit
             |FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
             |             l_extendedprice * (1 - l_discount) - 0.05 * p_retailprice * l_quantity AS amount
             |      FROM part JOIN lineitem ON p_partkey = l_partkey
             |           JOIN supplier ON s_suppkey = l_suppkey
             |           JOIN orders ON o_orderkey = l_orderkey
             |           JOIN nation ON s_nationkey = n_nationkey
             |      WHERE p_name LIKE '%widget%') v
             |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin)),

    // TPC-H Q10 shape (returned-item reporting): top-20 customers by
    // revenue lost to returns in one quarter. Scale plan: the quarter
    // filter cuts orders before the fact join and the returnflag filter
    // cuts lineitem at its scan; nation broadcasts; top-20 via
    // TakeOrderedAndProject on the customer-sized agg output.
    QueryDef("q_tpch_q10",
      (s, d) => {
        T.customer(s, d)
          .join(T.orders(s, d)
            .filter(col("o_orderdate") >= to_timestamp(lit("1996-04-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1996-07-01 00:00:00"))),
            col("c_custkey") === col("o_custkey"))
          .join(T.lineitem(s, d).filter(col("l_returnflag") === "R"),
            col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(T.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("revenue"))
          .select(col("c_custkey"), col("c_name"), col("revenue"),
            round(col("c_acctbal"), 4).as("acctbal"), col("n_name"))
          .orderBy(col("revenue").desc, col("c_custkey"))
          .limit(20)
      },
      Some("""SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
             |       round(c_acctbal, 4) AS acctbal, n_name
             |FROM customer JOIN orders ON c_custkey = o_custkey
             |     JOIN lineitem ON l_orderkey = o_orderkey
             |     JOIN nation ON c_nationkey = n_nationkey
             |WHERE o_orderdate >= TIMESTAMP '1996-04-01 00:00:00'
             |  AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
             |  AND l_returnflag = 'R'
             |GROUP BY c_custkey, c_name, c_acctbal, n_name
             |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin)),

    // TPC-H Q12 shape (shipping modes / priority): high- vs low-priority
    // line counts among late shipments, per line status (the fixture
    // carries no shipmode column — linestatus stands in; the
    // late-delivery conditional-count join is the shape). Scale plan:
    // the ship-year filter prunes lineitem at the scan; one equi-join on
    // the order key with the lateness inequality as residual; two
    // conditional counts in one grouped agg.
    QueryDef("q_tpch_q12",
      (s, d) => {
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        T.orders(s, d)
          .join(T.lineitem(s, d)
            .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00"))),
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
          .groupBy(col("l_linestatus"))
          .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
            sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
          .orderBy(col("l_linestatus"))
      },
      Some("""SELECT l_linestatus, CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
             |                              THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
             |       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
             |                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
             |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
             |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // TPC-H Q15 shape (top supplier): the max-over-an-aggregated-view
    // subquery. Scale plan: the quarter revenue agg is supplier-bounded;
    // its max reduces to ONE broadcast row the agg output filters
    // against (never a re-aggregation or window over the fact table).
    // Revenue is rounded INSIDE the view on both sides so the
    // max-equality compares identical 4-dp values across engines.
    QueryDef("q_tpch_q15",
      (s, d) => {
        val rev = T.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1996-04-01 00:00:00")))
          .groupBy(col("l_suppkey"))
          .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
            .as("total_rev"))
        rev.crossJoin(broadcast(rev.agg(max(col("total_rev")).as("mx"))))
          .filter(col("total_rev") === col("mx"))
          .join(broadcast(T.supplier(s, d)), col("s_suppkey") === col("l_suppkey"))
          .select(col("s_suppkey"), col("s_name"), col("total_rev"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH rev AS (SELECT l_suppkey, round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_rev
             |             FROM lineitem
             |             WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |               AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
             |             GROUP BY 1)
             |SELECT s_suppkey, s_name, total_rev
             |FROM supplier JOIN rev ON s_suppkey = l_suppkey
             |WHERE total_rev = (SELECT max(total_rev) FROM rev)
             |ORDER BY s_suppkey""".stripMargin)),

    // TPC-H Q2 shape (minimum-cost supplier): the correlated-min
    // subquery — for each qualifying part, the supplier(s) at the
    // minimum balance among that part's suppliers (the fixture has no
    // partsupp: lineitem is the association, balance stands in for
    // supply cost). Scale plan: decorrelated as a per-part min agg
    // joined back on (partkey, bal=min) — the min-equality compares an
    // UNCOMPUTED stored value against min of the same values, so float
    // equality is exact; the part filter broadcasts into both arms.
    QueryDef("q_tpch_q2",
      (s, d) => {
        val pk = T.part(s, d)
          // size ends in 9 (Q2's suffix-match flavor moved to the size
          // axis): p_size=19 exactly matches ZERO parts at sf0.001 and
          // the smoke gate requires a non-empty result at every fixture
          .filter(col("p_size") % 10 === 9 && col("p_type") === "STANDARD")
          .select(col("p_partkey"))
        val assoc = T.lineitem(s, d)
          .join(broadcast(pk), col("l_partkey") === col("p_partkey"), "left_semi")
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val bal = assoc.join(broadcast(T.supplier(s, d)),
          col("l_suppkey") === col("s_suppkey"))
        val mins = bal.groupBy(col("l_partkey").as("m_partkey"))
          .agg(min(col("s_acctbal")).as("min_bal"))
        bal.join(broadcast(mins),
            col("l_partkey") === col("m_partkey") && col("s_acctbal") === col("min_bal"))
          .select(col("l_partkey").as("p_partkey"), col("s_name"),
            round(col("s_acctbal"), 4).as("acctbal"))
          .orderBy(col("p_partkey"), col("s_name"))
          .limit(50)
      },
      Some("""WITH assoc AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
             |bal AS (SELECT l_partkey, l_suppkey, s_name, s_acctbal
             |        FROM assoc JOIN supplier ON l_suppkey = s_suppkey),
             |mins AS (SELECT l_partkey, min(s_acctbal) AS min_bal FROM bal GROUP BY 1)
             |SELECT p_partkey, s_name, round(s_acctbal, 4) AS acctbal
             |FROM part JOIN bal ON p_partkey = bal.l_partkey
             |     JOIN mins ON p_partkey = mins.l_partkey AND s_acctbal = min_bal
             |WHERE p_size % 10 = 9 AND p_type = 'STANDARD'
             |ORDER BY p_partkey, s_name LIMIT 50""".stripMargin)),

    // TPC-H Q20 shape (potential part promotion): the nested aggregating
    // IN-subquery — suppliers who shipped more than 60 units of any
    // 'small'-named part in a year. Scale plan: the subquery is a
    // (suppkey,partkey)-grouped agg over the name-filtered, year-pruned
    // fact slice; HAVING cuts it to rare keys; the IN becomes a LEFT
    // SEMI against that small set (AQE sizes it broadcast); the supplier
    // dim never joins the fact directly.
    QueryDef("q_tpch_q20",
      (s, d) => {
        val smallParts = T.part(s, d).filter(col("p_name").like("small%"))
          .select(col("p_partkey"))
        val qualified = T.lineitem(s, d)
          .filter(col("l_shipdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
            col("l_shipdate") < to_timestamp(lit("1997-01-01 00:00:00")))
          .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(sum(col("l_quantity")).as("qty"))
          .filter(col("qty") > 60)
          .select(col("l_suppkey"))
        T.supplier(s, d)
          .join(qualified, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_name"), round(col("s_acctbal"), 4).as("acctbal"))
          .orderBy(col("s_name"))
      },
      Some("""SELECT s_name, round(s_acctbal, 4) AS acctbal
             |FROM supplier
             |WHERE s_suppkey IN (
             |  SELECT l_suppkey
             |  FROM lineitem JOIN part ON p_partkey = l_partkey
             |  WHERE p_name LIKE 'small%'
             |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
             |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
             |  GROUP BY l_suppkey, l_partkey HAVING sum(l_quantity) > 60)
             |ORDER BY s_name""".stripMargin)),

    // TPC-H Q11 shape (important stock): parts whose one-nation
    // inventory value exceeds a fraction of that nation's total — the
    // aggregate-vs-scalar-of-the-same-aggregate HAVING (the fixture has
    // no partsupp: value is the documented shipped-quantity × retail
    // proxy). Scale plan: the per-part value agg runs ONCE and feeds
    // both arms — its grand total reduces to one broadcast row the agg
    // output filters against; the nation filter broadcasts into the
    // fact join. 4-dp rounds on both value and threshold pin the float
    // comparison boundary.
    QueryDef("q_tpch_q11",
      (s, d) => {
        val n3 = T.nation(s, d).filter(col("n_name") === "NATION_3")
          .select(col("n_nationkey"))
        val supp = T.supplier(s, d)
          .join(broadcast(n3), col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val vals = T.lineitem(s, d)
          .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
          .join(broadcast(T.part(s, d).select(col("p_partkey"), col("p_retailprice"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"))
          .agg(round(sum(col("l_quantity") * col("p_retailprice")), 4).as("v"))
        vals.crossJoin(broadcast(
            vals.agg(round(sum(col("v")) * lit(0.002), 4).as("thr"))))
          .filter(col("v") > col("thr"))
          .select(col("l_partkey"), col("v").as("value"))
          .orderBy(col("value").desc, col("l_partkey"))
      },
      Some("""WITH val AS (SELECT l_partkey, round(sum(l_quantity * p_retailprice), 4) AS v
             |             FROM lineitem JOIN part ON p_partkey = l_partkey
             |                  JOIN supplier ON s_suppkey = l_suppkey
             |                  JOIN nation ON s_nationkey = n_nationkey
             |             WHERE n_name = 'NATION_3' GROUP BY 1)
             |SELECT l_partkey, v AS value
             |FROM val, (SELECT round(sum(v) * 0.002, 4) AS thr FROM val) t
             |WHERE v > thr ORDER BY value DESC, l_partkey""".stripMargin)),

    // Bigram language-model counts: corpus-wide c(w1,w2) and the
    // conditional P(w2|w1) among frequent pairs. The explode is map-side;
    // the single shuffle groups by bigram. The n>=3 floor is applied
    // BEFORE the w1 window (both here and in the oracle) so cond_p is a
    // distribution over surviving pairs; it also caps the window input.
    QueryDef("q_ngram_lm",
      (s, d) => {
        val cnt = bigrams(T.documents(s, d))
          .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
          .filter(col("n") >= 3)
        cnt.withColumn("cond_p",
            round(col("n") / sum(col("n")).over(Window.partitionBy(col("w1"))), 4))
          .orderBy(col("w1"), col("w2"))
      },
      Some("""WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '') AS t FROM documents),
             |pos  AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i FROM toks),
             |big  AS (SELECT t[i] AS w1, t[i+1] AS w2 FROM pos),
             |cnt  AS (SELECT w1, w2, count(*) AS n FROM big GROUP BY w1, w2)
             |SELECT w1, w2, CAST(n AS BIGINT) AS n,
             |       round(n * 1.0 / sum(n) OVER (PARTITION BY w1), 4) AS cond_p
             |FROM cnt WHERE n >= 3 ORDER BY w1, w2""".stripMargin)),

    // Per-doc perplexity under the corpus bigram LM — the LM-based
    // quality filter next to the heuristic scores (q_text_quality,
    // q_repetition): boilerplate scores low, word salad scores high.
    // Three shuffles, all on bounded keys: bigram counts (vocab²-bounded),
    // unigram-context counts (vocab-bounded), and the per-doc agg; the
    // doc-bigram → LM join reuses the bigram-key partitioning, and no
    // corpus-wide state ever sits on the driver.
    QueryDef("q_doc_ppl",
      (s, d) => {
        val big = bigrams(T.documents(s, d))
        val cnt = big.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n_big"))
        val uni = big.groupBy(col("w1")).agg(count(lit(1)).as("n_uni"))
        val lm = cnt.join(uni, "w1")
          .select(col("w1"), col("w2"), (col("n_big") / col("n_uni")).as("p"))
        big.join(lm, Seq("w1", "w2"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            round(exp(-avg(log(col("p")))), 4).as("ppl"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '') AS t FROM documents),
             |pos  AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i FROM toks),
             |big  AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM pos),
             |cnt  AS (SELECT w1, w2, count(*) AS n_big FROM big GROUP BY w1, w2),
             |uni  AS (SELECT w1, count(*) AS n_uni FROM big GROUP BY w1),
             |lm   AS (SELECT c.w1, c.w2, c.n_big * 1.0 / u.n_uni AS p
             |         FROM cnt c JOIN uni u ON c.w1 = u.w1)
             |SELECT b.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             |       round(exp(-avg(ln(p))), 4) AS ppl
             |FROM big b JOIN lm ON b.w1 = lm.w1 AND b.w2 = lm.w2
             |GROUP BY b.doc_id ORDER BY b.doc_id""".stripMargin)),

    // Curriculum staging: order the corpus by difficulty (mean unigram
    // surprisal −avg ln p(w) under the corpus's own distribution — rare-
    // word-heavy docs score high) and cut it into 4 training stages at
    // the exact quartiles. The scale decision: stage assignment does NOT
    // use a global ntile window (that moves every row to one partition)
    // — the three quartile boundaries reduce to ONE broadcast row and
    // each doc compares against them map-side, so the plan is two
    // bounded-key shuffles (unigram counts, per-doc agg) plus broadcast
    // joins. Per-doc difficulty is rounded to 4 dp BEFORE the quantile/
    // comparison — that pins the stage cut across engines AND bounds
    // the exact-percentile state: Spark's Percentile aggregates a
    // value→count map (not a value list), so pre-rounding caps its
    // buffer at the ~10⁵ distinct 4-dp values regardless of corpus
    // size, keeping the boundary agg map-side-combinable at 100 TB.
    QueryDef("q_curriculum",
      (s, d) => {
        val toks = T.documents(s, d)
          .select(col("doc_id"), explode(TextOps.unicodeWords(col("text"))).as("w"))
        val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("n_w"))
        val tot = uni.agg(sum(col("n_w")).as("n_tot"))
        val lm = uni.crossJoin(broadcast(tot))
          .select(col("w"), (col("n_w") / col("n_tot")).as("p"))
        val diff = toks.join(lm, "w")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            round(-avg(log(col("p"))), 4).as("difficulty"))
        val bounds = diff.agg(
          round(expr("percentile(difficulty, 0.25)"), 4).as("b1"),
          round(expr("percentile(difficulty, 0.5)"), 4).as("b2"),
          round(expr("percentile(difficulty, 0.75)"), 4).as("b3"))
        diff.crossJoin(broadcast(bounds))
          .select(col("n_tokens"), col("difficulty"),
            (lit(1) + (col("difficulty") > col("b1")).cast("int")
              + (col("difficulty") > col("b2")).cast("int")
              + (col("difficulty") > col("b3")).cast("int")).as("stage"))
          .groupBy(col("stage"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"),
            round(avg(col("difficulty")), 4).as("avg_difficulty"))
          .orderBy(col("stage"))
      },
      Some("""WITH toks AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS w FROM documents),
             |uni AS (SELECT w, count(*) AS n_w FROM toks GROUP BY w),
             |lm AS (SELECT w, n_w * 1.0 / (SELECT sum(n_w) FROM uni) AS p FROM uni),
             |diff AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |                round(-avg(ln(p)), 4) AS difficulty
             |         FROM toks JOIN lm USING (w) GROUP BY doc_id),
             |b AS (SELECT round(quantile_cont(difficulty, 0.25), 4) AS b1,
             |             round(quantile_cont(difficulty, 0.5), 4) AS b2,
             |             round(quantile_cont(difficulty, 0.75), 4) AS b3 FROM diff)
             |SELECT 1 + CAST(difficulty > b1 AS INTEGER)
             |         + CAST(difficulty > b2 AS INTEGER)
             |         + CAST(difficulty > b3 AS INTEGER) AS stage,
             |       CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
             |       round(avg(difficulty), 4) AS avg_difficulty
             |FROM diff, b GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Gopher-style repetition score: the share of a doc's bigrams taken
    // by its most-repeated bigram. Per-doc agg keyed on doc_id — the
    // explode stays narrow and the shuffle payload is (doc_id, w1, w2).
    QueryDef("q_repetition",
      (s, d) => bigrams(T.documents(s, d))
        .groupBy(col("doc_id"), col("w1"), col("w2")).agg(count(lit(1)).as("n"))
        .groupBy(col("doc_id"))
        .agg(sum(col("n")).as("n_bigrams"), max(col("n")).as("max_rep"),
          round(max(col("n")) / sum(col("n")), 4).as("top_share"))
        .orderBy(col("doc_id")),
      Some("""WITH toks AS (SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '') AS t FROM documents),
             |pos  AS (SELECT doc_id, t, unnest(generate_series(1, len(t)-1)) AS i FROM toks),
             |big  AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2 FROM pos),
             |cnt  AS (SELECT doc_id, w1, w2, count(*) AS n FROM big GROUP BY doc_id, w1, w2)
             |SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams, CAST(max(n) AS BIGINT) AS max_rep,
             |       round(max(n) * 1.0 / sum(n), 4) AS top_share
             |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // PII redaction: regex scrub of emails/phone fragments, entirely
    // map-side (no shuffle but the final order-for-oracle). The contact
    // string is synthesized from doc_id so the fixture deterministically
    // exercises both patterns; the count column proves replacements
    // happened rather than trusting an identity transform.
    QueryDef("q_pii_redact",
      (s, d) => {
        val raw = concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"))
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
        val afterEmail = regexp_replace(raw, emailRe, "<EMAIL>")
        T.documents(s, d).select(col("doc_id"),
          regexp_replace(afterEmail, "555-[0-9]{4}", "<PHONE>").as("redacted"),
          ((length(afterEmail) - length(regexp_replace(afterEmail, "<EMAIL>", ""))) / 7)
            .cast(LongType).as("n_emails"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH synth AS (
             |  SELECT doc_id,
             |         text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com or call 555-'
             |              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
             |  FROM documents)
             |SELECT doc_id,
             |       regexp_replace(regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
             |                      '555-[0-9]{4}', '<PHONE>', 'g') AS redacted,
             |       CAST((length(regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'))
             |             - length(replace(regexp_replace(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'), '<EMAIL>', ''))) / 7 AS BIGINT) AS n_emails
             |FROM synth ORDER BY doc_id""".stripMargin)),

    // Text normalization: lowercase, strip non-alphanumerics, collapse
    // whitespace — the canonicalization step ahead of exact dedup.
    // Pure map-side scalar pipeline (codegen'd regexp_replace chain).
    // Unicode classes (round 11): [^a-z0-9 ] DELETED every non-Latin
    // letter — normalizing "北京 café" to "caf" — so the strip keeps
    // \p{L}\p{N} and spaces; identical on the ASCII fixture.
    QueryDef("q_text_norm",
      (s, d) => {
        val norm = trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^\\p{L}\\p{N} ]", ""), " +", " "))
        T.documents(s, d).select(col("doc_id"), norm.as("norm_text"),
            size(split(norm, " ")).cast(LongType).as("n_tokens"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
             |       trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N} ]', '', 'g'), ' +', ' ', 'g')) AS norm_text,
             |       CAST(len(string_split(trim(regexp_replace(regexp_replace(lower(text), '[^\p{L}\p{N} ]', '', 'g'), ' +', ' ', 'g')), ' ')) AS BIGINT) AS n_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Deterministic ~30% sample with per-stratum accounting. The md5
    // predicate needs no pre-pass (vs reservoir/exact stratified sampling
    // which need per-group counts first) and composes with pushdown: at
    // 100 TB the sample rate is verified from the same single scan.
    QueryDef("q_sample_strat",
      (s, d) => T.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_total"),
          count(when(sampleKey < "4ccc", true)).as("n_sample"),
          round(count(when(sampleKey < "4ccc", true)) / count(lit(1)), 4).as("rate"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_total,
             |       CAST(count(*) FILTER (WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 4) < '4ccc') AS BIGINT) AS n_sample,
             |       round(count(*) FILTER (WHERE substring(md5(CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)), 1, 4) < '4ccc') * 1.0 / count(*), 4) AS rate
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Deterministic train/val/test split (1/16 test, 1/16 val) keyed on
    // doc_id — rows keep their split under append/repartition, the
    // property a reproducible corpus build needs (same design as
    // sources/Splits.scala, here in an engine-portable md5 form).
    QueryDef("q_split_hash",
      (s, d) => {
        val h = substring(md5(concat(lit("s:"), col("doc_id").cast("string"))), 1, 1)
        T.documents(s, d)
          .withColumn("split",
            when(h < "1", "test").when(h < "2", "val").otherwise("train"))
          .groupBy(col("lang"), col("split")).agg(count(lit(1)).as("n"))
          .orderBy(col("lang"), col("split"))
      },
      Some("""WITH tagged AS (
             |  SELECT lang,
             |         CASE WHEN substring(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 1) < '1' THEN 'test'
             |              WHEN substring(md5('s:' || CAST(doc_id AS VARCHAR)), 1, 1) < '2' THEN 'val'
             |              ELSE 'train' END AS split
             |  FROM documents)
             |SELECT lang, split, CAST(count(*) AS BIGINT) AS n
             |FROM tagged GROUP BY lang, split ORDER BY lang, split""".stripMargin)),

    // Priority sampling (Duffield–Lund–Thorup, JACM 2007): a weighted
    // sample of k=20 docs with the unbiased subset-sum estimator — the
    // principled way to sample a corpus proportionally to a weight
    // (here n_chars ≈ training cost) while keeping sum-of-weight
    // estimates exact in expectation: priority q_i = w_i/u_i, keep the
    // top-k, τ = the (k+1)-th priority, ŵ_i = max(w_i, τ). Fully
    // deterministic: u_i derives from md5(doc_id) (the q_split_hash
    // convention), and cross-engine float parity is EXACT by
    // construction — u = (hexval+0.5)/2^24 is an exact power-of-two
    // scaling and IEEE division is exactly rounded, so both engines
    // compute bit-identical priorities (no transcendental functions,
    // unlike the ln(u)/w form of Efraimidis–Spirakis). Scale plan: one
    // map-only pass + TakeOrderedAndProject top-21 (never a global
    // sort); the 21-row window that extracts τ is driver-sized.
    QueryDef("q_sample_priority",
      (s, d) => prioritySampleOf(T.documents(s, d), 20),
      Some("""WITH pri AS (
             |  SELECT doc_id, n_chars,
             |         n_chars / ((CAST('0x' || substring(md5('pri:' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) + 0.5) / 16777216.0) AS q
             |  FROM documents),
             |topk1 AS (SELECT * FROM pri ORDER BY q DESC, doc_id LIMIT 21),
             |ranked AS (
             |  SELECT doc_id, n_chars, q,
             |         row_number() OVER (ORDER BY q DESC, doc_id) AS rn,
             |         CASE WHEN count(*) OVER () >= 21 THEN min(q) OVER ()
             |              ELSE 0.0 END AS tau
             |  FROM topk1)
             |SELECT doc_id, n_chars, round(q, 4) AS priority,
             |       round(greatest(CAST(n_chars AS DOUBLE), tau), 4) AS est_w
             |FROM ranked WHERE rn <= 20 ORDER BY doc_id""".stripMargin)),

    // Per-stratum priority sampling: q_sample_priority's estimator run
    // independently per language (k=5 each) — the per-domain weighted
    // sample a mixture-balanced corpus build takes. The per-group top-
    // (k+1) cut routes through the custom GroupedTopK operator
    // (bounded per-partition heaps, shuffle ≤ partitions × langs × 6
    // rows) instead of a window rank that would SORT every doc within
    // its language; the τ windows then run over ≤ langs × 6 survivors.
    // Same exact-arithmetic u as q_sample_priority ⇒ same cross-engine
    // float parity; the oracle states the idiomatic window form, so the
    // custom physical operator is hash-checked per group end-to-end.
    QueryDef("q_sample_group",
      (s, d) => {
        val k = 5
        val v = conv(substring(md5(concat(lit("pri:"),
          col("doc_id").cast("string"))), 1, 6), 16, 10).cast("double")
        val u = (v + 0.5) / lit(16777216.0)
        val pri = T.documents(s, d).select(col("lang"), col("doc_id"),
          col("n_chars"), (col("n_chars").cast("double") / u).as("q"))
        val topk1 = graft.plans.GroupedTopKOp.topK(pri, k + 1,
          Seq("lang"), Seq("q" -> true, "doc_id" -> false))
        val w = Window.partitionBy(col("lang"))
          .orderBy(col("q").desc, col("doc_id"))
        val wg = Window.partitionBy(col("lang"))
        topk1
          .withColumn("rn", row_number().over(w))
          .withColumn("tau",
            when(count(lit(1)).over(wg) >= k + 1, min(col("q")).over(wg))
              .otherwise(lit(0.0)))
          .filter(col("rn") <= k)
          .select(col("lang"), col("doc_id"), col("n_chars"),
            round(col("q"), 4).as("priority"),
            round(greatest(col("n_chars").cast("double"), col("tau")), 4)
              .as("est_w"))
          .orderBy(col("lang"), col("doc_id"))
      },
      Some("""WITH pri AS (
             |  SELECT lang, doc_id, n_chars,
             |         n_chars / ((CAST('0x' || substring(md5('pri:' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) + 0.5) / 16777216.0) AS q
             |  FROM documents),
             |topk1 AS (
             |  SELECT * FROM (
             |    SELECT *, row_number() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS rn
             |    FROM pri) WHERE rn <= 6),
             |ranked AS (
             |  SELECT lang, doc_id, n_chars, q, rn,
             |         CASE WHEN count(*) OVER (PARTITION BY lang) >= 6
             |              THEN min(q) OVER (PARTITION BY lang) ELSE 0.0 END AS tau
             |  FROM topk1)
             |SELECT lang, doc_id, n_chars, round(q, 4) AS priority,
             |       round(greatest(CAST(n_chars AS DOUBLE), tau), 4) AS est_w
             |FROM ranked WHERE rn <= 5 ORDER BY lang, doc_id""".stripMargin)),

    // Fixed-width value histogram over events — the profiling pass that
    // sizes skew mitigations. One two-phase hash aggregate; bin count is
    // bounded by the value range, not the row count.
    QueryDef("q_histogram",
      (s, d) => T.events(s, d)
        .groupBy((floor(col("value") / 100) * 100).cast(LongType).as("bin"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sum_value"))
        .orderBy(col("bin")),
      Some("""SELECT CAST(floor(value / 100) * 100 AS BIGINT) AS bin,
             |       CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value
             |FROM events GROUP BY 1 ORDER BY bin""".stripMargin)),

    // Distribution-drift detection between two dataset versions (PSI —
    // population stability index, the standard model-monitoring drift
    // score): the value distribution of the month's first half (ref)
    // vs second half (cur), binned by 50, with the per-bin PSI term
    // (p_cur − p_ref)·ln(p_cur/p_ref) floored at 1e-6 mass. The gate a
    // continuously-rebuilt corpus runs before swapping a snapshot: a
    // total PSI > 0.2 conventionally blocks the swap. Scale plan: two
    // bounded-key aggs (bin count ≤ value range / width, halves = 2);
    // the per-half totals broadcast; everything else is map-side.
    QueryDef("q_drift_psi",
      (s, d) => {
        val tagged = T.events(s, d).select(
          when(col("ts") < to_timestamp(lit("2024-01-16 00:00:00")), "ref")
            .otherwise("cur").as("half"),
          (floor(col("value") / 50) * 50).cast(LongType).as("bin"))
        val counts = tagged.groupBy(col("half"), col("bin"))
          .agg(count(lit(1)).as("n"))
        val tot = counts.groupBy(col("half")).agg(sum(col("n")).as("t"))
        val p = counts.join(broadcast(tot), "half")
          .groupBy(col("bin"))
          .agg(
            coalesce(max(when(col("half") === "ref", col("n") / col("t"))),
              lit(0.0)).as("p_ref"),
            coalesce(max(when(col("half") === "cur", col("n") / col("t"))),
              lit(0.0)).as("p_cur"))
        p.select(col("bin"),
            round(col("p_ref"), 4).as("p_ref"),
            round(col("p_cur"), 4).as("p_cur"),
            round((greatest(col("p_cur"), lit(1e-6)) - greatest(col("p_ref"), lit(1e-6)))
              * log(greatest(col("p_cur"), lit(1e-6)) / greatest(col("p_ref"), lit(1e-6))), 6)
              .as("psi_term"))
          .orderBy(col("bin"))
      },
      Some("""WITH tagged AS (
             |  SELECT CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 'ref'
             |              ELSE 'cur' END AS half,
             |         CAST(floor(value / 50) * 50 AS BIGINT) AS bin
             |  FROM events),
             |counts AS (SELECT half, bin, count(*) AS n FROM tagged GROUP BY half, bin),
             |tot AS (SELECT half, sum(n) AS t FROM counts GROUP BY half),
             |p AS (SELECT bin,
             |        coalesce(max(CASE WHEN c.half='ref' THEN n * 1.0 / t END), 0) AS p_ref,
             |        coalesce(max(CASE WHEN c.half='cur' THEN n * 1.0 / t END), 0) AS p_cur
             |      FROM counts c JOIN tot USING (half) GROUP BY bin)
             |SELECT bin, round(p_ref, 4) AS p_ref, round(p_cur, 4) AS p_cur,
             |       round((greatest(p_cur, 1e-6) - greatest(p_ref, 1e-6))
             |             * ln(greatest(p_cur, 1e-6) / greatest(p_ref, 1e-6)), 6) AS psi_term
             |FROM p ORDER BY bin""".stripMargin)),

    // RFM segmentation — the classic user-feature-engineering operator:
    // per-user Recency (days since last activity, vs the data-derived
    // corpus max date — H4), Frequency (event count), Monetary (2-dp
    // spend), each scored 1–4 by quartile, composed into a 3-digit
    // segment code with per-segment population and mean spend. The
    // 100-TB shape deliberately avoids the textbook ntile() — a global
    // window is the one-partition trap — and instead reduces all nine
    // quartile boundaries to ONE broadcast row (exact interpolated
    // percentiles over the user-sized frame; the q_curriculum pattern),
    // making score assignment a map-side comparison.
    QueryDef("q_rfm",
      (s, d) => {
        val e = T.events(s, d)
        val per = e
          .groupBy(col("user_id"))
          .agg(max(to_date(col("ts"))).as("last_d"),
            count(lit(1)).as("freq"),
            round(sum(col("value")), 2).as("mon"))
        val ref = e.agg(max(to_date(col("ts"))).as("ref_d"))
        val rfm = per.join(broadcast(ref))
          .withColumn("rec", datediff(col("ref_d"), col("last_d")))
        val q = rfm.agg(
          expr("percentile(rec, 0.25)").as("r1"), expr("percentile(rec, 0.5)").as("r2"),
          expr("percentile(rec, 0.75)").as("r3"),
          expr("percentile(freq, 0.25)").as("f1"), expr("percentile(freq, 0.5)").as("f2"),
          expr("percentile(freq, 0.75)").as("f3"),
          expr("percentile(mon, 0.25)").as("m1"), expr("percentile(mon, 0.5)").as("m2"),
          expr("percentile(mon, 0.75)").as("m3"))
        def up(v: org.apache.spark.sql.Column, b1: String, b2: String, b3: String) =
          when(v <= col(b1), 1).when(v <= col(b2), 2).when(v <= col(b3), 3).otherwise(4)
        rfm.join(broadcast(q))
          .withColumn("r_score", lit(5) - up(col("rec"), "r1", "r2", "r3"))
          .withColumn("f_score", up(col("freq"), "f1", "f2", "f3"))
          .withColumn("m_score", up(col("mon"), "m1", "m2", "m3"))
          .groupBy((col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
            .as("rfm_code"))
          .agg(count(lit(1)).as("n_users"), round(avg(col("mon")), 4).as("avg_mon"))
          .orderBy(col("rfm_code"))
      },
      Some("""WITH per AS (
             |  SELECT user_id, max(CAST(ts AS DATE)) AS last_d,
             |         count(*) AS freq, round(sum(value), 2) AS mon
             |  FROM events GROUP BY user_id),
             |ref AS (SELECT max(CAST(ts AS DATE)) AS ref_d FROM events),
             |rfm AS (SELECT user_id, date_diff('day', last_d, ref_d) AS rec,
             |               freq, mon FROM per, ref),
             |q AS (SELECT quantile_cont(rec, 0.25) AS r1, quantile_cont(rec, 0.5) AS r2,
             |             quantile_cont(rec, 0.75) AS r3,
             |             quantile_cont(freq, 0.25) AS f1, quantile_cont(freq, 0.5) AS f2,
             |             quantile_cont(freq, 0.75) AS f3,
             |             quantile_cont(mon, 0.25) AS m1, quantile_cont(mon, 0.5) AS m2,
             |             quantile_cont(mon, 0.75) AS m3
             |      FROM rfm),
             |scored AS (
             |  SELECT 5 - (CASE WHEN rec <= r1 THEN 1 WHEN rec <= r2 THEN 2
             |                   WHEN rec <= r3 THEN 3 ELSE 4 END) AS r_score,
             |         CASE WHEN freq <= f1 THEN 1 WHEN freq <= f2 THEN 2
             |              WHEN freq <= f3 THEN 3 ELSE 4 END AS f_score,
             |         CASE WHEN mon <= m1 THEN 1 WHEN mon <= m2 THEN 2
             |              WHEN mon <= m3 THEN 3 ELSE 4 END AS m_score,
             |         mon
             |  FROM rfm, q)
             |SELECT CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER) AS rfm_code,
             |       CAST(count(*) AS BIGINT) AS n_users,
             |       round(avg(mon), 4) AS avg_mon
             |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin))
  )

  /** q_sample_priority's core over an arbitrary (doc_id, n_chars) frame
    * — the spec feeds sub-k populations to pin the τ = 0 edge (with ≤ k
    * items there is no (k+1)-th priority and the estimator must return
    * ŵ = w exactly; min(q) would inflate every weight since q = w/u > w
    * always, u < 1). The τ window runs over ≤ k+1 rows — driver-sized.
    */
  def prioritySampleOf(docs: org.apache.spark.sql.DataFrame,
                       k: Int): org.apache.spark.sql.DataFrame = {
    val v = conv(substring(md5(concat(lit("pri:"),
      col("doc_id").cast("string"))), 1, 6), 16, 10).cast("double")
    val u = (v + 0.5) / lit(16777216.0)
    val topk1 = docs
      .select(col("doc_id"), col("n_chars"),
        (col("n_chars").cast("double") / u).as("q"))
      .orderBy(col("q").desc, col("doc_id"))
      .limit(k + 1)
    val w = Window.orderBy(col("q").desc, col("doc_id"))
    val wAll = Window.partitionBy()
    topk1
      .withColumn("rn", row_number().over(w))
      .withColumn("tau",
        when(count(lit(1)).over(wAll) >= k + 1, min(col("q")).over(wAll))
          .otherwise(lit(0.0)))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("n_chars"),
        round(col("q"), 4).as("priority"),
        round(greatest(col("n_chars").cast("double"), col("tau")), 4)
          .as("est_w"))
      .orderBy(col("doc_id"))
  }
}
