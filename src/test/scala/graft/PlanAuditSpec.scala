package graft

import graft.queries.Similarity
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits (SURVEY.md: ".explain the plan and iterate until
  * it's the plan you'd want"): these lock in the scale-critical plan
  * properties so a regression (lost pushdown, surprise shuffle, dropped
  * broadcast) fails CI instead of surfacing as a 100-TB incident.
  */
class PlanAuditSpec extends AnyFunSuite with SharedSpark {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, sf)

  test("q_scan_project prunes the scan to the selected columns") {
    val plan = formattedPlan(q("q_scan_project"))
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_extendedprice") && !readSchema.contains("l_shipdate"),
      s"scan reads pruned columns: $readSchema")
  }

  test("q_filter_pred pushes predicates into the parquet scan") {
    val plan = formattedPlan(q("q_filter_pred"))
    val pushed = plan.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    assert(pushed.contains("In(o_orderpriority") || pushed.contains("o_orderpriority"),
      s"expected pushed filters, got: $pushed")
    assert(!pushed.contains("PushedFilters: []"))
  }

  test("q_join_bcast broadcasts the dimension side (no fact shuffle)") {
    val plan = formattedPlan(q("q_join_bcast"))
    assert(plan.contains("BroadcastHashJoin"), "dimension join must broadcast")
  }

  test("q_join_smj uses sort-merge for the big-big join") {
    val plan = formattedPlan(q("q_join_smj"))
    assert(plan.contains("SortMergeJoin"), "big-big join must sort-merge")
  }

  test("q_topk_global plans as TakeOrderedAndProject (no full sort)") {
    val plan = formattedPlan(q("q_topk_global"))
    assert(plan.contains("TakeOrderedAndProject"),
      "global top-k must not globally sort all rows")
  }

  test("q_agg_q1 aggregates in two phases (map-side partial)") {
    val plan = formattedPlan(q("q_agg_q1"))
    val hashAggs = "HashAggregate".r.findAllIn(plan).size
    assert(hashAggs >= 2, s"expected partial+final HashAggregate, got $hashAggs")
  }

  test("simhash and minhash signatures are computed without any shuffle") {
    val sim = Similarity.simhashOf(Tables.documents(spark, sf))
    assert(!sim.queryExecution.executedPlan.toString.contains("Exchange"),
      "simhash must be map-only")
    val sig = Similarity.minhashSignaturesOf(Tables.documents(spark, sf))
    assert(!sig.queryExecution.executedPlan.toString.contains("Exchange"),
      "minhash signatures must be map-only")
  }

  test("custom text kernels participate in whole-stage codegen") {
    val sim = Similarity.simhashOf(Tables.documents(spark, sf))
    // codegen'd operators carry the `*` prefix in the executed plan
    val plan = sim.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project") || plan.contains("* Project"),
      s"custom expressions must not break codegen:\n$plan")
  }

  test("hive-partitioned sink enables partition pruning on read-back") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.events(spark, sf)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val back = spark.read.parquet(dir).filter(col("event_type") === "click")
    val pf = formattedPlan(back).linesIterator
      .find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("event_type"), s"expected partition filter, got: $pf")
    assert(back.count() ==
      Tables.events(spark, sf).filter(col("event_type") === "click").count())
  }

  test("q_bloom_prefilter carries the bloom probe as a pre-join filter") {
    val plan = q("q_bloom_prefilter").queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom probe must appear as a filter in the plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      "the exact join must remain after the prefilter")
  }

  test("q_lang_id is map-only: no hash exchange before the output sort") {
    val plan = q("q_lang_id").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"lang-id voting must not shuffle:\n$plan")
  }

  test("q_dedup_exact shuffles the sha2 digest, not the document text") {
    val planStr = q("q_dedup_exact").queryExecution.executedPlan.toString
    val exchanges = planStr.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, "expected a hash exchange for the groupBy")
    // Spark aliases the group key to _groupingexpression; the Project
    // below the exchange defines it as the sha2 digest.
    exchanges.foreach { ex =>
      assert(ex.contains("_groupingexpression") || ex.contains("digest"),
        s"group-by exchange must key on the digest: $ex")
      assert(!ex.contains("norm_text") && !ex.contains("text#"),
        s"document text must not be a shuffle key: $ex")
    }
    assert(planStr.contains("sha2"), "grouping key must be the sha2 digest")
  }

  test("q_dedup_para keys the winner shuffle on the paragraph digest, never paragraph text") {
    val planStr = q("q_dedup_para").queryExecution.executedPlan.toString
    val exchanges = planStr.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty, "expected digest + doc_id exchanges")
    exchanges.foreach { ex =>
      assert(!ex.contains("para#") && !ex.contains("clean_text"),
        s"paragraph text must never be a shuffle key: $ex")
    }
    assert(planStr.contains("sha2"), "winner selection must key on the sha2 digest")
  }

  test("q_profile: one column-pruned scan per branch, never an Expand") {
    val plan = formattedPlan(q("q_profile"))
    val scans = plan.linesIterator.count(_.trim.matches(raw"\(\d+\) Scan parquet.*"))
    assert(scans == 6, s"one branch per profiled column, found $scans scans")
    // each branch reads exactly its own column (pruned), and the exact
    // multi-distinct Expand formulation (measured 4x slower) must not
    // come back
    assert(!plan.contains("Expand"), "profile must not expand the input")
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.forall(_.count(_ == ',') == 0),
      s"every branch scan must read a single column: $readSchemas")
  }

  test("q_stream_enrich broadcasts the customer dimension (fact side never shuffles for the join)") {
    val plan = formattedPlan(q("q_stream_enrich"))
    assert(plan.contains("BroadcastHashJoin"), "dimension join must broadcast")
  }

  test("q_bm25 broadcasts the corpus statistics and document-frequency sides") {
    val plan = formattedPlan(q("q_bm25"))
    val bhj = "BroadcastHashJoin".r.findAllIn(plan).size +
      "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bhj >= 2, s"df and corpus-stats joins must broadcast, got $bhj broadcast joins")
  }

  test("CBO: with ANALYZE TABLE stats present, the 3-table chain keeps its broadcasts") {
    import org.apache.spark.sql.functions._
    // Catalyst's CBO only reads catalog statistics, so land the chain's
    // tables in the warehouse and ANALYZE them — the 100-TB workflow
    // (stats-informed join planning) in miniature.
    for ((name, df) <- Seq(
        "cbo_customer" -> Tables.customer(spark, sf),
        "cbo_nation" -> Tables.nation(spark, sf),
        "cbo_region" -> Tables.region(spark, sf))) {
      df.write.mode("overwrite").saveAsTable(name)
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
      // stats actually landed: row counts visible to the optimizer (the
      // rowCount-bearing stats visitor only runs with CBO enabled)
      val nStats = spark.table("cbo_nation").queryExecution.optimizedPlan.stats
      assert(nStats.rowCount.exists(_.toLong == 25L),
        s"ANALYZE stats missing from the catalog: $nStats")
      // UNHINTED chain: with CBO on and stats present the planner must
      // still broadcast the two dimension tables, not shuffle customer.
      val chain = spark.table("cbo_customer")
        .join(spark.table("cbo_nation"), col("c_nationkey") === col("n_nationkey"))
        .join(spark.table("cbo_region"), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_cust"))
      val plan = formattedPlan(chain)
      // formatted explain repeats each node (tree + detail) → 2 joins = 4 hits
      val nBcast = "BroadcastHashJoin".r.findAllIn(plan).size
      assert(nBcast == 4, s"expected both dimension joins broadcast under CBO:\n$plan")
      assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
        s"CBO must not shuffle the fact side of the chain:\n$plan")
      assert(chain.count() == 25L)
    } finally {
      spark.conf.set("spark.sql.cbo.enabled", "false")
      spark.conf.set("spark.sql.cbo.joinReorder.enabled", "false")
      Seq("cbo_customer", "cbo_nation", "cbo_region")
        .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("q_month_range broadcasts the 1-row aggregate, not the fact side") {
    val plan = formattedPlan(q("q_month_range"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "data-derived 'now' must broadcast")
  }

  test("q_inverted_index engages the GroupedTopK operator and prunes the scan") {
    val plan = formattedPlan(q("q_inverted_index"))
    assert(plan.contains("GroupedTopK"),
      "posting heads must run through the bounded-heap operator, not a window sort")
    assert(!plan.contains("Window"), "no window operator in the index build")
    // two scan branches: the df-count branch prunes all the way to
    // struct<text> (count(1) needs no doc_id), the posting branch
    // carries doc_id+text; neither may read the unused columns
    val readSchemas = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.exists(l => l.contains("doc_id") && l.contains("text")))
    assert(readSchemas.forall(l => !l.contains("lang") && !l.contains("source")),
      s"scan reads pruned columns: $readSchemas")
  }

  test("q_gap_fill aggregates map-side and broadcasts only the bounded type spine") {
    val plan = formattedPlan(q("q_gap_fill"))
    val hashAggs = "HashAggregate".r.findAllIn(plan).size
    assert(hashAggs >= 2, s"expected partial+final HashAggregate, got $hashAggs")
    // the only nested-loop join allowed is spine x 5-type broadcast
    assert(!plan.contains("CartesianProduct"),
      "spine cross must broadcast, never a cartesian over data rows")
  }

  test("q_rrf_fusion windows are partitioned (no single-partition global sort)") {
    val plan = formattedPlan(q("q_rrf_fusion"))
    // every Window in the fused plan partitions by lang; a missing
    // partitionBy would plan a single-partition window over the corpus
    val bad = plan.linesIterator.filter(_.contains("Window"))
      .exists(l => l.contains("windowspecdefinition") && !l.contains("lang"))
    assert(!bad, s"unpartitioned window in:\n$plan")
  }

  test("q_dedup_cjk joins on band buckets (hash/merge join), never a pair cross product") {
    // the char-shingle path must inherit the token path's plan shape:
    // candidates meet in a band-key equi-join; signatures are computed
    // map-side by the codegen'd kernels inside the scan stage
    val plan = formattedPlan(q("q_dedup_cjk"))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"band equi-join expected:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "near-dup candidates must never plan as a cross product")
    // the OUTER plan (candidate join over the checkpointed signatures)
    // must contain NO nested loop at all — a lost equi-key degrading
    // the band join to BNLJ is exactly the 100-TB incident this pins
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"candidate join degraded to a nested loop:\n$plan")
    // The signing stage is checkpointed (one materialization feeds both
    // self-join sides — round 13), so its lineage is behind an
    // ExistingRDD scan in the outer plan; audit it directly. The hot-set
    // filter must be the keep_cold reference-object kernel, NOT a
    // per-row array_except against a joined-in hot array (which rebuilt
    // the hot hash set per row — the slope-169 blow-up ScaleSlope
    // caught at the 100× saturated tier), so the signing plan contains
    // NO join of any kind: scan → kernels, map-only.
    val sigPlan = formattedPlan(graft.queries.Similarity
      .cappedCharSignaturesOf(Tables.documents(spark, sf)))
    assert(sigPlan.contains("char_shingles") && sigPlan.contains("minhash_sig") &&
      sigPlan.contains("keep_cold"),
      s"signatures must come from the codegen'd kernels, not lambdas/joins:\n$sigPlan")
    assert(!sigPlan.contains("Join") && !sigPlan.contains("CartesianProduct"),
      s"the signing stage must be map-only:\n$sigPlan")
  }

  test("q_dedup_cjk_exact: shingle equi-join (never cross product), kernel shingles, df-capped") {
    // the exact char twin must keep q_dedup_ngram's plan shape: one
    // shared kernel projection in the scan stage, candidates meet in a
    // shingle-keyed equi-join, and the df window runs on the SAME
    // shingle key (the exchange is reused, not added)
    val plan = formattedPlan(q("q_dedup_cjk_exact"))
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"), s"shingle equi-join expected:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "exact pairs must never plan as a cross product")
    // the kept-shingle frame is checkpointed since round 15 (one
    // materialization feeds all four plan branches), so the kernel
    // lineage sits behind an ExistingRDD in the outer plan — audit the
    // shingle stage directly, the cappedCharSignaturesOf convention
    val shPlan = formattedPlan(
      graft.queries.Similarity.charShinglesOf(Tables.documents(spark, sf)))
    assert(shPlan.contains("char_shingles"),
      "shingles must come from the codegen'd kernel, not lambdas")
  }

  test("q_zorder has no window operator — global rank runs on the zipWithIndex primitive") {
    // the one-time single-partition ntile(64) window over the whole
    // fact table is gone: bucket assignment must come from range-
    // partitioned sort + zipWithIndex (ordered partitions, bounded
    // exchange), with the row count joined in as a broadcast scalar
    val plan = formattedPlan(q("q_zorder"))
    assert(!plan.contains("Window"),
      s"q_zorder must not plan any window operator:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "the 1-row count frame must ride a broadcast, not a shuffle")
  }

  test("q_geo_radius joins on grid cells (hash join), never a nested-loop distance scan") {
    val plan = formattedPlan(q("q_geo_radius"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      "cell-key equi join expected")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"distance predicate must be a residual of the cell equi-join, got:\n$plan")
    assert(plan.contains("TakeOrderedAndProject"),
      "top-20 centers must cut via TakeOrderedAndProject, not a global sort")
  }

  test("q_assoc_rules cuts top-50 via TakeOrderedAndProject and aggregates map-side") {
    val plan = formattedPlan(q("q_assoc_rules"))
    assert(plan.contains("TakeOrderedAndProject"), "top-50 must not global-sort")
    val hashAggs = "HashAggregate".r.findAllIn(plan).size
    assert(hashAggs >= 4, s"expected partial+final pair/item aggs, got $hashAggs")
  }

  test("q_cdc_apply is one aggregation — no window operator anywhere") {
    val plan = formattedPlan(q("q_cdc_apply"))
    assert(!plan.contains("Window"),
      "last-writer-wins must run as max_by aggregation, not a row_number window")
    assert(plan.contains("HashAggregate") || plan.contains("SortAggregate"))
  }

  test("q_geo_knn runs GroupedTopK on cell candidates — no nested loop, no fact window") {
    val plan = formattedPlan(q("q_geo_knn"))
    assert(plan.contains("GroupedTopK"),
      "per-center cut must use the bounded-heap operator")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"kNN candidates must come from the cell equi-join:\n$plan")
    // the only Window is the rank over groups×k survivors, which sorts
    // ≤ 100 rows — assert it exists but never over the raw point scan
    assert(plan.contains("Window"))
  }

  test("q_geo_pairs self-joins on cells — no cross join, no nested loop") {
    val plan = formattedPlan(q("q_geo_pairs"))
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"),
      "all-pairs proximity must meet in a cell equi-join")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"self-join must not plan as a cross join:\n$plan")
  }

  test("q_join_overlap meets in a hash join on bins with the overlap as residual") {
    val plan = formattedPlan(q("q_join_overlap"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      "bin equi-join expected")
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"interval overlap must not plan as a nested loop:\n$plan")
  }

  test("q_dedup_prefix: kernel verify, no array_intersect, prefix explode bounded") {
    val plan = formattedPlan(q("q_dedup_prefix"))
    assert(plan.contains("sorted_overlap"),
      "verification must run the merge-scan kernel")
    assert(!plan.contains("array_intersect"),
      "array_intersect allocates an intersection array per candidate pair")
  }

  test("q_join_shj plans as ShuffledHashJoin (the hinted third strategy)") {
    val plan = formattedPlan(q("q_join_shj"))
    assert(plan.contains("ShuffledHashJoin"),
      s"hint must pin the shuffled-hash strategy:\n$plan")
  }

  test("q_hist_eqdepth inlines literal boundaries — no ntile, no join, one bucket agg") {
    val plan = formattedPlan(q("q_hist_eqdepth"))
    assert(!plan.contains("Window"), "equi-depth bucketing must not use ntile")
    // Round 15: boundaries come from a range-partitioned rank selection run
    // eagerly (14 rows to the driver) and are inlined as literal comparisons,
    // so the bucket plan has no join and no ObjectHashAggregate(percentile) —
    // just one partial+final HashAggregate pair over the scan.
    assert(!plan.contains("Join"), s"bucket pass must not join boundaries:\n$plan")
    assert(!plan.contains("ObjectHashAggregate"),
      "boundary percentile must not run as an object aggregate in the bucket plan")
    val aggNodes = raw"\(\d+\) (Object)?HashAggregate".r.findAllIn(plan).size
    assert(aggNodes <= 2, s"unexpected agg explosion ($aggNodes agg nodes):\n$plan")
  }

  test("q_source_overlap joins word-keyed and broadcasts the size table twice") {
    val plan = formattedPlan(q("q_source_overlap"))
    assert(!plan.contains("CartesianProduct"),
      "the source-pair matrix must come from the word-keyed join, not a cross join")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2,
      s"both size-table joins must broadcast:\n$plan")
  }

  test("q_join_nullskew: one join under the union, nulls filtered before it") {
    val plan = formattedPlan(q("q_join_nullskew"))
    // the null slice must NOT reach a join — exactly one join node total
    val joins = raw"\(\d+\) (BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)"
      .r.findAllIn(plan).size
    assert(joins == 1, s"expected exactly one join, got $joins:\n$plan")
    // the key filter may be pushed below the aliasing Project (isnotnull
    // over the CASE expression), so match the predicate, not the alias
    assert(plan.contains("isnotnull"),
      s"the joined slice must filter null keys before the join:\n$plan")
    assert(plan.contains("Union"), "null slice must union around the join")
  }

  test("q_schema_evo merged read keeps the evolved column and both batches") {
    val df = q("q_schema_evo")
    assert(df.columns.toSeq == Seq("priority", "n", "total"))
    // the declared query eagerly checkpoints before deleting its temp
    // batches (so its visible plan is a checkpoint scan); the sentinel
    // bucket must exist at value level (null-fill of the pre-evolution
    // batch survived)...
    assert(df.filter(org.apache.spark.sql.functions.col("priority")
      === "(pre-evolution)").count() == 1)
    // ...and the merged-read PLAN shape is audited on the same batch
    // layout directly: the mergeSchema scan must expose the evolved
    // column that only batch 2 carries
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_pa_evo")
    try {
      Seq((2L, 20.0)).toDF("o_orderkey", "o_totalprice")
        .write.parquet(s"$base/v1")
      Seq((1L, 10.0, "1-URGENT")).toDF("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.parquet(s"$base/v2")
      val plan = formattedPlan(
        spark.read.option("mergeSchema", "true").parquet(s"$base/v1", s"$base/v2"))
      assert(plan.contains("o_orderpriority"),
        s"merged schema must include the evolved column:\n$plan")
    } finally {
      import scala.util.Try
      val walk = java.nio.file.Files.walk(base)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { Try(java.nio.file.Files.deleteIfExists(p)); () })
      finally walk.close()
    }
  }

  test("q_ngram_novelty: reference shingles broadcast, corpus never shuffles for the join") {
    val plan = formattedPlan(q("q_ngram_novelty"))
    assert(plan.contains("BroadcastHashJoin"),
      s"the reference shingle set must broadcast:\n$plan")
    assert(plan.contains("LeftOuter"),
      "novelty is a left join (unseen shingles survive as nulls)")
    assert(!plan.contains("SortMergeJoin"),
      "the corpus side must not shuffle for the membership join")
  }

  test("q_hard_negatives: anchors broadcast, argmax is an aggregate, not a window") {
    val plan = formattedPlan(q("q_hard_negatives"))
    assert(!plan.contains("Window"),
      "triplet mining must argmax via partial-aggregable struct-max, not a window")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"the anchor side must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      "the anchor pairing must broadcast, never a cartesian exchange")
  }

  test("q_seasonal_decompose and q_label_balance: daily/label-bounded plans") {
    val sd = formattedPlan(q("q_seasonal_decompose"))
    // the only sort feeding a window runs over the |types|x|days| daily
    // table — the fact table itself must reduce through a HashAggregate
    // before any Window appears
    assert(sd.contains("Window"), "centered MA needs a range window")
    assert("HashAggregate".r.findAllIn(sd).size >= 2,
      "fact must reduce to the daily table map-side first")
    val lb = formattedPlan(q("q_label_balance"))
    assert(!lb.contains("Window") && lb.contains("BroadcastExchange"),
      s"label balance = bounded agg + broadcast totals:\n$lb")
  }

  test("q_dp_noise and q_k_anon aggregate map-side with bounded keys") {
    Seq("q_dp_noise", "q_k_anon").foreach { name =>
      val plan = formattedPlan(q(name))
      assert("HashAggregate".r.findAllIn(plan).size >= 2,
        s"$name: expected partial+final HashAggregate")
      assert(!plan.contains("Window"), s"$name must not need a window")
    }
  }
}
