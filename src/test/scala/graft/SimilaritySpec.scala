package graft

import graft.queries.Similarity
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Verifies the non-oracle similarity surface (SURVEY.md §2b: these are
  * engine-hash-specific or probabilistic, so they're checked against
  * exact computations instead of DuckDB).
  */
class SimilaritySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("identical texts get identical minhash signatures and simhash, hamming 0") {
    val docs = docsDf(
      0L -> "the quick brown fox jumps over the lazy dog",
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "an entirely different document about spark engines")
    val sigs = Similarity.minhashSignaturesOf(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(0L) == sigs(1L))
    assert(sigs(0L) != sigs(2L))
    val sh = Similarity.simhashOf(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(0L) == sh(1L))
    assert(java.lang.Long.bitCount(sh(0L) ^ sh(2L)) > 0)
  }

  test("char-shingle dedup finds CJK near-dups the token path is structurally blind to (q_dedup_cjk)") {
    // Space-free Han text: the token-3-gram path sees ONE giant token
    // per doc → zero shingles → zero signatures → zero pairs. The
    // char-8-gram path must find the planted near-dup pair and nothing
    // else. Docs 0/1: same 40-codepoint passage, one with a short
    // appended clause (high char-Jaccard). Doc 2: unrelated Han text.
    val base = "北京欢迎你我们都是好朋友这座城市有着悠久的历史和灿烂的文化每天都有新的故事发生"
    val cjk = docsDf(
      0L -> base,
      1L -> (base + "欢迎再来"),
      2L -> "机器学习模型需要大量高质量的训练数据去重和过滤是数据管道的核心步骤质量决定结果")
    assert(Similarity.minhashSignaturesOf(cjk).count() == 0,
      "token shingles must be structurally empty on space-free text (the motivating blindness)")
    val pairs = Similarity.charMinhashPairsOf(cjk, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((0L, 1L)),
      s"exactly the planted pair: ${pairs.toSeq}")
    assert(pairs.head._3 >= 0.5)
    // script-agnostic: Latin near-dups are found too, with punctuation
    // and case differences ignored by the letter/digit codepoint stream
    val latin = docsDf(
      10L -> "the quick brown fox jumps over the lazy dog again and again tonight",
      11L -> "The quick brown fox, jumps over the lazy dog again and again tonight!",
      12L -> "completely unrelated words about shuffle partitions and broadcast joins here")
    val lp = Similarity.charMinhashPairsOf(latin, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lp.toSeq == Seq((10L, 11L)), s"got ${lp.toSeq}")
    // empty shingle sets never band: punctuation-only docs (zero
    // letter/digit codepoints, length >= k) must not pair with each
    // other on the all-MaxValue signature
    val punct = docsDf(
      20L -> "!!! ??? ... ,,, ;;; :::",
      21L -> "### $$$ %%% ^^^ &&& ***")
    assert(Similarity.charMinhashPairsOf(punct, 0.0).count() == 0)
    // kernel shingle semantics: codepoint windows, case-folded, distinct
    val sh = Similarity.charMinhashSignaturesOf(docsDf(30L -> "aAaAaAaAaA"))
      .count()
    assert(sh == 1, "10 identical-codepoint letters yield one (distinct) shingle, still signed")
  }

  test("short documents (<3 tokens) produce no shingles and are excluded from signatures") {
    val docs = docsDf(0L -> "one two", 1L -> "a b c d")
    val arrs = Similarity.shingleArraysOf(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(arrs(0L).isEmpty)
    assert(arrs(1L) == Seq("a b c", "b c d"))
    assert(Similarity.minhashSignaturesOf(docs).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("minhash estimate tracks exact jaccard on sf0.001; high-sim pairs are recalled") {
    // exact jaccard per pair from the shared shingle definition
    val sh = Similarity.shingles(spark, sf).cache()
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val exact = sh.as("x").join(sh.as("y"),
        col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("n_common").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty, "fixture should contain near-duplicate docs")

    val est = Similarity.minhashPairs(spark, sf, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // recall: every exact pair >= 0.8 must be found by LSH banding
    exact.foreach { case (pair, j) =>
      assert(est.contains(pair), s"pair $pair (jaccard $j) missed by MinHash LSH")
      assert(math.abs(est(pair) - j) <= 0.3, s"pair $pair est ${est(pair)} vs exact $j")
    }
    sh.unpersist()
  }

  test("LSH pairs ⊆ exact-Jaccard pairs at the threshold, both shingle families (round 12)") {
    // The fixture's planted near-dups sit well above the 0.5 threshold,
    // so every LSH-emitted pair must also pass the exact filter (the
    // estimator has ~0.09 std there; a pair it can flip IN would need
    // exact J within a band the fixture doesn't populate). This is the
    // set-level complement of the ApproxOracle value bound the driver
    // now checks (q_dedup_near / q_dedup_cjk vs their exact twins).
    val docs = Tables.documents(spark, sf)
    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lshTok = pairs(Similarity.minhashPairsOf(docs, 0.5))
    val exactTok = pairs(graft.queries.TextOps.jaccardPairsOf(docs))
    assert(lshTok.nonEmpty, "fixture should contain token near-dups")
    assert(lshTok.subsetOf(exactTok),
      s"token LSH emitted non-pairs: ${(lshTok -- exactTok).take(5)}")
    val lshChar = pairs(Similarity.charMinhashPairsOf(docs, 0.5))
    val exactChar = pairs(graft.queries.TextOps.charJaccardPairsOf(docs))
    assert(lshChar.nonEmpty, "fixture should contain char near-dups")
    assert(lshChar.subsetOf(exactChar),
      s"char LSH emitted non-pairs: ${(lshChar -- exactChar).take(5)}")
  }

  test("df-capped signing: hot-boilerplate-only pairs are not emitted; genuine near-dups track capped exact (round 13)") {
    // Round 13 aligned the MinHash universe with the exact twins' df
    // cap: signatures sign only shingles with df <= MaxShingleDf. Plant
    // a boilerplate sentence in 202 docs (every internal shingle df=202,
    // hot). Docs 0/1 share ONLY that boilerplate — uncapped signing
    // scored them J ≈ 11/19 = 0.58 and emitted the pair; the capped
    // exact twin scores their kept sets at 1/9 = 0.11 and the capped
    // estimator must agree there is no pair. Docs 202/203 share genuine
    // sub-cap content and must still be found, tracking the capped exact
    // value, in BOTH shingle families.
    val boiler = "subscribe to our newsletter for daily updates and exclusive offers today"
    val content = "the quick brown fox jumps over that lazy dog near the river bank every morning"
    val rows = Seq(
      0L -> (boiler + " unique zero tail alpha beta"),
      1L -> (boiler + " unique one tail gamma delta"),
      202L -> (content + " ending two"),
      203L -> (content + " ending three")) ++
      (2 until 202).map(i =>
        i.toLong -> (boiler + " " + (0 until 12).map(j => s"f${i}w$j").mkString(" ")))
    val docs = docsDf(rows: _*)
    def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val estTok = pairs(Similarity.minhashPairsOf(docs, 0.5))
    assert(!estTok.contains((0L, 1L)),
      s"boilerplate-only pair must not survive the df cap: $estTok")
    val exactTok = pairs(graft.queries.TextOps.jaccardPairsOf(docs))
    assert(exactTok.contains((202L, 203L)) && exactTok((202L, 203L)) == 0.875,
      s"planted pair's capped exact jaccard: $exactTok")
    assert(estTok.contains((202L, 203L)), s"genuine near-dup missed: $estTok")
    assert(math.abs(estTok((202L, 203L)) - 0.875) <= 0.2,
      s"capped est must track capped exact: ${estTok((202L, 203L))}")
    // char family: same universe discipline (boilerplate 8-grams hot)
    val estChar = pairs(Similarity.charMinhashPairsOf(docs, 0.5))
    assert(!estChar.contains((0L, 1L)),
      s"char boilerplate-only pair must not survive the df cap: $estChar")
    val exactChar = pairs(graft.queries.TextOps.charJaccardPairsOf(docs))
    assert(estChar.contains((202L, 203L)) && exactChar.contains((202L, 203L)),
      s"char genuine near-dup missed: est=$estChar exact=$exactChar")
    assert(math.abs(estChar((202L, 203L)) - exactChar((202L, 203L))) <= 0.2,
      s"char capped est must track capped exact: ${estChar((202L, 203L))} vs ${exactChar((202L, 203L))}")
  }

  test("simhash band blocking finds duplicate and near-duplicate pairs, not distinct ones") {
    val docs = docsDf(
      0L -> "spark shuffles data between stages when a wide dependency appears in the plan",
      1L -> "spark shuffles data between stages when a wide dependency appears in the plan",
      2L -> "spark shuffles data between stages when a wide dependency shows in the plan",
      3L -> "completely unrelated text about cooking pasta with plenty of fresh basil leaves")
    val found = Similarity.simhashPairsOf(docs, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found.contains((0L, 1L)), "exact duplicate pair missed")
    assert(found.contains((0L, 2L)) && found.contains((1L, 2L)), "near-dup pair missed")
    assert(!found.exists(p => p._1 == 3L || p._2 == 3L), "distinct doc matched")
  }

  test("cosine guard: zero vectors score 0.0, never NaN") {
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val rows = Seq(
      Row(0L, Array.fill(4)(0.0f), 0),          // zero probe
      Row(1L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
      Row(2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 0))
    val emb = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = Similarity.bruteForceTopKOf(emb, Seq(0L), 2).collect()
    assert(out.length == 2)
    assert(out.forall(r => !r.getDouble(3).isNaN))
    assert(out.forall(r => r.getDouble(3) == 0.0))
  }

  test("lsh ANN top-k overlaps brute-force top-k on sf0.001") {
    val probes = Seq(0L, 1L, 2L)
    val bf = Similarity.bruteForceTopK(spark, sf, probes, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val lsh = Similarity.lshTopK(spark, sf, probes, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(lsh.nonEmpty, "LSH candidate generation must not be empty")
    val overlap = bf.intersect(lsh).size.toDouble / bf.size
    assert(overlap >= 0.4, s"LSH/brute-force overlap too low: $overlap")
  }

  test("lshTopKTables at the default table count reproduces lshTopK exactly") {
    val probes = Seq(0L, 1L, 2L)
    val base = Similarity.lshTopK(spark, sf, probes, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    val viaTables = Similarity.lshTopKTables(spark, sf, probes, 5,
        nTables = Similarity.LshTables)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(viaTables == base,
      "the explicit-table-count lever must be the same algorithm at the default")
    // and more OR-amplification tables can only widen the candidate
    // union: the default's hit set must survive at 4x the tables
    val wide = Similarity.lshTopKTables(spark, sf, probes, 5, nTables = 32)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(wide.nonEmpty)
  }

  test("JL-projected LSH top-k meets the un-projected path's brute-force recall bound") {
    val probes = Seq(0L, 1L, 2L)
    val bf = Similarity.bruteForceTopK(spark, sf, probes, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val jl = Similarity.lshTopKProjected(spark, sf, probes, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(jl.nonEmpty, "JL-LSH candidate generation must not be empty")
    val overlap = bf.intersect(jl).size.toDouble / bf.size
    // same bound the 64-d LSH path is held to — composing the projection
    // must not cost recall on the fixture
    assert(overlap >= 0.4, s"JL-LSH/brute-force overlap too low: $overlap")
  }

  test("ivf ANN top-k overlaps brute-force top-k on sf0.001") {
    val probes = Seq(0L, 1L, 2L)
    val bf = Similarity.bruteForceTopK(spark, sf, probes, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(spark, sf, probes, 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(ivf.nonEmpty, "IVF candidate generation must not be empty")
    val overlap = bf.intersect(ivf).size.toDouble / bf.size
    assert(overlap >= 0.3, s"IVF/brute-force overlap too low: $overlap")
  }

  test("geometry probe routes IVF on iso, LSH-8 on clustered/heavy; selected path meets recall") {
    // The SCALING.md round-9 finding as a mechanism: the probe must
    // recognize all three generator geometries, and the route it picks
    // must meet the recall bound ON that geometry (the whole point —
    // LSH-8 would sit at ~0.4 recall on iso, where the probe must
    // choose IVF instead).
    val geoms = Seq(
      "clustered" -> ScaleSlope.genEmbeddings(spark, 3000),
      "heavy" -> ScaleSlope.genEmbeddingsHeavy(spark, 3000),
      "iso" -> ScaleSlope.genEmbeddingsIso(spark, 3000))
    val probes = Seq(0L, 1L, 2L)
    geoms.foreach { case (g, emb0) =>
      val emb = emb0.select("vec_id", "embedding").localCheckpoint(true)
      val probe = Similarity.probeGeometry(emb)
      val route = Similarity.chooseRoute(probe)
      if (g == "iso")
        assert(route == Similarity.RouteIvf,
          s"iso must route to IVF, got $route (gap=${probe.gap})")
      else
        assert(route == Similarity.RouteLsh(Similarity.LshTables),
          s"$g must route to LSH-${Similarity.LshTables}, got $route (gap=${probe.gap})")
      val bf = Similarity.bruteForceTopKOf(emb, probes, 5)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val auto = Similarity.autoTopKOf(emb, probes, 5)
      assert(auto.select("route").distinct().collect().map(_.getString(0)).toSeq
        == Seq(route.name), "route column must surface the decision")
      val got = auto.collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val overlap = bf.intersect(got).size.toDouble / bf.size
      val bound = if (g == "iso") 0.6 else 0.8
      assert(overlap >= bound,
        s"$g via ${route.name}: recall $overlap below $bound")
    }
    // the LSH-pinned companion lever: more tables on a structureless
    // corpus, the default on a structured one
    assert(Similarity.lshTablesFor(
      Similarity.probeGeometry(ScaleSlope.genEmbeddingsIso(spark, 3000)
        .select("vec_id", "embedding"))) == 32)
    assert(Similarity.lshTablesFor(
      Similarity.probeGeometry(ScaleSlope.genEmbeddings(spark, 3000)
        .select("vec_id", "embedding"))) == Similarity.LshTables)
  }

  test("q_ann_auto on the isotropic fixture embeddings routes to IVF") {
    val auto = SparkEntry.queries("q_ann_auto")(spark, sf)
    val routes = auto.select("route").distinct().collect().map(_.getString(0)).toSeq
    assert(routes == Seq("ivf"),
      s"fixture embeddings are isotropic (max pairwise cos 0.51) — expected ivf, got $routes")
    assert(auto.count() > 0)
  }

  test("adaptive IVF geometry: clamps to 16 at fixture scale, grows as sqrt(n)") {
    assert(Similarity.adaptiveCentroids(2000) == Similarity.IvfCentroids)
    assert(Similarity.adaptiveCentroids(200000) == 112)  // ceil(sqrt(200000/16))
    assert(Similarity.adaptiveCentroids(1L << 40) == 4096) // driver-collect cap
    // identical results at fixture scale (lists clamps to the fixed 16)
    val fixed = Similarity.ivfTopK(spark, sf, Seq(0L, 1L, 2L), 5).collect().toSeq
    val adaptive = Similarity.ivfTopKAdaptive(spark, sf, Seq(0L, 1L, 2L), 5).collect().toSeq
    assert(fixed == adaptive)
  }

  test("custom expressions are SQL-registrable and match the Column API") {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, sf).createOrReplaceTempView("docs_sql")
    val viaSql = spark.sql("SELECT doc_id, simhash64(text) AS sh FROM docs_sql")
    val viaCol = Similarity.simhashOf(Tables.documents(spark, sf))
      .toDF("doc_id", "sh")
    assert(viaSql.exceptAll(viaCol).isEmpty && viaCol.exceptAll(viaSql).isEmpty)
    val shSql = spark.sql(
      "SELECT size(token_shingles(text)) AS n FROM docs_sql").agg(sum("n")).head().getLong(0)
    val shCol = Similarity.shingles(spark, sf).count()
    assert(shSql == shCol, s"SQL vs Column shingle counts differ: $shSql vs $shCol")
  }

  test("cosine near-dup pairs: planted near-duplicates are found, isotropic pairs are not") {
    val base = Tables.embeddings(spark, sf)
    // plant 10 near-duplicates: tiny perturbation on one dimension keeps
    // cosine ≈ 0.9999, far above the 0.95 near-dup threshold
    val copies = base.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding",
        transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)))
    val corpus = base.unionByName(copies)
    val got = Similarity.cosineDupPairsOf(corpus, 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0L until 10L).map(i => (i, i + 100000L)).toSet
    assert(got == want,
      s"expected exactly the 10 planted near-dup pairs, got ${got.size}: $got")
    // fixture-only corpus: no pair reaches 0.95 (max measured cosine 0.51)
    assert(Similarity.cosineDupPairsOf(base, 0.95).isEmpty)
  }

  test("adaptive LSH geometry: bits grow with corpus size, planted near-dups still found") {
    // grows log2 with n (constant target occupancy ⇒ linear candidates)
    assert(Similarity.adaptiveBits(100) == Similarity.LshBitsPerTable) // floor
    assert(Similarity.adaptiveBits(2000) == 8)    // ceil(log2(2000/8))
    assert(Similarity.adaptiveBits(20000) == 12)
    assert(Similarity.adaptiveBits(1L << 40) == 16) // recall-bound cap
    val base = Tables.embeddings(spark, sf)
    val copies = base.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000L)
      .withColumn("embedding",
        transform(col("embedding"), (x, i) => when(i === 0, x + lit(0.01f)).otherwise(x)))
    val got = Similarity.cosineDupPairsAdaptiveOf(base.unionByName(copies), 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L until 10L).map(i => (i, i + 100000L)).toSet)
  }

  test("IVF layout: corpus written partitioned by list id prunes probe scans to nprobe lists") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_lists").toString
    // the 100-TB layout step: land the assigned corpus hive-partitioned
    // by inverted-list id, so a probe's scan touches only its lists
    Similarity.ivfAssign(spark, sf).select(col("vec_id"), col("emb"), col("cid"))
      .write.mode("overwrite").partitionBy("cid").parquet(dir)
    val lists = spark.read.parquet(dir)
    val probeLists = Seq(0, 3, 5) // stand-in for a probe's nprobe nearest lists
    val pruned = lists.filter(col("cid").isin(probeLists: _*))
    val plan = formattedPlan(pruned)
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("cid"), s"probe must prune to its lists, got: $pf")
    // pruning is an optimization, not a semantics change
    assert(pruned.count() ==
      Similarity.ivfAssign(spark, sf).filter(col("cid").isin(probeLists: _*)).count())
  }

  test("fingerprints collide exactly for duplicate texts") {
    val docs = docsDf(
      0L -> "alpha beta gamma delta",
      1L -> "alpha beta gamma delta",
      2L -> "alpha beta gamma epsilon")
    val byId = Similarity.simhashOf(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(0L) == byId(1L))
  }

  test("JL random projection preserves pairwise squared distances in aggregate") {
    val projected = Similarity.randomProjectOf(Tables.embeddings(spark, sf))
      .select(col("vec_id"), col("emb"), col("proj"))
      .filter(col("vec_id") < 40) // 40 vectors → 780 pairs, driver-side check
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray))
    assert(projected.length == 40)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val ratios = for {
      i <- projected.indices; j <- (i + 1) until projected.length
    } yield d2(projected(i)._3, projected(j)._3) / d2(projected(i)._2, projected(j)._2)
    val mean = ratios.sum / ratios.size
    // 16 projected dims: E[ratio]=1, per-pair spread ~1/sqrt(8); the
    // fixture+seed are fixed so these bounds are deterministic in CI
    assert(mean > 0.85 && mean < 1.15, s"mean distortion $mean")
    assert(ratios.forall(r => r > 0.2 && r < 3.0),
      s"worst-pair distortion out of range: min=${ratios.min} max=${ratios.max}")
  }

  test("hard negatives match a driver-side brute-force recompute") {
    val anchors = Seq(0L, 1L, 2L)
    val all = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val expected = anchors.map { aid =>
      val (_, aEmb, aLabel) = all.find(_._1 == aid).get
      def best(pred: ((Long, Array[Double], Int)) => Boolean): (Long, Double) =
        all.filter(v => v._1 != aid && pred(v))
          .map(v => (v._1, cos(v._2, aEmb)))
          .maxBy { case (id, c) => (c, -id) }
      (aid, best(_._3 != aLabel), best(_._3 == aLabel))
    }
    val got = SparkEntry.queries("q_hard_negatives")(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)),
        (r.getLong(3), r.getDouble(4)))).toSeq
    assert(got.map(_._1) == anchors, "one row per anchor, anchor order")
    expected.zip(got).foreach { case ((aid, (hnId, hnC), (pId, pC)),
                                      (gAid, (gHnId, gHnC), (gPId, gPC))) =>
      assert(gAid == aid)
      assert(gHnId == hnId, s"anchor $aid hard-negative id")
      assert(math.abs(gHnC - math.rint(hnC * 10000) / 10000) < 1e-9)
      assert(gPId == pId, s"anchor $aid positive id")
      assert(math.abs(gPC - math.rint(pC * 10000) / 10000) < 1e-9)
      // a hard negative is only "hard" if it competes with the positive —
      // sanity: both sides found something (fixture has multiple labels)
    }
  }

  test("MMR selection matches an independent greedy recompute and diversifies") {
    val got = SparkEntry.queries("q_mmr_diversify")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == 5)
    assert(got.map(_._1).toSeq == (1 to 5), "ranks 1..5")
    assert(got.map(_._2).distinct.length == 5, "no repeats")
    // independent recompute of the greedy over the same pool
    val all = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val pEmb = all.find(_._1 == 0L).get._2
    val pool = all.filter(_._1 != 0L)
      .map { case (id, e) => (id, e, cos(e, pEmb)) }
      .sortBy { case (id, _, rel) => (-rel, id) }.take(20)
    var selected = List.empty[(Long, Array[Double])]
    val picks = scala.collection.mutable.ArrayBuffer.empty[Long]
    var remaining = pool.toList
    while (picks.size < 5 && remaining.nonEmpty) {
      // (1 - 0.7), not literal 0.3: the helper computes the weight the
      // same way, and the two differ by an ulp that could flip near-ties
      val best = remaining.maxBy { case (id, e, rel) =>
        val red = if (selected.isEmpty) 0.0 else selected.map(s => cos(e, s._2)).max
        (0.7 * rel - (1 - 0.7) * red, -id)
      }
      picks += best._1; selected ::= ((best._1, best._2))
      remaining = remaining.filterNot(_._1 == best._1)
    }
    assert(got.map(_._2).toSeq == picks.toSeq,
      s"greedy selection order: got ${got.map(_._2).toSeq}, expected $picks")
    // first pick is the pure-relevance argmax; later picks pay redundancy
    assert(got.head._4 == 0.0, "rank-1 redundancy is zero by definition")
  }
}
