package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Similarity
import graft.sources.IvfIndex

/** The on-disk IVF index (sources/IvfIndex.scala): build writes lists
  * Hive-partitioned by centroid id, search reads only the probes'
  * lists. Asserts (1) the scan actually partition-prunes, (2) on-disk
  * search returns exactly what the in-memory q_sim_ivf path returns —
  * persistence must not change ANN semantics.
  */
class IvfIndexSpec extends AnyFunSuite with SharedSpark {

  private lazy val indexPath = {
    val dir = Files.createTempDirectory("graft_ivf").toString
    IvfIndex.build(Tables.embeddings(spark, sf), dir)
    dir
  }

  private val probeIds = Seq(0L, 1L, 2L)

  private def probes =
    Similarity.corpusOf(Tables.embeddings(spark, sf))
      .filter(col("vec_id").isin(probeIds: _*))
      .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"))

  test("index layout: one partition directory per non-empty list + centroid table") {
    val listDirs = new java.io.File(s"$indexPath/lists").listFiles()
      .filter(_.getName.startsWith("cid=")).map(_.getName).toSeq
    assert(listDirs.nonEmpty && listDirs.size <= Similarity.IvfCentroids)
    val cents = spark.read.parquet(s"$indexPath/centroids")
    assert(cents.count() == Similarity.IvfCentroids)
    // every corpus vector is in exactly one list
    val total = spark.read.parquet(s"$indexPath/lists").count()
    assert(total == Tables.embeddings(spark, sf).count())
  }

  test("probe scan partition-prunes to the routed lists") {
    val plan = formattedPlan(
      IvfIndex.prunedLists(spark, indexPath, Seq(1, 3, 5)))
    assert(plan.contains("PartitionFilters"), plan)
    assert("cid#\\d+ IN \\(1,3,5\\)".r.findFirstIn(plan).isDefined
      || plan.contains("cid"), s"cid filter must reach PartitionFilters:\n$plan")
    // the data filter must NOT appear as a post-scan Filter on cid —
    // pruning happens at file listing, so cid is not even in ReadSchema
    assert(!plan.contains("ReadSchema: struct<vec_id:bigint,emb:array<double>,cid"),
      "cid must be a partition column, not a data column")
  }

  test("on-disk search ≡ in-memory ivfTopK") {
    val disk = IvfIndex.search(spark, indexPath, probes, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val mem = Similarity.ivfTopK(spark, sf, probeIds, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(disk.toSeq == mem.toSeq)
  }

  test("q_sim_ivf persisted probe ≡ in-memory adaptive path, and build runs once") {
    // clear any cache left by a previous JVM so this test exercises the
    // build-then-reuse sequence end to end
    val cache = new java.io.File(IvfIndex.cachePathFor(sf))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    if (cache.exists()) rm(cache)
    val persisted = IvfIndex.topKPersisted(spark, sf, probeIds, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val mem = Similarity.ivfTopKAdaptive(spark, sf, probeIds, 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(persisted.toSeq == mem.toSeq,
      "persisted probe must not change ANN semantics")
    // reuse: the second call must NOT rewrite the index files
    val listFiles = new java.io.File(s"${cache.getPath}/lists")
    def mtimes = listFiles.listFiles().map(f => f.getName -> f.lastModified()).toMap
    val before = mtimes
    val again = IvfIndex.topKPersisted(spark, sf, probeIds, 5).count()
    assert(again == persisted.length.toLong)
    assert(mtimes == before, "second probe must reuse the persisted index, not rebuild")
  }

  test("search hits known planted near-duplicates") {
    // plant: copies of vectors 0 and 1 at new ids; index must route the
    // copy to the same list as its original and rank it first
    val base = Similarity.corpusOf(Tables.embeddings(spark, sf))
      .select(col("vec_id"), col("embedding"))
    val planted = base.union(
      base.filter(col("vec_id").isin(0L, 1L))
        .select(col("vec_id") + 100000L, col("embedding")))
      .toDF("vec_id", "embedding")
    val dir = Files.createTempDirectory("graft_ivf_planted").toString
    IvfIndex.build(planted, dir)
    val p = Similarity.corpusOf(planted.filter(col("vec_id") >= 100000L))
      .select(col("vec_id").as("probe_id"), col("emb").as("p_emb"))
    val top = IvfIndex.search(spark, dir, p, k = 1).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(top.toSet == Set((100000L, 0L, 1.0), (100001L, 1L, 1.0)),
      s"planted duplicates must be each probe's top hit: ${top.mkString(",")}")
  }
}
