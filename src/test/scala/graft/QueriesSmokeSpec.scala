package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute on sf0.001 — catches runtime
  * breakage for the full SparkEntry surface in one suite (the DuckDB
  * value compare runs driver-side; see tools/compare_oracle.py).
  */
class QueriesSmokeSpec extends AnyFunSuite with SharedSpark {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val n = fn(spark, sf).count()
      assert(n >= 0)
      // Queries whose fixtures guarantee rows must not silently go empty.
      // q_join_anti: fixture genuinely has no anti-join survivors.
      // q_dedup_embed: fixture embeddings are isotropic (max pairwise
      // cosine 0.51) — zero near-dups is the correct answer; planted-pair
      // recall is covered in SimilaritySpec.
      if (!Set("q_join_anti", "q_dedup_embed").contains(name))
        assert(n > 0, s"$name returned 0 rows on sf0.001")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }
}
