package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query must execute on sf0.001 — catches runtime
  * breakage for the full SparkEntry surface in one suite (the DuckDB
  * value compare runs driver-side; see tools/compare_oracle.py).
  */
class QueriesSmokeSpec extends AnyFunSuite with SharedSpark {

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sf)
      // Driver-dump contract: the correctness harness sorts and hashes
      // every declared output with pandas, which cannot sort nested
      // values — an array column in a declared output crashed the
      // round-8 record for q_json_roundtrip. Serialize nested data in
      // the final projection (array_join / to_json / flattened struct
      // fields) instead.
      df.schema.foreach { f =>
        f.dataType match {
          case _: org.apache.spark.sql.types.ArrayType |
               _: org.apache.spark.sql.types.StructType |
               _: org.apache.spark.sql.types.MapType =>
            fail(s"$name declares nested column '${f.name}' (${f.dataType.typeName}) — " +
              "driver dump requires flat scalars; serialize in the final projection")
          case _ => ()
        }
      }
      val n = df.count()
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
