package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The storage-level knob only moves WHERE materialized rows live —
  * results must be byte-identical at any level, and the default path
  * must stay the plain eager localCheckpoint the bench has always
  * timed.
  */
class MaterializeSpec extends AnyFunSuite with SharedSpark {

  test("frame() results identical across storage levels; knob round-trips") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"w$i", i % 7))
      .toDF("id", "w", "g")
      .groupBy(col("g")).agg(count(lit(1)).as("c"), max(col("w")).as("mw"))
    val base = Materialize.frame(df).orderBy(col("g")).collect().toSeq
    for (lvl <- Seq("DISK_ONLY", "MEMORY_AND_DISK_SER")) {
      spark.conf.set(Materialize.StorageLevelConf, lvl)
      try {
        val got = Materialize.frame(df).orderBy(col("g")).collect().toSeq
        assert(got == base, s"results drifted at storage level $lvl")
      } finally spark.conf.unset(Materialize.StorageLevelConf)
    }
  }

  test("unknown storage level fails loud, not silently-default") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "w")
    spark.conf.set(Materialize.StorageLevelConf, "NOT_A_LEVEL")
    try intercept[IllegalArgumentException] { Materialize.frame(df) }
    finally spark.conf.unset(Materialize.StorageLevelConf)
  }
}
