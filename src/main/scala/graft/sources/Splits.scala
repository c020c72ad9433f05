package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit` draws per-row randoms whose assignment depends on
  * partitioning and row order — re-running after a repartition or an
  * append reshuffles rows between train and holdout. Hashing a stable id
  * instead makes the split a pure function of the row: stable across
  * re-runs, partitionings, and data growth (new rows land in a bucket
  * without moving old ones) — the property a 100-TB incremental
  * training-data pipeline actually needs.
  */
object Splits {

  private val Buckets = 10000

  /** (train, holdout) split: rows whose xxhash64(id, salt) bucket of
    * 10000 falls below trainPct*100 go to train.
    */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Double,
      salt: Long = 0L): (DataFrame, DataFrame) = {
    require(trainPct > 0 && trainPct < 100, s"trainPct must be in (0,100): $trainPct")
    val bucket = pmod(xxhash64(col(idCol), lit(salt)), lit(Buckets))
    val cut = math.round(trainPct * Buckets / 100.0)
    (df.filter(bucket < cut), df.filter(bucket >= cut))
  }
}
