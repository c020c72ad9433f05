package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Table-maintenance utilities for long-lived parquet datasets — the
  * operational side of a 100-TB pipeline that query code alone doesn't
  * cover.
  */
object Maintenance {

  /** Compact a many-small-files parquet dataset into `targetFiles`
    * range-clustered files sorted on `keys` (small-file compaction:
    * streaming/batch appends leave thousands of KB-sized files whose
    * open/footer overhead dominates scans; clustering by the common
    * filter key also tightens min/max row-group statistics so later
    * scans prune better).
    */
  def compactParquet(spark: SparkSession, inDir: String, outDir: String,
      keys: Seq[String], targetFiles: Int): Unit = {
    val df = spark.read.parquet(inDir)
    df.repartitionByRange(targetFiles, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(outDir)
  }

  /** Publish `df` to `finalDir` via a staging directory + atomic rename —
    * multi-step jobs that must never expose a half-written dataset use
    * this instead of writing in place (the commit protocol makes ONE
    * write atomic; this makes the publish step atomic too, replacing the
    * reference's delete-based rollback, R24/bug B5).
    */
  def publishAtomic(df: DataFrame, finalDir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val stagingPath = new Path(finalDir + ".staging")
    val finalPath = new Path(finalDir)
    val backup = new Path(finalDir + ".old")
    // the filesystem OWNING the target path — FileSystem.get(conf) would
    // resolve the default FS and break for s3a://... targets in local mode
    val fs = finalPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    df.write.mode(SaveMode.Overwrite).parquet(stagingPath.toString)
    val hadPrevious = fs.exists(finalPath)
    if (hadPrevious) {
      if (fs.exists(backup)) fs.delete(backup, true)
      require(fs.rename(finalPath, backup), s"could not move previous version aside: $finalDir")
    }
    if (!fs.rename(stagingPath, finalPath)) {
      // restore the previous version before failing — readers must never
      // be left with no dataset at finalDir
      if (hadPrevious) fs.rename(backup, finalPath)
      throw new IllegalStateException(s"atomic publish rename failed: $finalDir")
    }
    if (hadPrevious) fs.delete(backup, true)
  }
}
