package graft.queries

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-dimensional file-layout optimization (SURVEY.md §2b q_zorder):
  * Z-order (Morton) clustering, the write-time layout that makes
  * parquet min/max row-group pruning effective on TWO dimensions at
  * once.
  *
  * Why this is a 100-TB operator: a table sorted by `o_custkey` prunes
  * scans filtered on custkey but reads EVERY file for a date filter
  * (each file's date min/max spans the whole range). Sorting by the
  * interleaved-bit Morton code of (custkey, date) gives every file a
  * tight bounding BOX over both dimensions, so a 2-d box predicate
  * intersects — and therefore reads — a small fraction of files
  * (ZorderSpec measures the bounding-box shrinkage on real data).
  * The code is pure shift/mask arithmetic: codegen'd on the Spark
  * side, identical `<< & |` operators in the DuckDB oracle — the
  * layout decision is fully engine-portable.
  */
object Layout {

  /** Spread the low 16 bits of `x` to even bit positions (classic
    * Morton magic-mask cascade, 64-bit arithmetic throughout).
    */
  def spread16(x: Column): Column = {
    val s8 = (x.bitwiseOR(shiftleft(x, 8))).bitwiseAND(lit(0x00FF00FFL))
    val s4 = (s8.bitwiseOR(shiftleft(s8, 4))).bitwiseAND(lit(0x0F0F0F0FL))
    val s2 = (s4.bitwiseOR(shiftleft(s4, 2))).bitwiseAND(lit(0x33333333L))
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton code of two 16-bit dimensions: a on even bits, b on
    * odd bits.
    */
  def morton(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Orders with their 2-d layout key: dimensions are o_custkey and the
    * order's epoch-day, both folded to 12 bits (4096 cells/dim keeps
    * the fixture's cell occupancy realistic; production uses the full
    * 16). Fold, don't truncate: modulo keeps both tails.
    */
  def ordersWithZ(orders: DataFrame): DataFrame =
    orders
      .withColumn("dim_cust", pmod(col("o_custkey"), lit(4096L)))
      .withColumn("dim_day",
        pmod(floor(unix_timestamp(col("o_orderdate")) / lit(86400L)), lit(4096L)))
      .withColumn("zcode", morton(col("dim_cust"), col("dim_day")))

  /** Deterministic tmpdir cache for `sfDir`'s partitioned-layout copies
    * (same convention as IvfIndex.cachePathFor: on a cluster these are
    * table paths next to the source data; the tmpdir stand-in keeps the
    * fixture self-contained).
    */
  def layoutCacheFor(sfDir: String): String = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"${sys.props("java.io.tmpdir")}/graft_layout_cache/$digest"
  }

  private val buildLock = new Object

  /** Write-ONCE the hive-partitioned orders copy (partition column =
    * order month, ~80 partitions over the fixture's date range) plus the
    * month→quarter dimension it joins against. This is the layout that
    * turns a dimension-side filter into skipped fact partitions via
    * dynamic partition pruning — at 100 TB the difference between
    * scanning 80 months and scanning 3. Freshness = fact row count
    * matches the source (a regenerated corpus forces a rewrite).
    */
  def ensurePartitionedOrders(spark: SparkSession, sfDir: String): String = {
    val base = layoutCacheFor(sfDir)
    buildLock.synchronized {
      val orders = T.orders(spark, sfDir)
      val n = orders.count()
      val fresh =
        try spark.read.parquet(s"$base/orders_bymonth").count() == n &&
          spark.read.parquet(s"$base/monthdim").count() == 84
        catch { case _: org.apache.spark.sql.AnalysisException => false }
      if (!fresh) {
        orders
          .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
          .write.mode("overwrite").partitionBy("o_month")
          .parquet(s"$base/orders_bymonth")
        // 84 months spanning 1995-01..2001-12 (covers the fixture range)
        spark.range(0, 84)
          .select(add_months(to_date(lit("1995-01-01")), col("id").cast("int")).as("m0"))
          .select(date_format(col("m0"), "yyyy-MM").as("m_month"),
            concat(year(col("m0")), lit("-Q"), quarter(col("m0"))).as("m_quarter"))
          .coalesce(1)
          .write.mode("overwrite").parquet(s"$base/monthdim")
      }
    }
    base
  }

  /** Create-ONCE-per-session the bucketed fact tables (bucketed+sorted
    * on the join key, 16 buckets). Bucketing is the write-time layout
    * that makes the fact⋈fact join exchange-free: both scans are already
    * hash-distributed on the key, so SortMergeJoin needs no shuffle —
    * at 100 TB the single biggest cost of the orders⋈lineitem join.
    * Session-scoped (in-memory catalog): Bench's untimed pass 0 pays
    * the write; timed passes measure the co-located join itself, the
    * same amortization contract as the persisted ANN indexes.
    */
  def ensureBucketedTables(spark: SparkSession, sfDir: String): (String, String) = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(sfDir.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(8)
    // The managed-table location outlives the in-memory catalog, so a
    // digest-only name collides across JVMs in the same cwd: the second
    // Verify run of a session died with LOCATION_ALREADY_EXISTS, and
    // deleting the leftover would race a LIVE sibling JVM (driver
    // harness vs sbt test share this cwd) mid-scan. The applicationId
    // suffix makes each JVM's tables disjoint — no collision, nothing
    // of a sibling's to delete; abandoned locations from dead sessions
    // are garbage-collected age-gated instead.
    val app = spark.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    val li = s"graft_li_bkt_${digest}_$app"
    val ord = s"graft_ord_bkt_${digest}_$app"
    buildLock.synchronized {
      if (!spark.catalog.tableExists(li)) {
        sweepAbandonedBucketDirs(spark, app)
        T.lineitem(spark, sfDir).write
          .bucketBy(16, "l_orderkey").sortBy("l_orderkey").saveAsTable(li)
      }
      if (!spark.catalog.tableExists(ord))
        T.orders(spark, sfDir).write
          .bucketBy(16, "o_orderkey").sortBy("o_orderkey").saveAsTable(ord)
    }
    (li, ord)
  }

  /** Delete graft bucket-table locations left behind by DEAD sessions:
    * other apps' dirs untouched unless older than [[AbandonedAfterMs]]
    * (live siblings — a driver verify and an sbt test run minutes apart
    * — stay safe; a dir from yesterday's crashed JVM is reclaimed).
    * Never this app's own dirs, and pure best-effort.
    */
  private val AbandonedAfterMs = 6L * 3600 * 1000

  private def sweepAbandonedBucketDirs(spark: SparkSession, app: String): Unit =
    try {
      val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) {
        val cutoff = System.currentTimeMillis() - AbandonedAfterMs
        fs.listStatus(wh).foreach { st =>
          val name = st.getPath.getName
          val isGraftBkt =
            name.startsWith("graft_li_bkt_") || name.startsWith("graft_ord_bkt_")
          if (isGraftBkt && !name.endsWith(s"_$app") &&
              st.getModificationTime < cutoff)
            fs.delete(st.getPath, true)
        }
      }
    } catch { case _: Exception => () }

  val defs: Seq[QueryDef] = Seq(

    // The layout audit a writer runs before committing a clustering
    // choice: bucket the z-sorted table into 64 equal z-ranges (the
    // would-be files) and report each bucket's row count and per-
    // dimension bounds — tight per-bucket boxes are WHY the layout
    // prunes. The equal-split assignment is EXACT GLOBAL RANK over the
    // z order, computed with the q_gini/TeraSort primitive instead of a
    // window: repartitionByRange + sortWithinPartitions puts the fact
    // table in total (zcode, key) order across ORDERED partitions, RDD
    // zipWithIndex assigns global positions with one bounded exchange
    // (one count per partition) — never a single-partition ntile window
    // over the whole fact table (a 100-TB scan through one task). Range
    // boundaries are sampled and vary run-to-run, but the concatenated
    // order is a function of the data, so ranks — and the ntile-law
    // bucket derived from (rank, n) — are deterministic and match the
    // oracle's ntile(64) exactly (first n%64 buckets take one extra row).
    QueryDef("q_zorder",
      (s, d) => {
        val sess = s; import sess.implicits._
        val z = ordersWithZ(T.orders(s, d))
          .select(col("zcode"), col("o_orderkey"), col("dim_cust"), col("dim_day"))
        val sorted = z
          .repartitionByRange(32, col("zcode"), col("o_orderkey"))
          .sortWithinPartitions(col("zcode"), col("o_orderkey"))
        val indexed = sorted.rdd.zipWithIndex()
          .map { case (r, i) => (r.getAs[Long]("zcode"),
            r.getAs[Long]("dim_cust"), r.getAs[Long]("dim_day"), i + 1) }
          .toDF("zcode", "dim_cust", "dim_day", "i")
        // row count n rides in on a broadcast 1-row frame (count-star
        // over parquet is a metadata read, no second data pass)
        val nDf = T.orders(s, d).agg(count(lit(1)).as("n"))
        indexed.crossJoin(broadcast(nDf))
          // ntile law: with q = n div 64, r = n % 64, the first r
          // buckets hold q+1 rows, the rest q — pure (i, n) arithmetic
          .withColumn("bucket", expr(
            """CASE WHEN i <= (n % 64) * (n div 64 + 1)
              |     THEN (i - 1) div (n div 64 + 1) + 1
              |     ELSE (n % 64) + (i - (n % 64) * (n div 64 + 1) - 1) div (n div 64) + 1
              |END""".stripMargin).cast("long"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("zcode")).as("z_min"), max(col("zcode")).as("z_max"),
            min(col("dim_cust")).as("cust_min"), max(col("dim_cust")).as("cust_max"),
            min(col("dim_day")).as("day_min"), max(col("dim_day")).as("day_max"))
          .orderBy(col("bucket"))
      },
      Some("""WITH z AS (
             |  SELECT o_orderkey,
             |         o_custkey % 4096 AS dim_cust,
             |         CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) % 4096 AS dim_day
             |  FROM orders),
             |sp AS (
             |  SELECT *,
             |    ((dim_cust | (dim_cust << 8)) & 16711935) AS c8,
             |    ((dim_day  | (dim_day  << 8)) & 16711935) AS d8
             |  FROM z),
             |sp2 AS (
             |  SELECT *,
             |    ((c8 | (c8 << 4)) & 252645135) AS c4,
             |    ((d8 | (d8 << 4)) & 252645135) AS d4
             |  FROM sp),
             |sp3 AS (
             |  SELECT *,
             |    ((c4 | (c4 << 2)) & 858993459) AS c2,
             |    ((d4 | (d4 << 2)) & 858993459) AS d2
             |  FROM sp2),
             |sp4 AS (
             |  SELECT *,
             |    ((c2 | (c2 << 1)) & 1431655765) AS c1,
             |    ((d2 | (d2 << 1)) & 1431655765) AS d1
             |  FROM sp3),
             |zz AS (
             |  SELECT o_orderkey, dim_cust, dim_day,
             |         (c1 | (d1 << 1)) AS zcode,
             |         ntile(64) OVER (ORDER BY (c1 | (d1 << 1)), o_orderkey) AS bucket
             |  FROM sp4)
             |SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
             |       min(zcode) AS z_min, max(zcode) AS z_max,
             |       min(dim_cust) AS cust_min, max(dim_cust) AS cust_max,
             |       min(dim_day) AS day_min, max(dim_day) AS day_max
             |FROM zz GROUP BY bucket ORDER BY bucket""".stripMargin)),

    // Dynamic partition pruning: revenue by priority for one quarter,
    // where the quarter is known only through a dimension-table filter
    // — the fact side carries no static predicate at all. The fact is
    // the month-partitioned orders copy; at planning time Spark inserts
    // a DynamicPruningSubquery on the fact's partition column, reuses
    // the dim's broadcast, and the scan reads 3 of ~80 partitions
    // (DppSpec asserts the dynamicpruning PartitionFilter and the
    // pruned-partition count). This is THE mechanism that makes
    // star-schema queries scan-bounded at 100 TB: the filter lives on
    // the dimension, the IO savings land on the fact.
    QueryDef("q_join_dpp",
      (s, d) => {
        val base = ensurePartitionedOrders(s, d)
        val fact = s.read.parquet(s"$base/orders_bymonth")
        val dim = s.read.parquet(s"$base/monthdim")
          .filter(col("m_quarter") === "1996-Q2")
        fact.join(broadcast(dim), col("o_month") === col("m_month"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("o_totalprice")), 4).as("revenue"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |       round(sum(o_totalprice), 4) AS revenue
             |FROM orders
             |WHERE date_part('year', o_orderdate) = 1996
             |  AND date_part('quarter', o_orderdate) = 2
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Bucketed co-located join: the q_join_smj aggregation answered
    // from bucketed+sorted tables — the SortMergeJoin runs with ZERO
    // exchange before it (BucketedJoinSpec asserts the plan; the merge
    // hint pins SMJ so the demonstration doesn't depend on broadcast
    // thresholds). The bucketed write is paid once (ensureBucketedTables,
    // Bench pass 0); every later fact⋈fact join on the bucket key skips
    // its shuffle entirely — at 100 TB that shuffle IS the job cost, and
    // bucketing both fact tables on orderkey amortizes it across every
    // downstream join.
    QueryDef("q_join_bucketed",
      (s, d) => {
        val (li, ord) = ensureBucketedTables(s, d)
        s.table(li).hint("merge")
          .join(s.table(ord), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            round(sum(col("l_quantity")), 4).as("sum_qty"),
            round(sum(col("l_extendedprice")), 4).as("sum_price"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
             |       round(sum(l_quantity), 4) AS sum_qty,
             |       round(sum(l_extendedprice), 4) AS sum_price
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Small-file compaction planner — the maintenance job every
    // streaming/incremental sink needs (each micro-batch writes a file
    // per partition; after a week a 100-TB table is a million 5-MB
    // files and scan task-scheduling overhead dominates IO). The
    // planner runs over the FILE INVENTORY (catalog metadata, millions
    // of rows at most — never the data): simulate the inventory as one
    // "file" per (month, priority) slice of orders with bytes ≈
    // rows×120, then assign files to target-sized output groups by
    // sequential cumulative-sum packing within each month partition
    // (bin = ⌊cum_bytes_before / target⌋ — deterministic, one window
    // per partition, and compaction itself then runs one task per bin).
    QueryDef("q_compact_plan",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val files = T.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
            col("o_orderpriority").as("file_key"))
          .agg((count(lit(1)) * 120).as("bytes"))
        val w = Window.partitionBy(col("month")).orderBy(col("file_key"))
          .rowsBetween(Window.unboundedPreceding, -1)
        files
          .withColumn("bin",
            floor(coalesce(sum(col("bytes")).over(w), lit(0L)) / lit(32768L)))
          .select(col("month"), col("file_key"), col("bytes"), col("bin"))
          .orderBy(col("month"), col("file_key"))
      },
      Some("""WITH files AS (
             |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |         o_orderpriority AS file_key,
             |         CAST(count(*) * 120 AS BIGINT) AS bytes
             |  FROM orders GROUP BY 1, 2)
             |SELECT month, file_key, bytes,
             |       CAST(floor(coalesce(sum(bytes) OVER (PARTITION BY month
             |              ORDER BY file_key
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |            / 32768) AS BIGINT) AS bin
             |FROM files ORDER BY month, file_key""".stripMargin))
  )
}
