package graft.queries

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame}
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

  val defs: Seq[QueryDef] = Seq(

    // The layout audit a writer runs before committing a clustering
    // choice: bucket the z-sorted table into 64 equal z-ranges (the
    // would-be files) and report each bucket's row count and per-
    // dimension bounds — tight per-bucket boxes are WHY the layout
    // prunes. ntile over the z order is the fixture stand-in for the
    // writer's range partitioner; everything else is one map-side
    // projection plus a 64-group aggregation.
    QueryDef("q_zorder",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        ordersWithZ(T.orders(s, d))
          .withColumn("bucket",
            ntile(64).over(Window.orderBy(col("zcode"), col("o_orderkey"))).cast("long"))
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
             |FROM zz GROUP BY bucket ORDER BY bucket""".stripMargin))
  )
}
