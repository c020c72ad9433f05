package graft

import graft.queries.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Z-order layout (q_zorder): Morton-code correctness against a
  * reference bit-interleave, and the claim that matters — z-sorted
  * "files" have drastically tighter 2-d bounding boxes than
  * key-sorted ones, which is exactly what parquet min/max pruning
  * converts into skipped IO for box predicates.
  */
class ZorderSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** Reference Morton interleave: bit i of a → bit 2i, bit i of b →
    * bit 2i+1.
    */
  private def mortonRef(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (acc, i) =>
      acc | ((a >> i & 1L) << (2 * i)) | ((b >> i & 1L) << (2 * i + 1))
    }

  test("morton column == reference bit-interleave on the 16-bit corners and randoms") {
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L),
      (4095L, 1L), (1L, 4095L)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.morton(col("a"), col("b")).as("z"))
      .collect()
    got.foreach(r =>
      assert(r.getLong(2) == mortonRef(r.getLong(0), r.getLong(1)),
        s"morton(${r.getLong(0)}, ${r.getLong(1)})"))
  }

  test("morton preserves box locality: z-range of a quadrant never leaves it") {
    // all points of the low quadrant [0,255]x[0,255] sort before any
    // point with a>=256 AND b>=256 (the high quadrant) — the property
    // file-level min/max pruning exploits
    val lowMax = (0 until 256).flatMap(a => Seq(mortonRef(a.toLong, 255L),
      mortonRef(255L, a.toLong))).max
    val highMin = mortonRef(256L, 256L)
    assert(lowMax < highMin)
  }

  test("z-sorted files have tighter 2-d boxes than key-sorted files (pruning proxy)") {
    import org.apache.spark.sql.expressions.Window
    val z = Layout.ordersWithZ(Tables.orders(spark, sf))
    def boxArea(ordered: org.apache.spark.sql.Column): Double = {
      val per = z.withColumn("f", ntile(32).over(Window.orderBy(ordered)))
        .groupBy("f")
        .agg(((max(col("dim_cust")) - min(col("dim_cust")) + 1) *
              (max(col("dim_day")) - min(col("dim_day")) + 1)).as("area"))
      per.agg(sum(col("area"))).head().getLong(0).toDouble
    }
    val zArea = boxArea(col("zcode"))
    val keyArea = boxArea(col("o_orderkey")) // insertion-order layout
    // a box filter intersects files ∝ total box area: require ≥ 4×
    // shrinkage on the fixture (observed ~10× at sf0.001)
    assert(zArea * 4 < keyArea, s"z-layout area $zArea vs key-layout $keyArea")
  }

  test("q_zorder buckets are contiguous z-ranges covering all rows") {
    val rows = SparkEntry.queries("q_zorder")(spark, sf).collect()
    assert(rows.length == 64)
    val n = rows.map(_.getLong(1)).sum
    assert(n == Tables.orders(spark, sf).count())
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getLong(3) <= b.getLong(2), // prev z_max <= next z_min
        s"buckets ${a.getLong(0)} and ${b.getLong(0)} overlap in z")
    }
  }

  test("q_compact_plan: bins partition the inventory and respect the packing bound") {
    val rows = SparkEntry.queries("q_compact_plan")(spark, sf).collect()
    assert(rows.nonEmpty)
    val target = 32768L
    rows.groupBy(_.getString(0)).foreach { case (month, files) =>
      val ordered = files.sortBy(_.getString(1))
      // sequential packing: bin ids start at 0 and never decrease
      assert(ordered.head.getLong(3) == 0L, s"$month first bin")
      assert(ordered.sliding(2).forall {
        case Array(a, b) => a.getLong(3) <= b.getLong(3); case _ => true })
      // each bin holds < target bytes BEFORE its last file was added,
      // so bin total < target + that file's size
      ordered.groupBy(_.getLong(3)).foreach { case (bin, fs) =>
        val total = fs.map(_.getLong(2)).sum
        val maxFile = fs.map(_.getLong(2)).max
        assert(total < target + maxFile, s"$month bin $bin overflows: $total")
      }
    }
    // inventory conservation: total bytes = 120 x order count
    assert(rows.map(_.getLong(2)).sum ==
      120L * Tables.orders(spark, sf).count())
  }
}
