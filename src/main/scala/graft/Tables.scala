package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders for the driver-generated parquet tables
  * (`/root/testdata/sf*` — see TESTDATA.md / FIXTURES.md §A).
  *
  * Schemas are declared explicitly (SURVEY.md §1.3: the reference infers
  * every schema from JSON — `modules/src/prisma_report/lambda.py:171` — the
  * engine declares them) and asserted against what parquet actually
  * contains, so a drifting fixture fails loudly instead of silently.
  *
  * Timestamp normalization: the parquet files carry
  * `isAdjustedToUTC=false` timestamps (events.ts is `timestamp[ns]`,
  * SURVEY.md hazard H3), which Spark 4 reads as TIMESTAMP_NTZ. We cast to
  * session-local TimestampType (session TZ is pinned to UTC in
  * Verify/Bench/tests) so the whole standard timestamp function surface
  * (`window`, `unix_timestamp`, `date_format`, …) applies uniformly.
  */
object Tables {

  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Declared column names per table (FIXTURES.md §A). Types are checked
    * structurally (timestamp-ish → timestamp, list → array) not exactly,
    * because Spark legitimately maps ns→µs and ms→µs on read.
    */
  private val declaredColumns: Map[String, Seq[String]] = Map(
    "region"     -> Seq("r_regionkey", "r_name"),
    "nation"     -> Seq("n_nationkey", "n_name", "n_regionkey"),
    "customer"   -> Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier"   -> Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part"       -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders"     -> Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate"),
    "events"     -> Seq("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents"  -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  /** Load one table, normalizing timestamps to TimestampType.
    *
    * `events.ts` is parquet `TIMESTAMP(NANOS)` which Spark 4 rejects
    * outright ([PARQUET_TYPE_ILLEGAL]); with
    * `spark.sql.legacy.parquet.nanosAsLong` it reads as LongType
    * epoch-nanos, which we truncate to µs (Spark's native precision —
    * hazard H3: every declared query further truncates to seconds before
    * comparing against DuckDB's ns values). The conf is set here, not
    * only in the mains, so every entry point (driver harness, scalatest)
    * reads consistently.
    *
    * The loaded frame is memoized per (session, dir, name) — round 15,
    * guide §6 (file listing): every `spark.read.parquet` builds a fresh
    * InMemoryFileIndex (driver directory listing) and re-reads the
    * footer schema, ~75 ms per call warm, and a full bench pass makes
    * ~400 such calls. The cache holds the immutable SCAN DEFINITION
    * (plan + resolved file list + the schema assertion, run once per
    * dir) — never data or results: every action still reads the
    * parquet bytes. Callers' contract is the fixture one the hot-set
    * cache already states: a table dir is immutable for the life of
    * the session (regenerating a dir in place mid-session requires a
    * fresh session — all harness paths create their dirs before the
    * first read).
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val key = (spark, sfDir, name)
    val hit = loadCache.get(key)
    if (hit != null) hit
    else {
      val df = loadTable(spark, sfDir, name)
      // Eviction (round 16, ADVICE): entries for stopped sessions were
      // retained for the process lifetime (plans + InMemoryFileIndex
      // per session — scalatest runs create dozens of sessions). A
      // weak map can't evict here (the cached DataFrame strongly
      // references its session, pinning a weak key forever), so the
      // first cache entry for a context registers a listener that
      // drops every entry of that context's sessions when the context
      // ends. The dir-immutability contract is unchanged and stated in
      // the scaladoc above.
      evictionHooked.computeIfAbsent(spark.sparkContext, ctx => {
        ctx.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
            loadCache.keySet.removeIf(_._1.sparkContext eq ctx)
            evictionHooked.remove(ctx)
          }
        })
        java.lang.Boolean.TRUE
      })
      val prev = loadCache.putIfAbsent(key, df)
      if (prev != null) prev else df
    }
  }

  private val loadCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()
  private val evictionHooked =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, java.lang.Boolean]()

  private def loadTable(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/$name.parquet")
    declaredColumns.get(name).foreach { cols =>
      require(raw.columns.toSeq == cols,
        s"schema drift in $name: got ${raw.columns.mkString(",")} want ${cols.mkString(",")}")
    }
    raw.schema.fields.foldLeft(raw) { (df, f) =>
      f.dataType match {
        case TimestampNTZType => df.withColumn(f.name, col(f.name).cast(TimestampType))
        case LongType if name == "events" && f.name == "ts" =>
          df.withColumn(f.name, expr("timestamp_micros(ts div 1000)"))
        case _ => df
      }
    }
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = table(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
