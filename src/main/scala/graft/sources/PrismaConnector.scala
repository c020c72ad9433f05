package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Offline connector layer (SURVEY.md §7.1 step 4): consumes JSON
  * payloads shaped exactly like the reference's Prisma Cloud API
  * responses (schemas transcribed in FIXTURES.md §B from
  * `/root/reference/modules/src/prisma_report/lambda.py`) and produces
  * the three reports the reference uploads — re-expressed as declarative
  * Spark plans.
  *
  * Reference-semantics mapping (SURVEY.md §2a), with its bugs fixed
  * (§7.5): JSON→table normalize (R6) = `from_json` + explode; timestamp
  * enrichment (R7/R8) is data-derived, never ambient globals (bug B2);
  * null fill (R9) = `na.fill(0)`; the per-service fan-out loop (R11) is
  * a single groupBy/join; the per-account dict aggregation (R17) groups
  * by accountId, not display name (bug B3); report projection+rename
  * (R19/R20); partitioned CSV sink (R22/R23) through Spark's commit
  * protocol instead of hand-rolled rollback (R24, bug B5). No
  * credentials anywhere (config comes from the environment; the
  * reference hard-codes them — SURVEY.md §0 security note).
  *
  * 100 TB design: payload parsing is a map-only `from_json` over
  * whatever partitioning the landed JSON files have; the only shuffles
  * are the declared aggregations; the policy side of the alert join is
  * dimension-sized and broadcast.
  */
object PrismaConnector {

  val TsFmt = "yyyy-MM-dd HH:mm:ss"

  // ---- payload schemas (FIXTURES.md §B1-B3) ----

  private def aggregatesSchema(groupField: String) = StructType(Seq(
    StructField(groupField, StringType),
    StructField("criticalSeverityFailedResources", LongType),
    StructField("highSeverityFailedResources", LongType),
    StructField("mediumSeverityFailedResources", LongType),
    StructField("lowSeverityFailedResources", LongType),
    StructField("informationalSeverityFailedResources", LongType),
    StructField("passedResources", LongType),
    StructField("failedResources", LongType),
    StructField("totalResources", LongType)))

  def inventorySchema(groupField: String = "serviceName"): StructType = StructType(Seq(
    StructField("timestamp", LongType),
    StructField("requestedTimestamp", LongType),
    StructField("groupedAggregates", ArrayType(aggregatesSchema(groupField)))))

  val policySchema: StructType = StructType(Seq(
    StructField("policies", ArrayType(StructType(Seq(
      StructField("policyId", StringType), StructField("policyName", StringType),
      StructField("policyType", StringType), StructField("severity", StringType),
      StructField("alertCount", LongType)))))))

  val alertPageSchema: StructType = StructType(Seq(
    StructField("policyId", StringType), // page is fetched per policy (R16)
    StructField("items", ArrayType(StructType(Seq(
      StructField("id", StringType),
      StructField("resource", StructType(Seq(
        StructField("account", StringType), StructField("accountId", StringType),
        StructField("cloudType", StringType),
        StructField("cloudAccountGroups", ArrayType(StringType))))))))),
    StructField("nextPageToken", StringType)))

  // ---- R6: JSON → table normalize ----

  /** One inventory payload (JSON lines of responses) → flat aggregate
    * rows + R7/R8 enrichment + R9 null fill. `groupField` selects the
    * by-service vs by-resource-type variant.
    */
  def inventoryReport(spark: SparkSession, payloads: DataFrame,
      groupField: String = "serviceName"): DataFrame = {
    val parsed = payloads
      .select(from_json(col("json"), inventorySchema(groupField)).as("p"))
      .select(col("p.timestamp").as("ts_ms"),
        col("p.requestedTimestamp").as("req_ms"),
        // explode (not _outer): an empty/missing groupedAggregates list
        // contributes no report rows (R21) — explode_outer would emit a
        // phantom all-null record that na.fill turns into junk zeros
        explode(col("p.groupedAggregates")).as("g"))
    parsed
      .select(col("g.*"),
        // R7: epoch-millis → formatted string, derived from the payload
        // (never wall clock / module globals — bugs B2/B4)
        date_format(timestamp_millis(col("ts_ms")), TsFmt).as("timestamp"),
        date_format(timestamp_millis(col("req_ms")), TsFmt).as("requestedTimestamp"),
        date_format(timestamp_millis(col("ts_ms")), "yyyy-MM-dd").as("transaction_date"))
      .na.fill(0) // R9
  }

  /** Per-service resource-type fan-out (R11) — the reference's
    * sequential per-service GET loop becomes one payload set carrying a
    * `service` lineage column (→ `resourceIdentity`); no driver-side
    * loop, one declarative plan.
    */
  def resourceTypeReport(spark: SparkSession, payloads: DataFrame): DataFrame = {
    val parsed = payloads
      .select(col("service").as("resourceIdentity"),
        from_json(col("json"), inventorySchema("resourceTypeName")).as("p"))
      .select(col("resourceIdentity"),
        col("p.timestamp").as("ts_ms"), col("p.requestedTimestamp").as("req_ms"),
        explode(col("p.groupedAggregates")).as("g"))
    parsed
      .select(col("g.*"),
        date_format(timestamp_millis(col("ts_ms")), TsFmt).as("timestamp"),
        date_format(timestamp_millis(col("ts_ms")), "yyyy-MM-dd").as("transaction_date"),
        col("resourceIdentity"))
      .na.fill(0)
  }

  /** Alert report (R16/R17/R19/R20): policies ⋈ alert pages on policyId
    * (broadcast — policy list is dimension-sized), per-account hash
    * aggregation keyed by accountId (bug B3 fixed: the reference keys by
    * display name and merges distinct accounts), projected/renamed to
    * the reference's report schema.
    *
    * `inventoryPayload`, when given, supplies the report-wide
    * `timestamp`/`requestedTimestamp` columns the reference's
    * Alert_Report.csv carries (lambda.py sets them from the inventory
    * response) — data-derived like the B2 fix, joined as a broadcast
    * 1-row aggregate, never wall clock. Omitted → columns absent
    * (schema-narrowing deviation for callers with no inventory feed).
    */
  def alertReport(spark: SparkSession, policyPayload: DataFrame,
      alertPages: DataFrame, inventoryPayload: Option[DataFrame] = None): DataFrame = {
    val policies = policyPayload
      .select(from_json(col("json"), policySchema).as("p"))
      .select(explode(col("p.policies")).as("pol"))
      .select(col("pol.policyId"), col("pol.policyName"),
        col("pol.policyType"), col("pol.severity"))
    val alerts = alertPages
      .select(from_json(col("json"), alertPageSchema).as("a"))
      // explode drops empty pages: R21, nothing to report
      .select(col("a.policyId").as("alert_policyId"), explode(col("a.items")).as("item"))
      .select(col("alert_policyId"),
        col("item.resource.account").as("account"),
        col("item.resource.accountId").as("accountId"),
        col("item.resource.cloudType").as("cloudType"),
        // try_element_at: an EMPTY cloudAccountGroups array must yield
        // NULL, not the INVALID_ARRAY_INDEX error ANSI-mode element_at
        // raises (R18 + Spark 4 ANSI default)
        expr("try_element_at(item.resource.cloudAccountGroups, 1)").as("accountGroup"))
    val perAccount = alerts
      .groupBy(col("alert_policyId"), col("accountId")) // B3: key by id
      .agg(count(lit(1)).as("failedCount"),
        min(col("account")).as("account"), // deterministic "first"
        min(col("cloudType")).as("cloudType"),
        min(col("accountGroup")).as("accountGroup"))
    val report = perAccount
      .join(broadcast(policies), col("alert_policyId") === col("policyId"))
      .select( // R19 projection + R20 upper
        col("policyName").as("Policy Name"),
        col("policyType").as("Policy Type"),
        upper(col("severity")).as("Policy Severity"),
        upper(col("cloudType")).as("Cloud Type"),
        col("account").as("Cloud Account Name"),
        col("accountId").as("Cloud Account Id"),
        col("accountGroup").as("Cloud Account Group"),
        lit("fail").as("Status"),
        col("failedCount").as("Failed Resource Count"))
    inventoryPayload.fold(report) { inv =>
      val ts = inv
        .select(from_json(col("json"), inventorySchema()).as("p"))
        .agg(min(col("p.timestamp")).as("ts_ms"),
          min(col("p.requestedTimestamp")).as("req_ms"))
      report.join(broadcast(ts)) // 1-row broadcast, no shuffle of the report
        .withColumn("timestamp", date_format(timestamp_millis(col("ts_ms")), TsFmt))
        .withColumn("requestedTimestamp",
          date_format(timestamp_millis(col("req_ms")), TsFmt))
        .drop("ts_ms", "req_ms")
    }
  }

  /** R22/R23: header'd, quoted CSV under a hive-partitioned date layout
    * (`transaction_date=YYYY-MM-DD/`) — strictly better than the
    * reference's hand-built `{yyyy}/{MonthName}/{d}` key — written
    * through Spark's commit protocol (atomic publish; replaces R24's
    * delete-based rollback).
    */
  def writeReport(df: DataFrame, path: String): Unit = {
    val out = if (df.columns.contains("transaction_date")) df
      else df.withColumn("transaction_date",
        date_format(current_date(), "yyyy-MM-dd"))
    out.write.mode("overwrite")
      .partitionBy("transaction_date")
      .option("header", "true").option("quoteAll", "true")
      .csv(path)
  }

  /** [[writeReport]] in the reference's EXACT csv dialect —
    * QUOTE_NONNUMERIC (`aler_report/lambda.py:318`: pandas `to_csv(...,
    * quoting=QUOTE_NONNUMERIC)` quotes string cells, leaves numeric
    * cells bare). Spark's csv sink quotes all-or-minimal with no
    * per-type mode (and re-quotes delimiter-bearing cells no matter
    * what), so the dialect is built IN the plan and written through the
    * TEXT sink: string columns are escaped (`"` → `""`) and wrapped in
    * literal quotes, numerics cast to their text form, the record
    * assembled with concat_ws — every byte final before the sink sees
    * it. Still one distributed map-only projection through the same
    * committed, hive-partitioned sink — the dialect costs no plan
    * shape. ConnectorSpec pins the byte-level dialect.
    */
  def writeReportQuoteNonNumeric(df: DataFrame, path: String): Unit = {
    val out = withReportDate(df)
    val part = "transaction_date"
    renderQuoteNonNumeric(out, part)
      .write.mode("overwrite")
      .partitionBy(part)
      .text(path)
    // one header line per partition dir convention is NOT the pandas
    // layout; the reference writes ONE file with one header. Emit the
    // header once at the root (same commit-protocol-adjacent move as a
    // _SUCCESS marker): readers that reassemble partitions prepend it.
    // Resolve the filesystem FROM the path so the sidecar lands wherever
    // the text sink wrote (local, HDFS, s3a) instead of assuming a local
    // java.io path — the sink above supports any Hadoop filesystem and
    // the header must follow it.
    val headerPath = new org.apache.hadoop.fs.Path(path, "_header.csv")
    val hfs = headerPath.getFileSystem(
      df.sparkSession.sessionState.newHadoopConf())
    val os = hfs.create(headerPath, true)
    try os.write((headerLine(out, part) + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }

  private def withReportDate(df: DataFrame): DataFrame =
    if (df.columns.contains("transaction_date")) df
    else df.withColumn("transaction_date",
      date_format(current_date(), "yyyy-MM-dd"))

  /** The QUOTE_NONNUMERIC row renderer shared by the hive-layout and
    * literal-layout writers: one map-only projection to (value, part).
    */
  private def renderQuoteNonNumeric(out: DataFrame, part: String,
      includePart: Boolean = false): DataFrame = {
    import org.apache.spark.sql.types.{StringType => SStr}
    val cells = out.schema.fields
      .filter(f => includePart || f.name != part).map { f =>
        // includePart: the literal layout keeps the partition column as
        // a rendered cell (the reference assigns transaction_date as a
        // strftime STRING and to_csv quotes it) — the hive layout drops
        // it because partitionBy already encodes it in the path.
        if (f.dataType == SStr || f.name == part)
          concat(lit("\""),
            regexp_replace(coalesce(col(f.name).cast("string"), lit("")),
              "\"", "\"\""),
            lit("\"")).as(f.name)
        else
          // coalesce AFTER the cast: concat_ws silently DROPS null
          // arguments, so a bare null numeric cell would delete its field
          // and shift every later cell left. pandas QUOTE_NONNUMERIC
          // renders NaN/None as an empty bare field — match that.
          coalesce(col(f.name).cast("string"), lit("")).as(f.name)
      }
    out.select(concat_ws(",", cells.toIndexedSeq: _*).as("value"), col(part))
  }

  /** The QUOTE_NONNUMERIC header line (pandas quotes header cells). */
  private def headerLine(out: DataFrame, part: String,
      includePart: Boolean = false): String = {
    import org.apache.spark.sql.types.{StringType => SStr}
    out.schema.fieldNames.filter(n => includePart || n != part).map { n =>
      if (out.schema(n).dataType == SStr) "\"" + n.replace("\"", "\"\"") + "\""
      else "\"" + n + "\""
    }.mkString(",")
  }

  /** R23 byte-compat layout (round 12, OPTIONAL — hive `partitionBy`
    * stays the default and the recommended form): the reference's
    * literal `{yyyy}/{MonthName}/{d-MonthName-yyyy}/{file}.csv` object
    * key (`prisma_report/lambda.py:26-30,381` date_folder), for
    * drop-in replacement of its S3 consumer contract. Plan shape is
    * UNCHANGED from [[writeReportQuoteNonNumeric]]: rows render
    * map-side in the exact dialect; a per-date header row (pandas
    * writes one file WITH header per date) rides the same shuffle with
    * a sort flag so it lands first in its file without any extra sort
    * (the repartition-by-date ordering already satisfies the dynamic
    * sink's required ordering); `repartition(col(date))` pins ONE file
    * per date, matching the reference's one-object-per-day contract.
    * The literal tree is then produced by a BOUNDED driver-side rename
    * pass — one same-FS metadata op per date, no data movement — and
    * committed with a trailing _SUCCESS.
    */
  def writeReportLiteralLayout(df: DataFrame, path: String,
      fileName: String = "report"): Unit =
    writeReportsLiteralLayout(Seq(df -> fileName), path)

  /** Multi-report form of [[writeReportLiteralLayout]] — the shape the
    * reference's handler() actually publishes: SEVERAL report files into
    * ONE literal date-folder tree ({yyyy}/{MonthName}/{d-MonthName-yyyy}/
    * {Inventory_Report,Inventory_Resource_Type_Report,Alert_Report}.csv,
    * lambda.py:406-418), with all-or-nothing semantics (its rollback()
    * deletes the already-uploaded keys on any failure). Here the
    * rollback is structural instead of compensating: every report stages
    * into its own sibling tree first, and only after ALL Spark jobs
    * succeed does the bounded driver-side swap touch the committed tree
    * — a failure in any report's job leaves the prior committed tree
    * byte-identical (stronger than the reference, which deletes and can
    * crash mid-rollback).
    */
  def writeReportsLiteralLayout(reports: Seq[(DataFrame, String)],
      path: String): Unit = {
    require(reports.nonEmpty, "no reports to publish")
    require(reports.map(_._2).distinct.size == reports.size,
      s"duplicate literal-layout file names: ${reports.map(_._2)}")
    val part = "transaction_date"
    val outs = reports.map { case (df, name) => (withReportDate(df), name) }
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(outs.head._1.sparkSession.sessionState.newHadoopConf())
    val root = new org.apache.hadoop.fs.Path(path)
    val qualRoot = fs.makeQualified(root)
    val prev = new org.apache.hadoop.fs.Path(qualRoot.getParent,
      qualRoot.getName + "__prev_literal")
    // Crash recovery FIRST — even before this run's own input guard
    // (round-13 review), so ANY visit repairs the tree: if a
    // previous publish crashed mid-swap, prev holds the LAST GOOD tree
    // and root a partial no-_SUCCESS one — restore it rather than
    // deleting the only surviving copy. Only when root carries its own
    // _SUCCESS is a surviving prev mere garbage (crash after commit).
    if (fs.exists(prev)) {
      val committed = fs.exists(new org.apache.hadoop.fs.Path(root, "_SUCCESS"))
      if (committed) fs.delete(prev, true)
      else {
        if (fs.exists(root)) fs.delete(root, true)
        require(fs.rename(prev, root),
          s"literal-layout crash recovery could not restore $prev to $root")
      }
    }
    // Fail BEFORE any IO on dates the folder key can't express: a null
    // (hive would write __HIVE_DEFAULT_PARTITION__) or non-ISO value
    // has no {yyyy}/{MonthName}/{d} rendering. Bounded check — one
    // map-side agg per report, no driver-side date parsing of data rows.
    // try_to_date, not to_date: under Spark 4's default ANSI mode
    // to_date THROWS CANNOT_PARSE on a malformed string mid-aggregate;
    // try_to_date yields null so malformed rows are COUNTED and
    // reported through the same clear require message as nulls.
    outs.foreach { case (out, name) =>
      val bad = out.agg(count(when(col(part).isNull ||
          try_to_date(col(part), "yyyy-MM-dd").isNull, 1)).as("n"))
        .head().getLong(0)
      require(bad == 0,
        s"literal layout requires non-null yyyy-MM-dd $part values; $bad rows of " +
          s"'$name' violate (the hive-layout writeReportQuoteNonNumeric accepts " +
          "them — use that, or fix the dates)")
    }
    // The date-folder universe is the UNION of every report's dates
    // (round-14 review): the reference's to_csv always uploads a
    // header-only file for an empty report, so each date folder carries
    // ALL the declared file names — a report with no rows on some date
    // (or no rows at all) publishes a header-only CSV there instead of
    // silently missing under a fresh _SUCCESS. Bounded collect: a
    // publish covers a handful of calendar dates by construction.
    val allDates: Seq[String] = outs.map(_._1.select(col(part)))
      .reduce(_ unionByName _).distinct().collect().map(_.getString(0)).toSeq
    require(allDates.nonEmpty,
      s"every report is empty — no $part anywhere to anchor the literal " +
        "date-folder layout (the reference would stamp wall clock; here dates " +
        "are payload-derived, so an all-empty publish is refused)")
    def stagingPath(i: Int) = new org.apache.hadoop.fs.Path(qualRoot.getParent,
      qualRoot.getName + s"__staging_literal_$i")
    // drop stale staging siblings from ANY earlier failed run, including
    // indices beyond this run's report count
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(qualRoot.getParent,
      qualRoot.getName + "__staging_literal_*")))
      .foreach(_.foreach(st => fs.delete(st.getPath, true)))
    // Stage-then-swap (round-13 review): each report's Spark job writes
    // a SIBLING staging tree while the previously committed tree stays
    // intact — a mid-job failure leaves external consumers the prior
    // data, not an empty root. Only the bounded driver-side publish
    // pass below touches the committed tree. The try/finally spans the
    // STAGING writes too, so a failure in report k's job cleans the
    // k−1 complete staging trees it leaves behind.
    val monthFmt = java.time.format.DateTimeFormatter
      .ofPattern("MMMM", java.util.Locale.ENGLISH)
    var hadPrev = false
    try {
      val stagings = outs.zipWithIndex.map { case ((out, name), i) =>
        val staging = stagingPath(i)
        // The reference renders transaction_date as a quoted CSV column
        // (lambda.py:358,377 assigns the strftime string, to_csv keeps
        // it) AND uses it as the folder key — so unlike the hive
        // layout, the partition column stays in header and rows
        // (includePart).
        val data = renderQuoteNonNumeric(out, part, includePart = true)
          .withColumn("__hdr", lit(0))
        // header rows for EVERY date in the publish (not just this
        // report's own dates) — the all-files-per-folder contract above
        val headers = out.sparkSession
          .createDataset(allDates)(org.apache.spark.sql.Encoders.STRING)
          .toDF(part)
          .select(lit(headerLine(out, part, includePart = true)).as("value"),
            col(part), lit(1).as("__hdr"))
        data.unionByName(headers)
          .repartition(col(part))
          .sortWithinPartitions(col(part), col("__hdr").desc)
          .select("value", part)
          .write.mode("overwrite")
          .partitionBy(part)
          .text(staging.toString)
        (staging, name)
      }
      // Publish: rename the old committed tree aside (one metadata op —
      // overwrite semantics: stale dates from the previous run must not
      // survive, and HDFS refuses rename-onto-existing {file}.csv),
      // build the new tree from every staging, commit with _SUCCESS,
      // then drop the old tree. A crash mid-publish leaves the old tree
      // at <root>__prev_literal — which the recovery block above
      // RESTORES on the next run — and no fresh _SUCCESS over a partial
      // root.
      hadPrev = fs.exists(root)
      if (hadPrev) require(fs.rename(root, prev),
        s"literal-layout publish could not move the previous tree aside: $root")
      stagings.foreach { case (staging, fileName) =>
        fs.listStatus(staging).map(_.getPath)
          .filter(_.getName.startsWith(s"$part=")).foreach { dir =>
            val day = java.time.LocalDate.parse(dir.getName.stripPrefix(s"$part="))
            val month = day.format(monthFmt)
            val dest = new org.apache.hadoop.fs.Path(root,
              s"${day.getYear}/$month/${day.getDayOfMonth}-$month-${day.getYear}")
            fs.mkdirs(dest)
            val parts = fs.listStatus(dir).map(_.getPath)
              .filter(_.getName.startsWith("part-"))
            require(parts.length == 1,
              s"literal layout expects ONE file per date (repartition pinned it); got ${parts.length} in $dir")
            require(fs.rename(parts.head,
              new org.apache.hadoop.fs.Path(dest, s"$fileName.csv")),
              s"literal-layout publish rename failed for $dir")
          }
      }
      fs.create(new org.apache.hadoop.fs.Path(root, "_SUCCESS"), true).close()
    } finally outs.indices.foreach { i =>
      fs.delete(stagingPath(i), true) // staging never survives, even a failed run
    }
    if (hadPrev) fs.delete(prev, true)
  }

  /** The reference handler()'s full composed flow (R25 orchestration,
    * lambda.py:386-431): inventory report → per-service resource-type
    * fan-out (concat ≡ one payload set with lineage, R11/R12) → alert
    * report enriched with the inventory timestamps → all three published
    * atomically into ONE literal date-folder tree in the exact byte
    * dialect and file names the reference uploads. The reference's
    * rollback-on-failure contract holds structurally: any failure before
    * the final bounded swap leaves the previously committed tree intact
    * (see [[writeReportsLiteralLayout]]).
    */
  def runReportPipelineLiteral(spark: SparkSession,
      inventoryPayload: DataFrame, resourceTypePayloads: DataFrame,
      policyPayload: DataFrame, alertPages: DataFrame, path: String): Unit = {
    // The reference stamps wall-clock "today" on all three reports
    // (module-level current_date), which is what makes them share one
    // date folder. Here the date is PAYLOAD-derived like every other
    // timestamp (the B2-fix style), and the INVENTORY feed is the ONE
    // anchor for all three reports — the resource-type fan-out payloads
    // are fetched moments after the inventory and could carry a
    // different calendar date at a midnight boundary, which would split
    // the three-files-per-folder contract across two folders. A 1-row
    // broadcast attach pins them; reruns of old payloads republish the
    // same tree instead of today's.
    val inv = inventoryReport(spark, inventoryPayload)
    val anchor = inv.agg(min(col("transaction_date")).as("__anchor"))
    def pinned(df: DataFrame): DataFrame =
      df.join(broadcast(anchor))
        .withColumn("transaction_date", col("__anchor")).drop("__anchor")
    // pinned() covers the INVENTORY report too (round-14 review): at a
    // midnight boundary the inventory payload itself can carry rows on
    // two calendar dates, which would split Inventory_Report.csv across
    // two date folders while the two reports pinned to min(inv) land in
    // one — breaking the three-files-per-folder contract the anchor
    // exists to protect.
    writeReportsLiteralLayout(Seq(
      pinned(inv) -> "Inventory_Report",
      pinned(resourceTypeReport(spark, resourceTypePayloads)) ->
        "Inventory_Resource_Type_Report",
      pinned(alertReport(spark, policyPayload, alertPages,
        Some(inventoryPayload))) -> "Alert_Report"), path)
  }
}
