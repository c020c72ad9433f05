package graft.queries

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._

/** Scalar function packs — string / date / math / array / json — plus
  * the generator (UDTF) query (SURVEY.md §2b q_str_funcs … q_json_funcs,
  * q_udtf_gen). All built-ins → whole-stage codegen'd, no UDFs in the
  * hot path.
  *
  * Oracle type parity: DuckDB widens length/len/year/ceil/datediff to
  * BIGINT and list positions to BIGINT — every oracle casts back to the
  * Spark-side INT/BIGINT so the driver's schema compare passes.
  */
object Scalars {

  val defs: Seq[QueryDef] = Seq(

    // R20 (upper) + the rest of the string surface.
    QueryDef("q_str_funcs",
      (s, d) => T.part(s, d)
        .select(col("p_partkey"),
          upper(col("p_name")).as("name_u"),
          substring(col("p_name"), 1, 5).as("name_pre"),
          concat(col("p_brand"), lit("_"), col("p_type")).as("brand_type"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          length(col("p_name")).as("name_len"),
          col("p_name").like("%wid%").as("is_widget"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey, upper(p_name) AS name_u,
             |       substring(p_name, 1, 5) AS name_pre,
             |       p_brand || '_' || p_type AS brand_type,
             |       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
             |       CAST(length(p_name) AS INTEGER) AS name_len,
             |       p_name LIKE '%wid%' AS is_widget
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // R7/R14 generalized: date part extraction and arithmetic.
    QueryDef("q_date_funcs",
      (s, d) => T.orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
          date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
          datediff(col("o_orderdate"), lit("1995-01-01")).as("days_since"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |       CAST(year(o_orderdate) AS INTEGER) AS y,
             |       CAST(month(o_orderdate) AS INTEGER) AS m,
             |       CAST(day(o_orderdate) AS INTEGER) AS dom,
             |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
             |       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
             |       CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    QueryDef("q_math_funcs",
      (s, d) => T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          // round to 4, not 2: the true product of 2dp×2dp has exactly 4
          // decimal digits, so 4dp rounding never sits on a half-way edge
          // (2dp does: Spark HALF_UPs the shortest repr, DuckDB rounds the
          // binary value → 1222.745 split 1222.75 vs 1222.74).
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net"),
          ceil(col("l_extendedprice")).as("price_ceil"),
          floor(col("l_extendedprice")).as("price_floor"),
          round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
          round(log(col("l_extendedprice") + 1), 4).as("log_price"),
          round(pow(col("l_quantity"), 2), 4).as("qty_sq"),
          round(sqrt(col("l_quantity")), 4).as("qty_sqrt"))
        // full-output order: duplicate (okey, lineno) line rows (H2)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("net"),
          col("disc_dev"), col("qty_sq")),
      Some("""SELECT l_orderkey, l_linenumber,
             |       round(l_extendedprice * (1 - l_discount), 4) AS net,
             |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
             |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
             |       round(abs(l_discount - 0.05), 4) AS disc_dev,
             |       round(ln(l_extendedprice + 1), 4) AS log_price,
             |       round(pow(l_quantity, 2), 4) AS qty_sq,
             |       round(sqrt(l_quantity), 4) AS qty_sqrt
             |FROM lineitem
             |ORDER BY l_orderkey, l_linenumber, net, disc_dev, qty_sq""".stripMargin)),

    // R18 (element_at / array access) over tokenized documents.
    QueryDef("q_array_funcs",
      (s, d) => T.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          element_at(col("toks"), 1).as("first_tok"),
          element_at(col("toks"), -1).as("last_tok"),
          array_contains(col("toks"), "scan").as("has_scan"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |       CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
             |       list_extract(string_split(text, ' '), 1) AS first_tok,
             |       list_extract(string_split(text, ' '), -1) AS last_tok,
             |       list_contains(string_split(text, ' '), 'scan') AS has_scan
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // R6's JSON normalize: extract from the props JSON blob.
    QueryDef("q_json_funcs",
      (s, d) => T.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("bigint").as("k_val"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |       json_extract_string(props, '$.k') AS k_str,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
             |FROM events ORDER BY event_id""".stripMargin)),

    // VARIANT (Spark 4 semi-structured type): props parsed ONCE into an
    // open-schema variant, then any number of typed path extractions
    // read the binary-encoded value — the shred-at-read pattern for
    // JSON at 100 TB (get_json_object re-parses the string per path;
    // variant parses per row). try_variant_get on a missing path yields
    // NULL instead of failing — the DQ-friendly accessor.
    QueryDef("q_variant_funcs",
      (s, d) => T.events(s, d)
        .withColumn("v", expr("parse_json(props)"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k_val"),
          expr("variant_get(v, '$.k', 'string')").as("k_str"),
          expr("try_variant_get(v, '$.absent', 'string')").as("absent"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
             |       json_extract_string(props, '$.k') AS k_str,
             |       json_extract_string(props, '$.absent') AS absent
             |FROM events ORDER BY event_id""".stripMargin)),

    // Second string pack: edit distance, padding, translate, reverse,
    // repeat — the fuzzy-matching / normalization toolkit.
    QueryDef("q_str_funcs2",
      (s, d) => T.part(s, d)
        .withColumn("toks", split(col("p_name"), " "))
        .select(col("p_partkey"),
          levenshtein(element_at(col("toks"), 1), element_at(col("toks"), -1)).as("edit_dist"),
          lpad(col("p_brand"), 12, "_").as("brand_pad"),
          translate(col("p_type"), "aeiou", "AEIOU").as("type_tr"),
          reverse(col("p_brand")).as("brand_rev"),
          repeat(lit("ab"), 3).as("rep"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |       CAST(levenshtein(list_extract(string_split(p_name, ' '), 1),
             |                        list_extract(string_split(p_name, ' '), -1)) AS INTEGER) AS edit_dist,
             |       lpad(p_brand, 12, '_') AS brand_pad,
             |       translate(p_type, 'aeiou', 'AEIOU') AS type_tr,
             |       reverse(p_brand) AS brand_rev,
             |       repeat('ab', 3) AS rep
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Null/conditional toolkit: coalesce, nullif, greatest, least, CASE.
    QueryDef("q_null_funcs",
      (s, d) => T.events(s, d)
        .select(col("event_id"),
          coalesce(expr("try_cast(get_json_object(props, '$.k') AS BIGINT)"), lit(-1L)).as("k_or_neg1"),
          nullif(col("event_type"), lit("error")).as("type_no_err"),
          round(greatest(col("value"), lit(100.0)), 4).as("val_hi"),
          round(least(col("value"), lit(100.0)), 4).as("val_lo"),
          when(col("value") >= 100, "big").otherwise("small").as("bucket"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |       COALESCE(TRY_CAST(json_extract_string(props, '$.k') AS BIGINT), -1) AS k_or_neg1,
             |       NULLIF(event_type, 'error') AS type_no_err,
             |       round(GREATEST(value, 100.0), 4) AS val_hi,
             |       round(LEAST(value, 100.0), 4) AS val_lo,
             |       CASE WHEN value >= 100 THEN 'big' ELSE 'small' END AS bucket
             |FROM events ORDER BY event_id""".stripMargin)),

    // Array algebra: union/intersect/except/sort/slice/flatten on token
    // arrays (stringified for the engine-neutral compare).
    QueryDef("q_array_funcs2",
      (s, d) => T.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("head3", slice(col("toks"), 1, 3))
        .withColumn("tail3", slice(col("toks"), -3, 3))
        .select(col("doc_id"),
          concat_ws(",", array_sort(array_union(col("head3"), col("tail3")))).as("uni"),
          concat_ws(",", array_sort(array_intersect(col("head3"), col("tail3")))).as("inter"),
          concat_ws(",", array_sort(array_except(col("head3"), col("tail3")))).as("exc"),
          concat_ws(",", flatten(array(col("head3"), col("tail3")))).as("flat"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         string_split(text, ' ')[1:3] AS head3,
             |         string_split(text, ' ')[-3:] AS tail3
             |  FROM documents)
             |SELECT doc_id,
             |  COALESCE(list_aggregate(list_sort(list_distinct(list_concat(head3, tail3))), 'string_agg', ','), '') AS uni,
             |  COALESCE(list_aggregate(list_sort(list_distinct(list_filter(head3, x -> list_contains(tail3, x)))), 'string_agg', ','), '') AS inter,
             |  COALESCE(list_aggregate(list_sort(list_distinct(list_filter(head3, x -> NOT list_contains(tail3, x)))), 'string_agg', ','), '') AS exc,
             |  COALESCE(list_aggregate(list_concat(head3, tail3), 'string_agg', ','), '') AS flat
             |FROM t ORDER BY doc_id""".stripMargin)),

    // Map/JSON object surface: keys of the props JSON, value extraction.
    QueryDef("q_map_funcs",
      (s, d) => T.events(s, d)
        .withColumn("m", from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
        .select(col("event_id"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys"),
          element_at(col("m"), "k").as("k_val"),
          size(col("m")).as("n_keys"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |       list_aggregate(list_sort(json_keys(props)), 'string_agg', ',') AS keys,
             |       json_extract_string(props, '$.k') AS k_val,
             |       CAST(len(json_keys(props)) AS INTEGER) AS n_keys
             |FROM events ORDER BY event_id""".stripMargin)),

    // Regex pack: replace, count, extract-all.
    QueryDef("q_regex_funcs",
      (s, d) => T.part(s, d)
        .select(col("p_partkey"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
          regexp_count(col("p_name"), lit("[a-z]+")).as("n_words"),
          concat_ws(",", expr("regexp_extract_all(p_name, '[a-z]+', 0)")).as("words"))
        .orderBy(col("p_partkey")),
      Some("""SELECT p_partkey,
             |       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
             |       CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS INTEGER) AS n_words,
             |       list_aggregate(regexp_extract_all(p_name, '[a-z]+'), 'string_agg', ',') AS words
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // Interval arithmetic: day/month add-subtract (months_between is
    // deliberately omitted — Spark's complete-month fraction semantics
    // have no faithful DuckDB re-expression).
    QueryDef("q_interval_funcs",
      (s, d) => T.orders(s, d)
        .select(col("o_orderkey"),
          date_format(col("o_orderdate") + expr("INTERVAL 90 DAYS"), "yyyy-MM-dd").as("plus90d"),
          date_format(col("o_orderdate") - expr("INTERVAL 2 MONTHS"), "yyyy-MM-dd").as("minus2m"),
          date_format(add_months(col("o_orderdate"), 14), "yyyy-MM-dd").as("plus14m"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS plus90d,
             |       strftime(o_orderdate - INTERVAL 2 MONTH, '%Y-%m-%d') AS minus2m,
             |       strftime(CAST(o_orderdate AS DATE) + INTERVAL 14 MONTH, '%Y-%m-%d') AS plus14m
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Generator / UDTF: one row per token with 0-based position
    // (posexplode ↔ DuckDB zipped unnest).
    QueryDef("q_udtf_gen",
      (s, d) => T.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("col", "word")
        .select(col("doc_id"), col("pos"), col("word"))
        .orderBy(col("doc_id"), col("pos")),
      Some("""SELECT doc_id, CAST(pos AS INTEGER) AS pos, word
             |FROM (SELECT doc_id,
             |             unnest(string_split(text, ' ')) AS word,
             |             unnest(range(len(string_split(text, ' ')))) AS pos
             |      FROM documents)
             |ORDER BY doc_id, pos""".stripMargin)),

    // Edit-distance string similarity: nearest other nation by name
    // (25×25 bounded pair space — at scale the same kernel runs on
    // LSH-survivor candidate pairs, like exact Jaccard does).
    QueryDef("q_str_sim",
      (s, d) => {
        val a = T.nation(s, d).select(col("n_name").as("name_a"))
        val b = T.nation(s, d).select(col("n_name").as("name_b"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("name_a")).orderBy(col("dist"), col("name_b"))
        a.join(b, col("name_a") =!= col("name_b"))
          .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("name_a"), col("name_b").as("nearest"), col("dist"))
          .orderBy(col("name_a"))
      },
      Some("""SELECT name_a, name_b AS nearest, CAST(dist AS INTEGER) AS dist
             |FROM (
             |  SELECT a.n_name AS name_a, b.n_name AS name_b,
             |         levenshtein(a.n_name, b.n_name) AS dist,
             |         row_number() OVER (PARTITION BY a.n_name
             |           ORDER BY levenshtein(a.n_name, b.n_name), b.n_name) AS rn
             |  FROM nation a JOIN nation b ON a.n_name <> b.n_name)
             |WHERE rn = 1 ORDER BY name_a""".stripMargin)),

    // Correlated LATERAL subquery (SQL surface): each region's top-2
    // nations by name — the lateral join decorrelates into a ranked
    // window, no per-row re-execution.
    QueryDef("q_lateral_subquery",
      (s, d) => {
        T.region(s, d).createOrReplaceTempView("region")
        T.nation(s, d).createOrReplaceTempView("nation")
        s.sql("""SELECT r.r_name, t.n_name
                |FROM region r,
                |LATERAL (SELECT n_name FROM nation n
                |         WHERE n.n_regionkey = r.r_regionkey
                |         ORDER BY n_name LIMIT 2) t
                |ORDER BY r_name, n_name""".stripMargin)
      },
      Some("""SELECT r.r_name, t.n_name
             |FROM region r,
             |LATERAL (SELECT n_name FROM nation n
             |         WHERE n.n_regionkey = r.r_regionkey
             |         ORDER BY n_name LIMIT 2) t
             |ORDER BY r_name, n_name""".stripMargin)),

    // Custom Generator through the SQL LATERAL VIEW surface: the
    // pos_tokens UDTF (functions.PosTokens) tokenizes in one JVM loop
    // per row, streamed by GenerateExec — same semantics as q_udtf_gen's
    // posexplode(split(...)), same DuckDB oracle.
    QueryDef("q_lateral_view",
      (s, d) => {
        graft.functions.GraftFunctions.register(s)
        T.documents(s, d).createOrReplaceTempView("documents")
        s.sql("""SELECT doc_id, t.pos, t.token AS word
                |FROM documents
                |LATERAL VIEW pos_tokens(text) t AS pos, token
                |ORDER BY doc_id, pos""".stripMargin)
      },
      Some("""SELECT doc_id, CAST(pos AS INTEGER) AS pos, word
             |FROM (SELECT doc_id,
             |             unnest(string_split(text, ' ')) AS word,
             |             unnest(range(len(string_split(text, ' ')))) AS pos
             |      FROM documents)
             |ORDER BY doc_id, pos""".stripMargin))
  )
}
