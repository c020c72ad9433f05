package graft.queries

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond the dedup/ANN families already in
  * [[Similarity]] / [[TextOps]] / [[Corpus]]: sub-document (paragraph)
  * dedup, BM25 relevance ranking, column profiling, and SemDeDup-style
  * semantic dedup over embedding clusters.
  *
  * Scale design notes are on each operator; the common theme is that
  * whole-document text crosses a shuffle at most once per operator, and
  * every candidate-generation step is keyed (digest / cluster id), never
  * all-pairs.
  */
object Curation {

  /** Tokens per paragraph for [[paraDedupOf]]. The fixture documents are
    * single-line word streams (TESTDATA.md), so "paragraph" is defined
    * positionally: consecutive 8-token groups. On real corpora the
    * splitter would be `split(text, "\n\n")` — everything downstream is
    * agnostic to how paragraphs were delimited.
    */
  val ParaTokens = 8

  /** Paragraph-level (sub-document) dedup, CCNet-style: documents are
    * split into paragraphs, each distinct paragraph is kept only at its
    * first occurrence (minimum (doc_id, position) over the whole
    * corpus), and documents are reassembled from their surviving
    * paragraphs. This is the operator that removes boilerplate
    * headers/footers repeated across millions of pages — exact dedup
    * (q_dedup_exact) can't see them because the documents differ.
    *
    * Scale shape: winner selection groups by the paragraph's sha2
    * digest, so the hash-agg KEY is 64 bytes regardless of paragraph
    * length, with map-side partial aggregation collapsing local
    * duplicates before the exchange (the min_by payload carries one
    * paragraph text per mapper per digest, not one per row). Reassembly
    * shuffles surviving paragraphs once, keyed by doc_id. Total: two
    * shuffles, both on compact keys, no window over the corpus.
    */
  def paraDedupOf(docs: DataFrame): DataFrame = {
    // round 13: paragraphs chunk over the canonical Unicode tokenizer
    // (not a whitespace split) so space-free CJK text still forms
    // paragraphs instead of one giant pseudo-token
    val paras = docs
      // a tokenless doc (punctuation-only/empty text — REACHABLE since
      // the round-13 Unicode tokenizer, where the whitespace split
      // always returned ≥1 element) must contribute ZERO paragraphs:
      // unguarded, sequence(0, floor((0-1)/8)) = sequence(0, -1) is the
      // DESCENDING [0, -1] and would emit two phantom empty paragraphs.
      // The left join back below still reports the doc with n_kept = 0.
      // Guard on the cheap rlike PRECONDITION, below the kernel
      // projection (round 14): filtering on size(toks) made Catalyst
      // push the predicate under the select and evaluate the
      // unicode_words kernel TWICE per row — the exact pushdown trap
      // minhashSignaturesOf documents. One \p{L}\p{N} codepoint exists
      // iff the tokenizer emits ≥1 token (lowercasing maps word
      // codepoints to word codepoints — PropertySpec pins ≡).
      .filter(col("text").rlike("[\\p{L}\\p{N}]"))
      .select(col("doc_id"), TextOps.unicodeWords(col("text")).as("toks"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), floor((size(col("toks")) - 1) / ParaTokens).cast("int")),
          i => concat_ws(" ", slice(col("toks"), i * ParaTokens + 1, lit(ParaTokens))))))
      .withColumnRenamed("pos", "para_idx").withColumnRenamed("col", "para")
    val kept = paras
      .groupBy(sha2(col("para"), 256).as("digest"))
      .agg(min_by(struct(col("doc_id"), col("para_idx"), col("para")),
        struct(col("doc_id"), col("para_idx"))).as("w"))
      .select(col("w.doc_id").as("doc_id"), col("w.para_idx").as("para_idx"),
        col("w.para").as("para"))
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("para_idx"), col("para")))),
          x => x("para")), " ").as("clean_text"))
    // left join back so documents whose every paragraph was claimed by
    // an earlier doc still appear (empty), making the output a total
    // function of the corpus
    docs.select(col("doc_id")).join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
      .orderBy(col("doc_id"))
  }

  /** BM25 query terms — fixed, engine-agnostic (all in the fixture
    * vocabulary, TESTDATA.md).
    */
  val Bm25Terms = Seq("spark", "window", "merge")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** BM25 top-10 ranking for [[Bm25Terms]]: the IR-standard relevance
    * score (idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))) — the
    * retrieval/quality-ranking primitive next to q_tfidf's feature
    * extraction. Corpus statistics (N, avgdl) join in as a broadcast
    * 1-row aggregate; document length and term frequency are two
    * exploded aggregations sharing the tokenization. Only rows matching
    * the query terms survive past the tf aggregation, so the scoring
    * join is tiny regardless of corpus size.
    */
  def bm25Of(docs: DataFrame, terms: Seq[String] = Bm25Terms, k: Int = 10): DataFrame = {
    // canonical Unicode tokenizer (round 13): BM25 is a retrieval
    // signal, not a whitespace-accounting one — "straße," must match
    // the query term "straße", and CJK text must not collapse to one token
    val toks = docs.select(col("doc_id"),
      explode(TextOps.unicodeWords(col("text"))).as("word"))
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val tf = toks.filter(col("word").isin(terms: _*))
      .groupBy(col("doc_id"), col("word")).agg(count(lit(1)).as("tf"))
    // tf has one row per (doc, word) → count per word IS document freq
    val dfreq = tf.groupBy(col("word")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfreq), "word").join(dl, "doc_id").join(broadcast(stats))
      .withColumn("idf", log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("s", col("idf") * col("tf") * (Bm25K1 + 1) /
        (col("tf") + lit(Bm25K1) * (lit(1 - Bm25B) + lit(Bm25B) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id")).agg(round(sum(col("s")), 4).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** Column profiling (data-quality summary) of `orders`: one row per
    * column with null count, exact distinct count, and typed min/max
    * (numeric columns in `min_num`/`max_num`, strings and formatted
    * timestamps in `min_str`/`max_str` — keeping the two type families
    * in separate columns avoids cross-engine float-rendering drift).
    *
    * Plan: one aggregate BRANCH per column, unioned. Each branch's scan
    * is column-pruned to exactly its column, and its groupBy-free
    * aggregate shuffles only the partially-aggregated per-partition
    * state. The tempting single-pass alternative — one aggregate with
    * six `count(DISTINCT col)`s — makes Catalyst Expand the input
    * (one full-width replica per distinct aggregate: 7× the rows
    * through the exchange; measured warm at sf0.1 local[32]: 2.48 s
    * Expand vs 0.59 s branches vs 0.30 s HLL), so
    * multi-branch column-pruned scans beat "one scan" once more than
    * one exact distinct is involved. [[profileOrdersApproxOf]] is the
    * true single-pass form (HLL sketches, no Expand) a continuous
    * 100-TB profiler runs when ±2% distincts are acceptable.
    */
  def profileOrdersOf(orders: DataFrame): DataFrame = {
    def branch(c: String, isNum: Boolean, isDate: Boolean): DataFrame = {
      val mn = if (isDate) date_format(min(col(c)), "yyyy-MM-dd HH:mm:ss")
        else min(col(c))
      val mx = if (isDate) date_format(max(col(c)), "yyyy-MM-dd HH:mm:ss")
        else max(col(c))
      orders.select(col(c)).agg(
        sum(when(col(c).isNull, 1).otherwise(0)).cast("long").as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        (if (isNum) round(mn.cast("double"), 4) else lit(null).cast("double")).as("min_num"),
        (if (isNum) round(mx.cast("double"), 4) else lit(null).cast("double")).as("max_num"),
        (if (isNum) lit(null).cast("string") else mn.cast("string")).as("min_str"),
        (if (isNum) lit(null).cast("string") else mx.cast("string")).as("max_str"))
        .select(lit(c).as("col_name"), col("n_nulls"), col("n_distinct"),
          col("min_num"), col("max_num"), col("min_str"), col("max_str"))
    }
    Seq(
      branch("o_custkey", isNum = true, isDate = false),
      branch("o_orderdate", isNum = false, isDate = true),
      branch("o_orderkey", isNum = true, isDate = false),
      branch("o_orderpriority", isNum = false, isDate = false),
      branch("o_orderstatus", isNum = false, isDate = false),
      branch("o_totalprice", isNum = true, isDate = false))
      .reduce(_ unionByName _)
      .orderBy(col("col_name"))
  }

  /** The single-pass approximate profile: ONE column-complete scan, one
    * 1-row aggregate where every distinct count is an
    * `approx_count_distinct` HLL sketch — no Expand, no per-column
    * branches, mergeable across partitions. This is the shape a
    * continuous profiler runs over 100 TB; exactness (and the DuckDB
    * oracle) belongs to [[profileOrdersOf]]. CurationSpec bounds the
    * estimates against the exact profile.
    *
    * Measured caveat (sf0.1, fresh plans): this runs ~1.1 s vs the
    * exact branches' ~0.6 s — HyperLogLogPlusPlus is an IMPERATIVE
    * aggregate, so the agg drops out of whole-stage codegen and pays
    * interpreted per-row eval, which dominates when the scan is
    * page-cache-cheap. The single scan wins where it matters: when
    * scans are IO-bound (6 column reads vs 1) and when sketches must
    * merge across ingest increments — the continuous-profiler case,
    * not the one-shot fixture case.
    */
  def profileOrdersApproxOf(orders: DataFrame): DataFrame = {
    val cols = Seq("o_custkey", "o_orderdate", "o_orderkey",
      "o_orderpriority", "o_orderstatus", "o_totalprice")
    val agged = orders.agg(
      sum(when(col(cols.head).isNull, 1).otherwise(0)).as(s"${cols.head}_nulls"),
      (cols.head +: cols.tail).flatMap(c => Seq(
        // rsd 0.02: a few KB of sketch per column buys ±2% — the
        // default 0.05 measured 6.7% off on the orderkey column
        approx_count_distinct(col(c), 0.02).as(s"${c}_dist"))) ++
        cols.tail.map(c =>
          sum(when(col(c).isNull, 1).otherwise(0)).as(s"${c}_nulls")): _*)
    agged.select(expr(
      s"""stack(${cols.size}, ${cols.map(c =>
        s"'$c', CAST(${c}_nulls AS BIGINT), ${c}_dist").mkString(", ")})
         | AS (col_name, n_nulls, approx_distinct)""".stripMargin))
      .orderBy(col("col_name"))
  }

  /** Cosine-similarity threshold for semantic dedup — two documents
    * whose embeddings agree this closely are semantic restatements.
    */
  val SemThreshold = 0.95

  /** Cluster count for [[semDedupClustersOf]]: k = √n, the balanced
    * optimum for EXACT semantic dedup. The two cost terms pull k in
    * opposite directions — centroid assignment is O(n·k·d) (every
    * vector scores every centroid) and in-cluster pairing is
    * O(n²/k·d) (expected cluster size n/k) — and their sum is
    * minimized at k = √n, where both are O(n^1.5·d). Constant cluster
    * size (k ∝ n) just moves the quadratic into the assignment scan
    * (measured: 23.9 s at the 100× tier, ~n²·d/64 multiply-adds);
    * constant k moves it into pairing. n^1.5 is the honest price of
    * EXACTNESS within clusters — this operator sits between exact
    * all-pairs (n², q_dedup_ngram's exact role) and SRP-LSH candidates
    * (linear, q_dedup_embed) on the recall/cost spectrum. The 4096 cap
    * bounds the driver-side centroid collect; past it (n ≳ 16M)
    * production assigns against the persisted IVF index (partition-
    * pruned scan) instead of a flat centroid sweep.
    */
  def semClusterCount(n: Long): Int =
    math.min(4096, math.max(16, math.ceil(math.sqrt(n.toDouble)).toInt))

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * k-means-cluster the embedding space, then compute pairwise cosine
    * ONLY within each cluster, dropping every vector that has a
    * lower-id in-cluster neighbor above the threshold. Reported per
    * cluster: size, removals, survivors.
    *
    * Scale shape: the quadratic step is confined within clusters, and
    * [[semClusterCount]]'s √n geometry balances it against the
    * assignment scan — O(n^1.5) total, the exact-variant optimum (see
    * the constant's scaladoc for the full cost analysis). A
    * pathologically hot cluster is the same hazard as a hot LSH bucket
    * and takes the same representative-cap remedy if it binds.
    * Cross-cluster near-dups are missed by design — the published
    * SemDeDup trade (recall for never-all-pairs).
    *
    * Engine-defined clustering → no SQL oracle; CurationSpec plants
    * duplicate embeddings and asserts they are detected and that
    * survivors are exactly the non-dominated vectors.
    */
  def semDedupClustersOf(embeddings: DataFrame,
      threshold: Double = SemThreshold, lists: Int = 0): DataFrame = {
    val k = if (lists > 0) lists
      else semClusterCount(embeddings.count())
    val assigned = Similarity.ivfAssignOf(embeddings, k)._1
      .select(col("cid"), col("vec_id"), col("emb"))
    val pairs = assigned.as("a").join(assigned.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.cid").as("cid"), col("b.vec_id").as("dup_id"),
        graft.functions.VecExprs.cosineSim(col("a.emb"), col("b.emb")).as("cos"))
      .filter(col("cos") >= threshold)
    val removed = pairs.groupBy(col("cid"))
      .agg(countDistinct(col("dup_id")).as("n_removed"))
    assigned.groupBy(col("cid")).agg(count(lit(1)).as("n_vecs"))
      .join(removed, Seq("cid"), "left")
      .select(col("cid"),
        col("n_vecs"),
        coalesce(col("n_removed"), lit(0L)).as("n_removed"),
        (col("n_vecs") - coalesce(col("n_removed"), lit(0L))).as("n_survivors"))
      .orderBy(col("cid"))
  }

  /** The vectors [[semDedupClustersOf]] REMOVES, with their dominating
    * keeper — the per-vector view CurationSpec verifies against exact
    * brute-force cosine pairs.
    */
  def semDedupRemovalsOf(embeddings: DataFrame,
      threshold: Double = SemThreshold, lists: Int = 0): DataFrame = {
    val k = if (lists > 0) lists
      else semClusterCount(embeddings.count())
    val assigned = Similarity.ivfAssignOf(embeddings, k)._1
      .select(col("cid"), col("vec_id"), col("emb"))
    assigned.as("a").join(assigned.as("b"),
        col("a.cid") === col("b.cid") && col("a.vec_id") < col("b.vec_id"))
      .select(col("b.vec_id").as("removed_id"), col("a.vec_id").as("kept_id"),
        round(graft.functions.VecExprs.cosineSim(col("a.emb"), col("b.emb")), 4).as("cosine"))
      .filter(col("cosine") >= threshold)
      // a removed vector may have several dominators; report the lowest
      .groupBy(col("removed_id"))
      .agg(min(col("kept_id")).as("kept_id"), max(col("cosine")).as("cosine"))
      .orderBy(col("removed_id"))
  }

  /** Deterministic shard/pos assignment for an arbitrary docs frame —
    * factored out of q_shuffle_det so CurationSpec can prove layout
    * independence by feeding the SAME logic a differently-partitioned
    * input (the declared query always reads the parquet layout).
    */
  def shuffleDetOf(docs: DataFrame): DataFrame = {
    val keyed = docs
      .select(col("doc_id"),
        md5(concat(lit("sh:"), col("doc_id").cast("string"))).as("skey"))
      .withColumn("shard",
        (instr(lit("0123456789abcdef"), substring(col("skey"), 1, 1)) - 1).cast("int"))
    keyed
      .withColumn("pos", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("shard")).orderBy(col("skey"), col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef("q_dedup_para",
      (s, d) => paraDedupOf(T.documents(s, d)),
      Some("""WITH tl AS (
             |  SELECT doc_id,
             |         list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
             |                     t -> t <> '') AS toks
             |  FROM documents),
             |toks AS (
             |  SELECT doc_id, unnest(toks) AS word,
             |         unnest(range(len(toks))) AS pos
             |  FROM tl),
             |paras AS (
             |  SELECT doc_id, pos // 8 AS para_idx,
             |         string_agg(word, ' ' ORDER BY pos) AS para
             |  FROM toks GROUP BY doc_id, pos // 8),
             |kept AS (
             |  SELECT doc_id, para_idx, para,
             |         row_number() OVER (PARTITION BY para
             |                            ORDER BY doc_id, para_idx) AS rn
             |  FROM paras),
             |rebuilt AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
             |         string_agg(para, ' ' ORDER BY para_idx) AS clean_text
             |  FROM kept WHERE rn = 1 GROUP BY doc_id)
             |SELECT d.doc_id,
             |       CAST(coalesce(r.n_kept, 0) AS BIGINT) AS n_kept,
             |       coalesce(r.clean_text, '') AS clean_text
             |FROM documents d LEFT JOIN rebuilt r ON d.doc_id = r.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    QueryDef("q_bm25",
      (s, d) => bm25Of(T.documents(s, d)),
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), t -> t <> '')) AS word FROM documents),
             |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
             |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
             |tf AS (SELECT doc_id, word, count(*) AS tf FROM toks
             |       WHERE word IN ('spark', 'window', 'merge') GROUP BY doc_id, word),
             |dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY word)
             |SELECT tf.doc_id,
             |       round(sum(ln((n_docs - df + 0.5) / (df + 0.5) + 1)
             |                 * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))), 4) AS bm25
             |FROM tf JOIN dfreq USING (word) JOIN dl USING (doc_id) CROSS JOIN stats
             |GROUP BY tf.doc_id
             |ORDER BY bm25 DESC, doc_id LIMIT 10""".stripMargin)),

    QueryDef("q_profile",
      (s, d) => profileOrdersOf(T.orders(s, d)),
      Some("""WITH p AS (
             |  SELECT 'o_custkey' AS col_name,
             |         count(*) - count(o_custkey) AS n_nulls,
             |         count(DISTINCT o_custkey) AS n_distinct,
             |         CAST(min(o_custkey) AS DOUBLE) AS min_num,
             |         CAST(max(o_custkey) AS DOUBLE) AS max_num,
             |         CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
             |  FROM orders
             |  UNION ALL
             |  SELECT 'o_orderdate', count(*) - count(o_orderdate),
             |         count(DISTINCT o_orderdate), NULL, NULL,
             |         strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
             |         strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
             |  FROM orders
             |  UNION ALL
             |  SELECT 'o_orderkey', count(*) - count(o_orderkey),
             |         count(DISTINCT o_orderkey),
             |         CAST(min(o_orderkey) AS DOUBLE), CAST(max(o_orderkey) AS DOUBLE),
             |         NULL, NULL
             |  FROM orders
             |  UNION ALL
             |  SELECT 'o_orderpriority', count(*) - count(o_orderpriority),
             |         count(DISTINCT o_orderpriority), NULL, NULL,
             |         min(o_orderpriority), max(o_orderpriority)
             |  FROM orders
             |  UNION ALL
             |  SELECT 'o_orderstatus', count(*) - count(o_orderstatus),
             |         count(DISTINCT o_orderstatus), NULL, NULL,
             |         min(o_orderstatus), max(o_orderstatus)
             |  FROM orders
             |  UNION ALL
             |  SELECT 'o_totalprice', count(*) - count(o_totalprice),
             |         count(DISTINCT o_totalprice),
             |         round(min(o_totalprice), 4), round(max(o_totalprice), 4),
             |         NULL, NULL
             |  FROM orders)
             |SELECT col_name, CAST(n_nulls AS BIGINT) AS n_nulls,
             |       CAST(n_distinct AS BIGINT) AS n_distinct,
             |       min_num, max_num, min_str, max_str
             |FROM p ORDER BY col_name""".stripMargin)),

    // Vocabulary coverage: the tokenizer-coverage check a training
    // pipeline runs before committing to a vocab — top-20 corpus terms
    // (count desc, word tiebreak) as the "vocabulary", then per-doc
    // in-vocab token share and OOV count. The vocab is a tiny ranked
    // aggregate joined back BROADCAST; per-doc coverage is one exploded
    // aggregation keyed by doc_id. At 100 TB the vocab side stays
    // k rows regardless of corpus size.
    QueryDef("q_tok_vocab",
      (s, d) => {
        // canonical Unicode tokenizer (round 13): vocab coverage is a
        // tokenizer-quality signal — whitespace splitting would count a
        // space-free CJK doc as one always-OOV token
        val toks = T.documents(s, d)
          .select(col("doc_id"), explode(TextOps.unicodeWords(col("text"))).as("word"))
        // top-k via sort+limit, NOT a global row_number window: this
        // plans as TakeOrderedAndProject (per-partition heap + driver
        // merge of k rows) where the window would single-partition the
        // whole distinct-word table
        val vocab = toks.groupBy(col("word")).agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("word")).limit(20)
          .select(col("word"), lit(1).as("in_vocab"))
        toks.join(broadcast(vocab), Seq("word"), "left")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("in_vocab").isNull, 1).otherwise(0)).cast("long").as("n_oov"),
            round(sum(coalesce(col("in_vocab"), lit(0))).cast("double") /
              count(lit(1)), 4).as("coverage"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), t -> t <> '')) AS word FROM documents),
             |vocab AS (
             |  SELECT word FROM (
             |    SELECT word, row_number() OVER (ORDER BY count(*) DESC, word) AS rk
             |    FROM toks GROUP BY word) WHERE rk <= 20)
             |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
             |       CAST(count(*) FILTER (WHERE v.word IS NULL) AS BIGINT) AS n_oov,
             |       round(CAST(count(v.word) AS DOUBLE) / count(*), 4) AS coverage
             |FROM toks t LEFT JOIN vocab v ON t.word = v.word
             |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin)),

    // Single-pass HLL profile — the continuous-profiler form of
    // q_profile. No hash oracle (estimates are engine-specific); the
    // TOLERANCE oracle checks each approx_distinct against the exact
    // distinct within the rsd-0.02 sketch's 3σ ≈ 6% bound (10% ceiling)
    // while n_nulls stays an EXACT compare; CurationSpec additionally
    // bounds the estimates against the exact profile.
    QueryDef("q_profile_approx",
      (s, d) => profileOrdersApproxOf(T.orders(s, d)), None,
      Some(graft.ApproxOracle(
        Seq("o_custkey", "o_orderdate", "o_orderkey",
          "o_orderpriority", "o_orderstatus", "o_totalprice").map(c =>
          s"""SELECT '$c' AS col_name,
             |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
             |  CAST(count(DISTINCT $c) AS BIGINT) AS approx_distinct
             |FROM orders""".stripMargin)
          .mkString("SELECT * FROM (\n", "\nUNION ALL\n",
            "\n) ORDER BY col_name"),
        Map("approx_distinct" -> 0.10)))),

    // Deterministic corpus shuffle + shard assignment — the write-layout
    // step before training: every doc gets a stable pseudo-random md5
    // key, a 16-way shard from the key's first nibble, and its position
    // within the shard. Stable under repartition/append (pure function
    // of doc_id); a training run writes partitionBy(shard) +
    // sortWithinPartitions(key) and each reader streams one shard in
    // order. The per-shard row_number window is the intended cost: a
    // shard must be materialized in its sampling order anyway, and
    // shards are corpus/16 — the window never sees the whole corpus in
    // one partition.
    QueryDef("q_shuffle_det",
      (s, d) => shuffleDetOf(T.documents(s, d)),
      Some("""WITH keyed AS (
             |  SELECT doc_id, md5('sh:' || CAST(doc_id AS VARCHAR)) AS skey
             |  FROM documents),
             |sharded AS (
             |  SELECT doc_id, skey,
             |         CAST(strpos('0123456789abcdef', substring(skey, 1, 1)) - 1 AS INTEGER) AS shard
             |  FROM keyed)
             |SELECT doc_id, shard,
             |       CAST(row_number() OVER (PARTITION BY shard
             |                               ORDER BY skey, doc_id) AS BIGINT) AS pos
             |FROM sharded ORDER BY shard, pos""".stripMargin)),

    // 0 removals on the fixture (its embeddings are isotropic, max
    // pairwise cosine 0.51 — same measured fact as q_dedup_embed), so
    // the declared surface reports per-cluster survivor accounting
    // (always k non-empty rows); CurationSpec plants duplicates and
    // verifies removal semantics per-vector.
    QueryDef("q_dedup_sem",
      (s, d) => semDedupClustersOf(T.embeddings(s, d)), None),

    // DSIR-style importance selection (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling", arXiv:2302.03169):
    // score every raw doc by its average unigram log-likelihood ratio
    // between a target domain (here lang='en', the quality-proxy stand-in)
    // and the raw corpus, add-1 smoothed over the shared vocab, and keep
    // the top-50. Scale plan: BOTH distributions are vocab-bounded aggs
    // (map-side combined explodes — token rows of one doc are co-located
    // in the scan, so the partial agg collapses them before any
    // exchange); the LLR table is vocab-sized and broadcasts into the
    // scoring pass, whose doc-keyed shuffle carries ~one combined row
    // per doc, never raw tokens; the final cut is TakeOrderedAndProject.
    // No corpus text ever shuffles. The 4-dp round pins summation-order
    // float noise (H1-H5).
    QueryDef("q_dsir",
      (s, d) => {
        val tk = T.documents(s, d)
          .select(col("doc_id"), col("lang"),
            explode(TextOps.unicodeWords(col("text"))).as("w"))
        val raw = tk.groupBy(col("w")).agg(count(lit(1)).as("c_r"))
        val tgt = tk.filter(col("lang") === "en")
          .groupBy(col("w").as("tw")).agg(count(lit(1)).as("c_t"))
        val totals = tk
          .agg(count(lit(1)).as("n_r"),
            count(when(col("lang") === "en", 1)).as("n_t"))
          .crossJoin(raw.agg(count(lit(1)).as("v")))
        val llr = raw
          .join(tgt, col("w") === col("tw"), "left")
          .crossJoin(broadcast(totals))
          .select(col("w"),
            (log((coalesce(col("c_t"), lit(0L)) + lit(1.0)) / (col("n_t") + col("v"))) -
              log((col("c_r") + lit(1.0)) / (col("n_r") + col("v")))).as("llr"))
        tk.join(broadcast(llr), "w")
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_toks"), round(avg(col("llr")), 4).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(50)
      },
      Some("""WITH tk AS (
             |  SELECT doc_id, lang, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS w FROM documents),
             |raw AS (SELECT w, count(*) AS c_r FROM tk GROUP BY 1),
             |tgt AS (SELECT w, count(*) AS c_t FROM tk WHERE lang = 'en' GROUP BY 1),
             |tot AS (SELECT (SELECT count(*) FROM tk) AS n_r,
             |               (SELECT count(*) FROM tk WHERE lang = 'en') AS n_t,
             |               (SELECT count(*) FROM raw) AS v),
             |llr AS (SELECT w,
             |          ln((coalesce(c_t, 0) + 1.0) / (n_t + v)) - ln((c_r + 1.0) / (n_r + v)) AS llr
             |        FROM raw LEFT JOIN tgt USING (w), tot)
             |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_toks,
             |       round(avg(llr), 4) AS score
             |FROM tk JOIN llr USING (w)
             |GROUP BY 1, 2 ORDER BY score DESC, doc_id LIMIT 50""".stripMargin)),

    // DSIR over HASHED features — the published method's actual form
    // (Xie et al. 2023, arXiv:2302.03169 hashes n-grams into a FIXED
    // bucket space precisely so the importance table is bounded).
    // q_dsir's exact-vocab variant is fixture-interpretable but its
    // LLR table grows with the corpus vocabulary; here every token
    // maps to a 16-bit md5 bucket, so the LLR table is ≤65536 rows AT
    // ANY CORPUS SIZE and its broadcast is bounded by construction —
    // the 100-TB form of the operator. The bucket hash is the portable
    // first-4-hex-chars of md5 (Spark conv(.,16,10) ≡ DuckDB
    // ('0x'||…)::INT), so the oracle hashes identically.
    QueryDef("q_dsir_hashed",
      (s, d) => dsirHashedScores(s, d)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(50),
      Some(s"""WITH $DsirHashedCte
              |SELECT doc_id, lang, n_toks, score
              |FROM sc ORDER BY score DESC, doc_id LIMIT 50""".stripMargin)),

    // Score calibration table — the reliability diagram behind every
    // score-thresholded document filter: group docs by milli-LLR score
    // bin (floor(10³·score) of the 4-dp-rounded q_dsir_hashed score —
    // the multiply and floor are single IEEE ops on engine-identical
    // doubles, so the bin is exact) and report the observed weak-label
    // rate per bin as a floor-scaled integer. A well-calibrated scorer
    // shows rate rising with bin; the table is what picks q_pr_curve's
    // operating threshold. Scale: the corpus-sized work IS the
    // q_dsir_hashed scoring (bounded broadcast LLR table); the
    // calibration agg is one map-side-combined groupBy over ≤ a few
    // hundred bins.
    QueryDef("q_calibration",
      (s, d) => dsirHashedScores(s, d)
        .select(floor(col("score") * 1000).cast("long").as("bin"),
          when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
        .withColumn("pos_rate_e4", expr("(10000 * n_pos) div n"))
        .orderBy(col("bin")),
      Some(s"""WITH $DsirHashedCte
              |SELECT CAST(floor(score * 1000) AS BIGINT) AS bin,
              |       CAST(count(*) AS BIGINT) AS n,
              |       CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
              |         AS n_pos,
              |       CAST((10000 * sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END))
              |            // count(*) AS BIGINT) AS pos_rate_e4
              |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin)),

    // Precision/recall operating curve for the same scorer: predict
    // positive at milli-LLR bin ≥ τ for a fixed integer threshold grid,
    // count tp/fp/fn exactly, publish floor-scaled precision/recall
    // (−1 when the denominator is empty — deterministic, never a float
    // NaN). The threshold comparison is INTEGER (on the exact bin), so
    // no score-boundary ulp can move a document across an operating
    // point. Scale: one pass over the scored frame against a 7-row
    // broadcast threshold table; each (τ) cell is three
    // map-side-combined conditional counts.
    QueryDef("q_pr_curve",
      (s, d) => {
        val sess = s; import sess.implicits._
        val scored = dsirHashedScores(s, d)
          .select(floor(col("score") * 1000).cast("long").as("m"),
            when(col("lang") === "en", 1L).otherwise(0L).as("y"))
        val taus = Seq(-20L, -10L, -5L, 0L, 5L, 10L, 20L).toDF("tau")
        scored.join(broadcast(taus))
          .groupBy(col("tau"))
          .agg(sum(when(col("m") >= col("tau"), col("y")).otherwise(0L)).as("tp"),
            sum(when(col("m") >= col("tau"), lit(1L) - col("y")).otherwise(0L)).as("fp"),
            sum(when(col("m") < col("tau"), col("y")).otherwise(0L)).as("fn"))
          .select(col("tau"), col("tp"), col("fp"), col("fn"),
            expr("CASE WHEN tp + fp = 0 THEN -1 ELSE (10000 * tp) div (tp + fp) END")
              .as("precision_e4"),
            expr("CASE WHEN tp + fn = 0 THEN -1 ELSE (10000 * tp) div (tp + fn) END")
              .as("recall_e4"))
          .orderBy(col("tau"))
      },
      Some(s"""WITH $DsirHashedCte,
              |m AS (SELECT CAST(floor(score * 1000) AS BIGINT) AS m,
              |             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
              |      FROM sc),
              |taus(tau) AS (VALUES (-20), (-10), (-5), (0), (5), (10), (20)),
              |cells AS (
              |  SELECT tau, sum(CASE WHEN m >= tau THEN y ELSE 0 END) AS tp,
              |         sum(CASE WHEN m >= tau THEN 1 - y ELSE 0 END) AS fp,
              |         sum(CASE WHEN m < tau THEN y ELSE 0 END) AS fn
              |  FROM m CROSS JOIN taus GROUP BY tau)
              |SELECT CAST(tau AS BIGINT) AS tau, CAST(tp AS BIGINT) AS tp,
              |       CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
              |       CASE WHEN tp + fp = 0 THEN -1
              |            ELSE CAST((10000 * tp) // (tp + fp) AS BIGINT) END
              |         AS precision_e4,
              |       CASE WHEN tp + fn = 0 THEN -1
              |            ELSE CAST((10000 * tp) // (tp + fn) AS BIGINT) END
              |         AS recall_e4
              |FROM cells ORDER BY tau""".stripMargin)),

    // In-engine quality-classifier TRAINING (the CCNet/fastText pattern:
    // learn a document filter from weak labels, here lang='en'):
    // full-batch logistic regression over unigram-count features for 8
    // gradient steps, vocab = top-32 tokens (count desc, token asc —
    // total order) plus a bias. See ml/LogReg for the execution shape:
    // feature frame checkpointed once, each step two broadcast joins +
    // two map-side-combined aggs, only the ≤33-weight model reaches the
    // driver. The oracle unrolls the 8 steps as generated CTE chains
    // (the q_pagerank technique); weights round at 4 dp only on output,
    // so cross-engine exp/summation ulp noise (~1e-12) cannot surface.
    QueryDef("q_quality_clf",
      (s, d) => {
        // materialized ONCE like q_clf_auc's (round 16): train()'s
        // regime probe (distinct f) and the docVec build both consume
        // feats — unmaterialized, the probe re-ran the whole tokenize →
        // vocab-join lineage as an extra full pass (the round-15 ADVICE
        // probe-first reorder made that pass visible: 3.4 → 5.4 s)
        val (feats0, nDocs) = clfFeats(s, d)
        val feats = graft.Materialize.frame(feats0)
        val learned =
          graft.ml.LogReg.train(s, feats, nDocs, ClfIters, ClfLr)
        import s.implicits._
        learned.toDF("feature", "weight")
          .select(col("feature"), round(col("weight"), 4).as("weight"))
          .orderBy(col("feature"))
      },
      Some(qualityClfSql(ClfIters, ClfLr, ClfVocab))),

    // Evaluation of the learned filter — Mann-Whitney AUC of the
    // trained q_quality_clf model against its weak labels. Scores are
    // rounded to 4 dp FIRST (cross-engine ulp guard), which also caps
    // the score domain at ≤10001 distinct values — so the AUC runs on
    // a score HISTOGRAM: one groupBy(s), a prefix-sum window over the
    // ≤10k histogram rows (never a per-document global rank window),
    // and the rank-sum identity AUC = (Σ_pos avg_rank − P(P+1)/2)/(P·N)
    // with average ranks for tied groups. At 100 TB the only
    // corpus-scale steps are the scoring join (vocab-bounded broadcast)
    // and the histogram agg — both map-side combined.
    QueryDef("q_clf_auc",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        // one materialization feeds BOTH training and the scoring pass
        // (round 15): uncheckpointed, the post-training scoring join
        // re-ran the whole tokenize → vocab-join feature build a second
        // time — the most expensive lineage in the query
        val (feats0, nDocs) = clfFeats(s, d)
        val feats = graft.Materialize.frame(feats0)
        val learned =
          graft.ml.LogReg.train(s, feats, nDocs, ClfIters, ClfLr)
        import s.implicits._
        val wDf = learned.toDF("f", "wt")
        val scored = feats.join(broadcast(wDf), "f")
          .groupBy(col("doc_id"))
          .agg(max(col("y")).as("y"), sum(col("x") * col("wt")).as("z"))
          .select(col("y"),
            round(lit(1.0) / (lit(1.0) + exp(-col("z"))), 4).as("s"))
        val hist = scored.groupBy(col("s"))
          .agg(sum(col("y")).as("pos_c"),
            (count(lit(1)) - sum(col("y"))).cast("double").as("neg_c"))
        val w = Window.orderBy(col("s"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranked = hist.withColumn("ar",
          coalesce(sum(col("pos_c") + col("neg_c")).over(w), lit(0.0))
            + (col("pos_c") + col("neg_c") + 1) / 2.0)
        ranked.agg(sum(col("pos_c")).as("p"), sum(col("neg_c")).as("n"),
            sum(col("pos_c") * col("ar")).as("rp"))
          .select(col("p").cast("long").as("n_pos"),
            col("n").cast("long").as("n_neg"),
            round((col("rp") - col("p") * (col("p") + 1) / 2.0)
              / (col("p") * col("n")), 4).as("auc"))
      },
      Some(clfAucSql(ClfIters, ClfLr, ClfVocab))),

    // Reciprocal-rank fusion — the standard way to combine heterogeneous
    // retrieval signals (BM25 lexical + embedding ANN in production;
    // CurationSpec pins the fusion semantics on crafted rankings). The
    // declared query fuses two exactly-reproducible rankings per
    // language partition — by filtered token count and by n_chars —
    // RRF(d) = Σ 1/(60 + rank_i(d)), keeping the top 5 per lang.
    // Scale shape: both rankings are PARTITIONED windows (per-lang /
    // per-query-candidate-list, never a global sort); fusion joins on
    // the partition key + doc_id, so the two windows and the join all
    // reuse one hash-partitioning on lang. In a real query path the
    // inputs are top-k candidate LISTS (bounded), making fusion
    // driver-free and embarrassingly parallel across queries.
    QueryDef("q_rrf_fusion",
      (s, d) => rrfFusedOf(T.documents(s, d)),
      Some("""WITH base AS (
             |  SELECT doc_id, lang, n_chars,
             |         len(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
             |                         t -> t <> '')) AS n_toks
             |  FROM documents),
             |ranked AS (
             |  SELECT doc_id, lang,
             |         row_number() OVER (PARTITION BY lang
             |             ORDER BY n_toks DESC, doc_id) AS r_tok,
             |         row_number() OVER (PARTITION BY lang
             |             ORDER BY n_chars DESC, doc_id) AS r_len
             |  FROM base),
             |fused AS (
             |  SELECT doc_id, lang,
             |         round(1.0 / (60 + r_tok) + 1.0 / (60 + r_len), 4) AS rrf
             |  FROM ranked),
             |topk AS (
             |  SELECT lang, doc_id, rrf,
             |         row_number() OVER (PARTITION BY lang
             |             ORDER BY rrf DESC, doc_id) AS fused_rank
             |  FROM fused)
             |SELECT lang, CAST(fused_rank AS INTEGER) AS fused_rank, doc_id, rrf
             |FROM topk WHERE fused_rank <= 5
             |ORDER BY lang, fused_rank""".stripMargin)),

    // Equi-DEPTH histogram of l_extendedprice (8 buckets of ~equal mass)
    // — the profiling complement to q_histogram's equi-width bins and
    // the statistic a cost-based layout planner actually wants (equal-
    // mass bins expose skew that fixed-width bins hide). Plan shape
    // (round 15): the 7 interior boundaries come from a range-
    // partitioned sort + global-rank selection (≤14 rows to the
    // driver), then bucketing is a map-side sum of literal comparisons
    // + bounded-key agg — never an ntile(8) window (which would
    // shuffle every row to one sort order), and no longer the
    // `percentile` ObjectAggregate (which funnelled every distinct
    // value through a single final-merge task; a sketch deployment
    // swaps the selection for `approx_percentile` with no other
    // change). Boundaries are rounded to 4 decimals BEFORE bucketing
    // in both engines so the comparisons see bit-identical doubles.
    QueryDef("q_hist_eqdepth",
      (s, d) => {
        val li = T.lineitem(s, d)
          .select(col("l_extendedprice").cast("double").as("v"))
        // Exact interior boundaries via range-partitioned sort + rank
        // selection (round 15, guide §1.2 "per-task work"): the
        // `percentile(v, array(…))` ObjectAggregate built a value→count
        // OpenHashMap per partition, merged all of them in ONE final
        // reduce task, and sorted the (nearly all-distinct) 583k-entry
        // map single-threaded — measured 2.8-3.8 s of the query's
        // 4-5 s at sf0.1. The sorted-rank form shuffles the column
        // once ACROSS range partitions (parallel), zips global indexes,
        // and collects exactly the ≤14 rank rows the 7 interpolations
        // read — the scale shape is strictly better too (the old final
        // merge funnelled every distinct value through one task).
        // Interpolation replicates Percentile.getPercentile to the op:
        // (hi−pos)·v[lo] + (pos−lo)·v[hi], pos = p·(n−1), p dyadic —
        // and the 4-dp HALF_UP round of the shortest decimal repr is
        // java BigDecimal.valueOf, bit-identical to Spark's round().
        // NOTE this query runs Spark jobs EAGERLY at construction time
        // (count + zipWithIndex + collect for the boundary selection) —
        // consumers of QueryDef that assume lazy plans get the ≤14-row
        // driver work up front; the bench times construction+execution
        // together either way.
        val n = li.count()
        // n == 0 guard (round 16, ADVICE): the old `percentile` form
        // degraded to zero rows on empty input; the rank selection
        // threw (byRank missing key / negative positions). Dummy
        // boundaries keep the plan shape; the groupBy over the empty
        // input still yields zero rows.
        val bs: Seq[Double] =
          if (n == 0) Seq.fill(7)(0.0)
          else {
            val idx = li.repartitionByRange(col("v")).sortWithinPartitions(col("v"))
              .select(col("v")).as(org.apache.spark.sql.Encoders.scalaDouble)
              .rdd.zipWithIndex()
            val positions = (1 to 7).map(i => (i / 8.0) * (n - 1))
            val needed = positions.flatMap { p =>
              val lo = p.toLong; Seq(lo, math.min(lo + 1, n - 1))
            }.toSet
            val byRank: Map[Long, Double] = idx
              .filter { case (_, ix) => needed.contains(ix) }
              .map(_.swap).collect().toMap
            positions.map { pos =>
              val lo = pos.toLong
              val lk = byRank(lo)
              if (lo + 1 > n - 1) lk
              else {
                val hk = byRank(lo + 1)
                if (hk == lk) lk else (lo + 1 - pos) * lk + (pos - lo) * hk
              }
            }
          }
        val bucket = bs
          .map(b => (col("v") > lit(java.math.BigDecimal.valueOf(b)
            .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue)).cast("int"))
          .reduce(_ + _) + 1
        li.groupBy(bucket.as("bucket"))
          .agg(count(lit(1)).as("n"),
            round(min(col("v")), 4).as("lo"),
            round(max(col("v")), 4).as("hi"))
          .orderBy(col("bucket"))
      },
      Some("""WITH b AS (
             |  SELECT quantile_cont(l_extendedprice,
             |           [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS bs
             |  FROM lineitem)
             |SELECT CAST(1 + CAST(l_extendedprice > round(bs[1], 4) AS INT)
             |         + CAST(l_extendedprice > round(bs[2], 4) AS INT)
             |         + CAST(l_extendedprice > round(bs[3], 4) AS INT)
             |         + CAST(l_extendedprice > round(bs[4], 4) AS INT)
             |         + CAST(l_extendedprice > round(bs[5], 4) AS INT)
             |         + CAST(l_extendedprice > round(bs[6], 4) AS INT)
             |         + CAST(l_extendedprice > round(bs[7], 4) AS INT) AS INT) AS bucket,
             |       CAST(count(*) AS BIGINT) AS n,
             |       round(min(l_extendedprice), 4) AS lo,
             |       round(max(l_extendedprice), 4) AS hi
             |FROM lineitem CROSS JOIN b
             |GROUP BY 1 ORDER BY bucket""".stripMargin)),

    // Cross-source vocabulary-overlap matrix: pairwise Jaccard of the
    // distinct word sets of every source pair — the contamination/
    // provenance screen run when merging crawl snapshots from multiple
    // providers (a suspiciously high overlap between two "independent"
    // sources means one mirrors the other; q_decontam covers train-vs-
    // benchmark, this covers source-vs-source). Scale shape: the
    // (source, word) set is vocabulary-bounded (distinct is map-side
    // partial), the self-join is WORD-keyed — each word contributes at
    // most |sources|² pairs (bounded, 20² here) regardless of corpus
    // row count — and the 20-row size table broadcasts twice. Output is
    // |sources| choose 2 rows at any data scale.
    QueryDef("q_source_overlap",
      (s, d) => {
        val sw = T.documents(s, d)
          .select(col("source"), explode(TextOps.unicodeWords(col("text"))).as("word"))
          .distinct()
        val sizes = sw.groupBy(col("source")).agg(count(lit(1)).as("nw"))
        val inter = sw.as("a")
          .join(sw.as("b"),
            col("a.word") === col("b.word") && col("a.source") < col("b.source"))
          .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
          .agg(count(lit(1)).as("common"))
        inter
          .join(broadcast(sizes.withColumnRenamed("source", "src_a")
            .withColumnRenamed("nw", "nw_a")), Seq("src_a"))
          .join(broadcast(sizes.withColumnRenamed("source", "src_b")
            .withColumnRenamed("nw", "nw_b")), Seq("src_b"))
          .select(col("src_a"), col("src_b"), col("common"),
            round(col("common") / (col("nw_a") + col("nw_b") - col("common")), 4)
              .as("jaccard"))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some("""WITH sw AS (
             |  SELECT DISTINCT source, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS word
             |  FROM documents),
             |sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS nw
             |          FROM sw GROUP BY source),
             |inter AS (
             |  SELECT a.source AS src_a, b.source AS src_b,
             |         CAST(count(*) AS BIGINT) AS common
             |  FROM sw a JOIN sw b ON a.word = b.word AND a.source < b.source
             |  GROUP BY 1, 2)
             |SELECT i.src_a, i.src_b, i.common,
             |       round(i.common / (sa.nw + sb.nw - i.common), 4) AS jaccard
             |FROM inter i
             |JOIN sizes sa ON i.src_a = sa.source
             |JOIN sizes sb ON i.src_b = sb.source
             |ORDER BY src_a, src_b""".stripMargin))
  )

  /** q_rrf_fusion's body over an arbitrary documents frame (the spec
    * feeds crafted corpora and asserts hand-computed fusion ranks).
    */
  def rrfFusedOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // canonical Unicode tokenizer (round 13): the token-count ranking
    // signal must see CJK words, not one giant whitespace pseudo-token
    val base = docs.select(col("doc_id"), col("lang"), col("n_chars"),
      size(TextOps.unicodeWords(col("text"))).as("n_toks"))
    val rTok = row_number().over(Window.partitionBy(col("lang"))
      .orderBy(col("n_toks").desc, col("doc_id")))
    val rLen = row_number().over(Window.partitionBy(col("lang"))
      .orderBy(col("n_chars").desc, col("doc_id")))
    val fused = base
      .withColumn("r_tok", rTok).withColumn("r_len", rLen)
      .withColumn("rrf",
        round(lit(1.0) / (lit(60) + col("r_tok"))
          + lit(1.0) / (lit(60) + col("r_len")), 4))
    fused
      .withColumn("fused_rank", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(col("rrf").desc, col("doc_id"))))
      .filter(col("fused_rank") <= 5)
      .select(col("lang"), col("fused_rank"), col("doc_id"), col("rrf"))
      .orderBy(col("lang"), col("fused_rank"))
  }

  /** Shared feature frame for q_quality_clf / q_clf_auc: unigram counts
    * over the top-[[ClfVocab]] tokens plus a bias, weak label
    * y = [lang = en]. Returns (feats, nDocs).
    */
  /** q_dsir_hashed's scored frame (doc_id, lang, n_toks, score) without
    * the top-k cut — shared by q_dsir_hashed, q_calibration and
    * q_pr_curve so all three score documents identically (16-bit
    * md5-bucketed LLR, bounded broadcast importance table, 4-dp score
    * rounding as the cross-engine ulp guard).
    */
  def dsirHashedScores(s: SparkSession, d: String): DataFrame = {
    // four consumers (raw, tgt, totals, the scoring join) — each
    // branch re-ran the tokenizer kernel + md5 bucketing over the
    // whole corpus (round 15: 4-5 documents scans in the before plans
    // of all three scorer queries, guide §7.2). Narrowed to the three
    // columns downstream actually reads (w is spent once b exists),
    // then materialized once: ~24 B/token-row in block storage vs four
    // full tokenize+hash passes.
    val tk = graft.Materialize.frame(T.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(TextOps.unicodeWords(col("text"))).as("w"))
      .withColumn("b",
        conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long"))
      .select(col("doc_id"), col("lang"), col("b")))
    val raw = tk.groupBy(col("b")).agg(count(lit(1)).as("c_r"))
    val tgt = tk.filter(col("lang") === "en")
      .groupBy(col("b").as("tb")).agg(count(lit(1)).as("c_t"))
    val totals = tk
      .agg(count(lit(1)).as("n_r"),
        count(when(col("lang") === "en", 1)).as("n_t"))
      .crossJoin(raw.agg(count(lit(1)).as("v")))
    val llr = raw
      .join(tgt, col("b") === col("tb"), "left")
      .crossJoin(broadcast(totals))
      .select(col("b"),
        (log((coalesce(col("c_t"), lit(0L)) + lit(1.0)) / (col("n_t") + col("v"))) -
          log((col("c_r") + lit(1.0)) / (col("n_r") + col("v")))).as("llr"))
    tk.join(broadcast(llr), "b")
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_toks"), round(avg(col("llr")), 4).as("score"))
  }

  /** The oracle mirror of [[dsirHashedScores]] as a WITH-clause body
    * ending in `sc(doc_id, lang, n_toks, score)` — shared verbatim by
    * the three scorer-consuming oracles.
    */
  // def, not val: `defs` above initializes first and interpolates this
  // eagerly — a later-declared val would still be null at that point
  def DsirHashedCte: String =
    """tk0 AS (
      |  SELECT doc_id, lang, unnest(list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'), x -> x <> '')) AS w
      |  FROM documents),
      |tk AS (SELECT doc_id, lang,
      |              ('0x' || substr(md5(w), 1, 4))::BIGINT AS b
      |       FROM tk0),
      |raw AS (SELECT b, count(*) AS c_r FROM tk GROUP BY 1),
      |tgt AS (SELECT b, count(*) AS c_t FROM tk WHERE lang = 'en' GROUP BY 1),
      |tot AS (SELECT (SELECT count(*) FROM tk) AS n_r,
      |               (SELECT count(*) FROM tk WHERE lang = 'en') AS n_t,
      |               (SELECT count(*) FROM raw) AS v),
      |llr AS (SELECT b,
      |          ln((coalesce(c_t, 0) + 1.0) / (n_t + v)) - ln((c_r + 1.0) / (n_r + v)) AS llr
      |        FROM raw LEFT JOIN tgt USING (b), tot),
      |sc AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_toks,
      |              round(avg(llr), 4) AS score
      |       FROM tk JOIN llr USING (b) GROUP BY 1, 2)""".stripMargin

  private def clfFeats(s: SparkSession, d: String): (DataFrame, Double) = {
    val docs = T.documents(s, d)
    val tk = docs
      .select(col("doc_id"), col("lang"),
        explode(TextOps.unicodeWords(col("text"))).as("w"))
    val vocab = tk.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(ClfVocab).select(col("w"))
    val y = when(col("lang") === "en", 1.0).otherwise(0.0)
    val feats = tk.join(broadcast(vocab), "w")
      .groupBy(col("doc_id"), col("lang"), col("w"))
      .agg(count(lit(1)).cast("double").as("x"))
      .select(col("doc_id"), y.as("y"), col("w").as("f"), col("x"))
      .unionByName(docs.select(col("doc_id"), y.as("y"),
        lit("_bias").as("f"), lit(1.0).as("x")))
    (feats, docs.count().toDouble)
  }

  // defs (above) is a val initialized before these would be — keep them
  // methods so the oracle generator never sees zero-valued constants
  private def ClfVocab = 32
  private def ClfIters = 8
  private def ClfLr = 0.5

  /** Generated (not hand-copied 8×) unrolled-CTE oracle for
    * [[q_quality_clf]]'s fixed gradient-descent iterations.
    */
  private def qualityClfSql(iters: Int, lr: Double, vocabSize: Int): String = {
    val head =
      s"""WITH tk AS (SELECT doc_id, lang, unnest(list_filter(regexp_split_to_array(lower(text), '[^\\p{L}\\p{N}]+'), x -> x <> '')) AS w FROM documents),
         |vocab AS (SELECT w FROM (SELECT w, count(*) AS c FROM tk GROUP BY 1 ORDER BY c DESC, w LIMIT $vocabSize)),
         |feats AS (
         |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y, w AS f, CAST(count(*) AS DOUBLE) AS x
         |  FROM tk JOIN vocab USING (w) GROUP BY doc_id, lang, w
         |  UNION ALL
         |  SELECT doc_id, CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y, '_bias' AS f, 1.0 AS x
         |  FROM documents),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM documents),
         |w0 AS (SELECT DISTINCT f, 0.0 AS wt FROM feats)""".stripMargin
    val steps = (1 to iters).map { k =>
      val p = k - 1
      s"""z$k AS (SELECT doc_id, y, sum(x * wt) AS z FROM feats JOIN w$p USING (f) GROUP BY doc_id, y),
         |r$k AS (SELECT doc_id, 1.0/(1.0 + exp(-z)) - y AS r FROM z$k),
         |g$k AS (SELECT f, sum(x * r) AS s FROM feats JOIN r$k USING (doc_id) GROUP BY f),
         |w$k AS (SELECT w$p.f, w$p.wt - $lr * coalesce(g$k.s, 0.0)/nd AS wt FROM w$p LEFT JOIN g$k USING (f), n)""".stripMargin
    }
    (head +: steps).mkString(",\n") +
      s"\nSELECT f AS feature, round(wt, 4) AS weight FROM w$iters ORDER BY f"
  }

  /** Generated oracle for [[q_clf_auc]]: the same unrolled training CTE
    * chain, then scoring + the histogram Mann-Whitney AUC (identical
    * formulation to the engine so tie handling and rounding agree).
    */
  private def clfAucSql(iters: Int, lr: Double, vocabSize: Int): String = {
    val train = qualityClfSql(iters, lr, vocabSize)
    val ctes = train.substring(0, train.lastIndexOf("\nSELECT"))
    ctes +
      s""",
         |score AS (
         |  SELECT doc_id, max(y) AS y,
         |         round(1.0/(1.0 + exp(-sum(x * wt))), 4) AS s
         |  FROM feats JOIN w$iters USING (f) GROUP BY doc_id),
         |hist AS (
         |  SELECT s, CAST(sum(y) AS DOUBLE) AS pos_c,
         |         CAST(count(*) - sum(y) AS DOUBLE) AS neg_c
         |  FROM score GROUP BY s),
         |rk AS (
         |  SELECT s, pos_c, neg_c,
         |         coalesce(sum(pos_c + neg_c) OVER (ORDER BY s
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           + (pos_c + neg_c + 1) / 2.0 AS ar
         |  FROM hist),
         |agg AS (SELECT sum(pos_c) AS p, sum(neg_c) AS n,
         |               sum(pos_c * ar) AS rp FROM rk)
         |SELECT CAST(p AS BIGINT) AS n_pos, CAST(n AS BIGINT) AS n_neg,
         |       round((rp - p * (p + 1) / 2.0) / (p * n), 4) AS auc
         |FROM agg""".stripMargin
  }
}
