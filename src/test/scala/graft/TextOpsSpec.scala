package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic reference checks for the non-oracle text queries. */
class TextOpsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** Driver-side mirror of queries.TextOps.unicodeWords. */
  private def uniToks(text: String): Seq[String] =
    text.toLowerCase(java.util.Locale.ROOT)
      .split("[^\\p{L}\\p{N}]+").toSeq.filter(_.nonEmpty)

  test("q_lang_id matches a driver-side recompute of the lexicon vote on every doc") {
    val lexicon = Seq(
      "de" -> Seq("der", "die", "das"),
      "en" -> Seq("the", "a", "of"),
      "es" -> Seq("el", "la", "de"))
    val got = SparkEntry.queries("q_lang_id")(spark, sf)
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    val texts = Tables.documents(spark, sf)
      .select("doc_id", "text").as[(Long, String)].collect()
    assert(texts.nonEmpty && got.size == texts.length)
    texts.foreach { case (id, text) =>
      val toks = uniToks(text)
      val votes = lexicon.map { case (lang, words) =>
        lang -> toks.count(words.contains).toLong
      } :+ ("zh" -> text.codePoints().toArray
        .count(cp => Character.UnicodeScript.of(cp) == Character.UnicodeScript.HAN).toLong)
      val best = votes.map(_._2).max
      val expect =
        if (best == 0) ("und", 0L)
        else (votes.find(_._2 == best).get._1, best) // alphabetical tiebreak
      assert(got(id) == expect, s"doc $id: got ${got(id)} want $expect")
    }
  }

  /** Crafted NON-ASCII documents.parquet (the driver fixture is 100%
    * ASCII, so nothing there can exercise real multilingual text) —
    * written once per run, served to any query under test as its sfDir.
    */
  private lazy val uniDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_unidocs").toString
    Seq(
      (1L, "Der Müller wohnt in der großen Straße", "de", "crafted", 38L),
      (2L, "el niño pequeño y el árbol según el plan", "es", "crafted", 41L),
      (3L, "the cat of the house saw a bird", "en", "crafted", 31L),
      (4L, "北京欢迎你 我们都是好朋友 北京欢迎你", "zh", "crafted", 19L),
      (5L, "Café crème, s'il vous plaît — naïve résumé!", "fr", "crafted", 43L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("unicode tokenizer: accented and CJK text survives whole (the [^a-z] bug class)") {
    val toks = Tables.documents(spark, uniDir)
      .select($"doc_id", graft.queries.TextOps.unicodeWords($"text").as("t"))
      .as[(Long, Seq[String])].collect().toMap
    assert(toks(1L) == Seq("der", "müller", "wohnt", "in", "der", "großen", "straße"))
    assert(toks(2L) == Seq("el", "niño", "pequeño", "y", "el", "árbol", "según", "el", "plan"))
    assert(toks(4L) == Seq("北京欢迎你", "我们都是好朋友", "北京欢迎你"),
      "Han runs must tokenize to whole letter runs, not vanish")
    assert(toks(5L) == Seq("café", "crème", "s", "il", "vous", "plaît", "naïve", "résumé"))
    // and the Spark-side tokenizer agrees with the driver mirror used
    // by the recompute tests
    toks.foreach { case (id, t) =>
      val text = Tables.documents(spark, uniDir).filter($"doc_id" === id)
        .select("text").as[String].head()
      assert(t == uniToks(text), s"doc $id tokenizer drift")
    }
  }

  test("q_lang_id on non-ASCII docs: Han script votes zh, accented stopwords vote es/de") {
    val got = SparkEntry.queries("q_lang_id")(spark, uniDir)
      .as[(Long, String, String, Long)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(got(1L) == "de", s"umlaut text must still match 'der': $got")
    assert(got(2L) == "es", "accented es text votes el/la")
    assert(got(3L) == "en")
    assert(got(4L) == "zh", "Han-script doc must be detected via script votes")
  }

  test("q_token_regex and q_text_stats count non-ASCII words as words") {
    val tr = SparkEntry.queries("q_token_regex")(spark, uniDir)
      .as[(Long, Int, Int)].collect().map(r => r._1 -> r._2).toMap
    // doc 5: café crème s il vous plaît naïve résumé = 8 alnum runs —
    // the old [a-zA-Z0-9] class fragmented caf|é etc.
    assert(tr(5L) == 8, s"accented runs must count whole: $tr")
    assert(tr(4L) == 3, "three Han runs")
    val ts = SparkEntry.queries("q_text_stats")(spark, uniDir)
      .select("lang", "n_tokens").as[(String, Long)].collect().toMap
    assert(ts("zh") == 3L, "zh doc contributes its three Han-run tokens")
    assert(ts("de") == 7L)
  }

  test("substring dedup: planted shared spans are found with exact boundaries") {
    // Unique filler tokens everywhere except a 12-token span shared by
    // docs 1 and 2 (k=8 → dup windows at positions p..p+4, merged into
    // one 12-token island), and a doc 3 that repeats ITS OWN 8-gram
    // (within-doc duplication must count too, as in Lee et al.).
    val shared = (0 until 12).map(i => s"dup$i").mkString(" ")
    val self8 = (0 until 8).map(i => s"rep$i").mkString(" ")
    val docs = Seq(
      (1L, (0 until 10).map(i => s"a$i").mkString(" ") + " " + shared +
        " " + (0 until 5).map(i => s"b$i").mkString(" ")),
      (2L, (0 until 3).map(i => s"c$i").mkString(" ") + " " + shared),
      (3L, self8 + " " + (0 until 4).map(i => s"d$i").mkString(" ") + " " + self8),
      (4L, (0 until 30).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val got = graft.queries.TextOps.substrSpansOf(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1: 27 toks, one island covering exactly the 12 shared tokens
    assert(got(1L) == ((27, 1L, 12L)), s"doc1: ${got(1L)}")
    // doc 2: 15 toks, same 12-token island
    assert(got(2L) == ((15, 1L, 12L)), s"doc2: ${got(2L)}")
    // doc 3: 20 toks, two 8-token islands (its own repeat, split by d0-d3)
    assert(got(3L) == ((20, 2L, 16L)), s"doc3: ${got(3L)}")
    // doc 4: all-unique tokens → no duplicated span, absent from output
    assert(!got.contains(4L), s"doc4 flagged: ${got.get(4L)}")
  }

  test("inverted index: GroupedTopK posting head is the sorted prefix; df is exact") {
    import spark.implicits._
    // term "w" in 6 docs (head capped at 4), "x" in 5, "y" in 4 (below minDf)
    val docs = (0L until 6L).map(i => (i, "w" + (if (i < 5) " x" else "") + (if (i < 4) " y" else "")))
      .toDF("doc_id", "text")
    val out = graft.queries.TextOps.invertedIndexOf(docs, minDf = 5, headK = 4)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
    assert(out.keySet == Set("w", "x"), s"minDf filter: ${out.keySet}")
    assert(out("w") == ((6L, "0,1,2,3")), s"capped sorted head: ${out("w")}")
    assert(out("x") == ((5L, "0,1,2,3")))
  }

  test("inverted index: head equals full-list prefix on the fixture") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, sf)
    val got = graft.queries.TextOps.invertedIndexOf(docs, minDf = 1, headK = 8)
      .collect().map(r => r.getString(0) -> r.getString(2)).toMap
    val full = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term")
      .agg(slice(sort_array(collect_set(col("doc_id"))), 1, 8).as("head"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[Long](1).mkString(",")).toMap
    assert(got == full, "GroupedTopK head must equal the sorted-prefix ground truth")
  }

  test("unicodeWords kernel ≡ the regex form it replaced, on multilingual + numeric-class text (round 12)") {
    // The kernel (codepoint walk) must be indistinguishable from
    // filter(split(lower(text), "[^\p{L}\p{N}]+"), t -> t <> '') — the
    // declared tokenizer definition the DuckDB mirrors restate. Drive
    // BOTH as Spark expressions over one frame so lower() semantics are
    // Spark's own on each side.
    import org.apache.spark.sql.functions._
    val texts = Seq(
      "the fast key order sort",
      "  leading and trailing  ",
      "",
      "汉字text混在一起no spaces",
      "Ünïcôde STRAẞE straße größer",
      "Diyarbakır İstanbul",
      "digits 123 mixed a1b2, Ⅻ roman ² super ½ frac", // Nl and No classes
      "punct-only !!! ,,, 。。。",
      "a",
      "北京，大学。")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val both = df.select(col("doc_id"),
        graft.queries.TextOps.unicodeWords(col("text")).as("kernel"),
        filter(split(lower(col("text")), "[^\\p{L}\\p{N}]+"), t => t =!= "").as("regex"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}: kernel=${r.getSeq[String](1)} regex=${r.getSeq[String](2)}")
    }
    // spot-pin the Nl/No class membership the old isLetterOrDigit missed
    val toks = both(6).getSeq[String](1)
    assert(toks.contains("ⅻ") || toks.contains("Ⅻ".toLowerCase), s"Nl lost: $toks")
  }

  test("bigram-LM / DSIR / sketch / zipf families tokenize zh & de non-degenerately (round 12)") {
    // The round-12 unification: these families now tokenize through
    // unicodeWords. Under the old whitespace split a space-free zh doc
    // was ONE giant token (zero bigrams, one vocab entry) and German
    // tokens kept punctuation glued on ("straße," ≠ "straße"). A
    // crafted multilingual corpus pins the new behavior end-to-end
    // through the REAL QueryDefs (a temp documents.parquet dir).
    import org.apache.spark.sql.functions._
    val zh = "北京大学，中国科学。北京大学，中国科学。北京大学，中国科学。" // 6 toks: (a b) ×3
    val de = "straße, größer; straße, größer. straße, größer"             // 6 toks
    val en = "the data pipeline joins the data pipeline scans the data pipeline" // 11 toks
    val rows = (0L until 4L).map(i => (i, zh, "zh", "alpha")) ++
      (4L until 8L).map(i => (i, de, "de", "beta")) ++
      Seq((8L, en, "en", "alpha"), (9L, en, "en", "alpha"),
        (10L, en, "en", "beta"), (11L, en, "en", "beta"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zhde").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    def run(q: String) = SparkEntry.queries(q)(spark, dir)

    // q_ngram_lm: the Han bigram exists with its exact corpus count
    val lm = run("q_ngram_lm").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(lm(("北京大学", "中国科学")) == 12L, s"han bigram: $lm")
    assert(lm(("straße", "größer")) == 12L, "umlaut token must stay whole, no punctuation glued")
    assert(!lm.keys.exists { case (a, b) => (a + b).exists(",;.。，".contains(_)) })

    // q_doc_ppl + q_repetition: per-doc bigram counts = tokens − 1
    val ppl = run("q_doc_ppl").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ppl(0L) == 5L && ppl(4L) == 5L && ppl(8L) == 10L, s"ppl bigram counts: $ppl")
    val rep = run("q_repetition").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rep(0L) == ((5L, 3L)), s"zh repetition: ${rep(0L)}") // (a,b)×3 of 5

    // q_dsir: every doc scored over its REAL token count
    val dsir = run("q_dsir").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(dsir(0L) == 6L && dsir(4L) == 6L && dsir(8L) == 11L, s"dsir n_toks: $dsir")

    // q_zipf: vocabulary = 9 whole words (2 zh + 2 de + 5 en)
    assert(run("q_zipf").collect().head.getLong(0) == 9L)

    // q_sketch_topk: the head contains the whole multi-script tokens
    val top = run("q_sketch_topk").collect().map(_.getString(1)).toSet
    assert(top.contains("北京大学") && top.contains("straße"), s"topk: $top")

    // q_curriculum: token mass conserved across stages (whitespace
    // tokenization would count each zh doc as ONE token: 56 ≠ 92)
    val cur = run("q_curriculum").collect()
    assert(cur.map(_.getLong(1)).sum == 12L && cur.map(_.getLong(2)).sum == 92L,
      s"curriculum stages: ${cur.mkString(";")}")

    // q_source_overlap: the two sources share exactly the 5 en words
    val ov = run("q_source_overlap").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(ov(("alpha", "beta")) == 5L, s"overlap: $ov")
  }

  test("retrieval/quality families (bm25, entropy, pmi, freq_terms, tok_vocab, kmv, para) tokenize zh & de non-degenerately (round 13)") {
    // Round-13 unification: the last 8 non-definitional whitespace-split
    // analytics queries moved onto unicodeWords. Under the old split a
    // space-free zh doc was ONE pseudo-token: entropy 0, BM25/PMI/
    // freq-term counts silently zero, vocab coverage always-OOV. This
    // fixture pins the new behavior end-to-end through the REAL
    // QueryDefs (a temp documents.parquet dir).
    import org.apache.spark.sql.functions._
    val zh = "北京大学，中国科学。"            // 2 toks per repeat
    val de = "straße, größer; straße, größer. straße, größer" // 6 toks
    val rows = (0L until 5L).map(i => (i, zh * 3, "zh", "s0")) ++ Seq(
      (5L, zh * 8, "zh", "s0"),                        // 16 toks → 2 paragraphs
      (6L, de, "de", "s1"),
      (7L, "spark, window; merge. spark window merge spark", "en", "s1"),
      (8L, "spark pipeline data", "en", "s1"),
      (9L, "data pipeline scans logs", "en", "s1"))
    val dir = java.nio.file.Files.createTempDirectory("graft_zhde13").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.parquet(s"$dir/documents.parquet")
    def run(q: String) = SparkEntry.queries(q)(spark, dir)

    // q_text_entropy: doc 0 = (a b)×3 → 6 tokens, H = ln6 − ln3 = ln2;
    // whitespace tokenization would report n_toks=1, entropy 0
    val ent = run("q_text_entropy").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(ent(0L) == ((6L, 0.6931)), s"zh entropy: ${ent(0L)}")
    assert(ent(5L) == ((16L, 0.6931)), s"zh long-doc entropy: ${ent(5L)}")

    // q_bm25: the query terms live in the punctuated en doc — "spark,"
    // must match the term "spark"; exactly docs 7 and 8 score, 7 first
    val bm = run("q_bm25").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(bm.map(_._1).toSet == Set(7L, 8L), s"bm25 docs: ${bm.toSeq}")
    assert(bm.head._1 == 7L && bm.head._2 > bm.last._2, s"bm25 rank: ${bm.toSeq}")

    // q_freq_terms: the Han words appear in 6/10 docs ≥ 40%
    val ft = run("q_freq_terms").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ft.get("北京大学").contains(6L) && ft.get("中国科学").contains(6L),
      s"freq terms must see Han words: $ft")

    // q_pmi: the Han pair co-occurs in 6 docs (≥ the df_ab floor of 5)
    val pmi = run("q_pmi").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(pmi.get(("中国科学", "北京大学")).contains(6L), s"pmi pairs: $pmi")

    // q_tok_vocab: the zh doc is 6 in-vocab tokens, not 1 OOV blob
    val tv = run("q_tok_vocab").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(tv(0L) == ((6L, 0L, 1.0)), s"zh vocab coverage: ${tv(0L)}")

    // q_sketch_kmv: group 0 (zh) has a 2-word vocabulary, group 1 has
    // 2 de + 7 en = 9; disjoint → union 11, intersection 0 (KMV is
    // exact below k)
    val kmv = run("q_sketch_kmv").head()
    assert((kmv.getLong(0), kmv.getLong(1), kmv.getLong(2), kmv.getLong(3))
      == ((2L, 9L, 11L, 0L)), s"kmv: $kmv")

    // q_dedup_para: the 16-token zh doc splits into two IDENTICAL
    // 8-token paragraphs (one kept); docs 0-4 share one 6-token
    // paragraph (doc 0 wins). Whitespace chunking would make each zh
    // doc a single giant-token paragraph with punctuation intact.
    val para = run("q_dedup_para").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    val zh8 = Seq.fill(4)("北京大学 中国科学").mkString(" ")
    assert(para(5L) == ((1L, zh8)), s"zh para dedup: ${para(5L)}")
    assert(para(0L)._1 == 1L && para(1L) == ((0L, "")),
      s"cross-doc zh paragraph dedup: ${para(0L)} ${para(1L)}")
  }

  test("containment is directional: short-inside-long scores 1.0 one way, low Jaccard") {
    import spark.implicits._
    val short8 = "w1 w2 w3 w4 w5 w6 w7 w8"
    val long28 = short8 + " " + (0 until 20).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, short8), (2L, long28), (3L, "a b c d e f g h")).toDF("doc_id", "text")
    val got = graft.queries.TextOps.containmentPairsOf(docs, thr = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 1's 6 shingles all occur in doc 2 -> containment 1.0; the
    // reverse direction is 6/26 and must NOT appear; doc 3 is disjoint
    assert(got.toSeq == Seq((1L, 2L, 1.0)), s"got ${got.toSeq}")
    // and the symmetric Jaccard view scores the same pair below 0.5
    val jac = graft.queries.TextOps.jaccardPairsOf(docs).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "Jaccard must miss the contained pair containment catches")
  }
}
