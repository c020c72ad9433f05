package graft

import graft.functions.{BpeExprs, BpeTable}
import graft.ml.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE vocabulary learning (q_bpe_train) and corpus encoding
  * (q_bpe_encode).
  *
  * The trainer has no SQL oracle (iterative argmax). It is pinned by:
  *  1. first-merge parity — merge #0 must equal the most frequent
  *     adjacent symbol pair of the histogram, computed independently;
  *  2. token-count conservation — encoding every histogram word with
  *     the learned table yields exactly (initial symbols − Σ support)
  *     tokens, which simultaneously proves the recorded supports and
  *     that the encoder reproduces the training segmentation;
  *  3. bit-identical merges under a different input partitioning;
  *  4. the codegen'd `bpe_tokens` expression agreeing with the
  *     driver-side encoder word by word.
  */
class BpeSpec extends AnyFunSuite with SharedSpark {

  private lazy val hist = Bpe.wordHistogram(Tables.documents(spark, sf), 256)
  private lazy val merges = Bpe.train(hist, 48)
  private lazy val ranks: Map[(String, String), Int] =
    merges.map(m => (m.left, m.right) -> m.rank).toMap

  test("first merge is the most frequent adjacent pair of the histogram") {
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    hist.foreach { case (w, f) =>
      val syms = w.map(_.toString) :+ Bpe.EndOfWord
      syms.sliding(2).foreach { p =>
        counts.update((p(0), p(1)), counts.getOrElse((p(0), p(1)), 0L) + f)
      }
    }
    val best = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
    assert(merges.nonEmpty)
    assert((merges.head.left, merges.head.right) == best._1)
    assert(merges.head.support == best._2,
      "first merge is overlap-free only if nothing overlaps; adjust if fixture has aaa-runs")
  }

  test("token-count conservation: encoded length = initial symbols - sum(support)") {
    val initial = hist.map { case (w, f) => f * (w.length + 1L) }.sum
    val encoded = hist.map { case (w, f) => f * Bpe.encode(w, ranks).length.toLong }.sum
    assert(encoded == initial - merges.map(_.support).sum)
  }

  test("merges are bit-identical under a different input partitioning") {
    val hist2 = Bpe.wordHistogram(Tables.documents(spark, sf).repartition(7), 256)
    assert(hist2.toSeq == hist.toSeq)
    assert(Bpe.train(hist2, 48) == merges)
  }

  test("bpe_tokens expression agrees with the driver-side encoder") {
    val table = BpeTable(merges)
    val doc = Tables.documents(spark, sf).orderBy("doc_id").limit(5)
      .select(col("doc_id"), col("text"),
        BpeExprs.bpeTokens(col("text"), table).as("toks"))
      .collect()
    doc.foreach { r =>
      val words = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .split("[^\\p{L}]+").filter(_.nonEmpty)
      val expect = words.flatMap(w => Bpe.encode(w, ranks)).toSeq
      assert(r.getSeq[String](2) == expect, s"doc ${r.getLong(0)} encoding drifted")
    }
  }

  test("trainer histogram and encode path tokenize through ONE kernel (locale pinning, round 12)") {
    // The histogram used Spark's lower() (JVM-default locale for
    // non-ASCII) while encodeText pinned Locale.ROOT — on a
    // Turkish-locale JVM the vocabulary ('ı') and encode path ('i')
    // diverged for dotted/dotless I. Both now call
    // BpeKernels.splitWords; pin the wiring:
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    val text = "Diyarbakır'da BÜYÜK İstanbul; straße über 北京大学!"
    // histogramWords (what wordHistogram explodes) == the word stream
    // encodeText walks — same kernel, so equal BY CONSTRUCTION; the
    // assertion guards against the call sites drifting apart again
    val hist = graft.functions.BpeKernels
      .histogramWords(UTF8String.fromString(text))
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
    val enc = graft.functions.BpeKernels.splitWords(UTF8String.fromString(text))
      .filter(_.nonEmpty).toSeq
    assert(hist == enc && hist.nonEmpty, s"hist=$hist enc=$enc")
    // and wordHistogram (the DataFrame pass) tokenizes identically
    val docs = Seq((0L, text)).toDF("doc_id", "text")
    val fromDf = Bpe.wordHistogram(docs, cap = 100).map(_._1).toSet
    assert(fromDf == hist.toSet, s"df=$fromDf kernel=${hist.toSet}")
    // the Locale.ROOT property itself: dotted capital İ must NOT
    // case-map through the default locale (ROOT maps İ -> "i̇",
    // i + combining dot, regardless of JVM locale)
    assert(hist.exists(_.startsWith("i")), s"İstanbul lost: $hist")
  }

  test("unicode BPE: accented and Han words train and encode losslessly (round 11)") {
    import spark.implicits._
    // crafted non-ASCII corpus — the driver fixture is 100% ASCII, so
    // this is the only place the multilingual path gets exercised
    val docs = Seq(
      (1L, "straße straße straße müller müller café café café café"),
      (2L, "北京 北京 北京 北京 欢迎 欢迎 你好 你好 你好"),
      (3L, "el niño pequeño según según según el niño"))
      .toDF("doc_id", "text")
    val h = Bpe.wordHistogram(docs, 64)
    val words = h.map(_._1).toSet
    assert(words.contains("straße") && words.contains("café") &&
      words.contains("北京") && words.contains("según"),
      s"non-Latin words must survive the histogram pass: ${words.mkString(",")}")
    val m = Bpe.train(h, 32)
    assert(m.nonEmpty)
    val rk = m.map(x => (x.left, x.right) -> x.rank).toMap
    // encoding is lossless: concatenated symbols minus the sentinel
    // reproduce the word, for every trained word
    words.foreach { w =>
      val enc = Bpe.encode(w, rk)
      assert(enc.mkString("").stripSuffix(Bpe.EndOfWord) == w,
        s"lossy encode of $w: ${enc.toSeq}")
    }
    // the codegen'd expression agrees with the driver encoder on the
    // unicode corpus too
    val table = BpeTable(m)
    val got = docs.select(col("doc_id"),
        BpeExprs.bpeTokens(col("text"), table).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    docs.collect().foreach { r =>
      val expect = r.getString(1).toLowerCase(java.util.Locale.ROOT)
        .split("[^\\p{L}]+").filter(_.nonEmpty)
        .flatMap(w => Bpe.encode(w, rk)).toSeq
      assert(got(r.getLong(0)) == expect)
    }
    // supplementary-plane safety: a 𝕊 (U+1D54A, surrogate pair) word
    // must round-trip through code-point symbols, never tear
    val tricky = "x𝕊y"
    val enc = Bpe.encode(tricky, Map.empty)
    assert(enc.toSeq == Seq("x", "𝕊", "y", Bpe.EndOfWord))
  }

  test("q_bpe_encode counts are consistent and the subword stream is real") {
    val rows = SparkEntry.queries("q_bpe_encode")(spark, sf).collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val n = r.getLong(1); val distinct = r.getLong(2)
      assert(n > 0 && distinct > 0 && distinct <= n)
      assert(r.getString(3).nonEmpty)
    }
    // learned merges compress: fewer BPE tokens than raw characters
    val totalChars = Tables.documents(spark, sf)
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum < totalChars)
  }

  test("q_bpe_train emits a well-formed rank-ordered merge table") {
    val rows = SparkEntry.queries("q_bpe_train")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 64)
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) == i)
      assert(r.getString(3) == r.getString(1) + r.getString(2))
      assert(r.getLong(4) >= 2L)
    }
  }

  test("q_tok_fertility matches a driver-side per-language recompute") {
    val got = SparkEntry.queries("q_tok_fertility")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    // the QUERY trains at the Vocab object's size, not this spec's
    // smaller fixture table — recompute with the identical table
    val qRanks = Bpe.train(
        Bpe.wordHistogram(Tables.documents(spark, sf), queries.Vocab.VocabCap),
        queries.Vocab.NumMerges)
      .map(m => (m.left, m.right) -> m.rank).toMap
    val expected = docs.groupBy(_._1).map { case (lang, ds) =>
      val subs = ds.map { case (_, text) =>
        // same tokenization the bpe_tokens expression applies
        text.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}]+").filter(_.nonEmpty)
          .map(w => Bpe.encode(w, qRanks).length).sum.toLong
      }.sum
      // Spark's split keeps trailing empties (java split limit -1)
      val words = ds.map(_._2.split(" ", -1).length.toLong).sum
      lang -> ((ds.length.toLong, subs, words,
        (BigInt(10000) * subs / words).toLong))
    }
    assert(got.keySet == expected.keySet)
    expected.foreach { case (lang, e) =>
      assert(got(lang) == e, s"lang $lang: got ${got(lang)}, expected $e")
    }
  }
}
