package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding vocabulary learning over a document corpus.
  *
  * 100-TB shape (the reason this is corpus-scale-safe): BPE is trained
  * on the WORD HISTOGRAM, not the raw corpus — the only corpus-scale
  * pass is one tokenize→groupBy count with map-side partial
  * aggregation. The merge-learning loop then runs over the top-V word
  * histogram (V ≤ `VocabCap` rows, a bounded driver-side structure like
  * the ≤4096 k-means centroids in [[KMeansLite]]); its cost is
  * O(V · avg word len · merges) regardless of corpus size. Encoding the
  * corpus with the learned table is a second map-only pass (the
  * codegen'd `bpe_tokens` expression in `functions/BpeExprs.scala`).
  *
  * Determinism contract (the fixture and the 1000-executor cluster must
  * learn the same vocabulary): ties in the histogram cut break on
  * (count desc, word asc); ties in pair selection break on
  * (count desc, left asc, right asc); merge application is
  * leftmost-first non-overlapping. No step depends on partitioning.
  *
  * Reference scope: the reference has no tokenizer at all (token
  * counting there is byte length, `modules/src/prisma_report/lambda.py`
  * has none) — this is a north-star operator for training-data
  * pipelines (token budgeting, packing, and vocab coverage all want a
  * learned subword vocabulary).
  */
object Bpe {

  /** One learned merge: at `rank`, adjacent pair (`left`,`right`)
    * became `left+right`; `support` = frequency-weighted number of
    * occurrences actually merged (leftmost non-overlapping count), so
    * Σ support = (total tokens before) − (total tokens after) over the
    * training histogram — the invariant BpeSpec asserts.
    */
  final case class Merge(rank: Int, left: String, right: String, support: Long)

  /** End-of-word sentinel appended as a separate initial symbol, the
    * classic BPE device that lets merges distinguish word-final
    * subwords ("low</w>") from prefixes ("low" in "lower").
    */
  val EndOfWord = "</w>"

  /** Split a word into per-CODE-POINT symbols (+ nothing else): the
    * base alphabet of the merge algebra. Code points, not chars —
    * `charAt` would tear supplementary-plane characters (emoji, CJK
    * extension blocks) into unpaired surrogates that can never merge
    * back into valid text.
    */
  def charSymbols(w: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](w.length)
    var i = 0
    while (i < w.length) {
      val n = Character.charCount(w.codePointAt(i))
      out += w.substring(i, i + n)
      i += n
    }
    out.toArray
  }

  /** Corpus-scale pass: lowercase, strip non-letter runs, explode,
    * count — then keep the top `cap` words by (count desc, word asc).
    * The sort+limit plans as TakeOrderedAndProject (per-partition heap,
    * driver merges `cap` rows), never a global sort of the word table.
    * `\p{L}` runs, not `[a-z]` (round 11): BPE's base symbols are
    * code points, so accented/CJK words train exactly like ASCII ones
    * instead of being silently deleted from the histogram. Tokenizes
    * through [[graft.functions.BpeKernels.splitWords]] (round 12) —
    * the SAME Locale.ROOT kernel the encode path uses, so the trained
    * vocabulary and bpe_tokens() can never disagree on a JVM whose
    * default locale case-maps differently (Turkish dotted/dotless I).
    */
  def wordHistogram(docs: DataFrame, cap: Int): Array[(String, Long)] = {
    val words = docs
      .select(explode(graft.functions.BpeExprs.histogramWords(col("text"))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(cap)
    // bounded collect: ≤ cap rows by construction (the vocab histogram
    // is the documented driver-side state, like k-means centroids)
    words.collect().map(r => r.getString(0) -> r.getLong(1))
  }

  /** Learn up to `numMerges` merges from a word histogram. Stops early
    * when the best remaining pair occurs fewer than `minSupport` times.
    */
  def train(histogram: Array[(String, Long)], numMerges: Int,
            minSupport: Long = 2L): Seq[Merge] = {
    // mutable working set: each word as its current symbol sequence
    val freqs = histogram.map(_._2)
    val words: Array[Array[String]] = histogram.map { case (w, _) =>
      charSymbols(w) :+ EndOfWord
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var continue = true
    while (rank < numMerges && continue) {
      // count all adjacent pairs, frequency-weighted (overlap included:
      // "aaa" contributes (a,a) twice — the classic counting rule)
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var wi = 0
      while (wi < words.length) {
        val syms = words(wi); val f = freqs(wi)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + f)
          i += 1
        }
        wi += 1
      }
      if (counts.isEmpty) continue = false
      else {
        val (best, bestCnt) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        if (bestCnt < minSupport) continue = false
        else {
          // apply leftmost-first non-overlapping; count what actually
          // merged (≤ bestCnt when occurrences overlap)
          var merged = 0L
          wi = 0
          while (wi < words.length) {
            val syms = words(wi)
            var changed = false
            var i = 0
            while (i < syms.length - 1 && !changed) {
              if (syms(i) == best._1 && syms(i + 1) == best._2) changed = true
              i += 1
            }
            if (changed) {
              val out = scala.collection.mutable.ArrayBuffer.empty[String]
              i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
                  out += best._1 + best._2
                  merged += freqs(wi)
                  i += 2
                } else { out += syms(i); i += 1 }
              }
              words(wi) = out.toArray
            }
            wi += 1
          }
          merges += Merge(rank, best._1, best._2, merged)
          rank += 1
        }
      }
    }
    merges.toSeq
  }

  /** Encode one word (no sentinel) with a learned merge table:
    * repeatedly merge the lowest-rank pair present, leftmost-first
    * non-overlapping — reproduces the training-time segmentation
    * exactly (BpeSpec asserts the token-count identity).
    */
  def encode(word: String, ranks: Map[(String, String), Int]): Array[String] = {
    var syms: Array[String] = charSymbols(word) :+ EndOfWord
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < bestRank) bestRank = r
        i += 1
      }
      if (bestRank == Int.MaxValue) continue = false
      else {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        i = 0
        while (i < syms.length) {
          if (i < syms.length - 1 &&
              ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue) == bestRank) {
            out += syms(i) + syms(i + 1); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toArray
        continue = syms.length > 1
      }
    }
    syms
  }
}
