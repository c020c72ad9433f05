package graft.queries

import graft.{QueryDef, Tables => T}
import graft.functions.{BpeExprs, BpeTable}
import graft.ml.Bpe
import org.apache.spark.sql.functions._

/** Learned subword vocabulary (BPE) — train + corpus-wide encode
  * (SURVEY.md §2b q_bpe_train / q_bpe_encode).
  *
  * Neither query is oracle-eligible: BPE merge learning is an
  * iterative argmax loop no single SQL statement expresses. BpeSpec
  * verifies the trainer against first-merge SQL parity, the
  * token-count conservation identity, encoder/trainer segmentation
  * agreement, and partitioning-independence; the declared queries are
  * smoke-covered like every other entry.
  *
  * Scale shape: q_bpe_train's corpus-scale work is ONE histogram pass
  * (map-side combined groupBy + TakeOrderedAndProject top-V cut);
  * learning runs on the bounded histogram (ml/Bpe.scala). q_bpe_encode
  * is a second map-only pass — the codegen'd `bpe_tokens` expression
  * fuses into the scan stage, so at 100 TB it is embarrassingly
  * parallel with no shuffle before the per-doc projection.
  */
object Vocab {

  /** Fixture-scale knobs: top-512 word histogram, ≤64 merges, pairs
    * must occur ≥2 times. At 100 TB only VocabCap/NumMerges grow (to
    * ~50k/~32k for a production tokenizer) — the histogram stays a
    * bounded driver-side table either way.
    */
  val VocabCap = 512
  val NumMerges = 64

  private def learned(s: org.apache.spark.sql.SparkSession, d: String): Seq[Bpe.Merge] =
    Bpe.train(Bpe.wordHistogram(T.documents(s, d), VocabCap), NumMerges)

  val defs: Seq[QueryDef] = Seq(

    // The learned merge table itself: rank order IS the vocabulary.
    QueryDef("q_bpe_train",
      (s, d) => {
        import s.implicits._
        learned(s, d)
          .map(m => (m.rank, m.left, m.right, m.left + m.right, m.support))
          .toDF("merge_rank", "left_sym", "right_sym", "merged", "support")
          .orderBy(col("merge_rank"))
      },
      None),

    // Corpus-wide subword encoding with the learned table: per-doc BPE
    // token count, distinct-subword count, and the head of the stream.
    QueryDef("q_bpe_encode",
      (s, d) => {
        val table = BpeTable(learned(s, d))
        T.documents(s, d)
          .select(col("doc_id"),
            BpeExprs.bpeTokens(col("text"), table).as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_bpe_tokens"),
            size(array_distinct(col("toks"))).cast("long").as("n_distinct_sub"),
            array_join(slice(col("toks"), 1, 8), " ").as("head_sub"))
          .orderBy(col("doc_id"))
      },
      None),

    // Tokenizer fertility per language: BPE subwords emitted per
    // whitespace word under the learned table — THE cross-lingual
    // tokenizer-evaluation metric (a vocabulary trained on one language
    // mix over-fragments the others; fertility >> 1 on a language means
    // its documents cost proportionally more sequence length). Encoding
    // is one map-only pass of the plan-embedded bpe_tokens expression;
    // the agg is |langs|-bounded; fertility published as an exact
    // floor-scaled e4 of the two token-mass BIGINTs. Encoder is
    // engine-learned → scalatest (BpeSpec), not oracle.
    QueryDef("q_tok_fertility",
      (s, d) => {
        val table = BpeTable(learned(s, d))
        T.documents(s, d)
          .select(col("lang"),
            size(BpeExprs.bpeTokens(col("text"), table)).cast("long").as("n_sub"),
            // ws split: declared unit — fertility is DEFINED as
            // subword tokens per whitespace word
            size(split(col("text"), " ")).cast("long").as("n_words"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_sub")).as("sub_tokens"),
            sum(col("n_words")).as("words"),
            expr("(10000 * sum(n_sub)) div sum(n_words)").as("fertility_e4"))
          .orderBy(col("lang"))
      },
      None)
  )
}
