package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.ml.Bpe

/** Corpus-side BPE encoding as a codegen'd Catalyst expression.
  *
  * The learned merge table ships inside the expression (≤ a few hundred
  * entries — plan-serialized to every executor like a broadcast lambda
  * capture would be, but with a real generated-code call site instead
  * of a UDF's boxed Invoke). Whole-stage codegen keeps the
  * scan→encode→agg pipeline fused; the per-row work is one tight JVM
  * loop in [[BpeKernels.encodeText]].
  */
final class BpeTable(val ranks: java.util.HashMap[String, Integer])
    extends Serializable

object BpeTable {
  /** Key the pair as "left\u0000right" — symbols never contain NUL. */
  def apply(merges: Seq[Bpe.Merge]): BpeTable = {
    val m = new java.util.HashMap[String, Integer]
    merges.foreach(mg => m.put(mg.left + "\u0000" + mg.right, Int.box(mg.rank)))
    new BpeTable(m)
  }
}

object BpeKernels {

  /** THE tokenization of the BPE family — Locale.ROOT lowercase then
    * `\p{L}`-run split. One shared kernel (round 12) so the trainer's
    * histogram and the encode path can never diverge: Spark's lower()
    * falls back to JVM-default-locale String.toLowerCase for non-ASCII,
    * so a Turkish-default-locale JVM would train a vocabulary with 'ı'
    * while encodeText (pinned to ROOT) produced 'i'. Both sides now
    * call this.
    */
  def splitWords(text: UTF8String): Array[String] =
    text.toString.toLowerCase(java.util.Locale.ROOT).split("[^\\p{L}]+")

  /** [[splitWords]] as an array<string> value (empty boundary fragments
    * dropped) — the trainer-side histogram tokenizer.
    */
  def histogramWords(text: UTF8String): ArrayData = {
    val words = splitWords(text)
    val out = new scala.collection.mutable.ArrayBuffer[Any](words.length)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) out += UTF8String.fromString(words(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Tokenize `text` like the trainer's histogram pass ([[splitWords]]
    * — Unicode-correct, round 11: CJK and accented words encode instead
    * of vanishing) and BPE-encode each word with `table`. Returns the
    * concatenated subword stream as array<string>. Base symbols are
    * CODE POINTS (Bpe.charSymbols), so supplementary-plane characters
    * never tear into surrogates.
    */
  def encodeText(text: UTF8String, table: BpeTable): ArrayData = {
    val words = splitWords(text)
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    var wi = 0
    while (wi < words.length) {
      val w = words(wi)
      if (w.nonEmpty) {
        var syms: Array[String] = Bpe.charSymbols(w) :+ Bpe.EndOfWord
        var continue = syms.length > 1
        while (continue) {
          var bestRank = Int.MaxValue
          var i = 0
          while (i < syms.length - 1) {
            val r = table.ranks.get(syms(i) + "\u0000" + syms(i + 1))
            if (r != null && r.intValue < bestRank) bestRank = r.intValue
            i += 1
          }
          if (bestRank == Int.MaxValue) continue = false
          else {
            val buf = new scala.collection.mutable.ArrayBuffer[String](syms.length)
            i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && {
                    val r = table.ranks.get(syms(i) + "\u0000" + syms(i + 1))
                    r != null && r.intValue == bestRank
                  }) {
                buf += syms(i) + syms(i + 1); i += 2
              } else { buf += syms(i); i += 1 }
            }
            syms = buf.toArray
            continue = syms.length > 1
          }
        }
        var k = 0
        while (k < syms.length) { out += UTF8String.fromString(syms(k)); k += 1 }
      }
      wi += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `bpe_tokens(text)` — the learned-vocabulary subword stream of a
  * document. The merge table is a plan-embedded reference object
  * (`ctx.addReferenceObj`), so generated code calls the kernel
  * directly; no UDF boxing, no closure serialization per batch.
  */
case class BpeTokens(child: Expression, table: BpeTable)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"
  override protected def nullSafeEval(input: Any): Any =
    BpeKernels.encodeText(input.asInstanceOf[UTF8String], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, "graft.functions.BpeTable")
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernels.encodeText($c, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** `bpe_histogram_words(text)` — the trainer-side tokenizer as an
  * expression, codegen'd like [[BpeTokens]]. Exists so
  * [[graft.ml.Bpe.wordHistogram]] tokenizes through the SAME kernel as
  * the encode path (not Spark's default-locale lower()).
  */
case class HistogramWords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_histogram_words"
  override protected def nullSafeEval(input: Any): Any =
    BpeKernels.histogramWords(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernels.histogramWords($c)")
  override protected def withNewChildInternal(newChild: Expression): HistogramWords =
    copy(child = newChild)
}

object BpeExprs {
  def bpeTokens(text: Column, table: BpeTable): Column =
    ColumnBridge.column(BpeTokens(ColumnBridge.expression(text), table))
  def histogramWords(text: Column): Column =
    ColumnBridge.column(HistogramWords(ColumnBridge.expression(text)))
}
