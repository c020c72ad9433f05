package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom codegen'd Catalyst expressions for the text-similarity hot
  * path (SURVEY.md §4.2: "a native Catalyst Expression beats a Scala
  * UDF").
  *
  * Why not higher-order functions: `transform`/`aggregate` lambdas are
  * interpreted per element — shingling 5k docs (~260k shingles) costs
  * ~9 s and MinHash/SimHash multiply that by perms/bits. These kernels
  * run as a single generated-code call per row into tight JVM loops
  * (whole-stage codegen keeps the scan→project pipeline fused): the
  * same work runs in well under a second.
  *
  * Hashing uses Catalyst's XXH64 (the engine behind Spark's `xxhash64`)
  * with the permutation index as seed, so `simhash64` is bit-identical
  * to the xxhash64-based formulation it replaced.
  */
object TextKernels {

  /** Distinct space-delimited token n-gram shingles, first-occurrence
    * order (matches array_distinct(transform(...)) semantics).
    */
  def shingles(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]
    var i = 0
    while (i <= toks.length - n) {
      val sb = new java.lang.StringBuilder
      var j = 0
      while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Distinct k-CODEPOINT character shingles over the letter/digit
    * stream (round 11): the string is lowercased as a whole via
    * UTF8String.toLowerCase (round 13 — the SAME definition
    * unicodeWords and Spark's lower() use), punctuation/whitespace
    * codepoints are skipped, and the sliding window runs on CODE POINTS
    * (surrogate-safe). This is the dedup unit for scripts
    * WITHOUT word boundaries — token-3-gram shingles of a space-free
    * CJK document degenerate to one giant "token" (zero shingles), so
    * near-dup detection there silently finds nothing; character k-grams
    * are the standard replacement (and remain valid on Latin text,
    * where they approximate token shingles at k ≈ 8). First-occurrence
    * order, matching [[shingles]] semantics.
    */
  /** `[\p{L}\p{N}]` membership — the canonical tokenizer's regex
    * classes as a direct category check. NOT isLetterOrDigit: isDigit
    * covers only Nd, while `\p{N}` also admits Nl (Ⅻ) and No (², ½);
    * the kernel and the regex/DuckDB mirrors must agree on those.
    */
  def isWordCp(cp: Int): Boolean =
    Character.isLetter(cp) || {
      val t = Character.getType(cp)
      t == Character.DECIMAL_DIGIT_NUMBER || t == Character.LETTER_NUMBER ||
        t == Character.OTHER_NUMBER
    }

  /** The canonical Unicode word tokenizer (queries.TextOps.unicodeWords)
    * as a tight codepoint walk — semantically IDENTICAL to
    * `filter(split(lower(text), "[^\p{L}\p{N}]+"), t -> t <> '')`
    * (lowercase via UTF8String.toLowerCase = Spark's lower(), word
    * classes via [[isWordCp]] = the regex classes), but without the
    * per-row java.util.regex engine the split form pays. Round 12:
    * unifying 8 query families onto the regex tokenizer cost ~3.5 s on
    * the sf0.1 bench; this kernel claws it back while keeping one
    * definition (TextOpsSpec pins kernel ≡ regex on multilingual text).
    */
  def unicodeWords(text: UTF8String): ArrayData = {
    val s = text.toLowerCase.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]
    val sb = new java.lang.StringBuilder
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (isWordCp(cp)) sb.appendCodePoint(cp)
      else if (sb.length > 0) {
        out += UTF8String.fromString(sb.toString); sb.setLength(0)
      }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out += UTF8String.fromString(sb.toString)
    new GenericArrayData(out.toArray)
  }

  def charShingles(text: UTF8String, k: Int): ArrayData = {
    // ONE lowercase definition across the text kernels (round 13): the
    // string-level UTF8String.toLowerCase prepass — the same mapping
    // [[unicodeWords]] and Spark's lower() use, which the DuckDB
    // mirrors approximate. The per-codepoint Character.toLowerCase this
    // replaced diverged on one-to-many mappings (U+0130 İ → "i̇" vs
    // 'i') and conditional mappings (Σ → ς finally, σ medially), giving
    // the engine two subtly different "lowercase"s.
    //
    // LOCALE HAZARD (documented deviation, round 14): for non-ASCII
    // input UTF8String.toLowerCase delegates to String.toLowerCase
    // under the JVM DEFAULT locale — on a Turkish/Azeri-locale JVM 'I'
    // lowers to dotless 'ı', silently diverging from DuckDB's
    // locale-independent lower() and making shingle/token output
    // machine-dependent. We keep UTF8String.toLowerCase anyway because
    // matching Spark's own lower() (which has the identical hazard) is
    // the binding definition — ONE lowercase across kernel, Column-API
    // lower(), and SQL. A cluster that must be byte-stable across
    // locales sets -Duser.language=en (or user.country/user.language
    // via spark.driver/executor.extraJavaOptions) rather than forking
    // the definition. The Σ→ς final-sigma conditional mapping likewise
    // differs from DuckDB's per-codepoint mapping (see the sigma note
    // in the DuckDB mirrors).
    val s = text.toLowerCase.toString
    // letter/digit codepoint stream (already lowercased)
    val cps = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      // isWordCp, not isLetterOrDigit (round 12): the DuckDB mirror of
      // the exact twin uses the \p{L}\p{N} classes, which include the
      // Nl/No numbers isDigit misses — both sides must keep them.
      if (isWordCp(cp))
        cps.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    val stream = cps.toString
    val n = stream.codePointCount(0, stream.length)
    if (n < k) return new GenericArrayData(Array.empty[Any])
    // char-index of each codepoint start, so windows slice in O(1)
    val starts = new Array[Int](n + 1)
    var ci = 0; var cpi = 0
    while (ci < stream.length) {
      starts(cpi) = ci
      ci += Character.charCount(stream.codePointAt(ci))
      cpi += 1
    }
    starts(n) = stream.length
    val seen = new java.util.LinkedHashSet[String]
    var w = 0
    while (w <= n - k) {
      seen.add(stream.substring(starts(w), starts(w + k)))
      w += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** [[graft.functions.KeepCold]]'s kernel: array minus a fixed shared
    * membership ([[HotShingles]] — exact broadcast set or Bloom
    * filter), first-occurrence order preserved. An empty exact set is
    * identity without allocating. The membership handle is a
    * per-query-constant reference object, so the per-row cost is
    * O(|shingles|) lookups against ONE shared structure (the round-13
    * lesson: the array_except + 1-row-broadcast formulation rebuilt
    * the hot hash set per row).
    */
  def keepCold(shingles: ArrayData, hot: HotShingles): ArrayData = {
    if (hot.isEmpty) return shingles
    val n = shingles.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      if (!hot.contains(s)) out += s
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** MinHash signature: per permutation p, min over shingles of
    * XXH64(shingle bytes, seed = p). Empty input → all-Long.MaxValue
    * signature (callers filter empty shingle sets first).
    */
  def minhashSig(shingles: ArrayData, numPerms: Int): ArrayData = {
    val sig = new Array[Long](numPerms)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val m = shingles.numElements()
    var i = 0
    while (i < m) {
      val s = shingles.getUTF8String(i)
      var p = 0
      while (p < numPerms) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, p.toLong)
        if (h < sig(p)) sig(p) = h
        p += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** Exact overlap |A∩B| of two arrays of (df, shingle) structs BOTH
    * sorted ascending under the same (df, shingle) global order — one
    * merge scan, no hash set, no intersection array materialized.
    * This is the PPJoin verification kernel (q_dedup_prefix):
    * `size(array_intersect(a, b))` builds and deduplicates a new array
    * per candidate pair (measured 12.6 s over 409k pairs at sf0.1);
    * the merge scan is O(|A|+|B|) comparisons with zero allocation.
    */
  def sortedOverlap(a: ArrayData, b: ArrayData): Long = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val ra = a.getStruct(i, 2); val rb = b.getStruct(j, 2)
      var cmp = java.lang.Long.compare(ra.getLong(0), rb.getLong(0))
      if (cmp == 0) cmp = ra.getUTF8String(1).compareTo(rb.getUTF8String(1))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  /** 64-bit SimHash over whitespace tokens: per-occurrence ±1 bit votes
    * of XXH64(token, seed 42) — seed 42 = Spark's xxhash64 default, so
    * results match the previous formulation exactly.
    */
  def simhash64(text: UTF8String): Long = {
    val toks = text.toString.split(" ", -1)
    val votes = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val u = UTF8String.fromString(toks(i))
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) r |= 1L << b; b += 1 }
    r
  }
}

case class UnicodeWords(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unicode_words"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.unicodeWords(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.unicodeWords($c)")
  override protected def withNewChildInternal(newChild: Expression): UnicodeWords =
    copy(child = newChild)
}

case class TokenShingles(child: Expression, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "token_shingles"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.shingles($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): TokenShingles =
    copy(child = newChild)
}

case class CharShingles(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.charShingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charShingles($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
}

/** Drop the members of a FIXED hot-shingle membership from a string
  * array — the hot-shingle filter of the df-capped MinHash signing
  * (round 13). The membership is built ONCE on the driver (bounded
  * heavy-hitter collect, or a distributed Bloom build past
  * Similarity.HotSetMaxEntries — round 14) and rides into codegen as a
  * [[HotShingles]] reference object whose payload is BROADCAST, so each
  * row pays O(|shingles|) lookups against one shared structure and the
  * expression's equals/hashCode are O(1) fingerprint compares (never a
  * set traversal during plan canonicalization — the round-13 ADVICE
  * finding). The array_except + 1-row-broadcast formulation this
  * replaced rebuilt a hash set of the hot array PER ROW — O(|hot|)/row,
  * which ScaleSlope measured as a slope-169 blow-up at the 100×
  * saturated tier where |hot| ≈ the whole shingle space.
  */
case class KeepCold(child: Expression, hot: HotShingles)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "keep_cold"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.keepCold(input.asInstanceOf[ArrayData], hot)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("hotSet", hot, "graft.functions.HotShingles")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.keepCold($c, $setRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): KeepCold =
    copy(child = newChild)
}

case class MinHashSig(child: Expression, numPerms: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashSig(input.asInstanceOf[ArrayData], numPerms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.minhashSig($c, $numPerms)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Merge-scan overlap count of two same-order-sorted struct arrays
  * (see TextKernels.sortedOverlap). Both children must be
  * array<struct<df: long, shingle: string>> sorted ascending by
  * (df, shingle) — the producer (prefixJaccardPairsOf) guarantees it.
  */
case class SortedOverlap(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_overlap"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextKernels.sortedOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextKernels.sortedOverlap($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedOverlap =
    copy(left = newLeft, right = newRight)
}

/** Custom table-generating function (UDTF surface): one output row per
  * whitespace token with its 0-based position — the Catalyst `Generator`
  * counterpart of `posexplode(split(text, ' '))`, usable from SQL as
  * `LATERAL VIEW pos_tokens(text) t AS pos, token`. Tokenization runs as
  * one JVM loop per row (no intermediate array column materialized);
  * GenerateExec streams the produced rows, so memory stays O(1 doc).
  */
case class PosTokens(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {
  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("token", StringType, nullable = true)))
  override def prettyName: String = "pos_tokens"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pos_tokens expects a string column, got ${child.dataType.catalogString}")
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val toks = v.asInstanceOf[UTF8String].toString.split(" ", -1)
      Iterator.tabulate(toks.length)(i => InternalRow(i, UTF8String.fromString(toks(i))))
    }
  }
  override protected def withNewChildInternal(newChild: Expression): PosTokens =
    copy(child = newChild)
}

/** SQL registration so `spark.sql` users get the custom expressions too:
  * `SELECT simhash64(text), token_shingles(text) FROM docs`.
  */
object GraftFunctions {
  private def arity1(name: String)(
      build: Expression => Expression): Seq[Expression] => Expression = {
    case Seq(e) => build(e)
    case exprs => throw new IllegalArgumentException(
      s"$name expects exactly 1 argument, got ${exprs.length}")
  }
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val r = spark.sessionState.functionRegistry
    r.createOrReplaceTempFunction("unicode_words",
      arity1("unicode_words")(UnicodeWords(_)), "built-in")
    r.createOrReplaceTempFunction("token_shingles",
      arity1("token_shingles")(TokenShingles(_, 3)), "built-in")
    r.createOrReplaceTempFunction("char_shingles",
      arity1("char_shingles")(CharShingles(_, 8)), "built-in")
    r.createOrReplaceTempFunction("minhash_sig",
      arity1("minhash_sig")(MinHashSig(_, 32)), "built-in")
    r.createOrReplaceTempFunction("simhash64",
      arity1("simhash64")(SimHash64(_)), "built-in")
    r.createOrReplaceTempFunction("pos_tokens",
      arity1("pos_tokens")(PosTokens(_)), "built-in")
  }
}

/** Column-API surface for the custom expressions. */
object TextExprs {
  def unicodeWords(c: Column): Column =
    ColumnBridge.column(UnicodeWords(ColumnBridge.expression(c)))
  def tokenShingles(c: Column, n: Int = 3): Column =
    ColumnBridge.column(TokenShingles(ColumnBridge.expression(c), n))
  def charShingles(c: Column, k: Int = 8): Column =
    ColumnBridge.column(CharShingles(ColumnBridge.expression(c), k))
  def minhashSig(c: Column, numPerms: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c), numPerms))
  def keepCold(c: Column, hot: HotShingles): Column =
    ColumnBridge.column(KeepCold(ColumnBridge.expression(c), hot))
  def simhash64(c: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(c)))
  def sortedOverlap(a: Column, b: Column): Column =
    ColumnBridge.column(SortedOverlap(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
