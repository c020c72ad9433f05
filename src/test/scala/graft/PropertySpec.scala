package graft

import graft.queries.{Similarity, TimeWindows}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven property tests (SURVEY.md §5.2.3): random inputs,
  * algebraic invariants. Uses raw scalacheck Gens with deterministic
  * seeds (the scalatest bridge artifact isn't vendored); sized small —
  * each case spins Spark jobs.
  */
class PropertySpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  /** Deterministically sample `gen` n times and run `body` on each. */
  private def forAllSampled[T](gen: Gen[T], n: Int = 5)(body: T => Unit): Unit =
    (1 to n).foreach { i =>
      val v = gen(Gen.Parameters.default.withSize(40), Seed(i.toLong))
        .getOrElse(fail(s"generator exhausted at seed $i"))
      body(v)
    }

  private val rowsGen: Gen[List[(Int, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 5), Gen.choose(0.0, 100.0)))

  test("property: per-key fan-out + union == single groupBy for random splits (R11/R12)") {
    forAllSampled(rowsGen) { rows =>
      val df = rows.toDF("k", "v")
      val single = df.groupBy("k").agg(count(lit(1)).as("n"), round(sum("v"), 6).as("s"))
      val frames = rows.map(_._1).distinct.sorted.map(k =>
        df.filter(col("k") === k)
          .groupBy("k").agg(count(lit(1)).as("n"), round(sum("v"), 6).as("s")))
      val fanout = frames.reduce(_.unionByName(_))
      assert(single.exceptAll(fanout).isEmpty && fanout.exceptAll(single).isEmpty)
    }
  }

  test("property: unicodeWords kernel ≡ its declared regex definition on random unicode text") {
    // The kernel (TextKernels.unicodeWords, round 12) is DECLARED
    // semantically identical to
    // filter(split(lower(text), "[^\p{L}\p{N}]+"), t -> t <> '') with
    // lower = UTF8String.toLowerCase. Pure-JVM check (no Spark job per
    // case): the reference below IS that definition, so hundreds of
    // random multilingual strings run in milliseconds.
    import org.apache.spark.unsafe.types.UTF8String
    val cpGen: Gen[Int] = Gen.frequency(
      6 -> Gen.choose(0x20, 0x7e),          // ASCII incl. punctuation
      2 -> Gen.choose(0x4e00, 0x9fff),      // Han
      1 -> Gen.choose(0xc0, 0x17f),         // Latin-1/Extended-A (ß, ı, İ…)
      1 -> Gen.oneOf(0x2160, 0x216b, 0xb2, 0xbd, 0x0660, 0x1d7d8, // Nl/No/Nd + SMP digit
        0x1f600, 0x10400),                  // emoji + Deseret (surrogate pairs)
      // case-mapping edges (round 13): İ lowers one-to-many to i +
      // combining dot (U+0307, Mn — a SEPARATOR for the word classes),
      // ß is already-lowercase with an UPPER-case expansion, Σ/ς is the
      // conditional final-sigma mapping
      1 -> Gen.oneOf(0x130, 0xdf, 0x3a3, 0x3c2, 0x3c3, 0x131),
      1 -> Gen.oneOf(' '.toInt, '\t'.toInt, '\n'.toInt, 0x3002, 0xff0c)) // separators
    val textGen2: Gen[String] = Gen.listOf(cpGen)
      .map(_.flatMap(Character.toChars(_).toSeq).mkString)
    forAllSampled(textGen2, n = 300) { s =>
      val kernel = graft.functions.TextKernels
        .unicodeWords(UTF8String.fromString(s))
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val reference = UTF8String.fromString(s).toLowerCase.toString
        .split("[^\\p{L}\\p{N}]+").toSeq.filter(_.nonEmpty)
      assert(kernel == reference, s"text=${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("property: charShingles kernel ≡ its declarative definition, sharing ONE lowercase with unicodeWords (round 13)") {
    // Declarative reference: UTF8String.toLowerCase the WHOLE string
    // (the same mapping unicodeWords and Spark's lower() use — round 13
    // removed the per-codepoint Character.toLowerCase divergence), keep
    // the \p{L}\p{N} codepoints as a stream, emit all length-k codepoint
    // windows deduplicated in first-occurrence order; n<k → empty.
    // Generator reuses the multilingual + case-edge + surrogate-pair
    // alphabet above, so windows straddle surrogate pairs and the İ/ß/Σ
    // expansions flow through the shared lowercase prepass.
    import org.apache.spark.unsafe.types.UTF8String
    val cpGen: Gen[Int] = Gen.frequency(
      5 -> Gen.choose(0x20, 0x7e),
      3 -> Gen.choose(0x4e00, 0x4e10),      // narrow Han band → repeats → dedup paths
      1 -> Gen.choose(0xc0, 0x17f),
      1 -> Gen.oneOf(0x130, 0xdf, 0x3a3, 0x3c2, 0x10400, 0x1d7d8),
      1 -> Gen.oneOf(' '.toInt, 0x3002, 0xff0c))
    val textGen: Gen[String] = Gen.listOf(cpGen)
      .map(_.flatMap(Character.toChars(_).toSeq).mkString)
    for (k <- Seq(2, 8)) forAllSampled(textGen, n = 300) { s =>
      val kernel = graft.functions.TextKernels
        .charShingles(UTF8String.fromString(s), k)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      val cps = UTF8String.fromString(s).toLowerCase.toString
        .codePoints().toArray
        .filter(graft.functions.TextKernels.isWordCp)
        .map(cp => new String(Character.toChars(cp))).toSeq
      val reference =
        if (cps.length < k) Seq.empty[String]
        else cps.sliding(k).map(_.mkString).toSeq.distinct
      assert(kernel == reference,
        s"k=$k text=${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("property: keepCold kernel ≡ array filterNot over its hot set (round 14)") {
    // Pure-JVM check of the reference-object kernel against its
    // declarative definition: keepCold(arr, hot) must equal
    // arr.filterNot(hot), first-occurrence order preserved, over random
    // multilingual arrays — including the empty-set identity (no copy)
    // and all-hot rows (everything dropped). ≥1k generated cases.
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    val cpGen: Gen[Int] = Gen.frequency(
      5 -> Gen.choose('a'.toInt, 'f'.toInt),  // narrow band → real hits
      2 -> Gen.choose(0x4e00, 0x4e08),        // Han
      1 -> Gen.oneOf(0x130, 0xdf, 0x3a3, 0x3c2, 0x10400, 0x1d7d8)) // case edges + surrogates
    val tokGen: Gen[String] = Gen.choose(1, 4)
      .flatMap(l => Gen.listOfN(l, cpGen))
      .map(_.flatMap(Character.toChars(_).toSeq).mkString)
    val caseGen: Gen[(List[String], List[String], Int)] = for {
      arr <- Gen.listOf(tokGen)
      fromArr <- Gen.someOf(arr) // members → hits
      fresh <- Gen.listOf(tokGen) // likely misses
      mode <- Gen.oneOf(0, 0, 1, 2) // 1 = empty set, 2 = all-hot
    } yield (arr.map(_.toString), (fromArr ++ fresh).toList, mode)
    forAllSampled(caseGen, n = 1200) { case (arr, drawn, mode) =>
      val hot = mode match {
        case 1 => Nil
        case 2 => arr
        case _ => drawn
      }
      val holder = graft.functions.HotShingles.exact(spark,
        hot.map(UTF8String.fromString))
      val input: ArrayData = new GenericArrayData(
        arr.map(UTF8String.fromString).toArray[Any])
      val got = graft.functions.TextKernels.keepCold(input, holder)
      val want = arr.filterNot(hot.toSet)
      assert(got.toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq == want, s"arr=$arr hot=$hot")
      // empty-set identity returns the INPUT, not a copy
      if (hot.isEmpty) assert(got eq input)
    }
  }

  test("property: the rlike \\p{L}\\p{N} precondition ⇔ unicodeWords emits ≥1 token (q_dedup_para guard)") {
    // The round-14 tokenless-doc guard filters on the cheap rlike
    // precondition BELOW the kernel projection; soundness needs
    // exactly: text contains a \p{L}\p{N} codepoint ⇔ the tokenizer
    // emits ≥1 token (lowercasing maps word codepoints to word
    // codepoints). java.util.regex IS rlike's engine, so this is the
    // identical predicate, pure-JVM.
    import org.apache.spark.unsafe.types.UTF8String
    val cpGen: Gen[Int] = Gen.frequency(
      4 -> Gen.choose(0x20, 0x7e),
      2 -> Gen.oneOf(' '.toInt, '.'.toInt, '!'.toInt, 0x3002, 0xff0c, 0x2028),
      2 -> Gen.choose(0x4e00, 0x9fff),
      1 -> Gen.oneOf(0x130, 0xdf, 0x3a3, 0x3c2, 0x2160, 0xb2, 0x1d7d8,
        0x1f600, 0x10400))
    val textGen: Gen[String] = Gen.listOf(cpGen)
      .map(_.flatMap(Character.toChars(_).toSeq).mkString)
    val p = java.util.regex.Pattern.compile("[\\p{L}\\p{N}]")
    forAllSampled(textGen, n = 500) { s =>
      val hasTok = graft.functions.TextKernels
        .unicodeWords(UTF8String.fromString(s)).numElements() > 0
      assert(p.matcher(s).find() == hasTok,
        s"text=${s.map(c => f"\\u${c.toInt}%04x").mkString}")
    }
  }

  test("property: exact dedup is idempotent and keeps one row per distinct text") {
    val docGen = Gen.nonEmptyListOf(Gen.oneOf(
      "alpha beta gamma", "alpha beta gamma", "delta epsilon zeta", "eta theta iota"))
    forAllSampled(docGen) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val once = docs.groupBy(lower(trim(col("text"))).as("t"))
        .agg(min("doc_id").as("keep"))
      val twice = once.groupBy("t").agg(min("keep").as("keep"))
      assert(once.count() == texts.map(_.toLowerCase.trim).distinct.size)
      assert(once.exceptAll(twice.select(col("t"), col("keep"))).isEmpty)
    }
  }

  test("property: identical random docs always collide on minhash signature and simhash") {
    val wordGen = Gen.oneOf("spark", "scan", "join", "sort", "hash", "merge", "shuffle")
    val textGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    forAllSampled(textGen) { text =>
      val docs = Seq((0L, text), (1L, text)).toDF("doc_id", "text")
      val sigs = Similarity.minhashSignaturesOf(docs)
        .collect().map(r => r.getSeq[Long](1))
      assert(sigs.length == 2 && sigs(0) == sigs(1))
      val sh = Similarity.simhashOf(docs).collect().map(_.getLong(1))
      assert(sh(0) == sh(1))
    }
  }

  test("property: tumbling-window counts total == row count for random event times") {
    val tsGen = Gen.nonEmptyListOf(Gen.choose(0L, 72L * 3600)).map(_.map(s =>
      new java.sql.Timestamp(1704067200000L + s * 1000)))
    forAllSampled(tsGen) { tss =>
      val events = tss.zipWithIndex
        .map { case (t, i) => (i.toLong, t, i.toLong % 3, "click", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val windowed = TimeWindows.tumbleAgg(events)
      assert(windowed.agg(sum("n")).head().getLong(0) == tss.size)
    }
  }
}
