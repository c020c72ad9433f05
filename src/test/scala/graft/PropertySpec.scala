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
