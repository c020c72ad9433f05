package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Corpus

/** Property tests for the corpus-construction pack (queries/Corpus.scala)
  * on planted inputs, plus invariants on the fixture — the DuckDB value
  * compare runs driver-side, these lock in the semantics the oracle
  * can't see (plan shape, reconstruction bounds, coverage).
  */
class CorpusSpec extends AnyFunSuite with SharedSpark {

  import spark.implicits._

  private def docsDF(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  // ---- decontamination -------------------------------------------------

  test("decontam flags a planted copy of a benchmark doc") {
    val docs = docsDF(
      10L -> "alpha beta gamma delta epsilon zeta eta theta",   // benchmark (id%10==0)
      11L -> "alpha beta gamma delta epsilon zeta eta theta",   // exact copy
      12L -> "one two three four five six seven eight nine ten")
    val out = Corpus.decontamOf(docs).collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((11L, 10L)))
    assert(out.head.getDouble(3) == 1.0) // full overlap
  }

  test("decontam ignores overlap below threshold and bench-bench pairs") {
    val docs = docsDF(
      10L -> "alpha beta gamma delta epsilon zeta eta theta",
      20L -> "alpha beta gamma delta epsilon zeta eta theta", // bench copy: not reported
      13L -> "completely different words with no shared trigrams at all")
    assert(Corpus.decontamOf(docs).count() == 0)
  }

  test("decontam plan broadcasts the benchmark side") {
    val plan = formattedPlan(Corpus.decontamOf(Tables.documents(spark, sf)))
    assert(plan.contains("BroadcastHashJoin"),
      "benchmark shingle join must broadcast the (tiny) benchmark side")
  }

  // ---- chunking --------------------------------------------------------

  test("ngram novelty: a reference copy scores 0, unseen text 10000, a half-mix in between") {
    val docs = docsDF(
      10L -> "alpha beta gamma delta epsilon zeta",              // reference
      11L -> "alpha beta gamma delta epsilon zeta",              // pure copy → 0
      12L -> "one two three four five six",                      // all unseen → 10000
      13L -> "alpha beta gamma delta one two three four")        // mixed
    val out = Corpus.ngramNoveltyOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(11L) == ((4L, 0L, 0L)), "copy: 4 shingles, none novel")
    assert(out(12L) == ((4L, 4L, 10000L)), "unseen: all novel")
    // doc 13: 6 shingles; 'alpha beta gamma','beta gamma delta' seen →
    // 4 novel ('gamma delta one', 'delta one two', 'one two three',
    // 'two three four')
    assert(out(13L) == ((6L, 4L, (10000L * 4) / 6)))
    assert(!out.contains(10L), "reference docs are not scored")
  }

  test("chunks tile each doc: stride offsets, full coverage, correct heads") {
    val words = (1 to 83).map(i => s"w$i")
    val docs = docsDF(1L -> words.mkString(" "), 2L -> "solo")
    val chunks = Corpus.chunksOf(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))

    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    // starts are 0, 24, 48, 72 — floor((83-1)/24) = 3 → 4 chunks
    assert(d1.map(_._3).toSeq == Seq(0, 24, 48, 72))
    // full coverage: last chunk reaches the final token
    assert(d1.last._3 + d1.last._4 == 83)
    // interior chunks are full-size
    assert(d1.init.forall(_._4 == Corpus.ChunkTokens))
    // head = token at start position
    assert(d1.forall { case (_, _, start, _, head) => head == s"w${start + 1}" })

    val d2 = chunks.filter(_._1 == 2L)
    assert(d2.toSeq == Seq((2L, 0, 0, 1, "solo")))
  }

  // ---- sequence packing ------------------------------------------------

  test("pack offsets are contiguous and equal the naive single-window cumsum") {
    // span multiple PackBucket buckets so the two-phase path is exercised
    val docs = (0L until 300L).map(i => i -> (s"t$i " * ((i % 17).toInt + 1)).trim).toSeq
    val out = Corpus.packOf(docsDF(docs: _*)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    // contiguity: each doc starts where the previous ended
    out.sliding(2).foreach {
      case Array((_, n1, s1, _, _), (_, _, s2, _, _)) => assert(s2 == s1 + n1)
      case _ => ()
    }
    assert(out.head._3 == 0L)
    // bins match offsets
    out.foreach { case (_, n, s, first, last) =>
      assert(first == s / Corpus.PackBinSize)
      assert(last == (s + n - 1) / Corpus.PackBinSize)
      assert(first <= last)
    }
    // a doc longer than one bin straddles ≥ 2 bins
    val straddlers = out.count { case (_, _, _, f, l) => l > f }
    assert(straddlers > 0, "fixture must exercise bin straddling")
  }

  test("pack has no corpus-wide single-partition window") {
    // traverse the physical plan: every unpartitioned (single-partition)
    // WindowExec must sit ABOVE an aggregate — i.e. it consumes the
    // per-bucket subtotal table (n_docs/PackBucket rows), never the raw
    // document scan. The per-doc running sum must be the partitioned one.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    val plan = Corpus.packOf(Tables.documents(spark, sf)).queryExecution.sparkPlan
    val windows = plan.collect { case w: WindowExec => w }
    assert(windows.nonEmpty, "plan must contain window operators")
    val (global, partitioned) = windows.partition(_.partitionSpec.isEmpty)
    assert(global.size == 1, s"exactly one sequential window (subtotals), got ${global.size}")
    assert(partitioned.nonEmpty, "per-doc running sum must be bucket-partitioned")
    assert(global.head.collect { case a: HashAggregateExec => a }.nonEmpty,
      "the sequential window must consume the bucket-subtotal aggregate, not the corpus")
  }

  // ---- embedding normalization / quantization --------------------------

  test("embedNorm: l2 and head_norm are consistent") {
    val embs = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Corpus.embedNormOf(embs).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3))).sortBy(_._1)
    assert(out(0) == ((1L, 2, 5.0, 0.6)))
    assert(out(1) == ((2L, 4, 1.0, -1.0)))
  }

  test("embedQuant: quantized values bounded by ±127 and reconstruct within half a step") {
    val embs = Tables.embeddings(spark, sf).limit(50)
    val withQ = embs
      .withColumn("maxabs", array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .withColumn("q", transform(col("embedding"),
        x => floor(x.cast("double") * (lit(127.0d) / col("maxabs")) + 0.5d)))
    val rows = withQ.select(col("embedding"), col("q"), col("maxabs")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val q = r.getSeq[Long](1)
      val scale = 127.0 / r.getDouble(2)
      q.foreach(x => assert(x >= -127 && x <= 127, s"quant out of range: $x"))
      v.zip(q).foreach { case (x, qx) =>
        assert(math.abs(x - qx / scale) <= 0.5 / scale + 1e-9,
          s"reconstruction error beyond half step: v=$x q=$qx scale=$scale")
      }
    }
  }

  test("corpus pack queries are map-side before their output sort where claimed") {
    // chunking must not shuffle before the final sort: exactly one
    // Exchange (the rangepartitioning for ORDER BY)
    val plan = formattedPlan(Corpus.chunksOf(Tables.documents(spark, sf)))
    val exchanges = "Exchange".r.findAllIn(plan).size
    // formatted explain prints each node twice (tree + detail)
    assert(exchanges <= 2, s"q_chunk_docs should shuffle only for the output sort, saw:\n$plan")
  }
}
