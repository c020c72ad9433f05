package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic reference checks for the non-oracle text queries. */
class TextOpsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

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
      val toks = text.split(" ", -1)
      val votes = lexicon.map { case (lang, words) =>
        lang -> toks.count(words.contains).toLong
      }
      val best = votes.map(_._2).max
      val expect =
        if (best == 0) ("und", 0L)
        else (votes.find(_._2 == best).get._1, best) // alphabetical tiebreak
      assert(got(id) == expect, s"doc $id: got ${got(id)} want $expect")
    }
  }
}
