package graft.queries

import graft.{QueryDef, Tables => T}
import org.apache.spark.sql.functions._

/** Privacy-preserving corpus statistics — the release gate a training-data
  * pipeline runs before publishing per-source/per-domain counts about a
  * crawled corpus (reference analog: the report publisher at
  * `modules/src/prisma_report/lambda.py:374-383` publishes raw per-group
  * counts; these are the two standard hardened forms of that report).
  *
  * Both queries are pure bounded-key aggregations: the group-by keys are
  * (lang, source[, n_chars bucket]) — ≤ a few hundred distinct groups at
  * any corpus size — so the plan is a map-side partial agg + one shuffle
  * of ≤ |groups| rows per partition, then O(|groups|) scalar math. At
  * 100 TB the scan dominates and nothing here grows with row count.
  *
  * Determinism: the Laplace draw uses the md5-uniform trick shared with
  * q_sample_priority (`conv(substring(md5(seed||key),1,6),16,10)` → 24-bit
  * integer → u = (v+0.5)/2^24, exact in both engines), so the "noise" is a
  * pure function of the group key and the oracle hash-matches. A real
  * release would swap the seed string for a fresh secret per publication;
  * everything else is unchanged.
  */
object Privacy {

  private val eps24 = 16777216.0 // 2^24, the md5-derived uniform's grain

  val defs: Seq[QueryDef] = Seq(

    // ε-differentially-private per-(lang, source) document counts:
    // count + Laplace(Δf/ε) noise with sensitivity 1 and ε = 0.5 ⇒
    // scale b = 2. Inverse-CDF sampling: u ∈ (0,1) uniform,
    // lap = -b·sign(u-½)·ln(1-2·|u-½|). The +0.5/2^24 offset keeps
    // 1-2|u-½| ≥ 2^-24 so the log never hits -∞. Released counts are
    // also floored at 0 (a negative noisy count leaks nothing and
    // confuses downstream consumers).
    QueryDef("q_dp_noise",
      (s, d) => {
        val b = 2.0 // Laplace scale = sensitivity 1 / ε 0.5
        val counts = T.documents(s, d)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("true_n"))
        val v = conv(substring(md5(concat(lit("dp:"), col("lang"),
          lit(":"), col("source"))), 1, 6), 16, 10).cast("double")
        val u = (v + 0.5) / lit(eps24)
        val lap = (signum(u - 0.5) * lit(-b)) * log(lit(1.0) - lit(2.0) * abs(u - 0.5))
        counts
          .withColumn("noisy_n",
            round(greatest(col("true_n") + lap, lit(0.0)), 4))
          .select(col("lang"), col("source"), col("true_n"), col("noisy_n"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""WITH counts AS (
             |  SELECT lang, source, CAST(count(*) AS BIGINT) AS true_n
             |  FROM documents GROUP BY lang, source),
             |noised AS (
             |  SELECT lang, source, true_n,
             |         (CAST('0x' || substring(md5('dp:' || lang || ':' || source), 1, 6) AS BIGINT) + 0.5) / 16777216.0 AS u
             |  FROM counts)
             |SELECT lang, source, true_n,
             |       round(greatest(true_n + sign(u - 0.5) * (-2.0) * ln(1 - 2 * abs(u - 0.5)), 0.0), 4) AS noisy_n
             |FROM noised
             |ORDER BY lang, source""".stripMargin)),

    // k-anonymity audit over the quasi-identifier (lang, source,
    // 100-char length band): any combination shared by fewer than k=3
    // documents re-identifies its members and must be suppressed or
    // generalized before release. Output is the full equivalence-class
    // table with the suppression verdict — the release checklist a
    // privacy review reads. The length band is the generalization step
    // (raw n_chars would make nearly every class unique).
    QueryDef("q_k_anon",
      (s, d) => {
        val k = 3
        T.documents(s, d)
          .groupBy(col("lang"), col("source"),
            (floor(col("n_chars") / 100) * 100).cast("long").as("len_band"))
          .agg(count(lit(1)).as("class_size"))
          .withColumn("suppress", (col("class_size") < k).cast("boolean"))
          .orderBy(col("lang"), col("source"), col("len_band"))
      },
      Some("""SELECT lang, source,
             |       CAST(floor(n_chars / 100) * 100 AS BIGINT) AS len_band,
             |       CAST(count(*) AS BIGINT) AS class_size,
             |       count(*) < 3 AS suppress
             |FROM documents
             |GROUP BY 1, 2, 3
             |ORDER BY lang, source, len_band""".stripMargin)),

    // l-diversity audit — the k-anonymity refinement: a class can be
    // k-large and still leak if every member shares the SAME sensitive
    // value (the homogeneity attack k-anonymity misses). Here the
    // quasi-identifier is (lang, 100-char length band) and the sensitive
    // attribute is `source`: an observer who knows a document's language
    // and rough length must not be able to infer where it was crawled
    // from. l = distinct sensitive values per class; classes with l < 2
    // are flagged. Same bounded-key single-agg shape as q_k_anon — the
    // distinct is a two-phase partial aggregate, nothing grows with
    // corpus rows.
    QueryDef("q_l_diversity",
      (s, d) => {
        T.documents(s, d)
          .groupBy(col("lang"),
            (floor(col("n_chars") / 100) * 100).cast("long").as("len_band"))
          .agg(count(lit(1)).as("class_size"),
            countDistinct(col("source")).as("l_distinct"))
          .withColumn("homogeneous", col("l_distinct") < 2)
          .orderBy(col("lang"), col("len_band"))
      },
      Some("""SELECT lang,
             |       CAST(floor(n_chars / 100) * 100 AS BIGINT) AS len_band,
             |       CAST(count(*) AS BIGINT) AS class_size,
             |       CAST(count(DISTINCT source) AS BIGINT) AS l_distinct,
             |       count(DISTINCT source) < 2 AS homogeneous
             |FROM documents
             |GROUP BY 1, 2
             |ORDER BY lang, len_band""".stripMargin))
  )
}
