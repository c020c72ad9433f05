package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the round-9 analytics additions: prefix-filtered
  * set-similarity join, grid-binned spatial join, snapshot diff, CDC
  * apply, association rules, and the A/B z-test. Each oracle-checked
  * query ALSO gets an engine-side algorithmic check here (the parity /
  * definitional recompute the DuckDB hash can't express — e.g. that
  * the prefix filter is lossless on a crafted boundary pair).
  */
class AnalyticsSpec extends AnyFunSuite with SharedSpark {
  import spark.implicits._

  test("q_dedup_prefix reproduces q_dedup_ngram exactly on the fixture") {
    val ngram = SparkEntry.queries("q_dedup_ngram")(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    val prefix = SparkEntry.queries("q_dedup_prefix")(spark, sf)
      .as[(Long, Long, Double)].collect().toSet
    assert(ngram.nonEmpty, "fixture must contain near-dup pairs")
    assert(prefix == ngram,
      s"prefix filter lost/invented pairs: only-ngram=${ngram -- prefix} only-prefix=${prefix -- ngram}")
  }

  test("prefix filter keeps a pair at Jaccard exactly 0.50 (threshold boundary)") {
    // 8 shared consecutive tokens → 6 pure-shared 3-gram shingles; 3
    // unique tokens on one side each → 9 shingles per doc, J = 6/12 = 0.5.
    val shared = (1 to 8).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $shared", "en", "t", 1L),
      (2L, s"$shared b1 b2 b3", "en", "t", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = graft.queries.TextOps.prefixJaccardPairsOf(docs)
      .as[(Long, Long, Double)].collect().toList
    assert(got == List((1L, 2L, 0.5)), s"got $got")
  }

  test("prefix filter drops a pair just under threshold") {
    // 7 shared tokens → 5 shared shingles; 9 per doc → J = 5/13 ≈ 0.385.
    val shared = (1 to 7).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 a4 $shared", "en", "t", 1L),
      (2L, s"$shared b1 b2 b3 b4", "en", "t", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.queries.TextOps.prefixJaccardPairsOf(docs).count() == 0)
  }

  test("q_geo_radius equals the brute-force disk scan") {
    val pts = graft.queries.Geo.pointsOf(Tables.events(spark, sf))
      .select("event_id", "value", "x", "y")
      .as[(Long, Double, Long, Long)].collect()
    val centers = pts.sortBy(p => (-p._2, p._1)).take(20)
    val r2 = graft.queries.Geo.Radius * graft.queries.Geo.Radius
    val want = centers.map { c =>
      val in = pts.filter(p =>
        (p._3 - c._3) * (p._3 - c._3) + (p._4 - c._4) * (p._4 - c._4) <= r2)
      (c._1, c._3, c._4, in.length.toLong, in.map(_._2).max)
    }.sortBy(_._1).toList
    val got = SparkEntry.queries("q_geo_radius")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(got == want)
  }

  test("q_geo_knn equals brute force and every center satisfies the 3x3 exactness bound") {
    val pts = graft.queries.Geo.pointsOf(Tables.events(spark, sf))
      .select("event_id", "value", "x", "y")
      .as[(Long, Double, Long, Long)].collect()
    val centers = pts.sortBy(p => (-p._2, p._1)).take(20)
    val want = centers.flatMap { c =>
      pts.map(p => (p._1, (p._3 - c._3) * (p._3 - c._3) + (p._4 - c._4) * (p._4 - c._4)))
        .sortBy(p => (p._2, p._1)).take(graft.queries.Geo.KnnK).zipWithIndex
        .map { case ((eid, d2), i) => (c._1, i + 1, eid, d2) }
    }.sortBy(r => (r._1, r._2)).toList
    val got = SparkEntry.queries("q_geo_knn")(spark, sf)
      .as[(Long, Int, Long, Long)].collect().toList
    assert(got == want, "grid kNN differs from brute force")
    // the bound that makes the 3×3 answer provably exact
    val cs = graft.queries.Geo.KnnCellSize
    got.groupBy(_._1).foreach { case (cid, rows) =>
      assert(rows.map(_._4).max <= cs * cs,
        s"center $cid kth distance exceeds the CellSize bound")
    }
  }

  test("q_geo_pairs equals the brute-force all-pairs scan (exactly-once bin join)") {
    val pts = graft.queries.Geo.pointsOf(Tables.events(spark, sf))
      .select("event_id", "event_type", "x", "y")
      .as[(Long, String, Long, Long)].collect()
    val dd = graft.queries.Geo.PairDist * graft.queries.Geo.PairDist
    val pairs = for {
      a <- pts; b <- pts
      if a._1 < b._1 &&
        (a._3 - b._3) * (a._3 - b._3) + (a._4 - b._4) * (a._4 - b._4) <= dd
    } yield {
      val (tlo, thi) = if (a._2 <= b._2) (a._2, b._2) else (b._2, a._2)
      ((tlo, thi), (a._3 - b._3) * (a._3 - b._3) + (a._4 - b._4) * (a._4 - b._4))
    }
    val want = pairs.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong,
        math.rint(xs.map(_._2).sum.toDouble / xs.length * 10000) / 10000)
    }.toMap
    val got = SparkEntry.queries("q_geo_pairs")(spark, sf)
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(want.nonEmpty && got == want,
      s"binned pair join differs: got=$got want=$want")
  }

  test("q_join_overlap equals the naive unbinned overlap join") {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val e = Tables.events(spark, sf)
    val sess = e
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("brk", when(col("prev_us").isNull ||
        unix_micros(col("ts")) - col("prev_us") >= 1800L * 1000000L, 1).otherwise(0))
      .withColumn("sid", sum(col("brk")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(unix_micros(col("ts"))).as("s_start"),
        max(unix_micros(col("ts"))).as("s_end"))
    val win = graft.queries.Relational.incidentWindows(e)
      .select(col("win_id"), unix_micros(col("w_start")).as("w_s"),
        unix_micros(col("w_end")).as("w_e"))
    val want = sess.join(win, // BNLJ — fine at test scale, it's the definition
        col("s_start") <= col("w_e") && col("w_s") <= col("s_end"))
      .groupBy(col("win_id"))
      .agg(count(lit(1)).as("n"), sum(least(col("s_end"), col("w_e")) -
        greatest(col("s_start"), col("w_s"))).as("ov"))
      .orderBy(col("win_id"))
      .as[(Long, Long, Long)].collect().toList
    val got = SparkEntry.queries("q_join_overlap")(spark, sf)
      .as[(Long, Long, Long)].collect().toList
    assert(want.nonEmpty && got == want,
      "binned overlap join differs from the naive definition")
  }

  test("q_cdc_apply equals the window-form last-writer-wins") {
    val e = Tables.events(spark, sf)
    e.createOrReplaceTempView("cdc_events")
    val want = spark.sql(
      """SELECT user_id, event_type AS last_op, value AS cur_value, n_ops
        |FROM (SELECT user_id, event_type, value,
        |             row_number() OVER (PARTITION BY user_id
        |                                ORDER BY ts DESC, event_id DESC) AS rn,
        |             count(*) OVER (PARTITION BY user_id) AS n_ops
        |      FROM cdc_events)
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin)
      .as[(Long, String, Double, Long)].collect().toList
    val got = SparkEntry.queries("q_cdc_apply")(spark, sf)
      .as[(Long, String, Double, Long)].collect().toList
    assert(want.nonEmpty && got == want)
  }

  test("q_snapshot_diff categories partition the key universe with the modular counts") {
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .as[Long].collect().toSet
    val inOld = keys.filter(_ % 101 != 0)
    val inNew = keys.filter(_ % 97 != 0)
    val got = SparkEntry.queries("q_snapshot_diff")(spark, sf)
      .select("category", "n").as[(String, Long)].collect().toMap
    assert(got("added") == (inNew -- inOld).size)
    assert(got("removed") == (inOld -- inNew).size)
    // every shared key is changed or unchanged; total partitions the universe
    assert(got.values.sum == (inOld ++ inNew).size)
    // open-status orders in both versions are exactly the changed set
    val open = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O").select("o_orderkey")
      .as[Long].collect().toSet
    assert(got("changed") == (inOld & inNew & open).size)
  }

  test("q_assoc_rules confidence and lift match a definitional recompute") {
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .distinct().as[(Long, Long)].collect()
      .groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }.toSeq
    val n = baskets.size.toDouble
    val itemN = baskets.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val rules = SparkEntry.queries("q_assoc_rules")(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(rules.nonEmpty)
    rules.foreach { case (a, c, nBoth, conf, lift) =>
      val wantBoth = baskets.count(b => b.contains(a) && b.contains(c))
      assert(nBoth == wantBoth, s"support($a,$c)")
      assert(conf == math.rint(nBoth.toDouble / itemN(a) * 10000) / 10000 ||
        math.abs(conf - nBoth.toDouble / itemN(a)) < 5e-5, s"conf($a,$c)")
      assert(math.abs(lift - nBoth * n / (itemN(a).toLong * itemN(c))) < 5e-5,
        s"lift($a,$c)")
    }
  }

  test("q_attribution reproduces a driver-side linear-credit recompute") {
    val e = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .as[(Long, Long, String, Long)].collect()
    val win = 24L * 3600 * 1000000
    val touches = e.filter(x => x._3 == "view" || x._3 == "click")
    val credits = e.filter(_._3 == "purchase").flatMap { p =>
      val ts = touches.filter(t => t._2 == p._2 && t._4 <= p._4 && t._4 >= p._4 - win)
      ts.map(t => (t._3, p._1, 1.0 / ts.length))
    }
    val want = credits.groupBy(_._1).view.mapValues { xs =>
      (xs.length.toLong, xs.map(_._2).distinct.length.toLong,
        math.rint(xs.map(_._3).sum * 10000) / 10000)
    }.toMap
    val got = SparkEntry.queries("q_attribution")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(want.nonEmpty && got.keySet == want.keySet)
    got.foreach { case (t, (n, np, c)) =>
      val (wn, wnp, wc) = want(t)
      assert(n == wn && np == wnp, s"$t counts")
      assert(math.abs(c - wc) < 2e-4, s"$t credit: got $c want $wc")
    }
  }

  test("Gram sketch fails fast on a dimension mismatch (no silent truncation)") {
    import graft.ml.Gram
    val short = Seq.fill(16)(1.0f)
    val long = Seq.fill(128)(1.0f)
    intercept[IllegalArgumentException](Gram.reduce(Gram.zero, short))
    intercept[IllegalArgumentException](Gram.reduce(Gram.zero, long))
  }

  test("q_embed_pca: convergence certificate, share bound, sketch equals driver Gram") {
    import graft.ml.{Gram, Pca}
    val vecs = Tables.embeddings(spark, sf)
      .select(col("embedding").cast("array<float>"))
      .as[Seq[Float]].collect()
    // driver-side Gram (sequential — a DIFFERENT accumulation order
    // than the distributed sketch; eigen results must still agree)
    val buf = vecs.foldLeft(Gram.zero)((b, v) => Gram.reduce(b, v))
    val (lD, vD, shareD, nD) = Pca.topComponent(Gram.finish(buf))
    assert(nD == vecs.length)
    assert(Pca.residual(Gram.finish(buf), lD, vD) < 1e-5, "power iteration must converge")
    assert(shareD > 0.0 && shareD <= 1.0)
    val got = SparkEntry.queries("q_embed_pca")(spark, sf)
      .as[(Long, Double, Double, Double, Double, Double, Double)].collect().head
    assert(got._1 == vecs.length)
    assert(math.abs(got._2 - lD) < 1e-3, s"eigval ${got._2} vs $lD")
    assert(math.abs(got._3 - shareD) < 1e-3, s"share ${got._3} vs $shareD")
    for ((g, w) <- Seq(got._4 -> vD(0), got._5 -> vD(1), got._6 -> vD(2), got._7 -> vD(3)))
      assert(math.abs(g - w) < 1e-3, s"component $g vs $w")
  }

  test("q_ab_test reproduces a driver-side recompute of the z statistic") {
    val e = Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t")) // micros, not ms: no truncation
      .as[(Long, String, Long)].collect()
    val firstView = e.filter(_._2 == "view").groupBy(_._1)
      .view.mapValues(_.map(_._3).min).toMap
    val window = 24L * 3600 * 1000000 // 24h attribution, micros
    val converted = e.filter(_._2 == "purchase")
      .filter(x => firstView.get(x._1).exists(t => t <= x._3 && x._3 <= t + window))
      .map(_._1).toSet
    def stats(v: Long) = {
      val users = firstView.keySet.filter(_ % 2 == v)
      (users.size.toLong, users.count(converted).toLong)
    }
    val (n0, c0) = stats(0); val (n1, c1) = stats(1)
    val p0 = c0.toDouble / n0; val p1 = c1.toDouble / n1
    val pp = (c0 + c1).toDouble / (n0 + n1)
    val z = (p1 - p0) / math.sqrt(pp * (1.0 - pp) * (1.0 / n0 + 1.0 / n1))
    val got = SparkEntry.queries("q_ab_test")(spark, sf)
      .as[(Long, Long, Double, Long, Long, Double, Double)].collect().head
    assert(got._1 == n0 && got._2 == c0 && got._4 == n1 && got._5 == c1)
    assert(math.abs(got._7 - z) < 5e-5, s"z: got ${got._7} want $z")
  }

  /** Exact interpolated percentile, the Spark/DuckDB `percentile`/
    * `quantile_cont` definition: rank (n−1)·p, linear between floor and
    * ceil neighbors of the sorted sample.
    */
  private def pctl(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    val r = (s.length - 1) * p
    val lo = r.toInt; val hi = math.ceil(r).toInt
    s(lo) + (r - lo) * (s(hi) - s(lo))
  }

  test("q_anomaly_mad equals a driver-side median/MAD recompute") {
    def r(x: Double, s: Int) =
      BigDecimal(x).setScale(s, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rows = Tables.events(spark, sf)
      .select(col("event_type"), col("event_id"), round(col("value"), 2))
      .as[(String, Long, Double)].collect()
    val want = rows.groupBy(_._1).toSeq.flatMap { case (t, es) =>
      val med = r(pctl(es.map(_._3).toSeq, 0.5), 3)
      val devs = es.map { case (_, id, v) => (id, v, r(v - med, 3)) }
      val mad = r(pctl(devs.map(d => math.abs(d._3)).toSeq, 0.5), 4)
      devs.flatMap { case (id, v, dev) =>
        // the query's integer-exact threshold: 6745·|dev_mils| > 3500·mad_tm
        if (6745L * math.abs(math.round(dev * 1000)) >
            3500L * math.round(mad * 10000))
          Some((id, t, v, dev, mad))
        else None
      }
    }.toSet
    val got = SparkEntry.queries("q_anomaly_mad")(spark, sf)
      .as[(Long, String, Double, Double, Double)].collect().toSet
    assert(want.nonEmpty, "fixture must contain MAD outliers")
    assert(got == want,
      s"only-want=${(want -- got).take(3)} only-got=${(got -- want).take(3)}")
  }

  test("q_cuped: theta matches a driver recompute and variance reduction = corr^2 >= 0") {
    val row = SparkEntry.queries("q_cuped")(spark, sf).collect().head
    val (n0, n1) = (row.getLong(0), row.getLong(3))
    val (theta, varRed) = (row.getDouble(6), row.getDouble(7))
    // rebuild the per-user (x, y) frame exactly as the query defines it
    val e = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .as[(Long, java.sql.Date, Double)].collect()
    val days = e.map(_._2.toLocalDate)
    val cut = days.min.plusDays(
      java.time.temporal.ChronoUnit.DAYS.between(days.min, days.max) / 2)
    val per = e.groupBy(_._1).toSeq.map { case (_, es) =>
      val x = es.count(_._2.toLocalDate.isBefore(cut)).toDouble
      val y = BigDecimal(es.filter(!_._2.toLocalDate.isBefore(cut)).map(_._3).sum)
        .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
      (x, y)
    }.toSeq
    assert(n0 + n1 == per.size)
    val n = per.size
    val mx = per.map(_._1).sum / n; val my = per.map(_._2).sum / n
    val cov = per.map(p => (p._1 - mx) * (p._2 - my)).sum / (n - 1)
    val vx = per.map(p => (p._1 - mx) * (p._1 - mx)).sum / (n - 1)
    val vy = per.map(p => (p._2 - my) * (p._2 - my)).sum / (n - 1)
    assert(math.abs(theta - cov / vx) < 5e-4, s"theta $theta vs ${cov / vx}")
    // var(Y − θX) = var(Y) − cov²/var(X) when θ = cov/var(X) on the same
    // sample, so the reported reduction is exactly corr² — and ≥ 0
    val corr2 = cov * cov / (vx * vy)
    assert(varRed >= 0.0, "CUPED can never increase variance")
    assert(math.abs(varRed - corr2) < 5e-4, s"var_red $varRed vs corr² $corr2")
  }

  test("q_event_paths: counts cover every user triple, shares sum to 1") {
    val got = SparkEntry.queries("q_event_paths")(spark, sf)
      .as[(String, String, String, Long, Double)].collect()
    val perUser = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect()
    val wantTriples = perUser.map(p => math.max(0L, p._2 - 2)).sum
    assert(got.map(_._4).sum == wantTriples)
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-2)
    assert(got.map(t => (t._1, t._2, t._3)).distinct.length == got.length)
  }

  test("q_rfm: segments partition the user base, codes are valid 3-digit scores") {
    val got = SparkEntry.queries("q_rfm")(spark, sf)
      .as[(Int, Long, Double)].collect()
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(got.map(_._2).sum == nUsers, "every user lands in exactly one segment")
    got.foreach { case (code, _, _) =>
      val (r, f, m) = (code / 100, code / 10 % 10, code % 10)
      assert(r >= 1 && r <= 4 && f >= 1 && f <= 4 && m >= 1 && m <= 4, s"code $code")
    }
    // quartile scoring must actually spread users: more than one segment
    assert(got.length > 1)
  }

  test("q_ks_test: d_num equals the driver-side exact KS cross-numerator") {
    val Array((n0, n1, dNum, dE4, _)) = SparkEntry.queries("q_ks_test")(spark, sf)
      .as[(Long, Long, Long, Long, Boolean)].collect()
    val pts = Tables.events(spark, sf)
      .selectExpr("user_id % 2 AS g", "round(value, 2) AS v")
      .as[(Long, Double)].collect()
    val (g0, g1) = (pts.filter(_._1 == 0).map(_._2), pts.filter(_._1 == 1).map(_._2))
    assert(n0 == g0.length && n1 == g1.length)
    // exact integer KS numerator: max over observed v of |cum0·n1 − cum1·n0|
    val vs = pts.map(_._2).distinct.sorted
    val want = vs.map { v =>
      math.abs(g0.count(_ <= v).toLong * n1 - g1.count(_ <= v).toLong * n0)
    }.max
    assert(dNum == want, s"d_num $dNum vs driver $want")
    assert(dE4 == 10000L * dNum / (n0 * n1))
  }

  test("q_trend_ols: slope num/den equal the least-squares normal equations") {
    val got = SparkEntry.queries("q_trend_ols")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    // driver recompute straight from raw events
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "to_date(ts) AS d", "CAST(floor(value * 100 + 0.5) AS LONG) AS c")
      .as[(String, java.sql.Date, Long)].collect()
    val d0 = rows.map(_._2.toLocalDate).min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    got.foreach { case (et, nDays, sumCents, num, den, slopeE6) =>
      val series = rows.filter(_._1 == et)
        .groupBy(r => java.time.temporal.ChronoUnit.DAYS.between(d0, r._2.toLocalDate))
        .map { case (t, rs) => (t, rs.map(_._3).sum) }.toSeq
      val n = series.size.toLong
      val st = series.map(_._1).sum; val sy = series.map(_._2).sum
      val sty = series.map(p => p._1 * p._2).sum
      val stt = series.map(p => p._1 * p._1).sum
      assert(nDays == n && sumCents == sy)
      assert(num == n * sty - st * sy, s"$et num")
      assert(den == n * stt - st * st, s"$et den")
      assert(slopeE6 == num.signum * (1000000L * math.abs(num) / den), s"$et slope")
    }
    assert(got.nonEmpty)
  }

  test("q_survival_km: risk sets are reverse-cumulative and the KM fold is monotone") {
    val got = SparkEntry.queries("q_survival_km")(spark, sf)
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    val nUsers = Tables.events(spark, sf).select(col("user_id")).distinct().count()
    assert(got.map(r => r._3 + r._4).sum == nUsers, "every user counted once")
    // n_risk(t) = users with lifetime >= t
    got.foreach { case (t, nRisk, _, _, hazE4) =>
      val want = got.filter(_._1 >= t).map(r => r._3 + r._4).sum
      assert(nRisk == want, s"t=$t risk")
    }
    got.foreach { case (_, nRisk, d, _, hazE4) =>
      assert(hazE4 == 10000L * d / nRisk)
    }
    // the survival curve downstream of the table is monotone non-increasing
    val km = got.scanLeft(1.0) { case (s, (_, nRisk, d, _, _)) =>
      s * (nRisk - d).toDouble / nRisk
    }.tail
    assert(km.zip(km.tail).forall { case (a, b) => b <= a + 1e-12 })
    assert(km.last >= 0.0 && km.head <= 1.0)
  }

  test("q_changepoint: the flagged day is the exact integer-CUSUM argmax") {
    val got = SparkEntry.queries("q_changepoint")(spark, sf)
      .as[(String, Int, Long, Long, Long)].collect()
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "to_date(ts) AS d")
      .as[(String, java.sql.Date)].collect()
    val d0 = rows.map(_._2.toLocalDate).min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    got.foreach { case (et, cpT, cusNum, nDays, nEvents) =>
      val daily = rows.filter(_._1 == et)
        .groupBy(r => java.time.temporal.ChronoUnit.DAYS.between(d0, r._2.toLocalDate))
        .map { case (t, rs) => (t, rs.size.toLong) }.toSeq.sortBy(_._1)
      val n = daily.size.toLong; val tot = daily.map(_._2).sum
      assert(nDays == n && nEvents == tot)
      val cums = daily.zipWithIndex.map { case ((t, _), i) =>
        val pre = daily.take(i + 1).map(_._2).sum
        (t, n * pre - (i + 1) * tot)
      }
      val best = cums.maxBy(c => (math.abs(c._2), -c._1))
      assert(cpT.toLong == best._1 && cusNum == best._2, s"$et cp")
    }
    assert(got.nonEmpty)
  }

  test("q_ewma: smoother equals the dyadic kernel recompute; first row is identity") {
    val got = SparkEntry.queries("q_ewma")(spark, sf)
      .as[(String, Int, Long, Long)].collect()
    got.groupBy(_._1).foreach { case (et, rowsUnsorted) =>
      val rows = rowsUnsorted.sortBy(_._2)
      rows.zipWithIndex.foreach { case ((_, t, cents, smooth), i) =>
        val lags = (0 to 9).flatMap { j =>
          if (i - j >= 0) Some((1L << (10 - j)) * rows(i - j)._3) else None
        }
        val wsum = (0 to 9).flatMap { j =>
          if (i - j >= 0) Some(1L << (10 - j)) else None
        }.sum
        assert(smooth == lags.sum / wsum, s"$et t=$t")
      }
      // renormalized kernel: the series head smooths to itself
      assert(rows.head._4 == rows.head._3, s"$et head identity")
    }
    assert(got.nonEmpty)
  }

  test("q_link_pred equals the driver-side common-neighbor recompute") {
    val got = SparkEntry.queries("q_link_pred")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    val edges = graft.queries.Graph.coPurchaseEdges(Tables.lineitem(spark, sf))
      .filter(col("w") >= 2)
      .filter(col("src") < col("dst")).select("src", "dst")
      .as[(Long, Long)].collect().toSet
    val adj = scala.collection.mutable.Map[Long, Set[Long]]().withDefaultValue(Set())
    edges.foreach { case (a, b) => adj(a) += b; adj(b) += a }
    val nodes = adj.keys.toSeq.sorted
    val want = (for {
      i <- nodes.indices.iterator; j <- (i + 1 until nodes.size).iterator
      a = nodes(i); b = nodes(j)
      if !edges.contains((a, b))
      cn = (adj(a) & adj(b)).size.toLong
      if cn > 0
    } yield {
      val (da, db) = (adj(a).size.toLong, adj(b).size.toLong)
      (a, b, cn, da, db, 10000L * cn / (da + db - cn))
    }).toList
      .sortBy(t => (-t._3, -t._6, t._1, t._2)).take(100)
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
  }

  test("q_pmi lift matches the definitional document co-occurrence recompute") {
    val got = SparkEntry.queries("q_pmi")(spark, sf)
      .as[(String, String, Long, Long, Long, Long)].collect().toList
    assert(got.nonEmpty, "fixture must produce collocations")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .as[(Long, Seq[String])].collect()
    val nDocs = docs.length.toLong
    val df = docs.flatMap(_._2.distinct).groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val vocab = df.toSeq.sortBy(t => (-t._2, t._1)).take(100).toMap
    // full definitional recompute: every vocab pair's doc co-occurrence,
    // support-floored, ranked by the same total order
    val coCounts = scala.collection.mutable.Map[(String, String), Long]().withDefaultValue(0L)
    docs.foreach { d =>
      val vs = d._2.distinct.filter(vocab.contains).sorted
      for (i <- vs.indices; j <- i + 1 until vs.size)
        coCounts((vs(i), vs(j))) += 1L
    }
    val want = coCounts.toSeq.filter(_._2 >= 5).map { case ((a, b), dfAb) =>
      (a, b, dfAb, vocab(a), vocab(b), 10000L * dfAb * nDocs / (vocab(a) * vocab(b)))
    }.sortBy(t => (-t._6, t._1, t._2)).take(50).toList
    assert(got == want, s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
  }

  test("q_active_users: bitmap DAU/WAU/MAU equal the naive windowed distinct counts") {
    val got = SparkEntry.queries("q_active_users")(spark, sf)
      .as[(Int, Long, Long, Long)].collect().sortBy(_._1)
    val ud = Tables.events(spark, sf)
      .selectExpr("user_id", "to_date(ts) AS d").distinct()
      .as[(Long, java.sql.Date)].collect()
    val d0 = ud.map(_._2.toLocalDate).min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val days = ud.map(p => (p._1, java.time.temporal.ChronoUnit.DAYS.between(d0, p._2.toLocalDate)))
    val maxd = days.map(_._2).max
    assert(got.map(_._1.toLong) sameElements (0L to maxd), "one row per day, gaps included")
    got.foreach { case (t, dau, wau7, mau) =>
      assert(dau == days.filter(_._2 == t).map(_._1).distinct.length.toLong, s"dau t=$t")
      assert(wau7 == days.filter(p => p._2 >= t - 6 && p._2 <= t).map(_._1).distinct.length.toLong, s"wau t=$t")
      assert(mau == days.filter(_._2 <= t).map(_._1).distinct.length.toLong, s"mau t=$t")
    }
  }

  test("q_forecast_snaive: integer MAE scores match the day-offset recompute") {
    val got = SparkEntry.queries("q_forecast_snaive")(spark, sf)
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
    assert(got.nonEmpty)
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "to_date(ts) AS d").as[(String, java.sql.Date)].collect()
    val d0 = rows.map(_._2.toLocalDate).min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    got.foreach { case (et, nScored, sae7, mae7E2, sae1, wins) =>
      val daily = rows.filter(_._1 == et)
        .groupBy(r => java.time.temporal.ChronoUnit.DAYS.between(d0, r._2.toLocalDate))
        .map { case (t, rs) => t -> rs.size.toLong }
      val scored = daily.keys.filter(t => daily.contains(t - 7) && daily.contains(t - 1)).toSeq
      assert(nScored == scored.size.toLong, s"$et n")
      val w7 = scored.map(t => math.abs(daily(t) - daily(t - 7))).sum
      val w1 = scored.map(t => math.abs(daily(t) - daily(t - 1))).sum
      assert(sae7 == w7 && sae1 == w1, s"$et sae")
      assert(mae7E2 == 100L * w7 / nScored && wins == (w7 < w1), s"$et mae/skill")
    }
  }

  test("q_benford: shares are exact floor-scaled integers over the cents digits") {
    val got = SparkEntry.queries("q_benford")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    val cents = Tables.events(spark, sf).filter(col("value") > 0)
      .selectExpr("CAST(floor(value * 100 + 0.5) AS LONG) AS c").filter(col("c") >= 1)
      .as[Long].collect()
    val byDigit = cents.groupBy(_.toString.head.toString).map { case (dg, xs) => dg -> xs.length.toLong }
    val total = cents.length.toLong
    assert(got.map(_._2).sum == total, "every positive value classified once")
    got.foreach { case (dg, n, shareE4, benE4, devE4) =>
      assert(byDigit(dg) == n, s"digit $dg")
      assert(shareE4 == 10000L * n / total && devE4 == shareE4 - benE4, s"digit $dg scale")
    }
    // Benford table is the 4-dp floor of log10(1 + 1/d)
    got.foreach { case (dg, _, _, benE4, _) =>
      val d = dg.toInt
      assert(benE4 == math.floor(math.log10(1.0 + 1.0 / d) * 10000).toLong, s"digit $dg constant")
    }
  }

  test("q_gini: distributed rank Gini equals the driver-side sorted recompute") {
    val Array((nUsers, totalCents, giniE6)) = SparkEntry.queries("q_gini")(spark, sf)
      .as[(Long, Long, Long)].collect()
    val spend = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("y"))
      .as[(Long, Long)].collect()
    val ys = spend.sortBy(p => (p._2, p._1)).map(_._2)
    val n = ys.length.toLong
    val sy = ys.sum
    val siy = ys.zipWithIndex.map { case (y, i) => (i + 1L) * y }.sum
    assert(nUsers == n && totalCents == sy)
    assert(giniE6 == 1000000L * (2 * siy - (n + 1) * sy) / (n * sy), "gini")
    assert(giniE6 >= 0 && giniE6 < 1000000L)
  }

  test("q_gini is invariant to input partitioning (rank assignment is data-determined)") {
    val a = SparkEntry.queries("q_gini")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q_gini")(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("q_fuzzy_join equals the brute-force within-block edit-distance scan") {
    val got = SparkEntry.queries("q_fuzzy_join")(spark, sf)
      .as[(Int, Long, Long, String, String, Int)].collect().toList
    assert(got.nonEmpty, "fixture customer ids must yield lev-1 name pairs")
    val cs = Tables.customer(spark, sf)
      .select(col("c_nationkey"), col("c_custkey"), col("c_name"))
      .as[(Int, Long, String)].collect()
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val want = (for {
      (nk, grp) <- cs.groupBy(_._1).toSeq
      i <- grp.indices; j <- grp.indices
      if grp(i)._2 < grp(j)._2
      d = lev(grp(i)._3, grp(j)._3) if d <= 1
    } yield (nk, grp(i)._2, grp(j)._2, grp(i)._3, grp(j)._3, d))
      .sortBy(t => (t._2, t._3)).toList
    assert(got == want, s"sizes ${got.size} vs ${want.size}")
  }

  test("q_seq_detect match counts equal the driver-side regex recompute") {
    val got = SparkEntry.queries("q_seq_detect")(spark, sf)
      .as[(Int, Long)].collect().toMap
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "ts", "event_id", "substr(event_type, 1, 1) AS c")
      .as[(Long, java.sql.Timestamp, Long, String)].collect()
    val want = evs.groupBy(_._1).map { case (_, es) =>
      val s = es.sortBy(e => (e._2.getTime, e._3)).map(_._4).mkString
      "v+p".r.findAllIn(s).size
    }.groupBy(identity).map { case (m, xs) => m -> xs.size.toLong }
    assert(got == want, s"got $got want $want")
  }

  test("q_did cell means and the DiD stat match a driver recompute") {
    val Array((cPre, cPost, tPre, tPost, didE4)) = SparkEntry.queries("q_did")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val evs = Tables.events(spark, sf)
      .selectExpr("user_id", "to_date(ts) AS d", "CAST(floor(value * 100 + 0.5) AS LONG) AS c")
      .as[(Long, java.sql.Date, Long)].collect()
    val ds = evs.map(_._2.toLocalDate)
    val d0 = ds.min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val d1 = ds.max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val cut = d0.plusDays(java.time.temporal.ChronoUnit.DAYS.between(d0, d1) / 2)
    def cell(variant: Long, post: Boolean): Long = {
      val in = evs.filter(e => e._1 % 2 == variant &&
        (!e._2.toLocalDate.isBefore(cut)) == post)
      10000L * in.map(_._3).sum / in.map(_._1).distinct.length
    }
    assert(cPre == cell(0, post = false) && cPost == cell(0, post = true))
    assert(tPre == cell(1, post = false) && tPost == cell(1, post = true))
    assert(didE4 == (tPost - tPre) - (cPost - cPre))
  }

  test("q_theilsen doubled median slope matches the pairwise recompute") {
    val got = SparkEntry.queries("q_theilsen")(spark, sf)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "to_date(ts) AS d", "CAST(floor(value * 100 + 0.5) AS LONG) AS c")
      .as[(String, java.sql.Date, Long)].collect()
    val d0 = rows.map(_._2.toLocalDate).min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    got.foreach { case (et, nPairs, slope2E6) =>
      val daily = rows.filter(_._1 == et)
        .groupBy(r => java.time.temporal.ChronoUnit.DAYS.between(d0, r._2.toLocalDate))
        .map { case (t, rs) => t -> rs.map(_._3).sum }.toSeq.sortBy(_._1)
      val slopes = (for {
        i <- daily.indices; j <- i + 1 until daily.size
        dy = daily(j)._2 - daily(i)._2; dx = daily(j)._1 - daily(i)._1
      } yield dy.signum * (1000000L * math.abs(dy) / dx)).sorted
      assert(nPairs == slopes.size.toLong, s"$et pairs")
      val n = slopes.size
      val want2 = if (n % 2 == 1) 2 * slopes(n / 2)
                  else slopes(n / 2 - 1) + slopes(n / 2)
      assert(slope2E6 == want2, s"$et slope2")
    }
  }

  test("q_winsorize: clamped mean is between bounds and equals the driver fold") {
    val got = SparkEntry.queries("q_winsorize")(spark, sf)
      .as[(String, Long, Double, Double, Long, Long)].collect()
    assert(got.nonEmpty)
    val vs = Tables.events(spark, sf)
      .selectExpr("event_type", "round(value, 2) AS v").as[(String, Double)].collect()
    got.foreach { case (et, n, lo, hi, winE4, rawE4) =>
      val xs = vs.filter(_._1 == et).map(_._2)
      assert(n == xs.length.toLong)
      val sw = xs.map(v => math.floor(math.max(lo, math.min(hi, v)) * 10000 + 0.5).toLong).sum
      assert(winE4 == sw / n, s"$et win")
      val sc = xs.map(v => math.floor(v * 100 + 0.5).toLong).sum
      assert(rawE4 == 100L * sc / n, s"$et raw")
      assert(winE4 >= math.floor(lo * 10000).toLong && winE4 <= math.ceil(hi * 10000).toLong)
    }
  }

  test("q_calibration partitions the corpus; q_pr_curve cells recompute from the scored frame") {
    val cal = SparkEntry.queries("q_calibration")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val nDocs = Tables.documents(spark, sf).count()
    assert(cal.map(_._2).sum == nDocs, "every doc lands in exactly one bin")
    cal.foreach { case (_, n, pos, rateE4) =>
      assert(rateE4 == 10000L * pos / n)
    }
    val scored = graft.queries.Curation.dsirHashedScores(spark, sf)
      .selectExpr("CAST(floor(score * 1000) AS LONG) AS m",
        "CASE WHEN lang = 'en' THEN 1L ELSE 0L END AS y")
      .as[(Long, Long)].collect()
    val pr = SparkEntry.queries("q_pr_curve")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    pr.foreach { case (tau, tp, fp, fn, pE4, rE4) =>
      assert(tp == scored.count(s => s._1 >= tau && s._2 == 1).toLong, s"tau $tau tp")
      assert(fp == scored.count(s => s._1 >= tau && s._2 == 0).toLong, s"tau $tau fp")
      assert(fn == scored.count(s => s._1 < tau && s._2 == 1).toLong, s"tau $tau fn")
      assert(pE4 == (if (tp + fp == 0) -1L else 10000L * tp / (tp + fp)))
      assert(rE4 == (if (tp + fn == 0) -1L else 10000L * tp / (tp + fn)))
    }
    // recall is monotone non-increasing in the threshold
    val recalls = pr.map(_._6).filter(_ >= 0)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b <= a })
  }

  test("q_autocorr equals the cleared-denominator ACF recompute; acf(0) would be 1") {
    val got = SparkEntry.queries("q_autocorr")(spark, sf)
      .as[(String, Int, Long, Long)].collect()
    assert(got.nonEmpty)
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "to_date(ts) AS d").as[(String, java.sql.Date)].collect()
    val d0 = rows.map(_._2.toLocalDate).min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    got.foreach { case (et, lag, nPairs, acfE4) =>
      val daily = rows.filter(_._1 == et)
        .groupBy(r => java.time.temporal.ChronoUnit.DAYS.between(d0, r._2.toLocalDate))
        .map { case (t, rs) => t -> rs.size.toLong }
      val n = daily.size.toLong; val ss = daily.values.sum
      val dev = daily.map { case (t, x) => t -> (n * x - ss) }
      val den = dev.values.map(d => d * d).sum
      val pairs = dev.keys.filter(t => dev.contains(t - lag)).toSeq
      assert(nPairs == pairs.size.toLong, s"$et@$lag n")
      val num = pairs.map(t => dev(t) * dev(t - lag)).sum
      assert(acfE4 == num.signum * (10000L * math.abs(num) / den), s"$et@$lag acf")
      assert(math.abs(acfE4) <= 10000L)
    }
  }
}
