package graft

import graft.operators.Analytics
import graft.operators.TimeWindows

/** Round-11 drift/robust-stats contracts: PSI against a brute-force
  * recompute, KS self-comparison identity + bounds, winsorized-mean
  * fence invariants, and SAX word shape + brute-force symbol check. */
class DriftStatsSpec extends SparkTestBase {
  import spark.implicits._

  test("psi matches a brute-force smoothed recompute and is ~0 for a time-stable type") {
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as us", "value")
      .as[(String, Long, Double)].collect().toSeq
    val mid = {
      val all = rows.map(_._2)
      Math.floorDiv(all.min + all.max, 2L)
    }
    def bin(v: Double): Int = math.min(math.floor(v / 100.0).toInt, 9)
    val expected = rows.groupBy(_._1).map { case (t, rs) =>
      val (ref, cur) = rs.partition(_._2 <= mid)
      val nr = ref.size.toDouble; val nc = cur.size.toDouble
      val psi = (0 until 10).map { b =>
        val pr = (ref.count(r => bin(r._3) == b) + 0.5) / (nr + 5.0)
        val pc = (cur.count(r => bin(r._3) == b) + 0.5) / (nc + 5.0)
        (pc - pr) * math.log(pc / pr)
      }.sum
      t -> (ref.size.toLong, cur.size.toLong,
        BigDecimal(psi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Analytics.psi(spark, sf)
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (t, (nr, nc, p)) =>
      val (gnr, gnc, gp) = got(t)
      assert((gnr, gnc) == (nr, nc), s"$t split counts")
      assert(math.abs(gp - p) <= 1e-6, s"$t psi $gp vs $p")
    }
    // the synthetic generator draws value i.i.d. over time, so no type
    // should read as drifted at the 0.2 alert line
    got.foreach { case (t, (_, _, p)) =>
      assert(p < 0.2, s"$t unexpectedly drifted: $p") }
  }

  test("psi bins parameter drives the grid width (bins=20 matches a 20-bin brute force)") {
    // ADVICE r11: the width was hardcoded 100.0, so bins=20 silently
    // populated only buckets 0..10 while smoothing with 20 — pin the
    // parameterized grid against a brute force at a non-default width
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "unix_micros(ts) as us", "value")
      .as[(String, Long, Double)].collect().toSeq
    val mid = {
      val all = rows.map(_._2)
      Math.floorDiv(all.min + all.max, 2L)
    }
    val bins = 20
    def bin(v: Double): Int = math.min(math.floor(v / (1000.0 / bins)).toInt, bins - 1)
    val expected = rows.groupBy(_._1).map { case (t, rs) =>
      val (ref, cur) = rs.partition(_._2 <= mid)
      val psi = (0 until bins).map { b =>
        val pr = (ref.count(r => bin(r._3) == b) + 0.5) / (ref.size + 0.5 * bins)
        val pc = (cur.count(r => bin(r._3) == b) + 0.5) / (cur.size + 0.5 * bins)
        (pc - pr) * math.log(pc / pr)
      }.sum
      t -> BigDecimal(psi).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Analytics.psi(spark, sf, bins = bins)
      .as[(String, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (t, p) =>
      assert(math.abs(got(t) - p) <= 1e-6, s"$t psi ${got(t)} vs $p") }
  }

  test("ks statistic is 0 against itself, in (0,1] across types, and matches brute force") {
    val self = Analytics.ksTest(spark, sf, "click", "click")
      .as[(Long, Long, Double, Double)].collect().head
    assert(self._1 == self._2 && self._3 == 0.0 && self._4 == 0.0,
      s"self-KS must be exactly 0: $self")
    val rows = Tables.events(spark, sf)
      .select("event_type", "value").as[(String, Double)].collect().toSeq
    val a = rows.filter(_._1 == "click").map(_._2).sorted
    val b = rows.filter(_._1 == "view").map(_._2).sorted
    val grid = (a ++ b).distinct.sorted
    val brute = grid.map { v =>
      math.abs(a.count(_ <= v).toDouble / a.size -
        b.count(_ <= v).toDouble / b.size)
    }.max
    val got = Analytics.ksTest(spark, sf).as[(Long, Long, Double, Double)]
      .collect().head
    assert(got._1 == a.size && got._2 == b.size)
    assert(math.abs(got._3 - brute) <= 1e-6, s"D ${got._3} vs brute $brute")
    assert(got._3 > 0.0 && got._3 <= 1.0)
  }

  test("winsorized mean sits inside the fences and clip counts match brute force") {
    val rows = Tables.events(spark, sf)
      .select("event_type", "value").as[(String, Double)].collect().toSeq
    val got = Analytics.winsorize(spark, sf)
      .as[(String, Long, Double, Double, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (t, n, lo, hi, nLo, nHi, wmean) =>
      val vs = rows.filter(_._1 == t).map(_._2)
      assert(n == vs.size)
      assert(lo < hi)
      assert(nLo == vs.count(_ < lo), s"$t clip-lo")
      assert(nHi == vs.count(_ > hi), s"$t clip-hi")
      assert(wmean >= lo && wmean <= hi, s"$t wmean outside [$lo,$hi]")
      // winsorizing keeps n: mean of the clamped sample, not a trim
      val clamped = vs.map(v => math.min(math.max(v, lo), hi))
      assert(math.abs(wmean - clamped.sum / clamped.size) <= 1e-6)
    }
  }

  test("sax words are length-8 over {a,b,c,d,_} and symbols match brute force") {
    val got = TimeWindows.sax(spark, sf)
      .as[(String, java.sql.Date, Long, String)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, _, _, w) =>
      assert(w.length == 8 && w.forall("abcd_".contains(_)), w) }
    // brute-force one (type, day): recompute segment z-scores from cents
    val rows = Tables.events(spark, sf)
      .selectExpr("event_type", "cast(ts as date) as day",
        "cast(hour(ts) div 3 as int) as seg",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) as x")
      .as[(String, java.sql.Date, Int, Long)].collect().toSeq
    val (t0, d0, _, _) = rows.head
    val day = rows.filter(r => r._1 == t0 && r._2.toString == d0.toString)
    val n = day.size.toDouble
    val mu = day.map(r => BigDecimal(r._4)).sum.toDouble / n
    val varc = day.map(r => BigDecimal(r._4) * BigDecimal(r._4)).sum.toDouble / n - mu * mu
    val word = (0 to 7).map { s =>
      val seg = day.filter(_._3 == s)
      if (seg.isEmpty) '_'
      else if (varc <= 0) 'b'
      else {
        val m = seg.map(r => BigDecimal(r._4)).sum.toDouble / seg.size
        val z = BigDecimal((m - mu) / math.sqrt(varc))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (z < -0.6745) 'a' else if (z < 0) 'b' else if (z < 0.6745) 'c' else 'd'
      }
    }.mkString
    val gotWord = got.find(r => r._1 == t0 && r._2.toString == d0.toString).get._4
    assert(gotWord == word, s"brute-force SAX word mismatch: $gotWord vs $word")
  }

  test("sax shape-mates agree with a brute-force word-frequency count") {
    val words = TimeWindows.sax(spark, sf)
      .as[(String, java.sql.Date, Long, String)].collect()
    val freq = words.groupBy(_._4).map { case (w, rs) => w -> rs.length }
    val mates = TimeWindows.saxJoin(spark, sf)
      .as[(String, java.sql.Date, String, Long)].collect()
    assert(mates.length == words.length, "one row per (type, day), n preserved")
    mates.foreach { case (t, day, w, m) =>
      assert(m == freq(w) - 1L, s"($t,$day) mates $m != ${freq(w) - 1}")
    }
    // Σ n_mates counts each matching unordered pair exactly twice
    assert(mates.map(_._4).sum % 2 == 0)
  }
}
