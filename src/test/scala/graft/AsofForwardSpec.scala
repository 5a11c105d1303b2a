package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

/** Forward as-of join (mirrored window composition) and the trailing
  * RANGE-frame distinct count — brute-force equality at spec scale. */
class AsofForwardSpec extends SparkTestBase {

  test("forward as-of attaches the earliest dim row at-or-after each event") {
    val got = TemporalJoins.asofForward(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Double]("next_max")).map(_.toDouble))
      .toMap
    // brute force from the same dim definition
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        col("value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val dayUs = 86400L * 1000000L
    val dim = ev.groupBy(t => (t._2, t._3 / dayUs * dayUs))
      .map { case ((u, day), rows) => (u, day, rows.map(_._4).max) }
      .toSeq
    val byUser = dim.groupBy(_._1)
    ev.foreach { case (eid, uid, us, _) =>
      val want = byUser.getOrElse(uid, Seq())
        .filter(_._2 >= us).sortBy(_._2).headOption.map(_._3)
      assert(got(eid) == want, s"event $eid")
    }
    // unmatched tail rows exist and carry nulls (last-day events)
    assert(got.values.exists(_.isEmpty), "expected unmatched tail rows")
  }

  test("trailing-hour distinct type count matches a brute-force frame scan") {
    val got = TemporalJoins.rangeDistinctTypes(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        (r.getAs[Int]("n_types_1h"), r.getAs[Long]("n_events_1h"))).toMap
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val byUser = ev.groupBy(_._2)
    ev.foreach { case (eid, uid, us, _) =>
      val frame = byUser(uid).filter(e => e._3 >= us - 3600000000L && e._3 <= us)
      val want = (frame.map(_._4).distinct.length, frame.length.toLong)
      assert(got(eid) == want, s"event $eid: ${got(eid)} vs $want")
    }
  }

  test("rollup levels are consistent: per-type rows sum to the grand total") {
    val rows = graft.operators.Relational.rollupDaily(spark, sf).collect()
      .map(r => (Option(r.getAs[String]("event_type")),
        Option(r.getAs[java.sql.Date]("day")), r.getAs[Long]("gid"),
        r.getAs[Long]("n")))
    val leaf = rows.filter(_._3 == 0)
    val typeSub = rows.filter(_._3 == 1)
    val grand = rows.filter(_._3 == 3)
    assert(grand.length == 1)
    // no (day)-only level in a rollup (gid == 2 never appears)
    assert(!rows.exists(_._3 == 2))
    assert(leaf.map(_._4).sum == grand.head._4)
    assert(typeSub.map(_._4).sum == grand.head._4)
    // each type subtotal equals the sum of its leaves
    typeSub.foreach { case (t, _, _, n) =>
      assert(leaf.filter(_._1 == t).map(_._4).sum == n, s"type $t")
    }
  }
}
