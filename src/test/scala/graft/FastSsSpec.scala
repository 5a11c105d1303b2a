package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.apache.spark.sql.functions._

/** The distance-1 deletion-neighborhood theorem the FastSS fuzzy-join
  * execution rests on (Bocek et al. 2007): for strings u, v,
  * levenshtein(u, v) <= 1  IFF  ({u} ∪ del1(u)) ∩ ({v} ∪ del1(v)) ≠ ∅.
  * Property-tested over random pairs (both planted single edits and
  * independent strings), plus a one-pass equality check that the
  * Catalyst HOF neighborhood matches the plain-Scala reference. */
class FastSsSpec extends SparkTestBase {
  import spark.implicits._

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  private def nbhd(s: String): Set[String] =
    Set(s) ++ s.indices.map(i => s.take(i) + s.drop(i + 1))

  // small alphabet maximizes coincidental matches — the regime where a
  // wrong theorem would actually be caught
  private val word = for {
    n <- Gen.choose(1, 10)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  private val edited = for {
    w <- word
    pos <- Gen.choose(0, math.max(w.length - 1, 0))
    c <- Gen.oneOf('a', 'b', 'c')
    op <- Gen.oneOf(0, 1, 2) // sub, del, ins
  } yield op match {
    case 0 => (w, w.take(pos) + c + w.drop(pos + 1))
    case 1 => (w, w.take(pos) + w.drop(pos + 1))
    case _ => (w, w.take(pos) + c + w.drop(pos))
  }

  test("lev(u,v) <= 1 iff deletion neighborhoods intersect (planted edits)") {
    check(Prop.forAll(edited) { case (u, v) =>
      if (u.nonEmpty && v.nonEmpty)
        (lev(u, v) <= 1) == nbhd(u).intersect(nbhd(v)).nonEmpty
      else true
    })
  }

  test("lev(u,v) <= 1 iff deletion neighborhoods intersect (independent pairs)") {
    check(Prop.forAll(word, word) { (u, v) =>
      (lev(u, v) <= 1) == nbhd(u).intersect(nbhd(v)).nonEmpty
    })
  }

  test("the Catalyst HOF neighborhood equals the plain-Scala reference") {
    val words = (for {
      n <- 1 to 8
      seed <- 0 until 40
    } yield {
      val rnd = new scala.util.Random(n * 1000 + seed)
      (1 to n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    }).distinct
    val df = words.toDF("w")
    // private expression — rebuilt here verbatim from Dedup's definition
    val delNbhd = array_union(array(col("w")),
      transform(sequence(lit(1), length(col("w"))),
        i => concat(col("w").substr(lit(1), i - lit(1)),
          col("w").substr(i + lit(1), length(col("w"))))))
    val got = df.select(col("w"), delNbhd.as("v"))
      .as[(String, Seq[String])].collect().toMap
    for (w <- words)
      assert(got(w).toSet == nbhd(w), s"mismatch for '$w': ${got(w)} vs ${nbhd(w)}")
  }
}
