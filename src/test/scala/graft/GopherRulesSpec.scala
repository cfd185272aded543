package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

/** [[TextAnalysis.gopherRules]] — the public Gopher filter set (Rae et
  * al. 2021 A1.1). Each rule exercised in isolation on a doc that passes
  * every other rule. */
class GopherRulesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 60 words, mean length ~4.6, two stop kinds, no symbols/bullets/ellipses
  private val good = (("the quick brown fox jumps over lazy dogs today and " * 6).trim)

  private def rules(rows: (Long, String)*) =
    TextAnalysis.gopherRules(rows.toSeq.toDF("id", "text"), "id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("well-formed doc passes; each rule fails it in isolation") {
    val got = rules(
      1L -> good,
      2L -> ("word " * 60).trim,                        // one stop kind ("word"? none)
      3L -> (good + " " + ("# " * 20).trim),            // symbol ratio
      4L -> (("ab " * 60).trim + " the of"),            // mean word len < 3
      5L -> (good + "\n- b\n- b\n- b\n- b\n- b\n- b\n- b\n- b\n- b\n- b"), // bullets > 90%? 10/11 = 0.909
      6L -> (good + "\nmore..."),                        // ellipsis 1/2 > 0.3
      7L -> ("the and " + ("12345 " * 60)).trim)         // alpha ratio < 0.8
    assert(got(1L).getAs[Boolean]("keep"), "baseline doc must pass")
    assert(!got(2L).getAs[Boolean]("keep"), "needs >= 2 stop kinds")
    assert(got(2L).getAs[Long]("n_stop_kinds") === 0L)
    assert(!got(3L).getAs[Boolean]("keep"), "symbol ratio rule")
    assert(!got(4L).getAs[Boolean]("keep"), "mean word length rule")
    assert(!got(5L).getAs[Boolean]("keep"), "bullet ratio rule")
    assert(got(5L).getAs[Double]("bullet_ratio") > 0.9)
    assert(!got(6L).getAs[Boolean]("keep"), "ellipsis ratio rule")
    assert(!got(7L).getAs[Boolean]("keep"), "alphabetic word ratio rule")
  }

  test("word-count band") {
    val short = "the of and quick brown fox."                  // 6 words < 50
    val got = rules(1L -> short)
    assert(!got(1L).getAs[Boolean]("keep"))
    assert(got(1L).getAs[Long]("n_words") === 6L)
  }

  test("empty text yields a non-kept row, no nulls in ratios that gate") {
    val got = rules(1L -> "")
    assert(!got(1L).getAs[Boolean]("keep"))
    assert(got(1L).getAs[Long]("n_words") === 0L)
  }

  test("ellipsis counting: 3k dots count as k symbol units") {
    val got = rules(1L -> (good + " wait... what... more..."))
    // 9 ellipsis chars -> 3 units over 63 words, plus zero hashes
    val sym = got(1L).getAs[Double]("symbol_ratio")
    assert(math.abs(sym - 3.0 / 63.0) < 1e-6, s"symbol_ratio $sym")
  }
}
