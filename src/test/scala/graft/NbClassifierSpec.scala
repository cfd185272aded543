package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TextAnalysis.nbQualityFit]]/[[nbQualityScore]] — the fastText-style
  * trusted-corpus Naive-Bayes quality filter. */
class NbClassifierSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val labeled = Seq(
    (1L, "clean lucid prose with careful clean argument", true),
    (2L, "another lucid careful essay in clean prose", true),
    (3L, "click here buy now cheap cheap deal click", false),
    (4L, "buy cheap now limited deal click buy", false)
  ).toDF("doc_id", "text", "trusted")
  private lazy val model =
    TextAnalysis.nbQualityFit(labeled, "doc_id", "text", "trusted")

  test("fit: trusted-class terms get positive llr, spam terms negative") {
    val llr = model.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(llr("clean") > 0, s"'clean' should lean trusted: ${llr("clean")}")
    assert(llr("prose") > 0)
    assert(llr("click") < 0, s"'click' should lean spam: ${llr("click")}")
    assert(llr("cheap") < 0)
    // add-one smoothing keeps every llr finite even for one-class terms
    llr.values.foreach(v => assert(!v.isInfinite && !v.isNaN))
  }

  test("score separates held-out trusted-like from spam-like documents") {
    val heldOut = Seq(
      (10L, "a careful lucid argument in clean prose"),
      (11L, "click now buy the cheap deal")).toDF("doc_id", "text")
    val got = TextAnalysis.nbQualityScore(heldOut, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(10L) > 0 && got(11L) < 0,
      s"classifier must separate: trusted=${got(10L)} spam=${got(11L)}")
    assert(got(10L) > got(11L))
  }

  test("OOV tokens are neutral but count in the mean; empty docs score NULL") {
    val docs = Seq(
      (20L, "clean prose"),                      // fully in-vocab
      (21L, "clean prose zzz qqq xxx yyy"),      // same signal, diluted by OOV
      (22L, "zzz qqq"),                          // all OOV -> exactly 0
      (23L, "")                                  // token-less -> NULL
    ).toDF("doc_id", "text")
    val got = TextAnalysis.nbQualityScore(docs, model, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2))))).toMap
    assert(got(20L)._2.get > got(21L)._2.get,
      "OOV dilution must lower the mean, not be ignored")
    assert(got(21L)._2.get > 0)
    assert(got(22L) === ((2L, Some(0.0))))
    assert(got(23L) === ((0L, None)))
  }

  test("deterministic: refit and rescore bit-identical") {
    val m2 = TextAnalysis.nbQualityFit(labeled, "doc_id", "text", "trusted")
    assert(model.collect().toSet === m2.collect().toSet)
    val s1 = TextAnalysis.nbQualityScore(labeled, model, "doc_id", "text")
      .collect().toSet
    val s2 = TextAnalysis.nbQualityScore(labeled, m2, "doc_id", "text")
      .collect().toSet
    assert(s1 === s2)
  }
}
