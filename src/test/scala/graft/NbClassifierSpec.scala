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

  test("classifierResample: keeps are monotone in score, tilted not cliffed, deterministic") {
    import graft.operators.Curation
    // the same id (same Pareto draw) with a higher score can only gain
    // the keep — monotonicity of the GPT-3 rule per document
    val ids = (0L until 2000L)
    def keptAt(score: Double) = Curation
      .classifierResample(ids.map(i => (i, score)).toDF("id", "p"), "id", "p")
      .filter(col("kept") === 1).select("id").as[Long].collect().toSet
    val lo = keptAt(0.05); val mid = keptAt(0.5); val hi = keptAt(0.95)
    assert(lo.subsetOf(mid) && mid.subsetOf(hi), "keeps must nest by score")
    // quality TILT without a cliff: keep rate tracks the Lomax tail
    // P(pareto(9) > 1-s) = (2-s)^-9 — ~64% at s=0.95, ~2.6% at 0.5,
    // ~0.25% at 0.05: low scorers survive, high scorers dominate
    assert(lo.nonEmpty, "low scores must not be wiped out (no hard cliff)")
    assert(lo.size < mid.size && mid.size < hi.size)
    assert(math.abs(hi.size - 2000 * math.pow(1.05, -9)) < 100,
      s"score 0.95 keep rate off the Lomax tail: ${hi.size}/2000")
    assert(math.abs(mid.size - 2000 * math.pow(1.5, -9)) < 40,
      s"score 0.5 keep rate off the Lomax tail: ${mid.size}/2000")
    assert(lo.size < 20, s"score 0.05 should keep rarely: ${lo.size}/2000")
    // NULL score = the untrusted prior (score 0), not an error
    val withNull = Curation.classifierResample(
      Seq((1L, Some(0.9)), (2L, None)).toDF("id", "p"), "id", "p")
      .collect().map(r => r.getLong(0) -> r.getInt(r.fieldIndex("kept"))).toMap
    assert(withNull.contains(2L))
    // determinism: same salt, same keeps
    assert(keptAt(0.5) === keptAt(0.5))
  }

  test("map-only literal-map scoring == join-form scoring bit for bit") {
    val docs = labeled.select(col("doc_id"), col("text"))
      .unionByName(Seq((30L, "clean zzz prose qqq click"), (31L, ""))
        .toDF("doc_id", "text"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue
        else java.lang.Double.doubleToLongBits(r.getDouble(2)))
    val joinForm = TextAnalysis.nbQualityScore(docs, model, "doc_id", "text")
      .collect().map(key).toSet
    val mapForm = TextAnalysis.nbQualityScoreMapOnly(docs, model, "doc_id", "text")
      .collect().map(key).toSet
    assert(mapForm === joinForm)
    // carryCols thread extra columns through the projection untouched
    val carried = TextAnalysis.nbQualityScoreMapOnly(
      docs.withColumn("tag", concat(lit("t"), col("doc_id"))),
      model, "doc_id", "text", carryCols = Seq("tag"))
    assert(carried.columns.toSeq === Seq("id", "tag", "n_tokens", "nb_score"))
    assert(carried.filter(col("tag") =!= concat(lit("t"), col("id"))).count() === 0L)
  }

  test("maxVocab guard: over-budget model falls back to the join form; streaming throws") {
    val docs = labeled.select(col("doc_id"), col("text"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) Long.MinValue
        else java.lang.Double.doubleToLongBits(r.getDouble(2)))
    val want = TextAnalysis.nbQualityScore(docs, model, "doc_id", "text")
      .collect().map(key).toSet
    // a maxVocab below the model size must not blow the driver into a
    // giant map literal — it silently takes the broadcast-join form,
    // with identical output (incl. carryCols)
    val guarded = TextAnalysis.nbQualityScoreMapOnly(
        docs, model, "doc_id", "text", maxVocab = 3)
      .collect().map(key).toSet
    assert(guarded === want)
    val carried = TextAnalysis.nbQualityScoreMapOnly(
      docs.withColumn("tag", concat(lit("t"), col("doc_id"))),
      model, "doc_id", "text", carryCols = Seq("tag"), maxVocab = 3)
    assert(carried.columns.toSeq === Seq("id", "tag", "n_tokens", "nb_score"))
    assert(carried.filter(col("tag") =!= concat(lit("t"), col("id"))).count() === 0L)
    // a STREAMING input cannot take the stateful fallback — loud error
    // with the production fix, not a runtime unsupported-plan surprise
    val dir = java.nio.file.Files.createTempDirectory("graft_nbguard")
    docs.write.parquet(dir.resolve("landing").toString)
    val stream = spark.readStream.schema(docs.schema)
      .parquet(dir.resolve("landing").toString)
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.nbQualityScoreMapOnly(stream, model, "doc_id", "text",
        maxVocab = 3)
    }
    assert(e.getMessage.contains("prune"), e.getMessage)
  }

  test("deterministic: refit and rescore bit-identical; persisted model round-trips") {
    val m2 = TextAnalysis.nbQualityFit(labeled, "doc_id", "text", "trusted")
    assert(model.collect().toSet === m2.collect().toSet)
    val dir = java.nio.file.Files.createTempDirectory("graft_nb").toString
    val loaded = TextAnalysis.writeNbQuality(spark, labeled,
      "doc_id", "text", "trusted", dir)
    assert(loaded.collect().toSet === model.collect().toSet)
    val s1 = TextAnalysis.nbQualityScore(labeled, model, "doc_id", "text")
      .collect().toSet
    val s2 = TextAnalysis.nbQualityScore(labeled, m2, "doc_id", "text")
      .collect().toSet
    assert(s1 === s2)
  }
}
