package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Trained-range SQ8 (VERDICT r13 #7 — the FAISS `ScalarQuantizer.train()`
  * analog): [[Similarity.int8TrainRanges]] fits per-dim max-|x| ranges,
  * [[Similarity.int8EncodeCellsTrained]] quantizes against them, and
  * [[Similarity.ivfInt8TrainedRefineSearch]] serves the two-stage
  * coarse-dequantize + exact-refine path. The oracle (`sim_sq8_trained`)
  * pins the happy path over the testdata; this suite covers the cases the
  * trained variant EXISTS for — non-normalized coordinates the fixed
  * `x * 127` scheme saturates on, out-of-range saturation at encode,
  * all-zero dims — plus full-probe exactness. */
class TrainedSq8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def embDf(rows: Seq[(Long, Option[Array[Float]])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("int8TrainRanges: per-dim max-|x|, null vectors ignored") {
    val emb = embDf(Seq(
      0L -> Some(Array(3f, -8f, 0f)),
      1L -> Some(Array(-5f, 2f, 0f)),
      2L -> None))
    val got = Similarity.int8TrainRanges(emb)
      .orderBy("dim").collect().map(r => (r.getInt(0), r.getDouble(1))).toSeq
    assert(got === Seq((0, 5.0), (1, 8.0), (2, 0.0)))
  }

  test("trained encode: full byte range used, saturation past the trained range, zero dims") {
    val train = embDf(Seq(
      0L -> Some(Array(4f, -10f, 0f)),
      1L -> Some(Array(-2f, 5f, 0f))))
    val ranges = Similarity.int8TrainRanges(train)
    // encode rows NOT in the training set: one inside the ranges, one past
    // them (the incremental-landing case — must saturate, not wrap)
    val cells = embDf(Seq(
      10L -> Some(Array(4f, -10f, 0f)),
      11L -> Some(Array(2f, 5f, 0f)),
      12L -> Some(Array(40f, -99f, 0f)))).withColumn("cluster", lit(0))
    val q8 = Similarity.int8EncodeCellsTrained(cells, ranges)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](2).toSeq).toMap
    // maxabs = (4, 10, 0): x/maxabs*127 rounded HALF_UP-by-SQL-round
    assert(q8(10L) === Seq[Byte](127, -127, 0), "range endpoints hit ±127")
    assert(q8(11L) === Seq[Byte](64, 64, 0)) // 2/4*127 = 63.5 -> 64 (round half up)
    assert(q8(12L) === Seq[Byte](127, -127, 0), "out-of-range saturates")
    // untrained encode of the SAME rows saturates everything — the failure
    // mode the trained variant exists to fix
    val flat = Similarity.int8EncodeCells(cells)
      .orderBy("vec_id").collect()
      .map(r => r.getLong(0) -> r.getSeq[Byte](2).toSeq).toMap
    assert(flat(11L) === Seq[Byte](127, 127, 0),
      "fixed x*127 collapses non-normalized coords to the clamp")
  }

  test("full-probe trained serving == exact top-k on a non-normalized corpus") {
    val rnd = new scala.util.Random(23)
    // coordinates in [-9, 9] with per-dim spread: the fixed scheme would
    // quantize every coordinate to ±127 and lose the ranking entirely
    val emb = embDf((0L until 60L).map { i =>
      i -> Some(Array.tabulate(8)(d => ((rnd.nextFloat() - 0.5f) * 2f * (d + 2))))
    })
    val out = java.nio.file.Files.createTempDirectory("graft_tsq8").toString
    val idx = Similarity.buildDenseIndex(emb, out, Some(Similarity.IvfParams(
      nlist = 4, lloydIters = 1, numSub = 2, subDim = 4,
      numCentroids = 8, pqIters = 1, defaultNprobe = 4)))
    val ranges = Similarity.int8TrainRanges(emb)
    val store = Similarity.int8EncodeCellsTrained(idx.cells, ranges)
    val q = emb.filter(col("vec_id") === 5).select(col("embedding").as("qv"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e4))).toSeq
    val got = key(Similarity.ivfInt8TrainedRefineSearch(
      store, ranges, idx.cells, idx.centroids, q,
      nprobe = 4, kCoarse = 60, k = 10))
    val want = key(Similarity.scoreAll(emb, q)
      .select(col("vec_id"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10))
    assert(got === want)
  }
}
