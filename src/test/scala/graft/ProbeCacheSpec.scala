package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Similarity.CentroidCache]] — the driver-cached coarse probe the
  * serving facade uses instead of launching a [[Similarity.probeCells]]
  * Spark job per request. The whole point is EXACT parity: same dot fold,
  * same round-6 HALF_UP, desc with ties to the lower cluster id,
  * null-vector centroids last. Pinned here on adversarial data:
  * duplicate centroid vectors (forced rounded-score ties), sub-grain
  * score differences (rounding collapses them into ties), a null-vector
  * centroid reachable at deep nprobe, and a query shorter than the
  * centroids (min-length dot). */
class ProbeCacheSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def centDf(rows: Seq[(Int, Seq[Float])], withNull: Boolean = false) = {
    import spark.implicits._
    val base = rows.toDF("cluster", "cv")
      .select(col("cluster"), col("cv").cast("array<float>"))
    if (!withNull) base
    else base.unionByName(spark.sql(
      "SELECT 99 AS cluster, CAST(NULL AS ARRAY<FLOAT>) AS cv"))
  }

  test("cache.probe == probeCells on ties, sub-grain deltas, and null rows") {
    val rnd = new scala.util.Random(11)
    val d = 24
    val v0 = Seq.fill(d)((rnd.nextDouble() * 2 - 1).toFloat)
    val cents = Seq(
      5 -> v0,                                   // duplicate of 12: exact tie
      12 -> v0,
      3 -> v0.map(x => x + 1e-9f),               // sub-grain: ties after rounding
      7 -> Seq.fill(d)((rnd.nextDouble() * 2 - 1).toFloat),
      1 -> Seq.fill(d)((rnd.nextDouble() * 2 - 1).toFloat),
      20 -> v0.map(-_))                          // far row
    val df = centDf(cents, withNull = true)
    val cache = new Similarity.CentroidCache(df)
    val qv = v0.toArray
    val qvDf = spark.range(1).select(typedLit(v0).cast("array<float>").as("qv"))
    for (nprobe <- Seq(1, 2, 3, 5, 7)) { // 7 reaches the null-cv row
      val expect = Similarity.probeCells(df, qvDf, nprobe)
      assert(cache.probe(qv, nprobe) === expect, s"nprobe=$nprobe")
    }
  }

  test("query shorter than the centroids: min-length dot parity") {
    val cents = Seq(
      0 -> Seq(1.0f, 1.0f, 100.0f), // the tail must NOT score
      1 -> Seq(2.0f, 0.5f, -50.0f))
    val df = centDf(cents)
    val cache = new Similarity.CentroidCache(df)
    val q = Seq(1.0f, 1.0f)
    val qvDf = spark.range(1).select(typedLit(q).cast("array<float>").as("qv"))
    assert(cache.probe(q.toArray, 2) === Similarity.probeCells(df, qvDf, 2))
  }

  test("random fuzz: 50 queries x 64 centroids agree at every nprobe depth") {
    val rnd = new scala.util.Random(42)
    val cents = (0 until 64).map(i =>
      i -> Seq.fill(16)((rnd.nextDouble() * 2 - 1).toFloat))
    val df = centDf(cents).cache()
    df.count()
    val cache = new Similarity.CentroidCache(df)
    for (t <- 0 until 50) {
      val q = Seq.fill(16)((rnd.nextDouble() * 2 - 1).toFloat)
      val qvDf = spark.range(1).select(typedLit(q).cast("array<float>").as("qv"))
      val nprobe = 1 + rnd.nextInt(8)
      assert(cache.probe(q.toArray, nprobe) ===
        Similarity.probeCells(df, qvDf, nprobe), s"trial $t")
    }
    df.unpersist()
  }
}
