package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** FAISS-style sampled training in [[Similarity.buildDenseIndex]]
  * (`trainSampleRows`): the trained artifacts (centroids, PQ codebooks)
  * fit on a deterministic hash sample while the per-row artifacts
  * (cells, codes, int8, radii) always cover the full corpus.
  *
  *  - degenerate parity: a sample target >= N must produce artifacts
  *    BIT-IDENTICAL to the unsampled build (same code path contract);
  *  - a genuinely sampled build stays complete (every corpus row lands
  *    in cells/codes/int8 exactly once) and full-probe serving remains
  *    exact — training depth affects recall economics, never coverage;
  *  - a sample smaller than the largest codebook is rejected loudly. */
class SampledTrainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val pinned = Similarity.IvfParams(
    nlist = 8, lloydIters = 2, numSub = 8, subDim = 8,
    numCentroids = 16, pqIters = 1, defaultNprobe = 2)

  private def collectSorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("trainSampleRows >= N degenerates to the unsampled build bit-for-bit") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val outFull = java.nio.file.Files.createTempDirectory("graft_strain_f").toString
    val outSamp = java.nio.file.Files.createTempDirectory("graft_strain_s").toString
    val full = Similarity.buildDenseIndex(emb, outFull, Some(pinned))
    val samp = Similarity.buildDenseIndex(emb, outSamp, Some(pinned),
      trainSampleRows = Some(1000000L))
    assert(collectSorted(samp.centroids) === collectSorted(full.centroids))
    assert(collectSorted(samp.codebooks) === collectSorted(full.codebooks))
    assert(collectSorted(samp.codes) === collectSorted(full.codes))
  }

  test("a genuinely sampled build is complete and serves exactly at full probe") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val n = emb.count()
    val out = java.nio.file.Files.createTempDirectory("graft_strain_h").toString
    // half-corpus training sample; still >= max(nlist, numCentroids)
    val idx = Similarity.buildDenseIndex(emb, out, Some(pinned),
      trainSampleRows = Some(n / 2))

    // per-row artifacts cover the FULL corpus exactly once
    assert(idx.cells.count() === n)
    assert(idx.cells.select("vec_id").distinct().count() === n)
    assert(idx.codes.count() === n * pinned.numSub)
    assert(idx.int8.get.count() === n)

    // trained artifacts have codebook shape (possibly fewer rows: Lloyd
    // can empty a cell), and DIFFER from the full fit — the sample
    // genuinely changed the training set
    assert(idx.centroids.count() <= pinned.nlist)
    assert(idx.codebooks.select("m").distinct().count() === pinned.numSub)

    // full probe over the sampled-training index == exact top-k: training
    // depth moves recall-at-small-nprobe, never full-probe coverage
    val q = emb.filter(col("vec_id") === 3).select(col("embedding").as("qv"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e4))).toSeq
    val got = key(Similarity.ivfSearchPruned(
      idx.cells, idx.centroids, q, nprobe = idx.centroids.count().toInt, k = 12))
    val want = key(Similarity.scoreAll(emb, q)
      .select(col("vec_id"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(12))
    assert(got === want)
  }

  test("a sample smaller than the largest codebook is rejected") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val out = java.nio.file.Files.createTempDirectory("graft_strain_r").toString
    intercept[IllegalArgumentException] {
      Similarity.buildDenseIndex(emb, out, Some(pinned),
        trainSampleRows = Some(8L)) // < numCentroids = 16
    }
  }
}
