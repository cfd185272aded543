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
    // genuinely changed the training set (if the hash filter were a
    // silent no-op, the centroid sets would match bit-for-bit)
    assert(idx.centroids.count() <= pinned.nlist)
    assert(idx.codebooks.select("m").distinct().count() === pinned.numSub)
    val outFull = java.nio.file.Files.createTempDirectory("graft_strain_hf").toString
    val full = Similarity.buildDenseIndex(emb, outFull, Some(pinned),
      trainSampleRows = Some(Long.MaxValue))
    assert(collectSorted(idx.centroids) !== collectSorted(full.centroids),
      "half-corpus sampled centroids matched the full fit — the sample " +
        "filter did not change the training set")

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

  test("omitted trainSampleRows auto-sizes; small corpora stay unsampled bit-for-bit") {
    // IvfParams.autoTrainSample: max(39*nlist, 256*numCentroids, 400000)
    assert(pinned.autoTrainSample === 400000L)
    assert(Similarity.IvfParams(nlist = 20000, lloydIters = 2, numSub = 8,
      subDim = 8, numCentroids = 256, pqIters = 1, defaultNprobe = 16)
      .autoTrainSample === 780000L) // 39*nlist dominates
    // on a corpus below the 400k floor the auto default degenerates to
    // the full corpus: default build == forced-unsampled build
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val outAuto = java.nio.file.Files.createTempDirectory("graft_strain_a").toString
    val outFull = java.nio.file.Files.createTempDirectory("graft_strain_af").toString
    val auto = Similarity.buildDenseIndex(emb, outAuto, Some(pinned))
    val full = Similarity.buildDenseIndex(emb, outFull, Some(pinned),
      trainSampleRows = Some(Long.MaxValue))
    assert(collectSorted(auto.centroids) === collectSorted(full.centroids))
    assert(collectSorted(auto.codebooks) === collectSorted(full.codebooks))
  }

  test("a binomially undershooting realized sample falls back to the full corpus") {
    // the hash-threshold filter admits a BINOMIAL count: find a target
    // that clears the request-time floor but realizes BELOW it, and pin
    // that the build silently fell back to the unsampled fit rather than
    // training fewer centroids than the configured geometry
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val n = emb.count()
    val floor = math.max(pinned.nlist, pinned.numCentroids).toLong // 16
    def realized(target: Long): Long = {
      val cut = (target.toDouble / n * (1L << 60)).toLong
      emb.filter(graft.operators.Dedup.hash60(
        concat(lit("trainsample:"), col("vec_id").cast("string"))) < lit(cut))
        .count()
    }
    (floor to math.min(n - 1, floor + 30L)).find(realized(_) < floor) match {
      case Some(t) =>
        val outU = java.nio.file.Files.createTempDirectory("graft_strain_u").toString
        val outF = java.nio.file.Files.createTempDirectory("graft_strain_uf").toString
        val under = Similarity.buildDenseIndex(emb, outU, Some(pinned),
          trainSampleRows = Some(t))
        val full = Similarity.buildDenseIndex(emb, outF, Some(pinned),
          trainSampleRows = Some(Long.MaxValue))
        assert(collectSorted(under.centroids) === collectSorted(full.centroids),
          s"target=$t realized ${realized(t)} < floor $floor but the build " +
            "did not fall back to the full corpus")
      case None =>
        // this corpus' hash landscape never undershoots near the floor —
        // still assert the realized counts are what the fallback guards on
        assert((floor to floor + 30L).forall(t => realized(t) >= floor))
    }
  }
}
