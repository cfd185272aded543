package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The dense-index BUILD surface: the k ~ sqrt(N) sizing rule
  * ([[Similarity.IvfParams.auto]]) and the one-call builder
  * ([[Similarity.buildDenseIndex]]) that writes the four persisted
  * serving artifacts (centroids / cell-partitioned corpus / refined
  * codebooks / cell-partitioned codes). */
class DenseBuildSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("IvfParams.auto wires the k ~ sqrt(N) sizing rule") {
    // reference regime: 1M rows of CLIP-dim vectors
    val p = Similarity.IvfParams.auto(1000000L, 768)
    assert(p.nlist === 4000) // ceil(4*sqrt(1e6))
    assert(p.subDim === 8 && p.numSub === 96)
    assert(p.numCentroids === 256) // one byte per code
    assert(p.defaultNprobe === 250) // nlist/16

    // testbed regime
    val small = Similarity.IvfParams.auto(500L, 64)
    assert(small.nlist === 90) // ceil(4*sqrt(500))
    assert(small.subDim === 8 && small.numSub === 8)
    assert(small.numCentroids === 256)
    assert(small.defaultNprobe === 5)

    // clamps: nlist and the codebook never exceed the corpus; a prime d
    // falls back to one d-dim subspace
    val tiny = Similarity.IvfParams.auto(9L, 7)
    assert(tiny.nlist === 9)
    assert(tiny.numSub === 1 && tiny.subDim === 7)
    assert(tiny.numCentroids === 9)
    assert(tiny.defaultNprobe === 1)

    // subDim picks a PROPER divisor nearest 8 — d=10 gives 5 (2 subspaces),
    // not d itself
    val d10 = Similarity.IvfParams.auto(10000L, 10)
    assert(d10.subDim === 5 && d10.numSub === 2)

    // monotone in N: 4x the rows, 2x the cells
    assert(Similarity.IvfParams.auto(4000000L, 64).nlist === 8000)

    intercept[IllegalArgumentException](Similarity.IvfParams.auto(0L, 8))
    intercept[IllegalArgumentException](Similarity.IvfParams.auto(10L, 0))
  }

  test("buildDenseIndex: auto-sized build lands all artifacts and serves exactly at full probe") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val out = java.nio.file.Files.createTempDirectory("graft_densebuild").toString
    val idx = Similarity.buildDenseIndex(emb, out) // geometry = auto(500, 64)

    for (sub <- Seq("centroids", "cells", "codebooks", "codes"))
      assert(new java.io.File(s"$out/$sub").exists(), s"missing artifact $sub")
    assert(new java.io.File(s"$out/cells").listFiles()
      .exists(_.getName.startsWith("cluster=")), "cells not cell-partitioned")
    assert(new java.io.File(s"$out/codes").listFiles()
      .exists(_.getName.startsWith("cluster=")), "codes not cell-partitioned")

    // auto sizing took effect (k >> the testbed's pinned 8; empty cells may
    // drop out of the refit, so <= the rule's 90)
    val nlist = idx.centroids.count().toInt
    assert(nlist > 8 && nlist <= 90, s"unexpected nlist $nlist")

    // the cell store holds the whole corpus exactly once, codes carry
    // numSub rows per corpus row
    assert(idx.cells.count() === 500L)
    assert(idx.cells.select("vec_id").distinct().count() === 500L)
    assert(idx.codes.count() === 500L * 8)

    // full probe over the built index == exact top-k: the build lost and
    // duplicated nothing
    val q = emb.filter(col("vec_id") === 3).select(col("embedding").as("qv"))
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e4))).toSeq
    val got = key(Similarity.ivfSearchPruned(
      idx.cells, idx.centroids, q, nprobe = nlist, k = 12))
    // same ROUNDED-score boundary as the pruned search (ties to lower id)
    val want = key(Similarity.scoreAll(emb, q)
      .select(col("vec_id"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(12))
    assert(got === want)
  }
}
