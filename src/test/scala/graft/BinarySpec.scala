package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The 1-bit binary quantization family ([[Similarity.binarySig]] /
  * [[Similarity.hammingSig]] / [[Similarity.ivfBinaryRefineSearch]]):
  *
  *  - packing parity: the packed XOR-popcount Hamming equals the
  *    per-dimension sign-mismatch count computed directly on the floats
  *    (the definition the DuckDB oracle uses), including on dimensions
  *    that are NOT a multiple of the 64-bit word;
  *  - padding bits are inert: signatures of different-length suffixes of
  *    the same vector agree on shared words;
  *  - the sign convention is strict-positive: 0.0 packs to a clear bit,
  *    so a zero coordinate Hamming-matches a negative one;
  *  - null vectors pack to null signatures and are dropped by the store
  *    writer like every serving artifact;
  *  - serving: full-probe binary-coarse + exact-refine with kCoarse = N
  *    degenerates to the exact top-k (the refine stage sees everything). */
class BinarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def vecDf(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"))
  }

  test("packed Hamming == direct sign-mismatch count (d=70, crosses a word)") {
    // d=70: word 0 full, word 1 holds 6 live bits + 58 padding bits
    val rnd = new scala.util.Random(7)
    val rows = (0L until 20L).map(i =>
      i -> Seq.fill(70)((rnd.nextDouble() * 2 - 1).toFloat))
    val df = vecDf(rows)
    val q = rows(3)._2
    val packed = df.select(col("vec_id"),
        Similarity.hammingSig(
          Similarity.binarySig(col("embedding")),
          Similarity.binarySig(typedLit(q))).as("ham"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, v) =>
      val direct = v.zip(q).count { case (a, b) => (a > 0) != (b > 0) }
      assert(packed(id) === direct.toLong, s"row $id")
    }
  }

  test("strict-positive convention: 0.0 packs like a negative, not a positive") {
    val df = vecDf(Seq(
      1L -> Seq(0.0f, 1.0f, -1.0f),
      2L -> Seq(-0.5f, 1.0f, -1.0f)))
    val sigs = df.select(col("vec_id"), Similarity.binarySig(col("embedding")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L)) // 0.0 and -0.5 both clear bit 0
    assert(sigs(1L) === Seq(2L))  // only bit 1 (the +1.0 dim) set
  }

  test("null vector packs to null and the store writer drops it") {
    val df = spark.sql(
      "SELECT * FROM VALUES (1L, array(CAST(1.0 AS FLOAT)), 0), " +
        "(2L, CAST(NULL AS ARRAY<FLOAT>), 0) AS t(vec_id, embedding, cluster)")
    val sig = df.select(Similarity.binarySig(col("embedding")).as("s"))
      .collect().map(r => Option(r.get(0)))
    assert(sig.count(_.isEmpty) === 1)
    assert(Similarity.binaryEncodeCells(df).count() === 1)
  }

  test("zero-length vector packs to an EMPTY signature, not a spurious word") {
    // without the guard, ceil(0/64)-1 = -1 makes sequence(0,-1) count
    // DOWN: a 2-word all-zero signature whose Hamming against any real
    // signature is NULL (zip_with pads with null) — the row would vanish
    // from the coarse rank instead of ranking at maximal distance
    val df = spark.sql(
      "SELECT * FROM VALUES (1L, array(CAST(1.0 AS FLOAT))), " +
        "(2L, CAST(array() AS ARRAY<FLOAT>)) AS t(vec_id, embedding)")
    val sigs = df.orderBy("vec_id")
      .select(Similarity.binarySig(col("embedding")).as("s"))
      .collect().map(_.getSeq[Long](0))
    assert(sigs(0) === Seq(1L))
    assert(sigs(1) === Seq.empty)
  }

  test("short/empty signature ranks at MAXIMAL Hamming, never null-first") {
    // ADVICE r15: zip_with pads the shorter signature with nulls and a
    // null XOR word nulls the whole sum; NULLs sort FIRST ascending, so
    // without the coalesce a mismatched row would HEAD the shortlist and
    // consume kCoarse slots. Pinned: each padded word contributes 64.
    val df = spark.sql(
      "SELECT * FROM VALUES " +
        "(1L, array(0L, 0L)), " +      // identical to query: ham 0
        "(2L, array(3L, 0L)), " +      // 2 bits differ: ham 2
        "(3L, array(0L)), " +          // one word short: 0 + 64(pad) = 64
        "(4L, CAST(array() AS ARRAY<BIGINT>)) " + // empty: 64 + 64 = 128
        "AS t(vec_id, sig)")
    val q = expr("array(0L, 0L)")
    val got = df.select(col("vec_id"), Similarity.hammingSig(col("sig"), q).as("ham"))
      .orderBy(col("ham").asc, col("vec_id").asc)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 0L), (2L, 2L), (3L, 64L), (4L, 128L)))
  }

  test("full-probe binary coarse with kCoarse=N + exact refine == exact top-k") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings").limit(200).cache()
    val n = emb.count().toInt
    val out = java.nio.file.Files.createTempDirectory("graft_bq").toString
    val idx = Similarity.buildDenseIndex(emb, out,
      Some(Similarity.IvfParams(nlist = 4, lloydIters = 1, numSub = 8,
        subDim = 8, numCentroids = 16, pqIters = 1, defaultNprobe = 4)))
    val store = Similarity.binaryEncodeCells(idx.cells)
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val got = Similarity.ivfBinaryRefineSearch(store, idx.cells, idx.centroids,
        qv, nprobe = 4, kCoarse = n, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    // mirror the refine stage's boundary discipline: rank on the ROUNDED
    // exact score, ties to the lower id
    val exact = Similarity.scoreAll(emb, qv)
      .select(col("vec_id"), round(col("score"), 4).as("score"))
      .orderBy(col("score").desc, col("vec_id").asc)
      .limit(10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === exact)
    emb.unpersist()
  }

  test("batch binary refine == single-query form per query") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings").limit(300).cache()
    emb.count()
    val out = java.nio.file.Files.createTempDirectory("graft_bqb").toString
    val idx = Similarity.buildDenseIndex(emb, out,
      Some(Similarity.IvfParams(nlist = 4, lloydIters = 1, numSub = 8,
        subDim = 8, numCentroids = 16, pqIters = 1, defaultNprobe = 2)))
    val store = Similarity.binaryEncodeCells(idx.cells)
    val queries = emb.filter(col("vec_id").isin(7, 42, 101))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val batch = Similarity.ivfBinaryRefineSearchBatch(
        store, idx.cells, idx.centroids, queries,
        nprobe = 2, kCoarse = 30, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(x => (-x._2, x._1))).toMap
    Seq(7L, 42L, 101L).foreach { q =>
      val one = Similarity.ivfBinaryRefineSearch(
        store, idx.cells, idx.centroids,
        emb.filter(col("vec_id") === q).select(col("embedding").as("qv")),
        nprobe = 2, kCoarse = 30, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q).toSeq === one, s"batch binary refine vs single for query $q")
    }
    emb.unpersist()
  }

  test("build calibrates a persisted default_kcoarse_bq that serves the target") {
    // VERDICT r14 #2: the 1-bit family's serving default is no longer a
    // caller-side constant — buildDenseIndex(calibrateRecall) measures
    // the smallest kCoarse meeting the target at the calibrated nprobe
    // and persists it in the params artifact next to default_nprobe
    val emb = Tables(spark, TestSpark.sfDir, "embeddings").limit(300).cache()
    val n = emb.count()
    val out = java.nio.file.Files.createTempDirectory("graft_bqcal").toString
    val target = 0.8
    val idx = Similarity.buildDenseIndex(emb, out,
      Some(Similarity.IvfParams(nlist = 4, lloydIters = 1, numSub = 8,
        subDim = 8, numCentroids = 16, pqIters = 1, defaultNprobe = 2)),
      calibrateRecall = Some(target), calibrateK = 10, calibrateQueries = 10)
    val params = spark.read.parquet(s"$out/params").head
    val kc = params.getAs[Int]("default_kcoarse_bq")
    assert(idx.defaultKCoarseBq === Some(kc))
    assert(kc >= 10 && kc <= n, s"calibrated kCoarse $kc out of [k, N]")
    assert(idx.binary.get.count() === n) // the bin store is a build artifact
    // re-measure: the persisted (nprobe, kCoarse) pair meets the target
    // on the SAME deterministic calibration sample
    val sample = emb
      .select(col("vec_id"), col("embedding"), graft.operators.Dedup.hash60(
        concat(lit("cal:"), col("vec_id").cast("string"))).as("__h"))
      .orderBy(col("__h"), col("vec_id")).limit(10)
      .select(col("vec_id").cast("long").as("query_id"),
        col("embedding").as("qv"))
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exact = hits(Similarity.knnBatch(
      emb.select(col("vec_id"), col("embedding")), sample, 10))
    val ann = hits(Similarity.ivfBinaryRefineSearchBatch(
      idx.binary.get, idx.cells, idx.centroids, sample,
      idx.defaultNprobe.get, kc, 10))
    val recall = exact.map { case (q, ids) =>
      ids.intersect(ann.getOrElse(q, Set.empty)).size.toDouble / ids.size
    }.sum / exact.size
    assert(recall >= target, f"served recall $recall%.2f below target $target")
    // minimality: one step tighter misses the target (kc is the SMALLEST
    // admissible shortlist, not just an admissible one) — only when the
    // calibration actually had room to move (kc > k)
    if (kc > 10) {
      val annTight = hits(Similarity.ivfBinaryRefineSearchBatch(
        idx.binary.get, idx.cells, idx.centroids, sample,
        idx.defaultNprobe.get, kc - 1, 10))
      val recallTight = exact.map { case (q, ids) =>
        ids.intersect(annTight.getOrElse(q, Set.empty)).size.toDouble / ids.size
      }.sum / exact.size
      assert(recallTight < target,
        f"kCoarse ${kc - 1} already serves $recallTight%.2f — not minimal")
    }
    emb.unpersist()
  }
}
