package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPQ-style rotate-then-quantize (Ge et al. 2013 / FAISS OPQMatrix):
  * [[Similarity.rotateVectors]] with EIGENVALUE ALLOCATION, wired into
  * [[Similarity.buildDenseIndex]] as `opqRotateIters` and served by
  * [[Similarity.pqAdcScoreRotated]]. The spec pins the two halves of the
  * contract: the rotation is score-NEUTRAL (orthogonal basis — exact
  * rankings unchanged up to the round-6 projection grain), and on
  * anisotropic data the allocated rotation measurably CUTS quantization
  * distortion at the same code budget (a plain PCA-ordered rotation does
  * not — squared error is variance-linear and rotation-invariant; the
  * win is dealing eigen-sorted components round-robin across the
  * sub-quantizers, measured 1.05 -> 0.44 on this corpus, BASELINE.md). */
class OpqSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def h(i: Long, j: Int) =
    ((i * 2654435761L + j * 40503L) % 1000) / 1000.0 - 0.5

  /** Four dense orthogonal (Hadamard) directions with scales 20/12/6/3
    * plus per-coordinate noise — correlated structure that straddles
    * every PQ subspace boundary in the raw coordinates. */
  private lazy val corpus = {
    val had = Array(
      Array(1, 1, 1, 1, 1, 1, 1, 1), Array(1, -1, 1, -1, 1, -1, 1, -1),
      Array(1, 1, -1, -1, 1, 1, -1, -1), Array(1, -1, -1, 1, 1, -1, -1, 1))
    val scales = Array(20.0, 12.0, 6.0, 3.0)
    (0L until 300L).map { i =>
      val coefs = Array.tabulate(4)(f => h(i, f * 7) * scales(f))
      (i, Array.tabulate(8) { j =>
        ((0 until 4).map(f => coefs(f) * had(f)(j) / math.sqrt(8)).sum
          + h(i, j + 50) * 0.3).toFloat
      })
    }.toDF("vec_id", "embedding")
  }
  private val (ns, sd) = (4, 2)
  private lazy val rot =
    Similarity.pcaTopComponents(corpus, "embedding", m = 8, iters = 10)

  test("rotation is score-neutral: exact top-k ids unchanged, scores within the projection grain") {
    val qv = corpus.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    val raw = Similarity.knnExact(corpus, qv, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val cr = Similarity.rotateVectors(corpus, rot, allocate = Some((ns, sd)))
    val qr = Similarity.rotateVectors(
      qv.select(lit(0L).as("vec_id"), col("qv").as("embedding")), rot,
      allocate = Some((ns, sd)))
      .select(col("embedding").as("qv"))
    val rotated = Similarity.knnExact(cr, qr, k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(raw.map(_._1).toSeq === rotated.map(_._1).toSeq)
    raw.zip(rotated).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) < 1e-3, s"score drift $a vs $b")
    }
  }

  test("eigenvalue-allocated rotation cuts PQ distortion; plain PCA order does not") {
    def distortion(vecs: org.apache.spark.sql.DataFrame): Double = {
      val cb = Similarity.pqRefineCodebooks(vecs,
        Similarity.pqCodebooks(vecs, ns, sd, 4), ns, sd, iters = 3)
      val d = Similarity.quantizationDistortion(vecs, cb, ns, sd)
      cb.unpersist(); d
    }
    val dRaw = distortion(corpus)
    val dPca = distortion(Similarity.rotateVectors(corpus, rot))
    val dAlloc = distortion(
      Similarity.rotateVectors(corpus, rot, allocate = Some((ns, sd))))
    assert(dAlloc < 0.6 * dRaw,
      s"allocated rotation must cut distortion materially: $dAlloc vs raw $dRaw")
    assert(dAlloc <= dPca,
      s"allocation must not lose to plain PCA order: $dAlloc vs $dPca")
  }

  test("ADC over rotated codes recalls at least as much of the exact top-k") {
    val qv = corpus.filter(col("vec_id") === 42).select(col("embedding").as("qv"))
    val truth = Similarity.knnExact(corpus, qv, k = 10)
      .collect().map(_.getLong(0)).toSet
    def adcHits(vecs: org.apache.spark.sql.DataFrame,
        q: org.apache.spark.sql.DataFrame): Int = {
      val cb = Similarity.pqRefineCodebooks(vecs,
        Similarity.pqCodebooks(vecs, ns, sd, 4), ns, sd, iters = 3)
      val got = Similarity.pqAdcScore(
        Similarity.pqEncode(vecs, cb, ns, sd), cb, q, k = 10, ns, sd)
        .collect().map(_.getLong(0)).count(truth)
      cb.unpersist(); got
    }
    val rawHits = adcHits(corpus, qv)
    val cr = Similarity.rotateVectors(corpus, rot, allocate = Some((ns, sd)))
    val qr = Similarity.rotateVectors(
      qv.select(lit(0L).as("vec_id"), col("qv").as("embedding")), rot,
      allocate = Some((ns, sd)))
      .select(col("embedding").as("qv"))
    val rotHits = adcHits(cr, qr)
    assert(rotHits >= rawHits,
      s"rotated ADC must not recall less: $rotHits vs $rawHits of ${truth.size}")
  }

  test("buildDenseIndex(opqRotateIters) persists the rotation and serves through pqAdcScoreRotated") {
    val dir = java.nio.file.Files.createTempDirectory("graft_opq").toString
    val p = Similarity.IvfParams(nlist = 4, lloydIters = 1, numSub = ns,
      subDim = sd, numCentroids = 4, pqIters = 2, defaultNprobe = 2)
    val idx = Similarity.buildDenseIndex(corpus, dir, params = Some(p),
      opqRotateIters = Some(8))
    assert(idx.rotation.isDefined)
    assert(idx.rotation.get.count() === 64L, "8 components x 8 dims")
    val qv = corpus.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    val served = Similarity.pqAdcScoreRotated(
      idx.codes, idx.codebooks, idx.rotation.get, qv, k = 5, ns, sd)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(served.length === 5)
    // serving parity: rotating the query by hand and running plain ADC
    // over the same persisted codes must give the identical result
    val qr = Similarity.rotateVectors(
      qv.select(lit(0L).as("vec_id"), col("qv").as("embedding")),
      idx.rotation.get, allocate = Some((ns, sd)))
      .select(col("embedding").as("qv"))
    val manual = Similarity.pqAdcScore(idx.codes, idx.codebooks, qr, k = 5, ns, sd)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(served.toSeq === manual.toSeq)
    // scores come back rank-ordered
    assert(served.map(_._2).toSeq === served.map(_._2).sorted(
      Ordering[Double].reverse).toSeq)
    // and the un-rotated build leaves no rotation artifact
    val dir2 = java.nio.file.Files.createTempDirectory("graft_noopq").toString
    val idx2 = Similarity.buildDenseIndex(corpus, dir2, params = Some(p))
    assert(idx2.rotation.isEmpty)
  }

  test("incremental maintenance encodes landed batches in the index's rotated basis") {
    import graft.streaming.IncrementalIndex
    val base = java.nio.file.Files.createTempDirectory("graft_opq_incr")
    val landing = base.resolve("landing").toString
    val sink = base.resolve("store").toString
    val codes = base.resolve("codes").toString
    val ckpt = base.resolve("ckpt").toString
    val labeled = corpus.select(col("vec_id"), col("embedding"),
      (col("vec_id") % 3).cast("int").as("label"))
    val cents = Similarity.centroids(labeled, "label", "embedding")
    val rotated = Similarity.rotateVectors(corpus, rot, allocate = Some((ns, sd)))
    val cb = Similarity.pqRefineCodebooks(rotated,
      Similarity.pqCodebooks(rotated, ns, sd, 4), ns, sd, iters = 2)
    val trained = Similarity.quantizationDistortion(rotated, cb, ns, sd)
    // the basis-mismatch failure mode this wiring prevents: RAW vectors
    // against the rotated codebooks read as massive "drift"
    val rawAgainstRotated = Similarity.quantizationDistortion(corpus, cb, ns, sd)
    assert(rawAgainstRotated > trained * 1.5,
      s"expected basis mismatch to look like drift: $rawAgainstRotated vs $trained")
    corpus.filter(col("vec_id") < 150).write.mode("append").parquet(landing)
    IncrementalIndex.updateDenseIndex(spark, landing, sink, ckpt,
      cents.select(col("label"), col("cv")),
      codebooks = Some(cb), codesDir = Some(codes), numSub = ns, subDim = sd,
      trainDistortion = Some(trained), driftTolerance = 1.5,
      centroidIdCol = "label", cellCol = "ivf_cell", rotation = Some(rot))
    corpus.filter(col("vec_id") >= 150).write.mode("append").parquet(landing)
    IncrementalIndex.updateDenseIndex(spark, landing, sink, ckpt,
      cents.select(col("label"), col("cv")),
      codebooks = Some(cb), codesDir = Some(codes), numSub = ns, subDim = sd,
      trainDistortion = Some(trained), driftTolerance = 1.5,
      centroidIdCol = "label", cellCol = "ivf_cell", rotation = Some(rot))
    // accumulated codes == one-shot encode of the ROTATED corpus
    val want = Similarity.pqEncode(rotated, cb, ns, sd)
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    val got = spark.read.parquet(codes).select("vec_id", "m", "code")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(got === want)
    cb.unpersist()
  }

  test("retrainAndSwap(opqRotateIters) publishes the rotation; currentRotation reads it") {
    import graft.streaming.IncrementalIndex
    val root = java.nio.file.Files.createTempDirectory("graft_opq_ver").toString
    val v = IncrementalIndex.retrainAndSwap(spark, root, corpus, None,
      numSub = ns, subDim = sd, numCentroids = 4, pqIters = 2,
      opqRotateIters = Some(8))
    assert(v === 0L)
    val rotArt = IncrementalIndex.currentRotation(spark, root)
    assert(rotArt.isDefined)
    assert(rotArt.get.count() === 64L, "8 components x 8 dims")
    // the published distortion is the ROTATED-basis training distortion
    val (cb, dist, _, _) = IncrementalIndex.currentCodebooks(spark, root)
    val rotated = Similarity.rotateVectors(corpus, rotArt.get,
      allocate = Some((ns, sd)))
    val recomputed = Similarity.quantizationDistortion(rotated, cb, ns, sd)
    assert(math.abs(dist - recomputed) < 1e-9, s"$dist vs $recomputed")
    // an unrotated retrain publishes no rotation artifact
    val root2 = java.nio.file.Files.createTempDirectory("graft_noopq_ver").toString
    IncrementalIndex.retrainAndSwap(spark, root2, corpus, None,
      numSub = ns, subDim = sd, numCentroids = 4, pqIters = 2)
    assert(IncrementalIndex.currentRotation(spark, root2).isEmpty)
  }

  test("versioned self-healing loop refits the ROTATION with the codebooks on drift") {
    import graft.streaming.IncrementalIndex
    val base = java.nio.file.Files.createTempDirectory("graft_opq_heal")
    val landing = base.resolve("landing").toString
    val sink = base.resolve("store").toString
    val ckpt = base.resolve("ckpt").toString
    val indexRoot = base.resolve("index").toString
    val labeled = corpus.select(col("vec_id"), col("embedding"),
      (col("vec_id") % 3).cast("int").as("label"))
    val cents = Similarity.centroids(labeled, "label", "embedding")
      .select(col("label"), col("cv"))
    // bootstrap: version 0 publishes codebooks AND a rotation
    corpus.filter(col("vec_id") < 150).write.mode("append").parquet(landing)
    IncrementalIndex.updateDenseIndexVersioned(spark, landing, sink, ckpt,
      cents, indexRoot, numSub = ns, subDim = sd, numCentroids = 4,
      centroidIdCol = "label", cellCol = "ivf_cell",
      opqRotateIters = Some(6))
    assert(IncrementalIndex.currentVersion(spark, indexRoot) === Some(0L))
    val rot0 = IncrementalIndex.currentRotation(spark, indexRoot)
    assert(rot0.isDefined)
    // a shifted batch trips the (rotated-basis) drift gate; the loop must
    // retrain rotation+codebooks together, publish v=1, and replay
    corpus.filter(col("vec_id") >= 150)
      .withColumn("embedding", expr("transform(embedding, x -> x + 50.0f)"))
      .write.mode("append").parquet(landing)
    IncrementalIndex.updateDenseIndexVersioned(spark, landing, sink, ckpt,
      cents, indexRoot, numSub = ns, subDim = sd, numCentroids = 4,
      centroidIdCol = "label", cellCol = "ivf_cell",
      opqRotateIters = Some(6))
    assert(IncrementalIndex.currentVersion(spark, indexRoot) === Some(1L))
    assert(spark.read.parquet(sink).count() === 300)
    val rot1 = IncrementalIndex.currentRotation(spark, indexRoot)
    assert(rot1.isDefined)
    // the v1 basis was REFIT on the drifted mixture, not carried over
    def rotMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Number]("comp").intValue,
        r.getAs[Number]("pos").longValue) -> r.getDouble(r.fieldIndex("pc"))).toMap
    assert(rotMap(rot0.get) !== rotMap(rot1.get))
    // the live version's codes equal a one-shot encode of the landed
    // store ROTATED through the live basis — both halves (swap-time
    // re-encode of old rows + replay-time encode of the gated batch)
    // went through v=1's rotation
    val (cb1, _, v1, codesDir) = IncrementalIndex.currentCodebooks(spark, indexRoot)
    assert(v1 === 1L)
    val store = spark.read.parquet(sink).select(col("vec_id"), col("embedding"))
    val want = Similarity.pqEncode(
        Similarity.rotateVectors(store, rot1.get, allocate = Some((ns, sd))),
        cb1, ns, sd)
      .collect().map(r => (r.getLong(0), r.getAs[Number]("m").intValue) ->
        r.getAs[Number]("code").intValue).toMap
    val got = spark.read.parquet(codesDir).select("vec_id", "m", "code")
      .collect().map(r => (r.getLong(0), r.getAs[Number]("m").intValue) ->
        r.getAs[Number]("code").intValue).toMap
    assert(got === want)
  }

  test("pruned/batch IVF-PQ serving is rotation-aware (basis mismatch guarded)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_opq_serve").toString
    val p = Similarity.IvfParams(nlist = 4, lloydIters = 1, numSub = ns,
      subDim = sd, numCentroids = 4, pqIters = 2, defaultNprobe = 2)
    val idx = Similarity.buildDenseIndex(corpus, dir, params = Some(p),
      opqRotateIters = Some(8))
    val qv = corpus.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    // FULL probe through the rotation-aware pruned path == flat rotated ADC
    val flat = Similarity.pqAdcScoreRotated(
      idx.codes, idx.codebooks, idx.rotation.get, qv, k = 5, ns, sd)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val pruned = Similarity.ivfPqSearchPruned(
      idx.codes, idx.codebooks, idx.centroids, qv, nprobe = 4, k = 5, ns, sd,
      rotation = idx.rotation)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(pruned === flat)
    // ...and WITHOUT the rotation the raw query scores a mismatched basis
    // (the silent failure mode the parameter exists to prevent)
    val mismatched = Similarity.ivfPqSearchPruned(
      idx.codes, idx.codebooks, idx.centroids, qv, nprobe = 4, k = 5, ns, sd)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(mismatched !== flat)
    // batch form: each query's rows equal its single-query rotated ADC
    val queries = corpus.filter(col("vec_id").isin(7, 42))
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val batch = Similarity.ivfPqSearchBatchPruned(
      idx.codes, idx.codebooks, idx.centroids, queries, nprobe = 4, k = 5,
      ns, sd, rotation = idx.rotation)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sortBy(x => (-x._2, x._1))).toMap
    Seq(7L, 42L).foreach { q =>
      val one = Similarity.pqAdcScoreRotated(
        idx.codes, idx.codebooks, idx.rotation.get,
        corpus.filter(col("vec_id") === q).select(col("embedding").as("qv")),
        k = 5, ns, sd)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(batch(q).toSeq === one, s"batch vs single for query $q")
    }
    // two-stage refine with rotation: the ADC stage rotates, the exact
    // stage re-scores RAW vectors with the RAW query — at a full
    // shortlist the result must equal exact kNN bit-for-bit (any basis
    // slip in either stage breaks this)
    val ref = Similarity.ivfPqRefineSearch(
      idx.cells, idx.codes, idx.codebooks, idx.centroids, qv,
      nprobe = 4, kCoarse = 300, k = 5, ns, sd, rotation = idx.rotation)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val exact = Similarity.knnExact(corpus, qv, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(ref.map(_._1) === exact.map(_._1))
    // batch two-stage refine (round 12): each query's rows equal its
    // single-query ivfPqRefineSearch — same probed cells, same rotated
    // ADC shortlist, same raw exact re-score
    val refBatch = Similarity.ivfPqRefineSearchBatch(
      idx.cells, idx.codes, idx.codebooks, idx.centroids, queries,
      nprobe = 4, kCoarse = 30, k = 5, ns, sd, rotation = idx.rotation)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(x => (-x._2, x._1))).toMap
    Seq(7L, 42L).foreach { q =>
      val one = Similarity.ivfPqRefineSearch(
        idx.cells, idx.codes, idx.codebooks, idx.centroids,
        corpus.filter(col("vec_id") === q).select(col("embedding").as("qv")),
        nprobe = 4, kCoarse = 30, k = 5, ns, sd, rotation = idx.rotation)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(refBatch(q).toSeq === one, s"batch refine vs single for query $q")
    }
    // batch SQ8 two-stage (round 12): same two-pruned-pass shape over
    // the byte store — each query's rows equal its single-query form
    val i8Batch = Similarity.ivfInt8RefineSearchBatch(
      idx.int8.get, idx.cells, idx.centroids, queries,
      nprobe = 4, kCoarse = 30, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).sortBy(x => (-x._2, x._1))).toMap
    Seq(7L, 42L).foreach { q =>
      val one = Similarity.ivfInt8RefineSearch(
        idx.int8.get, idx.cells, idx.centroids,
        corpus.filter(col("vec_id") === q).select(col("embedding").as("qv")),
        nprobe = 4, kCoarse = 30, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(i8Batch(q).toSeq === one, s"batch int8 refine vs single for query $q")
    }
  }

  test("rotation kernel == literal projection bit-for-bit (incl. null vectors)") {
    // the scale form: past RotateLiteralMax coefficient literals (d=768
    // full rotations are ~590k) the projection runs as a partition
    // kernel — same contract as the codegen'd literal path, pinned here
    // on the same inputs (with a null-vector row mixed in)
    val coefs = Similarity.rotationCoefs(rot, Some((ns, sd)))
    // a null ELEMENT (not a null vector): the HOF fold nulls every
    // component's aggregate, so both forms must emit the all-null row —
    // the kernel used to NPE on the primitive unbox instead (ADVICE r12)
    val withNullElem = corpus.filter(col("vec_id") === 7)
      .select(lit(998L).as("vec_id"),
        expr("transform(embedding, (x, j) -> if(j = 3, cast(null as float), x))")
          .as("embedding"))
    val withNull = corpus
      .unionByName(
        Seq((999L, null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
      .unionByName(withNullElem)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0),
        Option(r.getSeq[java.lang.Float](1)).map(_.toList))).toMap
    val litP = rows(Similarity.rotateVectorsPrepared(withNull, coefs))
    val ker = rows(Similarity.rotateVectorsKernel(withNull, coefs))
    assert(ker === litP)
    assert(litP(999L).get.forall(_ == null), "null vector → all-null coords")
    assert(litP(998L).get.forall(_ == null), "null element → all-null coords")
  }

  test("allocation guards: more components than coordinates is rejected") {
    val e = intercept[IllegalArgumentException] {
      Similarity.rotateVectors(corpus, rot, allocate = Some((2, 2)))
    }
    assert(e.getMessage.contains("allocate"))
  }
}
