package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Range (radius) search: the flat scan is ground truth; the cell-pruned
  * form must equal it at EVERY threshold because its skip rule is a bound,
  * not a heuristic — `dot(q, x) <= dot(q, mu_c) + ||q|| * r_c`
  * (Cauchy-Schwarz, no normalization assumption). */
class RangeSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def fixtures = {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val cents = Similarity.centroids(emb)
      .select(col("label").cast("int").as("cluster"), col("cv"))
    val cells = Similarity.assignCells(emb, cents)
    val radii = Similarity.cellRadii(cells, cents)
    (emb, cents, cells, radii)
  }

  test("pruned range search == flat range search at every threshold") {
    val (emb, cents, cells, radii) = fixtures
    val qv = emb.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    for (tau <- Seq(0.05, 0.25, 0.5, 0.9, 1.5)) {
      val flat = rows(Similarity.rangeSearch(cells, qv, tau))
      val pruned = rows(
        Similarity.ivfRangeSearchPruned(cells, cents, radii, qv, tau))
      assert(pruned === flat, s"pruned != flat at minScore=$tau")
    }
    // a reachable threshold returns the probe row itself (self-score is
    // the max) — the comparison above is not vacuous
    val some = rows(Similarity.rangeSearch(cells, qv, 0.05))
    assert(some.nonEmpty && some.head._1 === 7L)
  }

  test("the Cauchy-Schwarz bound dominates every cell's true max score") {
    val (emb, cents, cells, radii) = fixtures
    val qv = emb.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    val perCellMax = cells.filter(col("cluster").isNotNull)
      .crossJoin(broadcast(qv))
      .groupBy(col("cluster"))
      .agg(max(graft.functions.VectorOps.dot(col("embedding"), col("qv")))
        .as("truemax"))
    val ub = cents
      .join(radii, Seq("cluster"))
      .crossJoin(broadcast(qv))
      .select(col("cluster"),
        (graft.functions.VectorOps.dot(col("cv"), col("qv")) +
          sqrt(graft.functions.VectorOps.dot(col("qv"), col("qv"))) *
            col("radius")).as("ub"))
    val bad = perCellMax.join(ub, Seq("cluster"))
      .filter(col("truemax") > col("ub") + lit(1e-6))
      .collect()
    assert(bad.isEmpty,
      s"UB violated in cells: ${bad.map(_.getAs[Number]("cluster")).mkString(",")}")
  }

  test("a grown store invalidates build-time radii; delta max-merge restores the bound") {
    import graft.streaming.IncrementalIndex
    val (emb, cents, _, _) = fixtures
    val base = java.nio.file.Files.createTempDirectory("graft_radii_inc")
    val landing = base.resolve("landing")
    java.nio.file.Files.createDirectories(landing)
    def land(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft_radii_tmp")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, landing.resolve(name))
    }
    def ingest(): Unit = IncrementalIndex.updateDenseIndex(spark,
      landing.toString, s"$base/cells", s"$base/ckpt", cents,
      radiiDir = Some(s"$base/radii"))
    // batch 0: the original corpus; its per-cell radii are exactly what a
    // build-time artifact would hold
    land(emb, "b0.parquet")
    ingest()
    val staleRadii = Similarity.cellRadii(
      Similarity.assignCells(emb, cents), cents)
    // batch 1: an OUTLIER far outside every existing cell radius (the same
    // direction as a real row, 8x the length)
    val outlier = emb.filter(col("vec_id") === 3)
      .withColumn("vec_id", col("vec_id") + 1000000L)
      .withColumn("embedding",
        transform(col("embedding"), x => (x * lit(8.0f)).cast("float")))
    land(outlier, "b1.parquet")
    ingest()
    val store = spark.read.parquet(s"$base/cells")
    val qv = outlier.select(col("embedding").as("qv"))
    val self = Similarity.rangeSearch(store, qv, minScore = 0.0)
      .filter(col("vec_id") === 1000003L).head.getDouble(1)
    val tau = self - 1e-3
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.getLong(0)).toSeq
    val flat = ids(Similarity.rangeSearch(store, qv, tau))
    assert(flat.contains(1000003L), "flat scan must see the landed outlier")
    // the bug class this leg exists to prevent: build-time radii
    // under-estimate the grown cell, the bound wrongly skips it, the hit
    // VANISHES — not a slow plan, a wrong answer
    val stalePruned = ids(Similarity.ivfRangeSearchPruned(
      store, cents, staleRadii, qv, tau))
    assert(!stalePruned.contains(1000003L),
      "geometry too tame: the stale bound did not skip the outlier's cell " +
        "(grow the outlier scale so the regression stays meaningful)")
    // delta-merged radii restore exactness...
    val live = IncrementalIndex.loadRadii(spark, s"$base/radii")
    assert(ids(Similarity.ivfRangeSearchPruned(store, cents, live, qv, tau))
      === flat)
    // ...and compaction preserves the merged view exactly
    IncrementalIndex.compactRadii(spark, s"$base/radii")
    val compacted = IncrementalIndex.loadRadii(spark, s"$base/radii")
    assert(ids(Similarity.ivfRangeSearchPruned(store, cents, compacted, qv, tau))
      === flat)
    assert(new java.io.File(s"$base/radii").listFiles()
      .count(f => f.isDirectory && f.getName.startsWith("batch_id=")) === 1,
      "compaction should fold the per-batch radii deltas into one epoch")
  }

  test("a high threshold skips cells: the pruned scan reads fewer partitions") {
    val (emb, cents, cells, radii) = fixtures
    val base = java.nio.file.Files.createTempDirectory("graft_range")
    val dir = base.resolve("cells").toString
    graft.sources.Store.writePartitioned(cells, dir, "cluster")
    val store = spark.read.parquet(dir)
    val qv = emb.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
    // derive a threshold from the measured UB spread so that AT LEAST ONE
    // cell is skipped by construction: any tau strictly above the smallest
    // cell UB (plus the serving slack) excludes that cell
    val ubs = cents.join(radii, Seq("cluster")).crossJoin(broadcast(qv))
      .select((graft.functions.VectorOps.dot(col("cv"), col("qv")) +
        sqrt(graft.functions.VectorOps.dot(col("qv"), col("qv"))) *
          col("radius")).as("ub"))
      .collect().map(_.getDouble(0)).sorted
    assert(ubs.distinct.length > 1, "degenerate geometry: all cell UBs equal")
    val slack = 0.5 * math.pow(10, -4) + 1e-6
    val tau = ubs.head + slack + 1e-4
    val pruned = Similarity.ivfRangeSearchPruned(store, cents, radii, qv, tau)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cluster"),
      s"pruned range scan lost its partition filter:\n$plan")
    // correctness is unchanged over the partitioned store...
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rows(pruned) === rows(Similarity.rangeSearch(cells, qv, tau)))
    // ...and the skip rule actually bites
    val passing = ubs.count(_ >= tau - slack)
    assert(passing < ubs.length,
      s"UB pruning never skipped a cell ($passing of ${ubs.length} pass at tau=$tau)")
  }
}
