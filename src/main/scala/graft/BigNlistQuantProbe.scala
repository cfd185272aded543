package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** QUANTIZED serving at trained big-nlist geometry (VERDICT r16 #5):
  * the r16 facade leg served exact-refine FLOATS through the 84k-centroid
  * hierarchy at the calibrated pair; the 100 TB coarse tier is PQ — this
  * probe puts the ADC path through the SAME hierarchy and commits
  * recall + latency + driver-footprint rows beside the float surface.
  *
  * Build-once PQ leg under `$root/bignlist/pq` (codebooks trained on a
  * hash sample at the flagship 96x8x256 geometry, 1M rows encoded from
  * the hierarchy-assigned cell store, codes written cell-clustered so
  * the probed scan partition-prunes); serving-only re-runs reuse it.
  *
  * Reported at the calibrated (nprobeL1, nprobe) pair (re-derived with
  * [[Similarity.calibrateNprobePair]] against the 0.85@20 target — the
  * r17 joint calibrator, same exact-truth discipline as BigNlistProbe):
  *  - float two-level ([[Similarity.ivfSearchBatchPrunedTwoLevel]]) —
  *    the r16 reference row;
  *  - ADC-only through the hierarchy
  *    ([[Similarity.ivfPqSearchBatchPruned]] with `hierarchy`);
  *  - two-stage ADC + exact refine
  *    ([[Similarity.ivfPqRefineSearchBatch]] with `hierarchy`) at
  *    kCoarse = 4x k and 16x k;
  * each with recall@20 vs exact truth and batch wall. Driver footprint
  * is printed for the L1 cache vs the flat centroid table.
  *
  * Run: `GRAFT_PROBE_ROOT=<dir> java -cp classes:spark-jars
  * graft.BigNlistQuantProbe` where the root holds `emb/` and
  * `bignlist/` from a BigNlistProbe run. */
object BigNlistQuantProbe {
  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("GRAFT_PROBE_ROOT",
      sys.error("usage: GRAFT_PROBE_ROOT=<dir> BigNlistQuantProbe"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val out = s"$root/bignlist"
    val emb = spark.read.parquet(s"$root/emb")
    val cells = spark.read.parquet(s"$out/cells")
    val l1 = spark.read.parquet(s"$out/l1")
    val l2 = spark.read.parquet(s"$out/l2")
    val cents = spark.read.parquet(s"$out/centroids")
    val (numSub, subDim, numCodes) = (96, 8, 256)

    // ---- build-once PQ leg over the hierarchy-assigned store
    val doneP = new org.apache.hadoop.fs.Path(s"$out/pq/_graft_built")
    val fs = doneP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(doneP)) {
      val n = emb.count()
      // ~100k-row hash sample for the codebook fit (the build-time
      // posture: train on a sample, encode everything)
      val cut = (100000.0 / n * (1L << 60)).toLong
      val sample = emb.filter(graft.operators.Dedup.hash60(
        concat(lit("pqtrain:"), col("vec_id").cast("string"))) < lit(cut))
      val (cb, tFit) = time {
        val cb0 = Similarity.pqRefineCodebooks(sample,
          Similarity.pqCodebooks(sample, numSub, subDim, numCodes),
          numSub, subDim, iters = 1)
        cb0.coalesce(1).write.mode("overwrite")
          .option("compression", "zstd").parquet(s"$out/pq/codebooks")
        cb0.unpersist()
        spark.read.parquet(s"$out/pq/codebooks")
      }
      val (_, tEnc) = time {
        graft.sources.Store.writeClustered(
          Similarity.pqEncode(cells, cb, numSub, subDim,
            carry = Seq("cluster")),
          s"$out/pq/codes", "cluster")
      }
      println(f"PQ leg build: codebook fit ${tFit}%.0f s, " +
        f"encode+write 1M rows ${tEnc}%.0f s")
      fs.create(doneP, true).close()
    }
    val codebooks = spark.read.parquet(s"$out/pq/codebooks")
    val codes = spark.read.parquet(s"$out/pq/codes")

    // ---- exact truth (shared by calibration and every serving row)
    val k = 20
    val queries = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .persist()
    queries.count()
    val (exact, tExact) = time {
      Similarity.calibrationTruth(emb, queries, k)
    }
    println(f"exact truth: ${tExact}%.0f s")
    def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
      val got = rows.map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, ids) =>
        ids.intersect(got.getOrElse(q, Set.empty)).size.toDouble / ids.size
      }.sum / exact.size
    }

    // ---- the calibrated pair (r17 joint calibrator, 0.85@20 target)
    val (pair, tCal) = time {
      Similarity.calibrateNprobePair(cells, l1, l2, queries, k, 0.85,
        emb.count(), truth = Some(exact))
    }
    val (npL1, np) = pair
    val groups = l1.count().toInt
    val nlist = cents.count()
    println(f"joint calibrateNprobePair(0.85@$k): (nprobeL1=$npL1 of " +
      f"$groups, nprobe=$np of $nlist) in ${tCal}%.0f s")
    println(f"driver coarse state: L1 ${groups * 768 * 4 / 1e6}%.1f MB " +
      f"vs flat ${nlist * 768L * 4 / 1e6}%.0f MB")

    val hier = Some((l1, l2))
    // float reference row (the r16 surface's serving shape)
    val (fRows, tF) = time {
      Similarity.ivfSearchBatchPrunedTwoLevel(
        cells, l1, l2, queries, npL1, np, k).collect()
    }
    println(f"float two-level      (npL1=$npL1, np=$np): " +
      f"recall@$k ${recallOf(fRows)}%.3f, ${tF}%.1f s/batch")
    // ADC-only through the hierarchy
    val (aRows, tA) = time {
      Similarity.ivfPqSearchBatchPruned(codes, codebooks, cents, queries,
        np, k, numSub, subDim, hierarchy = hier,
        nprobeL1 = Some(npL1)).collect()
    }
    println(f"ADC through hierarchy (npL1=$npL1, np=$np): " +
      f"recall@$k ${recallOf(aRows)}%.3f, ${tA}%.1f s/batch")
    // two-stage ADC + exact refine at two shortlist depths
    for (kc <- Seq(4 * k, 16 * k)) {
      val (rRows, tR) = time {
        Similarity.ivfPqRefineSearchBatch(cells, codes, codebooks, cents,
          queries, np, kc, k, numSub, subDim, hierarchy = hier,
          nprobeL1 = Some(npL1)).collect()
      }
      println(f"ADC+refine kC=$kc%4d  (npL1=$npL1, np=$np): " +
        f"recall@$k ${recallOf(rRows)}%.3f, ${tR}%.1f s/batch")
    }
    spark.stop()
  }
}
