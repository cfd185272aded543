package graft

import graft.operators.Similarity
import graft.streaming.IncrementalIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Hierarchy maintenance under RETRAIN at big-nlist (VERDICT r16 #6):
  * the drift-gate → retrain → republish loop is spec-pinned at small
  * geometry, but a retrain at the 84k-centroid tier re-encodes the
  * whole store — this probe runs ONE self-healing cycle at that
  * geometry and times every phase, with a concurrent reader asserting
  * serving continuity through `CURRENT` for the entire swap.
  *
  * Phases (fresh `$root/retrain` tree each run; the bignlist corpus,
  * centroids and hierarchy come from the BigNlistProbe artifacts):
  *  1. bootstrap — first maintenance run lands a 100k-row batch,
  *     publishing v=0 WITH the hierarchy (the r17 landing path assigns
  *     through l1/l2, so this also measures the hierarchical landing
  *     assign at nlist=84k);
  *  2. drift — a +10-shifted 50k batch lands in the landing dir and the
  *     versioned loop must gate it, retrain PQ over store+landing,
  *     atomically publish v=1 (hierarchy republished in the subtree),
  *     and land the batch on replay;
  *  3. continuity — a reader thread polls every 2 s during phase 2:
  *     resolve `currentVersion` + `currentHierarchy` + `currentCodebooks`
  *     and run a two-level probe against the version's artifacts; ANY
  *     failure or mixed-version read fails the probe.
  *
  * Run: `GRAFT_PROBE_ROOT=<dir> java -cp classes:spark-jars
  * graft.BigNlistRetrainProbe` (root holds `emb/` + `bignlist/`). */
object BigNlistRetrainProbe {
  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("GRAFT_PROBE_ROOT",
      sys.error("usage: GRAFT_PROBE_ROOT=<dir> BigNlistRetrainProbe"))
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
    val emb = spark.read.parquet(s"$root/emb")
    val cents = spark.read.parquet(s"$root/bignlist/centroids")
    val base = s"$root/retrain"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(base), true)
    val landing = s"$base/landing"
    val sink = s"$base/store"
    val ckpt = s"$base/ckpt"
    val indexRoot = s"$base/index"
    val nlist = cents.count()

    // ---- phase 1: bootstrap v=0 from a ~100k-row landing batch.
    // Batch selection is modulo-based: flagship vec_ids are the 2000 base
    // ids plus replica offsets of r*10^7, so a `< 100000` range filter
    // would catch only the base replica — pmod slices uniformly.
    val batch1 = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
    val n1 = batch1.count()
    batch1.write.mode("append").parquet(landing)
    val (_, tBoot) = time {
      IncrementalIndex.updateDenseIndexVersioned(spark, landing, sink, ckpt,
        cents, indexRoot, numSub = 96, subDim = 8, coarseHierarchy = true)
    }
    require(IncrementalIndex.currentVersion(spark, indexRoot) == Some(0L),
      "bootstrap did not publish v=0")
    require(IncrementalIndex.currentHierarchy(spark, indexRoot).isDefined,
      "bootstrap version carries no hierarchy")
    val landed0 = spark.read.parquet(sink).count()
    require(landed0 == n1, s"store has $landed0 rows, expected $n1")
    println(f"phase 1 bootstrap ($n1 rows, nlist=$nlist, hierarchical " +
      f"landing assign): ${tBoot}%.0f s, v=0 published")

    // ---- continuity reader: poll CURRENT during the retrain swap
    @volatile var stop = false
    @volatile var readerFailure: Option[Throwable] = None
    var reads = 0
    val reader = new Thread(() => {
      val qDf = emb.filter(col("vec_id") === 0)
        .select(col("embedding").as("qv"))
      while (!stop && readerFailure.isEmpty) {
        try {
          val v = IncrementalIndex.currentVersion(spark, indexRoot).get
          val (l1v, l2v) = IncrementalIndex.currentHierarchy(spark, indexRoot).get
          val (cbv, dist, vCb, _) = IncrementalIndex.currentCodebooks(spark, indexRoot)
          require(vCb == v, s"mixed-version read: hierarchy v=$v codebooks v=$vCb")
          require(dist > 0 && cbv.count() > 0)
          val probedCells = Similarity.probeCellsTwoLevel(l1v, l2v, qDf,
            nprobeL1 = 4, nprobe = 16)
          require(probedCells.nonEmpty, "two-level probe returned no cells")
          reads += 1
        } catch { case t: Throwable => readerFailure = Some(t) }
        Thread.sleep(2000)
      }
    })
    reader.setDaemon(true)
    reader.start()

    // ---- phase 2: drifted ~50k batch -> gate -> retrain -> v=1 -> replay
    val batch2 = emb.filter(pmod(col("vec_id"), lit(20)) === 1)
      .withColumn("embedding", expr("transform(embedding, x -> x + 10.0f)"))
    val n2 = batch2.count()
    batch2.write.mode("append").parquet(landing)
    val (_, tCycle) = time {
      IncrementalIndex.updateDenseIndexVersioned(spark, landing, sink, ckpt,
        cents, indexRoot, numSub = 96, subDim = 8, coarseHierarchy = true)
    }
    stop = true
    reader.join(5000)
    readerFailure.foreach(t => throw new IllegalStateException(
      "serving continuity BROKE during the retrain swap", t))
    val v1 = IncrementalIndex.currentVersion(spark, indexRoot)
    require(v1 == Some(1L), s"expected v=1 after the drift cycle, got $v1")
    val landed1 = spark.read.parquet(sink).count()
    require(landed1 == n1 + n2, s"store has $landed1 rows, expected ${n1 + n2}")
    // the republished hierarchy keeps full-L1 parity with the flat probe
    val (l1v, l2v) = IncrementalIndex.currentHierarchy(spark, indexRoot).get
    val qDf = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val parity = Similarity.probeCellsTwoLevel(l1v, l2v, qDf,
        l1v.count().toInt, 8) ==
      Similarity.probeCells(cents, qDf, 8)
    println(f"phase 2 drift cycle (gate + retrain ${n1 + n2} rows at 96x8 + " +
      f"atomic v=1 + replay): ${tCycle}%.0f s; mid-swap reader: $reads " +
      f"successful CURRENT reads, 0 failures; post-swap full-L1 parity: " +
      f"$parity")
    require(parity, "republished hierarchy lost flat parity")
    spark.stop()
  }
}
