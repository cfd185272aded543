package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Driver-bound probe for the coarse stage at BIG-nlist geometry
  * (VERDICT r14 #3): the flat [[Similarity.CentroidCache]] holds the
  * full nlist x d centroid table driver-side — the documented ceiling
  * of the serving design (~126k rows at N=10^9, ~4 GB at N=10^11).
  * This probe measures, at nlist = 10^5 x d=768 (the 4*sqrt(N) rule's
  * output at N ~ 6*10^8 — past every committed geometry so far):
  *
  *  - flat: centroid collect + in-process rank per probe (what
  *    [[graft.api.SearchEngine]] serves today), with its driver bytes;
  *  - two-level ([[Similarity.buildCoarseHierarchy]]): the sqrt(nlist)
  *    level-1 table driver-side, level-2 as a PartitionFilters-pruned
  *    scan — the IMI shape that keeps the driver sqrt-bounded at any N.
  *
  * The expected reading is NOT that two-level is faster at 10^5 (a
  * local[32] scan of 10^5 rows is milliseconds either way): it is that
  * the flat path's driver footprint grows linearly in nlist while the
  * two-level path's grows as sqrt(nlist) — the probe prints both
  * footprints next to both latencies so BASELINE.md can carry the
  * crossover as a measured row instead of an estimate.
  *
  * Run: `java -cp classes:spark-jars graft.CoarseProbe [nlist] [d]`. */
object CoarseProbe {
  def main(args: Array[String]): Unit = {
    val nlist = args.headOption.map(_.toInt).getOrElse(100000)
    val d = args.lift(1).map(_.toInt).getOrElse(768)
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
    val out = java.nio.file.Files.createTempDirectory("graft_coarse_probe").toString

    // synthetic centroid table: deterministic pseudo-random directions
    // (xxhash-mixed), the shape a kmeansFit over a ~6*10^8-row corpus
    // would persist
    spark.range(nlist).select(col("id").cast("int").as("cluster"),
      expr(s"transform(sequence(0, ${d - 1}), j -> " +
        "cast(pmod(xxhash64(id * 7919 + j), 2000) / 1000.0 - 1.0 as float))")
        .as("cv"))
      .write.mode("overwrite").parquet(s"$out/centroids")
    val centArt = spark.read.parquet(s"$out/centroids")
    val qv = Array.tabulate(d)(j => (((j * 2654435761L) % 2000) / 1000.0f) - 1.0f)

    // ---- flat: the CentroidCache path (collect nlist x d to the driver)
    val (cache, tBuild) = time { new Similarity.CentroidCache(centArt) }
    val flatBytes = nlist.toLong * d * 4
    val (_, tWarm) = time { cache.probe(qv, 64) }
    val (flatProbe, tFlat) = time { cache.probe(qv, 64) }
    println(f"flat CentroidCache: nlist=$nlist x d=$d, driver ~" +
      f"${flatBytes / 1e6}%.0f MB, build ${tBuild}%.1f s, " +
      f"probe ${tFlat * 1000}%.2f ms (warm ${tWarm * 1000}%.2f ms)")

    // ---- two-level: sqrt(nlist) driver rows + a pruned distributed scan
    val (_, tHier) = time { Similarity.buildCoarseHierarchy(centArt, out) }
    val l1 = spark.read.parquet(s"$out/l1")
    val l2 = spark.read.parquet(s"$out/l2")
    val g = l1.count().toInt
    val l1Bytes = g.toLong * d * 4
    val qDf = spark.range(1).select(typedLit(qv.toSeq).cast("array<float>").as("qv"))
    val (_, tWarm2) = time {
      Similarity.probeCellsTwoLevel(l1, l2, qDf, nprobeL1 = 8, nprobe = 64)
    }
    val (twoProbe, tTwo) = time {
      Similarity.probeCellsTwoLevel(l1, l2, qDf, nprobeL1 = 8, nprobe = 64)
    }
    println(f"two-level (IMI analog): groups=$g (driver ~" +
      f"${l1Bytes / 1e6}%.1f MB), hierarchy build ${tHier}%.1f s, " +
      f"probe ${tTwo * 1000}%.0f ms at nprobeL1=8 (warm ${tWarm2 * 1000}%.0f ms)")

    // ---- coverage at partial level-1 probe: how much of the flat
    // probe's cell list the 8-group probe retains (the IMI trade).
    // NOTE: on THIS corpus the number is a floor, not an estimate — the
    // synthetic centroids are uniform random directions, so the group
    // structure carries no signal and nearest-group pruning is blind.
    // Real coarse centroids are themselves clustered (they are k-means
    // centers of clustered data), which is what the real-centroid leg
    // below measures when GRAFT_PROBE_ROOT points at a built index.
    val flatSet = flatProbe.toSet
    val overlap = twoProbe.count(flatSet.contains).toDouble / flatProbe.size
    println(f"coverage (synthetic uniform centroids — adversarial floor): " +
      f"two-level@nprobeL1=8 retains ${overlap * 100}%.0f%% of the flat " +
      f"top-64 cells; full-l1 parity is spec-pinned (CoarseHierarchySpec)")

    // ---- real-centroid coverage: the same measurement over a TRAINED
    // centroid artifact (the flagship's nlist=4000 k-means centers) and
    // real query vectors — the geometry two-level probing would actually
    // serve
    sys.env.get("GRAFT_PROBE_ROOT").foreach { root =>
      val cent = spark.read.parquet(s"$root/index/centroids")
      val nl = cent.count().toInt
      val out2 = java.nio.file.Files.createTempDirectory("graft_coarse_real").toString
      val (_, tH) = time { Similarity.buildCoarseHierarchy(cent, out2) }
      val l1r = spark.read.parquet(s"$out2/l1")
      val l2r = spark.read.parquet(s"$out2/l2")
      val g2 = l1r.count().toInt
      val np = scala.util.Try(spark.read.parquet(s"$root/index/params")
        .head.getAs[Int]("default_nprobe")).getOrElse(16)
      val flatCache = new Similarity.CentroidCache(cent)
      val qs = spark.read.parquet(s"$root/emb").limit(20)
        .select(col("embedding")).collect().map(_.getSeq[Float](0).toArray)
      Seq(2, 4, 8, 16).foreach { npl1 =>
        val cov = qs.map { q =>
          val flat = flatCache.probe(q, np).toSet
          val qDf = spark.range(1)
            .select(typedLit(q.toSeq).cast("array<float>").as("qv"))
          val two = Similarity.probeCellsTwoLevel(l1r, l2r, qDf, npl1, np)
          two.count(flat.contains).toDouble / flat.size
        }
        println(f"real centroids (nlist=$nl, groups=$g2, build ${tH}%.0f s): " +
          f"nprobeL1=$npl1%2d -> mean coverage of flat top-$np = " +
          f"${cov.sum / cov.length * 100}%.0f%%")
      }
    }
    spark.stop()
  }
}
