package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** COLD-CACHE coarse-tier probe (VERDICT r15 #5: "decide the binary
  * family's default — either a measured IO-bound scenario where 1-bit
  * wins wall, or demote the store to opt-in"): warm-cache serving put
  * the 1-bit and SQ8 two-stage paths at wall PARITY at equal recall
  * (16.5 vs 17.6 s, BASELINE.md r15) because a 32-thread local scan of
  * a page-cached 0.77 GB byte store costs about the same as a 0.10 GB
  * signature store — memory bandwidth is not the bottleneck at this
  * geometry. The 1-bit family's claimed edge is IO: at 8x less coarse
  * bytes, a COLD read (page cache dropped — first query after a
  * restart, or a corpus larger than RAM) should favor it by the byte
  * ratio. This probe measures exactly that, against the persisted
  * flagship store:
  *
  *  1. equal-recall knobs: the binary side serves its CALIBRATED
  *     `default_kcoarse_bq`; the SQ8 side sweeps kCoarse up from k
  *     until it matches (the r15 adjudication protocol, warm);
  *  2. per family x {cold, warm}: drop the page cache (`sync; echo 3 >
  *     /proc/sys/vm/drop_caches` — the probe runs as root in this
  *     container), run the two-stage 20-query batch once, then again
  *     warm. The cells store (float refine) is read by BOTH paths, so
  *     the cold delta isolates the coarse tier's IO.
  *
  * Prints one JSON line per leg; the decision row goes to BASELINE.md.
  *
  * Run: `GRAFT_PROBE_ROOT=<dir> java -cp classes:spark-jars
  * graft.ColdCoarseProbe [kCoarseSq8]` (the optional arg skips the
  * warm equal-recall sweep when the value is already known). */
object ColdCoarseProbe {
  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("GRAFT_PROBE_ROOT",
      sys.error("usage: GRAFT_PROBE_ROOT=<dir> ColdCoarseProbe"))
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
    def dropCaches(): Unit = {
      val rc = new ProcessBuilder("sh", "-c",
        "sync && echo 3 > /proc/sys/vm/drop_caches").inheritIO().start().waitFor()
      require(rc == 0, "cannot drop the page cache — cold legs would lie")
    }
    def dirBytes(p: String): Long = {
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.getContentSummary(path).getLength
    }

    val cells = spark.read.parquet(s"$root/index/cells")
    val centroids = spark.read.parquet(s"$root/index/centroids")
    val bin = spark.read.parquet(s"$root/index/bin")
    val int8 = spark.read.parquet(s"$root/index/int8")
    val params = spark.read.parquet(s"$root/index/params").head
    val np = params.getAs[Int]("default_nprobe")
    // null-safe like IvfPqServeProbe: an uncalibrated store carries NULL
    // and getAs[Int] would silently unbox it to 0 (killing the probe on
    // require(kCoarse >= k) instead of a clear diagnostic)
    val kcIdx = params.fieldIndex("default_kcoarse_bq")
    require(!params.isNullAt(kcIdx),
      "the store has no calibrated default_kcoarse_bq — build with " +
        "calibrateRecall before running the cold-coarse comparison")
    val kcBq = params.getInt(kcIdx)
    val k = 20
    val emb = spark.read.parquet(s"$root/emb")
    val queries = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .persist()
    queries.count()

    def recallOf(rows: Array[org.apache.spark.sql.Row],
        exact: Map[Long, Set[Long]]): Double = {
      val got = rows.map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      exact.map { case (q, ids) =>
        ids.intersect(got.getOrElse(q, Set.empty)).size.toDouble / ids.size
      }.sum / exact.size
    }

    def bq() = Similarity.ivfBinaryRefineSearchBatch(
      bin, cells, centroids, queries, np, kcBq, k).collect()
    def sq(kc: Int) = Similarity.ivfInt8RefineSearchBatch(
      int8, cells, centroids, queries, np, kc, k).collect()

    // ---- equal-recall SQ8 kCoarse (warm; the r15 protocol)
    val kcSq = args.headOption.map(_.toInt).getOrElse {
      val exact = Similarity.knnBatch(emb, queries, k).collect()
        .map(r => r.getLong(0) -> r.getLong(1))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val target = recallOf(bq(), exact)
      println(f"binary calibrated (nprobe=$np, kCoarse=$kcBq): recall@$k $target%.3f")
      var kc = k
      while (recallOf(sq(kc), exact) < target) kc = math.min(kc * 2, 1 << 22)
      println(s"SQ8 equal-recall kCoarse=$kc")
      kc
    }

    // warm both paths once (codegen + plan cache; the cells store will be
    // re-dropped before each cold leg anyway)
    bq(); sq(kcSq)

    val binBytes = dirBytes(s"$root/index/bin")
    val i8Bytes = dirBytes(s"$root/index/int8")
    val legs = Seq(
      ("binary", () => bq(), kcBq, binBytes),
      ("sq8", () => sq(kcSq), kcSq, i8Bytes))
    val rows = legs.map { case (name, run, kc, bytes) =>
      dropCaches()
      val (_, tCold) = time(run())
      val (_, tWarm) = time(run())
      f""""$name":{"kcoarse":$kc,"coarse_store_mb":${bytes / 1e6}%.0f,""" +
        f""""cold_sec":$tCold%.2f,"warm_sec":$tWarm%.2f}"""
    }
    println(s"""{"metric":"cold_coarse","nprobe":$np,"queries":$k,""" +
      rows.mkString(",") + "}")
    spark.stop()
  }
}
