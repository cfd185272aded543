package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Joint-pair calibration wall + regression pin on the PERSISTED 1M
  * big-nlist store (VERDICT r17 #5): the r18 calibrator resolves each
  * rung's nprobe search driver-side from one thresholded candidate scan
  * — this probe re-derives the (nprobeL1, nprobe) pair on the SAME
  * store and truth discipline as the r17 run (RECALL.md: (8, 42) at
  * 0.850@20 in 1,199 s) so the chosen pair pins the rewrite and the
  * wall measures the discipline.
  *
  * Run: `GRAFT_PROBE_ROOT=<dir> java -cp classes:spark-jars
  * graft.PairCalProbe` (root holds `emb/` + `bignlist/`). */
object PairCalProbe {
  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("GRAFT_PROBE_ROOT",
      sys.error("usage: GRAFT_PROBE_ROOT=<dir> PairCalProbe"))
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
    val k = 20
    val queries = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .persist()
    queries.count()
    val (exact, tExact) = time { Similarity.calibrationTruth(emb, queries, k) }
    println(f"exact truth: ${tExact}%.0f s")
    val n = emb.count()
    val (pair, tCal) = time {
      Similarity.calibrateNprobePair(cells, l1, l2, queries, k, 0.85,
        n, truth = Some(exact))
    }
    println(f"joint calibrateNprobePair(0.85@$k) on the 1M store: " +
      f"(nprobeL1=${pair._1}, nprobe=${pair._2}) in ${tCal}%.0f s " +
      "(r17 reference: (8, 42) in 1,199 s)")
    spark.stop()
  }
}
