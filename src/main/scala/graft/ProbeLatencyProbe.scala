package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Within-run A/B for the r14 driver-cached coarse probe
  * ([[Similarity.CentroidCache]] vs [[Similarity.probeCells]]): the
  * serving facade's per-request probe was a full Spark job (centroid
  * parquet scan + cross join + collect); the cache ranks in-process.
  * Ambient machine noise between bench runs can mask or fake a win at
  * the endpoint-mix level, so this measures BOTH forms in ONE process on
  * the SAME index, interleaved — plus parity of every returned list.
  *
  * Run: `java -cp classes:spark-jars graft.ProbeLatencyProbe [sfDir]
  * [nlist] [requests]`. */
object ProbeLatencyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nlist = args.lift(1).map(_.toInt).getOrElse(46)
    val n = args.lift(2).map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val work = java.nio.file.Files.createTempDirectory("graft_probe_ab").toString
    val cents = Similarity.kmeansFit(emb, k = nlist, iters = 1)
    cents.coalesce(1).write.mode("overwrite").parquet(s"$work/centroids")
    cents.unpersist()
    val centArt = spark.read.parquet(s"$work/centroids")
    val qvs = emb.limit(n).select(col("embedding")).collect()
      .map(_.getSeq[Float](0).toArray)

    // warm both paths once (scan caching, codegen, JIT)
    val cache = new Similarity.CentroidCache(centArt)
    val qDf0 = spark.range(1).select(lit(qvs(0)).as("qv"))
    Similarity.probeCells(centArt, qDf0, 4)
    cache.probe(qvs(0), 4)

    // interleaved A/B: ambient drift hits both arms equally
    var tJob = 0L; var tCache = 0L
    var i = 0
    while (i < n) {
      val qv = qvs(i % qvs.length)
      val qDf = spark.range(1).select(lit(qv).as("qv"))
      val t0 = System.nanoTime()
      val viaJob = Similarity.probeCells(centArt, qDf, 4)
      val t1 = System.nanoTime()
      val viaCache = cache.probe(qv, 4)
      val t2 = System.nanoTime()
      require(viaJob == viaCache, s"parity broke at request $i")
      tJob += t1 - t0; tCache += t2 - t1
      i += 1
    }
    println(f"probeCells (Spark job): ${tJob / 1e6 / n}%.2f ms/request")
    println(f"CentroidCache.probe   : ${tCache / 1e6 / n}%.3f ms/request")
    println(f"ratio: ${tJob.toDouble / tCache}%.0fx  (n=$n, nlist=$nlist, parity checked every request)")
    spark.stop()
  }
}
