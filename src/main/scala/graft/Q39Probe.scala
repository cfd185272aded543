package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for `q39_semdedup_e2e` (VERDICT r10 #4: the
  * largest r9→r10 bench mover, 2.76 → 3.87 s). The query composes four
  * stages — blocked cosine pairing, pointer-doubling components, cell
  * assignment, keeper election — and this prints each stage's time plus
  * the pair/component counts that drive them, so a bench-level drift
  * can be attributed to a stage (plan regression) or to the regenerated
  * corpus's pair structure (data). Run:
  * `java -cp classes:spark-jars graft.Q39Probe [sfDir]`. */
object Q39Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); a
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"q39 stage probe ($sfDir, ${emb.count()} rows)")
    val idx = SparkEntry.DenseArtifacts.ivf(spark, sfDir)
    val pairs = time("cosinePairsBlocked") {
      val p = Dedup.cosinePairsBlocked(emb, idx.centroids,
        "vec_id", "embedding", threshold = 0.45, probes = 1)
        .persist()
      println(s"    pairs = ${p.count()}")
      p
    }
    val comps = time("canonicalIds") {
      val c = Dedup.canonicalIds(pairs.select(col("i"), col("j")))
      println(s"    labeled nodes = ${c.count()}, " +
        s"components = ${c.select(col("keep_id")).distinct().count()}")
      c
    }
    val csim = time("assignCells+score") {
      val assigned = Similarity.assignCells(emb, idx.centroids)
      val s = assigned.join(idx.centroids, Seq("cluster"))
        .select(col("vec_id").as("id"),
          round(lit(-1.0) * graft.functions.VectorOps.dot(
            col("embedding"), col("cv")), 6).as("score"))
      s.count(); s
    }
    time("keepBest")(Dedup.keepBest(comps, csim).count())
    pairs.unpersist()
    spark.stop()
  }
}
