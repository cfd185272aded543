package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe for the `canonicalIds` fast path: times the
  * dedup_components-shaped pipeline (minhash-LSH pairs → components)
  * with the driver-local union-find vs the distributed loop, alternating
  * in ONE warm session, min of 3 each. Run:
  * `java -cp classes:spark-jars graft.CcProbe [sfDir]`. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count() // warm scan
    def pairs = Dedup.minhashLshPairs(docs, "doc_id", "text")
      .select(col("i"), col("j"))
    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once
    Dedup.canonicalIds(pairs).count()
    Dedup.canonicalIds(pairs, maxLocalEdges = 0).count()
    val pairsOnly = (1 to 3).map(_ => time(pairs.count())).min
    val local = (1 to 3).map(_ =>
      time(Dedup.canonicalIds(pairs).count())).min
    val dist = (1 to 3).map(_ =>
      time(Dedup.canonicalIds(pairs, maxLocalEdges = 0).count())).min
    println(f"pairs pipeline alone:     $pairsOnly%6.2f s")
    println(f"local union-find path:    $local%6.2f s")
    println(f"distributed loop path:    $dist%6.2f s")
    spark.stop()
  }
}
