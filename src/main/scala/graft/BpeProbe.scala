package graft

import graft.operators.Lexical
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** BPE trainer economics probe (VERDICT r9 #3): the distributed merge
  * loop schedules one aggregate + one map per merge over the vocabulary
  * relation's growing lineage — fine at spec-scale merges, ~64k
  * sequential jobs at a production 32k-merge vocabulary. The driver-local
  * loop ([[Lexical.bpeFit]]) collects the word-frequency table once and
  * iterates in memory. This prints the measured fit time at a
  * production-shaped merge count, plus the distributed form at a small
  * count for the per-merge job cost. Run:
  * `java -cp classes:spark-jars graft.BpeProbe [sfDir] [numMerges]`. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(1000)
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
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val nVocab = Lexical.tokens(docs, "doc_id", "text")
      .select(col("term")).distinct().count()
    val (localRules, tLocal) = time {
      Lexical.bpeFit(docs, "doc_id", "text", numMerges).collect()
    }
    val smallMerges = 25
    val (_, tDist) = time {
      Lexical.bpeFitDistributed(docs, "doc_id", "text", smallMerges).collect()
    }
    println(f"BPE probe ($sfDir, vocab=$nVocab distinct words)")
    println(f"local fit, $numMerges merges:      ${tLocal}%8.1f s " +
      f"(${localRules.length} rules emitted)")
    println(f"distributed fit, $smallMerges merges: ${tDist}%8.1f s " +
      f"(${tDist / smallMerges}%.2f s/merge -> ${tDist / smallMerges * numMerges}%.0f s " +
      f"extrapolated at $numMerges)")
    spark.stop()
  }
}
