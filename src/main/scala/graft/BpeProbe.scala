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
    // FLATNESS CHECK for the lineage-truncated fallback (VERDICT r10 #2):
    // marginal s/merge on successive ranges. Without localCheckpoint each
    // merge replans the whole prefix, so the marginal cost GROWS with the
    // merge index; with truncation the later segment should cost the same
    // per merge as the earlier one.
    val (_, t50) = time {
      Lexical.bpeFitDistributed(docs, "doc_id", "text", 50).collect()
    }
    val (_, t200) = time {
      Lexical.bpeFitDistributed(docs, "doc_id", "text", 200).collect()
    }
    val (_, tFull) = time {
      Lexical.bpeFitDistributed(docs, "doc_id", "text", numMerges).collect()
    }
    println(f"BPE probe ($sfDir, vocab=$nVocab distinct words)")
    println(f"local fit, $numMerges merges:      ${tLocal}%8.1f s " +
      f"(${localRules.length} rules emitted)")
    println(f"distributed fit, 50 merges:   ${t50}%8.1f s (${t50 / 50}%.3f s/merge)")
    println(f"distributed fit, 200 merges:  ${t200}%8.1f s (${t200 / 200}%.3f s/merge; " +
      f"marginal 50->200: ${(t200 - t50) / 150}%.3f s/merge)")
    println(f"distributed fit, $numMerges merges: ${tFull}%8.1f s " +
      f"(${tFull / numMerges}%.3f s/merge; " +
      f"marginal 200->$numMerges: ${(tFull - t200) / (numMerges - 200)}%.3f s/merge)")
    spark.stop()
  }
}
