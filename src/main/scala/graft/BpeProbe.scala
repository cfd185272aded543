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

  /** Peak heap across all HEAP MemoryPoolMXBeans — exact (JVM-maintained
    * high-water marks, no sampling); reset before each measured fit. */
  private def heapPools = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
  }
  private def resetPeaks(): Unit = heapPools.foreach(_.resetPeakUsage())
  private def peakMb: Long =
    heapPools.map(_.getPeakUsage.getUsed).sum / (1024L * 1024L)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val numMerges = args.lift(1).map(_.toInt).getOrElse(1000)
    val mode = args.lift(2).getOrElse("quick")
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

    // PRODUCTION 32k-MERGE RUN (VERDICT r11 #5): the sf documents use a
    // ~31-type synthetic vocabulary (~138 total mergeable pairs), so a
    // 32k-merge fit on them would just measure early exhaustion. This
    // mode synthesizes a production-SHAPED vocabulary — 8 deterministic
    // 8-char hex words per doc (md5-derived; ~40k distinct types at
    // sf0.1's 5000 docs, ~360k mergeable pair mass) — and runs the
    // selected fit form(s) at the full merge count, reporting wall time,
    // rules actually emitted (no silent exhaustion), and exact peak heap.
    // `full` runs both; `full-local` / `full-dist` run one (the
    // distributed form is ~2 jobs/merge ≈ hours at 32k merges, so it is
    // launched as its own detached run).
    if (mode.startsWith("full")) {
      val synth = docs.select(col("doc_id"),
        concat_ws(" ", (1 to 8).map(i =>
          substring(md5(concat(col("text"), lit(s":$i"),
            col("doc_id").cast("string"))), 1, 8)): _*).as("text"))
        .persist()
      val nTypes = Lexical.tokens(synth, "doc_id", "text")
        .select(col("term")).distinct().count()
      println(s"BPE production probe ($sfDir, synthetic vocab=$nTypes types, " +
        s"$numMerges merges, mode=$mode)")
      if (mode != "full-dist" && mode != "full-naive" && mode != "full-seg") {
        resetPeaks()
        val (localRules, tL) = time {
          Lexical.bpeFit(synth, "doc_id", "text", numMerges).collect()
        }
        val pkL = peakMb
        println(f"local fit (incremental): ${tL}%8.1f s, ${localRules.length} " +
          f"rules emitted, peak heap ${pkL} MB")
      }
      // the recount-everything twin, at the same merge count — the A/B
      // against the incremental engine (same collected vocabulary)
      if (mode == "full-naive") {
        val vocabRows = Lexical.bpeVocab(synth, "doc_id", "text").collect()
          .map(r => (r.getString(0), r.getLong(1)))
        resetPeaks()
        val (naiveRules, tN) = time {
          Lexical.bpeMergeLocalNaive(vocabRows, numMerges)
        }
        val pkN = peakMb
        println(f"local fit (naive):       ${tN}%8.1f s, ${naiveRules.length} " +
          f"rules emitted, peak heap ${pkN} MB")
      }
      // SEGMENT at the production artifact: apply the full numMerges-rule
      // table to every document via the replay kernel (the fold form dies
      // ~100 rules — measured: analyzer StackOverflow), plus the 32-rule
      // fold for the per-rule cost reference
      if (mode == "full-seg") {
        val rules = Lexical.bpeFit(synth, "doc_id", "text", numMerges)
          .orderBy(col("step")).collect().map(_.getAs[String]("pair"))
        println(s"segment probe: ${rules.length}-rule artifact")
        resetPeaks()
        val (nSub, tR) = time {
          Lexical.bpeSegmentReplay(synth, rules, "doc_id", "text")
            .agg(sum(col("n_subwords"))).collect().head.getLong(0)
        }
        println(f"segment replay, ${rules.length} rules: ${tR}%8.1f s, " +
          f"total subwords $nSub, peak heap ${peakMb} MB")
        val r32 = rules.take(32)
        val (nSub32f, tF32) = time {
          Lexical.bpeSegmentFolded(synth, r32, "doc_id", "text")
            .agg(sum(col("n_subwords"))).collect().head.getLong(0)
        }
        val (nSub32r, tR32) = time {
          Lexical.bpeSegmentReplay(synth, r32, "doc_id", "text")
            .agg(sum(col("n_subwords"))).collect().head.getLong(0)
        }
        println(f"segment at 32 rules: fold ${tF32}%6.1f s / replay ${tR32}%6.1f s" +
          f" (subwords fold=$nSub32f replay=$nSub32r${
            if (nSub32f == nSub32r) ", EQUAL" else ", MISMATCH"})")
      }
      if (mode != "full-local" && mode != "full-naive" && mode != "full-seg") {
        resetPeaks()
        val (distRules, tD) = time {
          Lexical.bpeFitDistributed(synth, "doc_id", "text", numMerges).collect()
        }
        val pkD = peakMb
        println(f"distributed fit: ${tD}%8.1f s (${tD / numMerges}%.3f s/merge), " +
          f"${distRules.length} rules emitted, peak heap ${pkD} MB")
      }
      synth.unpersist()
      spark.stop()
      return
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
