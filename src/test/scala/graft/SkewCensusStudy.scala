package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Wall-clock companion to SkewCensusSpec (VERDICT r8 #4): times
  * `duplicateSpans` on the hot-shingle fixture — one boilerplate shingle
  * hash carrying half the corpus — WITH and WITHOUT AQE's skew-join,
  * production-scale thresholds (256 MB trip point scaled to the fixture's
  * shuffle bytes like the spec). The split's benefit is the measured gap;
  * results recorded in BASELINE.md ("census-join skew stress").
  *
  * Run: `sbt "Test/runMain graft.SkewCensusStudy [nDocs] [runLen]"`. */
object SkewCensusStudy {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toInt).getOrElse(40000)
    val runLen = if (args.length > 1) args(1).toInt else 100
    def session(skew: Boolean) = {
      val s = TestSpark.spark.newSession()
      s.conf.set("spark.sql.shuffle.partitions", "32")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", skew.toString)
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
      s
    }
    def fixture(s: org.apache.spark.sql.SparkSession) = {
      val boiler = Seq.fill(runLen)("lorem").mkString(" ")
      s.range(nDocs).select(col("id"),
        when(col("id") % 2 === 0,
          concat_ws(" ",
            expr("array_join(transform(sequence(1, 5), j -> concat('u', id, 'x', j)), ' ')"),
            lit(boiler)))
          .otherwise(
            expr("array_join(transform(sequence(1, 5), j -> concat('u', id, 'x', j)), ' ')"))
          .as("text"))
    }
    def run(skew: Boolean): (Double, Long, Boolean) = {
      val s = session(skew)
      val spans = Dedup.duplicateSpans(fixture(s), "id", "text", k = 5)
      spans.count() // warm
      val t0 = System.nanoTime()
      // count() on the SAME DataFrame whose queryExecution we inspect:
      // the AQE final plan (with its skew annotations) only exists on an
      // EXECUTED QueryExecution — a write would execute a different one
      val n = spans.collect().length.toLong
      val sec = (System.nanoTime() - t0) / 1e9
      (sec, n, spans.queryExecution.executedPlan.toString.contains("skew=true"))
    }
    val hot = (nDocs / 2) * (runLen - 4).toLong
    println(s"fixture: $nDocs docs, hot shingle carries $hot instances (half the corpus)")
    val (tOff, nOff, _) = run(skew = false)
    val (tOn, nOn, split) = run(skew = true)
    require(nOff == nOn, s"answers diverged: $nOff vs $nOn")
    println(f"skewJoin OFF: $tOff%7.2f s   (hot key in ONE task)")
    println(f"skewJoin ON : $tOn%7.2f s   (split=$split)  speedup ${tOff / tOn}%.2fx")
    TestSpark.spark.stop()
  }
}
