package graft

import graft.streaming.IncrementalIndex
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IncrementalIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AvailableNow runs process only new files; re-runs are no-ops") {
    val base = java.nio.file.Files.createTempDirectory("graft_incr")
    val landing = base.resolve("landing").toString
    val sink = base.resolve("postings").toString
    val ckpt = base.resolve("ckpt").toString

    val docs = Tables(spark, TestSpark.sfDir, "documents").select("doc_id", "text")
    docs.write.parquet(landing)
    IncrementalIndex.updatePostings(spark, landing, sink, ckpt)
    val afterFirst = spark.read.parquet(sink).count()
    assert(afterFirst > 0)

    // second run, nothing new -> no growth
    IncrementalIndex.updatePostings(spark, landing, sink, ckpt)
    assert(spark.read.parquet(sink).count() === afterFirst)

    // land a new file (id-shifted copy) -> only its postings are appended
    docs.withColumn("doc_id", col("doc_id") + 100000)
      .write.mode("append").parquet(landing)
    IncrementalIndex.updatePostings(spark, landing, sink, ckpt)
    val afterThird = spark.read.parquet(sink)
    assert(afterThird.count() === 2 * afterFirst)
    // original ids were not reprocessed (no duplicates)
    val dups = afterThird.groupBy("id", "term").count().filter(col("count") > 1).count()
    assert(dups === 0)
  }

  test("incremental refresh loop: streaming sink -> fitted index -> identical scores") {
    import graft.operators.Lexical
    val base = java.nio.file.Files.createTempDirectory("graft_incr_loop")
    val landing = base.resolve("landing").toString
    val sink = base.resolve("postings").toString
    val ckpt = base.resolve("ckpt").toString
    import spark.implicits._
    val b1 = Seq((1L, "spark join table"), (2L, "join scan")).toDF("doc_id", "text")
    val b2 = Seq((3L, "table spark spark")).toDF("doc_id", "text")

    // two maintenance runs land two batches into the postings sink
    b1.write.mode("append").parquet(landing)
    IncrementalIndex.updatePostings(spark, landing, sink, ckpt)
    b2.write.mode("append").parquet(landing)
    IncrementalIndex.updatePostings(spark, landing, sink, ckpt)

    // refresh the fitted index FROM THE SINK (no raw text touched) and
    // search: scores must equal a from-scratch build over the full corpus
    val allDocs = b1.unionByName(b2)
    val fromSink = Lexical.writeIndexFromPostings(spark,
      spark.read.parquet(sink).drop("batch_id"), nDocs = allDocs.count(),
      s"$base/idx_sink", buckets = 2)
    val fromDocs = Lexical.writeIndex(spark, allDocs, "doc_id", "text",
      s"$base/idx_docs", buckets = 2)
    def scores(idx: Lexical.SparseIndex) =
      Lexical.tfidfSearchIndexed(spark, idx, Seq("spark", "join"))
        .collect().map(r => r.getLong(0) -> math.rint(r.getDouble(1) * 1e9)).toMap
    assert(scores(fromSink) === scores(fromDocs))
    assert(scores(fromSink).keySet === Set(1L, 2L, 3L))
  }
}
