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
}
