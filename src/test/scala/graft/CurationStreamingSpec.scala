package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming curation front-end: gates/sample before state, stateful exact
  * dedup ACROSS micro-batches, result equals the batch pipeline. */
class CurationStreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming curation equals the batch pipeline; dedup state spans micro-batches") {
    import graft.operators.{Curation, Dedup}
    val docs = Tables(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    // plant EXACT text duplicates under fresh ids: the copy lands in a
    // LATER micro-batch than the original, so suppressing it requires the
    // dedup state to survive across batches
    val corpus = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 100000L))
    def batchPipeline(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("n_chars") >= 150)
      .filter(Curation.sampleKey(col("doc_id"), "scur") < 6000)
      .select(Dedup.hash60(col("text")).as("content_hash"),
        size(expr("regexp_extract_all(lower(text), '\\\\w+', 0)"))
          .cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 20)
      .distinct()
    val want = batchPipeline(corpus)
      .orderBy("content_hash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(want.nonEmpty)
    // copies alone admit FEWER distinct hashes than the union (some copies
    // are sampled where their originals are not, and vice versa) — so the
    // planted dup case is non-vacuous
    val copiesOnly = batchPipeline(
      docs.withColumn("doc_id", col("doc_id") + 100000L)).count()
    assert(copiesOnly < want.length)
    // stage three landing files: two ranges of originals, then the copies
    val stage = java.nio.file.Files.createTempDirectory("graft_scur_spec")
    val parts = Seq(
      docs.filter(col("doc_id") < 250),
      docs.filter(col("doc_id") >= 250),
      docs.withColumn("doc_id", col("doc_id") + 100000L))
    parts.zipWithIndex.foreach { case (df, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_scur_tmp$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, stage.resolve(s"b$i.parquet"))
    }
    val got = graft.streaming.CurationStreaming.curateLanding(spark, stage.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
  }
}
