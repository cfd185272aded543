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

  test("streaming classifier gate equals the batch rule; dedup state spans micro-batches") {
    import graft.operators.{Curation, Dedup, TextAnalysis}
    val docs = Tables(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("text"))
    val model = TextAnalysis.nbQualityFit(
      docs.withColumn("trusted", col("lang") === "en"), "doc_id", "text", "trusted")
    // exact text copies under fresh ids land in a LATER micro-batch: each
    // copy gets its own Pareto dice (id-keyed), but the emitted
    // (content_hash, p_trusted) row must appear exactly once
    val corpus = docs.unionByName(
      docs.withColumn("doc_id", col("doc_id") + 100000L))
    val want = Curation.classifierResample(
        TextAnalysis.nbQualityScore(corpus, model, "doc_id", "text")
          .withColumn("p_trusted",
            round(lit(1.0) / (lit(1.0) + exp(-col("nb_score"))), 6)),
        "id", "p_trusted")
      .filter(col("kept") === 1)
      .join(corpus.select(col("doc_id").as("id"), col("text")), Seq("id"))
      .select(Dedup.hash60(col("text")).as("content_hash"), col("p_trusted"))
      .distinct()
      .orderBy("content_hash")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(want.nonEmpty)
    val stage = java.nio.file.Files.createTempDirectory("graft_scg_spec")
    val parts = Seq(
      docs.filter(col("doc_id") < 250),
      docs.filter(col("doc_id") >= 250),
      docs.withColumn("doc_id", col("doc_id") + 100000L))
    parts.zipWithIndex.foreach { case (df, i) =>
      val tmp = java.nio.file.Files.createTempDirectory(s"graft_scg_tmp$i")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = new java.io.File(tmp.toString).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(part.toPath, stage.resolve(s"b$i.parquet"))
    }
    val got = graft.streaming.CurationStreaming
      .classifierGateLanding(spark, stage.toString, model)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got === want)
  }

  test("streaming web-filter equals the batch composition; dedup state spans micro-batches") {
    import graft.operators.{Dedup, TextAnalysis}
    import org.apache.spark.sql.DataFrame
    val docs = Tables(spark, TestSpark.sfDir, "documents")
      .select(col("doc_id"), col("text"))
    // %5 docs share a constant body -> ONE cleaned-text hash whose members
    // land in BOTH files, so suppressing the later copies needs state
    val synth: DataFrame => DataFrame = df => df.select(col("doc_id").as("id"),
      concat_ws("\n",
        when(col("doc_id") % 5 === 0,
          lit(("the shared body of common and repeated words here now " * 6).trim + "."))
          .otherwise(concat(col("text"), lit("."))),
        lit("And that will be the good second line."),
        lit("And the third good line is here.")).as("text"))
    def batch(df: DataFrame) = {
      val c4 = TextAnalysis.c4Clean(synth(df), "id", "text")
        .filter(col("keep_doc")).select(col("id"), col("text_clean"))
      TextAnalysis.gopherRules(c4, "id", "text_clean", carryText = true)
        .filter(col("keep"))
        .select(Dedup.hash60(col("text_clean")).as("content_hash"), col("n_words"))
        .distinct()
    }
    val want = batch(docs).orderBy("content_hash")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(want.nonEmpty)
    val stage = java.nio.file.Files.createTempDirectory("graft_swf_spec")
    Seq(docs.filter(col("doc_id") < 250), docs.filter(col("doc_id") >= 250))
      .zipWithIndex.foreach { case (df, i) =>
        val tmp = java.nio.file.Files.createTempDirectory(s"graft_swf_tmp$i")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val part = new java.io.File(tmp.toString).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        java.nio.file.Files.move(part.toPath, stage.resolve(s"b$i.parquet"))
      }
    val got = graft.streaming.CurationStreaming
      .webfilterLanding(spark, stage.toString, synth)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === want)
  }
}
