package graft.streaming

import graft.operators.Lexical
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** Incremental index maintenance: the Spark-native replacement for the
  * reference's skip-if-output-exists extraction loops (`clip.ipynb` cell 7,
  * `metadata/ocr.ipynb` cell 6, `audio_regconition.ipynb` cell 1).
  *
  * A file-source streaming query watches the landing directory; each
  * `Trigger.AvailableNow` run processes ONLY files the checkpoint hasn't
  * seen and `foreachBatch` appends their derived index rows (postings here;
  * embeddings/shot tables follow the same shape) to the sink. Re-running
  * with nothing new is a no-op — exactly-once bookkeeping lives in the
  * checkpoint instead of ad-hoc filesystem existence checks.
  *
  * Scale notes: per-batch work is an ordinary batch plan (tokenize ->
  * map-side-combined groupBy), so a backfill over 100 TB is just a big
  * first batch; `maxFilesPerTrigger` bounds incremental batch size.
  */
object IncrementalIndex {

  /** One maintenance run: ingest new document files from `landingDir`,
    * append their postings `(id, term, tf)` to `sinkDir`. Blocks until the
    * AvailableNow run finishes. */
  def updatePostings(
      spark: SparkSession,
      landingDir: String,
      sinkDir: String,
      checkpointDir: String): Unit = {
    val schema = spark.read.parquet(landingDir).schema
    val src = spark.readStream.schema(schema).parquet(landingDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        Lexical.postings(batch, "doc_id", "text")
          .write.mode("append").parquet(sinkDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
