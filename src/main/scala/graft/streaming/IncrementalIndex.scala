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

  /** INCREMENTAL NEAR-DUP DETECTION: each maintenance run MinHash-bands
    * only the NEW documents, joins their band buckets against the
    * accumulated bucket table (old text is never re-shingled), verifies
    * candidates by exact Jaccard against the accumulated shingle table,
    * appends verified pairs, and then appends the new docs'
    * buckets/shingles to the index. Steady-state cost per run is
    * O(new docs) + the candidate joins — the streaming form of
    * [[graft.operators.Dedup.minhashLshPairs]], with the checkpoint
    * guaranteeing each landed file is banded exactly once. */
  def updateDedup(
      spark: SparkSession,
      landingDir: String,
      indexDir: String,
      checkpointDir: String,
      threshold: Double = 0.5): Unit = {
    import org.apache.spark.sql.functions._
    val bucketsDir = s"$indexDir/buckets"
    val shinglesDir = s"$indexDir/shingles"
    val pairsDir = s"$indexDir/pairs"
    val schema = spark.read.parquet(landingDir).schema
    val src = spark.readStream.schema(schema).parquet(landingDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        import graft.operators.Dedup
        // raw shingles, SAME hash family as the batch operator: the
        // streaming path finds exactly the pairs minhashLshPairs would —
        // online and offline dedup stay mutually auditable
        val sh = Dedup.shingles(batch, "doc_id", "text").persist()
        val bk = Dedup.minhashBuckets(sh, 16, 2).persist()
        // stored/joined shingles are 8-byte hashes, like the batch
        // operator's verification join
        val shh = sh.select(col("id"), Dedup.hash60(col("s")).as("hv"))
        val haveOld = new java.io.File(bucketsDir).exists()
        // candidates: new-vs-old (against the accumulated index) and
        // new-vs-new (within this batch)
        val oldBk = if (haveOld) spark.read.parquet(bucketsDir) else bk.limit(0)
        val oldSh = if (haveOld) spark.read.parquet(shinglesDir) else shh.limit(0)
        val cands = Dedup.lshCandidates(bk.unionByName(oldBk))
          // keep only pairs touching >=1 NEW doc: old-vs-old already emitted
          .join(bk.select(col("id")).distinct()
              .select(col("id").as("__new")).withColumn("__m", lit(1)),
            col("i") === col("__new") || col("j") === col("__new"), "left_semi")
        val allSh = shh.unionByName(oldSh)
        val sizes = allSh.groupBy(col("id")).agg(count(lit(1)).as("n"))
        val verified = cands
          .join(allSh.select(col("id").as("i"), col("hv")), Seq("i"))
          .join(allSh.select(col("id").as("j"), col("hv")), Seq("j", "hv"))
          .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter"))
          .join(sizes.select(col("id").as("i"), col("n").as("ni")), Seq("i"))
          .join(sizes.select(col("id").as("j"), col("n").as("nj")), Seq("j"))
          .select(col("i"), col("j"),
            (col("inter").cast("double") / (col("ni") + col("nj") - col("inter"))).as("jaccard"))
          .filter(col("jaccard") >= threshold)
        verified.write.mode("append").parquet(pairsDir)
        bk.write.mode("append").parquet(bucketsDir)
        shh.write.mode("append").parquet(shinglesDir)
        sh.unpersist(); bk.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
