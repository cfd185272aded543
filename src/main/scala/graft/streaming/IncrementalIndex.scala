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
  * seen and `foreachBatch` writes their derived index rows (postings here;
  * embeddings/shot tables follow the same shape) to the sink. Re-running
  * with nothing new is a no-op — source bookkeeping lives in the checkpoint
  * instead of ad-hoc filesystem existence checks.
  *
  * Sink semantics: `foreachBatch` is AT-LEAST-ONCE (a crash after a write
  * but before the checkpoint commit replays the batch on restart), so every
  * sink write here is an idempotent dynamic-partition OVERWRITE of the
  * batch's own `batch_id=` partition — a replay rewrites the same partition
  * with the same rows instead of appending duplicates. Effective semantics:
  * exactly-once per landed file.
  *
  * Scale notes: per-batch work is an ordinary batch plan (tokenize ->
  * map-side-combined groupBy), so a backfill over 100 TB is just a big
  * first batch; `maxFilesPerTrigger` bounds incremental batch size.
  */
object IncrementalIndex {

  /** Idempotent per-batch sink write: dynamic partition overwrite of this
    * batch's `batch_id=` partition only. */
  private def writeBatchPartition(df: DataFrame, batchId: Long, dir: String): Unit =
    df.withColumn("batch_id", org.apache.spark.sql.functions.lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(dir)

  /** Filesystem-agnostic existence check (file:, hdfs:, s3a:, ...) — a
    * `java.io.File` test would silently report "absent" for any non-local
    * URI and drop all new-vs-old candidate pairs. */
  private def pathExists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** One maintenance run: ingest new document files from `landingDir`,
    * write their postings `(id, term, tf)` to `sinkDir` (one `batch_id=`
    * partition per batch). Blocks until the AvailableNow run finishes. The
    * accumulated sink is a postings relation:
    * [[graft.operators.Lexical.writeIndexFromPostings]] refreshes the full
    * fitted sparse index from it without re-tokenizing any text. */
  def updatePostings(
      spark: SparkSession,
      landingDir: String,
      sinkDir: String,
      checkpointDir: String): Unit = {
    val schema = spark.read.parquet(landingDir).schema
    val src = spark.readStream.schema(schema).parquet(landingDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        writeBatchPartition(
          Lexical.postings(batch, "doc_id", "text"), batchId, sinkDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Incremental DENSE index maintenance: new embedding rows land, each
    * batch is assigned to its nearest IVF cell against the broadcast
    * centroid table ([[graft.operators.Similarity.knnJoin]] k=1 — one scan,
    * no shuffle of the batch), and written cell-PARTITIONED (plus the
    * per-batch `batch_id=` idempotence partition), so an [[graft.operators.
    * Similarity.ivfSearch]]-style probe over the accumulated store prunes
    * to the probed cells' directories. The dense analog of
    * [[updatePostings]]: the reference re-runs its CLIP notebook over new
    * videos and re-merges `.npy` files; here arrival-to-searchable is one
    * checkpointed micro-batch.
    *
    * When `codebooks`+`codesDir` are given, each batch is ALSO PQ-encoded
    * against the (frozen, broadcast) codebooks and its codes land
    * cell-partitioned under `codesDir` with the same delete-then-append
    * batch-subtree idempotence — the PQ serving artifact
    * ([[graft.operators.Similarity.ivfPqSearchPruned]] reads it) stays in
    * lockstep with the cells table instead of going stale as rows arrive.
    * Codebooks are train-once artifacts like the centroids (FAISS retrains
    * neither on `add()`); refitting either is an offline rebuild, not a
    * maintenance step. */
  def updateDenseIndex(
      spark: SparkSession,
      landingDir: String,
      sinkDir: String,
      checkpointDir: String,
      centroids: org.apache.spark.sql.DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      codebooks: Option[DataFrame] = None,
      codesDir: Option[String] = None,
      numSub: Int = 8,
      subDim: Int = 8): Unit = {
    import org.apache.spark.sql.functions._
    val seeds = centroids.select(col("label").as("seed_id"), col("cv").as("sv"))
    val schema = spark.read.parquet(landingDir).schema
    val src = spark.readStream.schema(schema).parquet(landingDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // the cell column gets its own name — landed rows may already
        // carry a label column of their own
        val assigned = graft.operators.Similarity
          .knnJoin(batch.select(col(idCol), col(vecCol)), seeds, k = 1,
            idCol = idCol, vecCol = vecCol)
          .select(col(idCol), col("seed_id").as("ivf_cell"))
        // replay idempotence: cell assignment may DIFFER on replay (the
        // caller can pass refit centroids after a crash), so dynamic
        // overwrite of only the (batch, cell) partitions produced THIS
        // time would leave the crashed attempt's other-cell partitions
        // alive. Drop the whole batch subtree first, then append — the
        // batch_id outer partition makes that one directory delete.
        val batchPath = new org.apache.hadoop.fs.Path(s"$sinkDir/batch_id=$batchId")
        batchPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(batchPath, true)
        batch.join(assigned, Seq(idCol))
          .withColumn("batch_id", lit(batchId))
          .write.mode("append")
          .partitionBy("batch_id", "ivf_cell")
          .parquet(sinkDir)
        for (cb <- codebooks; cd <- codesDir) {
          val codesBatchPath = new org.apache.hadoop.fs.Path(s"$cd/batch_id=$batchId")
          codesBatchPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(codesBatchPath, true)
          graft.operators.Similarity
            .pqEncode(batch.select(col(idCol), col(vecCol)).join(assigned, Seq(idCol)),
              cb, numSub, subDim, idCol, vecCol, carry = Seq("ivf_cell"))
            .withColumn("batch_id", lit(batchId))
            .write.mode("append")
            .partitionBy("batch_id", "ivf_cell")
            .parquet(cd)
        }
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
    * writes verified pairs, and then writes the new docs' buckets/shingles
    * to the index — all as idempotent per-batch partitions. Steady-state
    * cost per run is O(new docs) + the candidate joins — the streaming form
    * of [[graft.operators.Dedup.minhashLshPairs]]. */
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
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        import graft.operators.Dedup
        // raw shingles, SAME hash family as the batch operator: the
        // streaming path finds exactly the pairs minhashLshPairs would —
        // online and offline dedup stay mutually auditable
        val sh = Dedup.shingles(batch, "doc_id", "text").persist()
        val bk = Dedup.minhashBuckets(sh, 16, 2).persist()
        // stored/joined shingles are 8-byte hashes, like the batch
        // operator's verification join
        val shh = sh.select(col("id"), Dedup.hash60(col("s")).as("hv"))
        // BOTH state dirs must exist: a crash between the buckets and
        // shingles writes of the very first batch leaves only one — that
        // partial state must read as "no index yet" or the replay would
        // fail on the missing directory forever
        val haveOld = pathExists(spark, bucketsDir) && pathExists(spark, shinglesDir)
        // candidates: new-vs-old (against the accumulated index) and
        // new-vs-new (within this batch). CRITICAL replay guard: a crashed
        // attempt of THIS batch may have already written its own
        // partitions — they must not read back as "old" state, or a replay
        // double-counts every new-doc shingle (sizes and intersections
        // skew, wrongly admitting/excluding pairs near the threshold).
        // The read itself is guarded too: a zero-row first batch (no
        // >=3-token docs) leaves a _SUCCESS-only directory whose
        // schema-less read throws — that state is equally "no index yet",
        // not a reason to wedge every later run.
        def oldState(dir: String, empty: DataFrame): DataFrame =
          if (!haveOld) empty
          else
            try spark.read.parquet(dir)
              .filter(col("batch_id") =!= batchId).drop("batch_id")
            catch {
              case _: org.apache.spark.sql.AnalysisException => empty
            }
        val oldBk = oldState(bucketsDir, bk.limit(0))
        val oldSh = oldState(shinglesDir, shh.limit(0))
        // keep only pairs touching >=1 NEW doc (old-vs-old already emitted
        // by an earlier batch): two broadcast equi-joins add new-side
        // markers and an OR filter — one pass over the candidates, never a
        // nested-loop join (an OR-of-equalities join condition would plan
        // as BroadcastNestedLoopJoin)
        val newIds = bk.select(col("id")).distinct()
        val cands = Dedup.lshCandidates(bk.unionByName(oldBk))
          .join(broadcast(newIds.select(col("id").as("i"), lit(1).as("__ni"))),
            Seq("i"), "left")
          .join(broadcast(newIds.select(col("id").as("j"), lit(1).as("__nj"))),
            Seq("j"), "left")
          .filter(col("__ni").isNotNull || col("__nj").isNotNull)
          .drop("__ni", "__nj")
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
        writeBatchPartition(verified, batchId, pairsDir)
        writeBatchPartition(bk, batchId, bucketsDir)
        writeBatchPartition(shh, batchId, shinglesDir)
        sh.unpersist(); bk.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
