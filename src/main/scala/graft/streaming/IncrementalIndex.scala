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
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        // single-file landing => single partition: spread the map-heavy
        // tokenize before the postings aggregate (same fix as the dense
        // landing path, r13)
        val batch = batch0.repartition(spark.sparkContext.defaultParallelism)
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
    * centroid table ([[graft.operators.Similarity.knnJoin]] k=1 at
    * oracle-scale centroid counts; the
    * [[graft.operators.Similarity.assignCellsBulk]] primitive-loop kernel
    * past 64 cells — identical argmax, parity-pinned), and written
    * cell-PARTITIONED (plus the
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
    * maintenance step.
    *
    * DRIFT GATE (`trainDistortion` + `driftTolerance`): because batches
    * encode against FROZEN codebooks, a shifting input distribution
    * silently degrades ADC recall — the codes stay valid, they just
    * quantize badly. When `trainDistortion` (the corpus's mean squared
    * quantization error at TRAINING time,
    * [[graft.operators.Similarity.quantizationDistortion]] over the
    * training corpus — persist it next to the codebooks) is supplied, each
    * batch's own distortion is measured BEFORE anything is written; a batch
    * whose distortion exceeds `driftTolerance x trainDistortion` fails the
    * run with the measured ratio. Nothing lands (the batch never commits,
    * so a later run after retraining replays it cleanly) — the documented
    * retrain trigger: rebuild codebooks (and codes) offline, recompute
    * `trainDistortion`, re-run maintenance. A stable-distribution batch
    * measures ~1x training distortion and passes untouched. */
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
      subDim: Int = 8,
      trainDistortion: Option[Double] = None,
      driftTolerance: Double = 1.5,
      centroidIdCol: String = "cluster",
      cellCol: String = "cluster",
      statsCols: Seq[String] = Seq.empty,
      statsDir: Option[String] = None,
      radiiDir: Option[String] = None,
      rotation: Option[DataFrame] = None,
      int8Dir: Option[String] = None,
      binDir: Option[String] = None,
      hierarchy: Option[(DataFrame, DataFrame)] = None): Unit = {
    import org.apache.spark.sql.functions._
    // half-specifying the PQ leg would SILENTLY skip it and leave the codes
    // artifact stale — the exact staleness this maintenance job exists to
    // prevent — so a caller typo must fail fast, not no-op
    require(codebooks.isDefined == codesDir.isDefined,
      s"codebooks and codesDir must be supplied together " +
        s"(got codebooks=${codebooks.isDefined}, codesDir=${codesDir.isDefined})")
    require(trainDistortion.isEmpty || codebooks.isDefined,
      "trainDistortion given without codebooks — there is nothing to gate")
    // an OPQ-rotated index's codebooks live in the ROTATED coordinates
    // ([[graft.operators.Similarity.buildDenseIndex]] opqRotateIters /
    // [[retrainAndSwap]] rotation): encoding a raw batch against them
    // would land garbage codes — and the drift gate would scream about a
    // distribution shift that is actually a basis mismatch. Passing the
    // index's rotation artifact routes the batch through the SAME
    // allocated rotation before both the gate and the encode; the landed
    // CELLS store stays raw (IVF geometry is unrotated by design).
    require(rotation.isEmpty || codebooks.isDefined,
      "rotation given without codebooks — only the PQ leg encodes in the " +
        "rotated basis")
    // same fail-fast for the histogram leg: a stale cellstats artifact
    // makes the adaptive probe planner silently mis-size probes
    require(statsCols.isEmpty == statsDir.isEmpty,
      s"statsCols and statsDir must be supplied together " +
        s"(got statsCols=${statsCols.nonEmpty}, statsDir=${statsDir.isDefined})")
    // centroidIdCol/cellCol default to "cluster" — the exact layout
    // [[graft.operators.Similarity.buildDenseIndex]] persists and every
    // pruned serving path reads — so build-time artifacts feed this job and
    // the incremental store serves WITHOUT renames; labeled-seed callers
    // override both (e.g. "label"/"ivf_cell")
    val seeds = centroids.select(col(centroidIdCol).as("seed_id"), col("cv").as("sv"))
    // a pre-existing sink's layout overrides the cellCol param: landing new
    // batches under a DIFFERENT partition column than the accumulated
    // store's would split the layout and fail every later merged read
    // ("ivf_cell" was the pre-round-7 default — see [[detectCellCol]])
    val cc = resolveCellCol(spark, sinkDir, cellCol)
    val ccCodes = codesDir.map(cd => resolveCellCol(spark, cd, cc))
    // assignment-dispatch size, computed ONCE (the centroid relation is
    // stable across micro-batches): at oracle-scale centroid counts the
    // packed knnJoin stays (the CTE-expressible form the incremental
    // oracles and IncrementalIndexSpec unroll); past 64 the per-row
    // interpreted k-struct sort is the same IVF-scale bottleneck
    // buildDenseIndex dispatched away in round 12, so the bulk kernel
    // assigns instead (identical argmax: simRound=4 HALF_UP, ties to the
    // lowest id — IncrementalIndexSpec pins the parity at 100 centroids).
    val nSeeds = centroids.count()
    // the bulk kernel narrows centroid ids to Int (its broadcast matrix is
    // (Int, Array[Float])-keyed): a labeled-seed caller passing long ids
    // beyond Int range would silently WRAP under cast("int") and land rows
    // in aliased cells — fail fast once, before any batch commits
    if (nSeeds > 64) {
      val b = centroids.agg(
        min(col(centroidIdCol).cast("long")).as("lo"),
        max(col(centroidIdCol).cast("long")).as("hi")).head()
      if (!b.isNullAt(0))
        require(b.getLong(0) >= Int.MinValue && b.getLong(1) <= Int.MaxValue,
          s"centroid ids [${b.getLong(0)}, ${b.getLong(1)}] exceed Int range " +
            "— the >64-centroid bulk assignment kernel keys its broadcast " +
            "matrix by Int and cast(\"int\") would silently wrap them")
    }
    val schema = spark.read.parquet(landingDir).schema
    val src = spark.readStream.schema(schema).parquet(landingDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: org.apache.spark.sql.DataFrame, batchId: Long) =>
        // a landing batch usually arrives as ONE parquet file => ONE
        // partition, and every leg below would then run its whole compute
        // on a single core (the r13 maintenance probe measured a 10k-row
        // landing against a 4000-cell index at 312 s for exactly this
        // reason). Spread it once; every narrow stage inherits the
        // parallelism. Values are untouched — assignment and encodes are
        // per-row.
        val batch = batch0.repartition(spark.sparkContext.defaultParallelism)
        // the PQ-side view of the batch: rotated when the index is
        // OPQ-rotated, the raw vectors otherwise
        def pqBatch = rotation.fold(batch.select(col(idCol), col(vecCol)))(rot =>
          graft.operators.Similarity.rotateVectors(
            batch.select(col(idCol), col(vecCol)), rot, idCol, vecCol,
            allocate = Some((numSub, subDim))))
        // drift gate FIRST — before any write, so a drifted batch fails the
        // run without committing and replays cleanly after a retrain
        for (cb <- codebooks; trained <- trainDistortion) {
          val d = graft.operators.Similarity.quantizationDistortion(
            pqBatch, cb, numSub, subDim, idCol, vecCol)
          if (d > trained * driftTolerance)
            throw new IllegalStateException(
              f"codebook drift: batch $batchId distortion $d%.6f is " +
                f"${d / trained}%.2fx the training distortion $trained%.6f " +
                f"(tolerance ${driftTolerance}x) — retrain the PQ codebooks " +
                "and re-encode before ingesting this distribution")
        }
        // the cell column name is the caller's (default "cluster") — landed
        // rows may already carry a label column of their own. The
        // assignment is PERSISTED for the batch: four legs (cells, codes,
        // radii, int8) join against it, and an unpersisted plan would
        // recompute the argmax once per leg (measured 4x on the r13
        // maintenance probe). Dispatch: packed knnJoin at oracle-scale
        // centroid counts, bulk kernel past 64 — same argmax (round-4
        // HALF_UP sims, ties to the lowest id). Null-vector rows are
        // filtered BEFORE assignment on both routes: the knnJoin route
        // silently dropped them (no match) while the bulk route landed a
        // NULL-cell partition no serving path reads — one behavior now,
        // and it is the knnJoin one (an unservable vector does not land).
        val assignable = batch.select(col(idCol), col(vecCol))
          .filter(col(vecCol).isNotNull)
        // hierarchy-serving index (VERDICT r16 #3): a landed batch assigns
        // THROUGH the published l1/l2 — the same IMI-style two-stage
        // argmax the BUILD uses past HierarchyMinNlist
        // ([[graft.operators.Similarity.assignCellsHierarchical]], at this
        // path's round-4 grain) — so maintenance never pays the flat
        // argmax the hierarchy exists to avoid (~25x at nlist≈10⁵,
        // BigNlistProbe).
        val assigned = (hierarchy match {
          case Some((l1, l2)) =>
            graft.operators.Similarity
              .assignCellsHierarchical(assignable, l1, l2,
                vecCol = vecCol, clusterCol = "cluster", simRound = 4)
              .select(col(idCol), col("cluster").cast("long").as(cc))
          case None if nSeeds <= 64 =>
            graft.operators.Similarity
              .knnJoin(assignable, seeds, k = 1,
                idCol = idCol, vecCol = vecCol)
              .select(col(idCol), col("seed_id").as(cc))
          case None =>
            graft.operators.Similarity
              .assignCellsBulk(assignable,
                centroids.select(col(centroidIdCol).cast("int").as("cluster"),
                  col("cv")),
                vecCol = vecCol, clusterCol = "cluster", simRound = 4)
              .select(col(idCol), col("cluster").cast("long").as(cc))
          }).persist()
        // every leg below reads the persisted assignment: if one
        // throws, the retried micro-batch must not inherit a leaked
        // cached copy (it would accumulate in the block manager across
        // stream restarts), so unpersist sits in a finally
        try {
          // replay idempotence: cell assignment may DIFFER on replay (the
          // caller can pass refit centroids after a crash), so dynamic
          // overwrite of only the (batch, cell) partitions produced THIS
          // time would leave the crashed attempt's other-cell partitions
          // alive. Drop the whole batch subtree first, then append — the
          // batch_id outer partition makes that one directory delete.
          val batchPath = new org.apache.hadoop.fs.Path(s"$sinkDir/batch_id=$batchId")
          batchPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(batchPath, true)
          // repartition by the cell column before each cell-partitioned
          // write: a partitionBy write emits one file per (task, cell) pair,
          // so the 32-way-parallel batch would otherwise land ~tasks × cells
          // small files per batch (measured ~7k files for a 10k-row landing
          // at nlist=4000) — hashing each cell to exactly one task bounds it
          // at one file per touched cell per batch, the layout compaction
          // folds further
          batch.join(assigned, Seq(idCol))
            .withColumn("batch_id", lit(batchId))
            .repartition(col(cc))
            .write.mode("append")
            .partitionBy("batch_id", cc)
            .parquet(sinkDir)
          for (cb <- codebooks; cd <- codesDir) {
            val codesBatchPath = new org.apache.hadoop.fs.Path(s"$cd/batch_id=$batchId")
            codesBatchPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(codesBatchPath, true)
            val codesCol = ccCodes.getOrElse(cc)
            graft.operators.Similarity
              .pqEncode(pqBatch.join(assigned, Seq(idCol)),
                cb, numSub, subDim, idCol, vecCol, carry = Seq(cc))
              .withColumnRenamed(cc, codesCol)
              .withColumn("batch_id", lit(batchId))
              .repartition(col(codesCol))
              .write.mode("append")
              .partitionBy("batch_id", codesCol)
              .parquet(cd)
          }
          // per-(cell, attribute) histogram DELTA for this batch — keeps the
          // adaptive probe planner's artifact in lockstep with the landed
          // store (the build-time artifact alone goes stale the moment a
          // batch lands). Delta rows, not read-modify-write: the planner's
          // cellStatsCounts sums `cnt` per cell, so accumulated batch deltas
          // read as the exact merged histogram, and the batch_id subtree
          // delete+append keeps replay idempotence like cells/codes. The
          // artifact stays coarse-quantizer-sized (nlist x |attrs| x batches;
          // [[compactStats]] MERGES piled-up deltas back to one row per key).
          for (sd <- statsDir) {
            val statsBatchPath = new org.apache.hadoop.fs.Path(s"$sd/batch_id=$batchId")
            statsBatchPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(statsBatchPath, true)
            graft.operators.Similarity
              .cellStats(batch.join(assigned, Seq(idCol)), statsCols, cc)
              .withColumn("batch_id", lit(batchId))
              .write.mode("append")
              .partitionBy("batch_id")
              .parquet(sd)
          }
          // per-cell RADIUS delta for this batch — a landed row can lie
          // FARTHER from its centroid than the build-time radius, and a
          // too-small radius breaks [[graft.operators.Similarity
          // .ivfRangeSearchPruned]]'s skip bound (a skipped cell would hold a
          // hit: MISSED RESULTS, not just a slow plan). Max-per-cell deltas
          // restore the bound: `loadRadii`'s max-merge over batches (plus the
          // build artifact) is the true store-wide max. Deletes need no
          // compensation — removing rows only shrinks the true max, so a
          // stale-high radius stays a valid (merely conservative) bound.
          // Same batch_id delete+append replay idempotence as cells/codes.
          for (rd <- radiiDir) {
            val radiiBatchPath = new org.apache.hadoop.fs.Path(s"$rd/batch_id=$batchId")
            radiiBatchPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(radiiBatchPath, true)
            graft.operators.Similarity
              .cellRadii(batch.join(assigned, Seq(idCol)),
                centroids.select(col(centroidIdCol).as(cc), col("cv")),
                vecCol, cc)
              .withColumn("batch_id", lit(batchId))
              .write.mode("append")
              .partitionBy("batch_id")
              .parquet(rd)
          }
          // SQ8 byte-store delta — the build persists an int8 artifact
          // beside the cells ([[graft.operators.Similarity.buildDenseIndex]])
          // and [[graft.operators.Similarity.ivfInt8RefineSearch]] scans it
          // INSTEAD of the float cells, so an unmaintained int8 store goes
          // silently stale the moment a batch lands: the coarse stage would
          // rank over yesterday's corpus while the refine reads today's.
          // Encode is on the RAW vectors (SQ8 serves the raw basis — the
          // OPQ rotation concerns only the PQ codes), cell-partitioned
          // under the same batch_id replay-idempotence as cells/codes.
          for (i8d <- int8Dir) {
            val i8BatchPath = new org.apache.hadoop.fs.Path(s"$i8d/batch_id=$batchId")
            i8BatchPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(i8BatchPath, true)
            graft.operators.Similarity
              .int8EncodeCells(batch.join(assigned, Seq(idCol)), idCol, vecCol, cc)
              .withColumn("batch_id", lit(batchId))
              .repartition(col(cc))
              .write.mode("append")
              .partitionBy("batch_id", cc)
              .parquet(i8d)
          }
          // 1-bit SIGNATURE delta (VERDICT r15 #8) — the binary family's
          // coarse store goes stale exactly like int8's the moment a
          // batch lands: [[graft.operators.Similarity
          // .ivfBinaryRefineSearch]]'s Hamming stage would rank over
          // yesterday's corpus while the refine reads today's. Encode is
          // on the RAW vectors (the sign convention serves the raw
          // basis, like SQ8), same batch_id replay idempotence.
          for (bd <- binDir) {
            val binBatchPath = new org.apache.hadoop.fs.Path(s"$bd/batch_id=$batchId")
            binBatchPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
              .delete(binBatchPath, true)
            graft.operators.Similarity
              .binaryEncodeCells(batch.join(assigned, Seq(idCol)), idCol, vecCol, cc)
              .withColumn("batch_id", lit(batchId))
              .repartition(col(cc))
              .write.mode("append")
              .partitionBy("batch_id", cc)
              .parquet(bd)
          }
        } finally assigned.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** COMPACTION for the incremental cell stores: [[updateDenseIndex]] lands
    * one `batch_id=` subtree per micro-batch, so after N batches every IVF
    * cell's rows are spread over N small files and probe-pruned scans
    * degrade (N file opens + footer reads per probed cell — the classic
    * small-file problem). This maintenance job rewrites ALL existing batch
    * subtrees into ONE compacted epoch subtree (`batch_id=<negative epoch>`,
    * one file per cell: the cells are few and the write is repartitioned by
    * the cell column), preserving the `(batch_id, cellCol)` layout — and
    * therefore `PartitionFilters` pruning on the cell column — exactly.
    *
    * Crash safety (replay-safe, resumable): the compacted subtree is staged
    * under a `_`-prefixed directory (hidden from every parquet reader),
    * then a MANIFEST naming the epoch and the superseded source subtrees is
    * committed via atomic rename, and only then is the staged subtree
    * renamed in and the sources deleted. A crash BEFORE the manifest leaves
    * the store untouched (stale staging is cleared on the next run); a
    * crash AFTER the manifest is finished by [[recoverCompaction]] (also
    * run automatically at the start of every compaction), which is
    * idempotent — re-deleting already-deleted sources is a no-op, and the
    * rename-in happens at most once. Readers see either the old N subtrees
    * or (after the rename supersedes them) a brief union window that the
    * source deletes close; run compaction, like [[updateDenseIndex]]
    * itself, from the single maintenance scheduler — not concurrently with
    * ingest.
    *
    * Epochs are strictly decreasing negatives (min(existing) - 1 capped at
    * -1), so repeated compactions re-fold earlier epochs plus any new
    * batches without ever colliding with a real (non-negative) batch id. */
  def compactCells(
      spark: SparkSession,
      dir: String,
      cellCol: String = "cluster"): Unit = {
    import org.apache.spark.sql.functions._
    // the existing layout is authoritative — see [[detectCellCol]]
    val cc = resolveCellCol(spark, dir, cellCol)
    compactStore(spark, dir,
      // each cell lands whole in one task -> one file per cell
      df => df.repartition(col(cc)), Seq(cc))
  }

  /** Compaction for the [[updateDenseIndex]] cellstats DELTA store: unlike
    * the row stores, folding stats means MERGING — the accumulated
    * per-batch (cell, attrs, cnt) delta rows re-aggregate to one summed
    * histogram row per (cell, attrs), written as a single epoch subtree
    * (one file: the histogram is coarse-quantizer-sized). The planner's
    * sum-per-cell read makes pre- and post-compaction artifacts
    * indistinguishable; same staged-write + manifest + rename crash
    * protocol as [[compactCells]]. */
  def compactStats(
      spark: SparkSession,
      dir: String,
      statsCols: Seq[String],
      cellCol: String = "cluster"): Unit = {
    import org.apache.spark.sql.functions._
    require(statsCols.nonEmpty, "compactStats needs the histogram's attribute columns")
    compactStore(spark, dir,
      df => df.groupBy((cellCol +: statsCols).map(col): _*)
        .agg(sum(col("cnt")).as("cnt"))
        .coalesce(1),
      Seq.empty)
  }

  /** The SERVING view of the radii delta store: max-merge the per-batch
    * deltas (and the optional build-time `radii` artifact) to the true
    * store-wide per-cell radius — the exact bound
    * [[graft.operators.Similarity.ivfRangeSearchPruned]] needs over a
    * store that has grown since its index was built. Coarse-quantizer-
    * sized read (nlist x batches rows). */
  def loadRadii(
      spark: SparkSession,
      radiiDir: String,
      base: Option[DataFrame] = None,
      cellCol: String = "cluster"): DataFrame = {
    import org.apache.spark.sql.functions._
    val deltas = spark.read.parquet(radiiDir)
      .select(col(cellCol), col("radius"))
    base.fold(deltas)(b =>
        deltas.unionByName(b.select(col(cellCol).cast(
          deltas.schema(cellCol).dataType), col("radius"))))
      .groupBy(col(cellCol)).agg(max(col("radius")).as("radius"))
  }

  /** Compaction for the radii DELTA store: folding radii means taking the
    * per-cell MAX over the accumulated batch deltas — [[loadRadii]]'s
    * max-merge read makes pre- and post-compaction artifacts
    * indistinguishable. Same staged-write + manifest + rename crash
    * protocol as [[compactCells]]. */
  def compactRadii(
      spark: SparkSession,
      dir: String,
      cellCol: String = "cluster"): Unit = {
    import org.apache.spark.sql.functions._
    compactStore(spark, dir,
      df => df.groupBy(col(cellCol)).agg(max(col("radius")).as("radius"))
        .coalesce(1),
      Seq.empty)
  }

  /** The cell partition column a store's on-disk layout actually uses
    * (`<col>=value` subtrees, descending through `batch_id=` when present),
    * or None for an empty / unpartitioned store. MIGRATION SEAM: the
    * default cell column changed from "ivf_cell" to "cluster" (so
    * build-time artifacts feed maintenance without renames) — the
    * maintenance entry points resolve the column from the existing layout
    * first, so default-invoked calls keep working against stores landed
    * under the old default instead of failing on a missing column or
    * splitting the store across two partition layouts. */
  private[graft] def detectCellCol(
      spark: SparkSession, dir: String): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    def partCols(p: org.apache.hadoop.fs.Path): Seq[String] =
      fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && !s.getPath.getName.startsWith("_") &&
          s.getPath.getName.contains("="))
        .map(_.getPath.getName.takeWhile(_ != '='))
        .distinct
    // a store carrying TWO distinct cell partition columns side by side is
    // exactly the damage this seam guards against — resolving it by
    // whichever name listStatus returns first would let maintenance keep
    // extending one half of a split store. Fail loudly instead.
    def resolve(cols: Seq[String]): Option[String] = cols.sorted match {
      case Seq() => None
      case Seq(one) => Some(one)
      case many => throw new IllegalStateException(
        s"index store at $dir is split across partition columns " +
          s"${many.mkString(", ")}; repair the layout (rewrite one side " +
          "under a single cell column) before running maintenance")
    }
    partCols(root) match {
      case Seq("batch_id") =>
        resolve(fs.listStatus(root).toSeq
          .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
          .sortBy(_.getPath.getName)
          .flatMap(b => partCols(b.getPath))
          .distinct)
      case other => resolve(other)
    }
  }

  /** The layout-resolved cell column: the store's own partition column when
    * it has one, the caller's (or default) otherwise. */
  private def resolveCellCol(
      spark: SparkSession, dir: String, cellCol: String): String =
    detectCellCol(spark, dir).getOrElse(cellCol)

  private def compactStore(
      spark: SparkSession,
      dir: String,
      fold: DataFrame => DataFrame,
      extraPartCols: Seq[String],
      force: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverCompaction(spark, dir)
    if (!fs.exists(root)) return
    val sources = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath.getName).sorted
    // `force` re-folds even a single epoch subtree — [[compactDenseStores]]
    // uses it to push tombstone anti-joins through an already-compacted
    // store (a plain small-file fold has nothing to do there)
    if (sources.isEmpty || (sources.size == 1 && !force)) return
    val epoch =
      math.min(sources.map(_.stripPrefix("batch_id=").toLong).min, 0L) - 1
    val staging = new org.apache.hadoop.fs.Path(root, "_compact_staging")
    fs.delete(staging, true)
    fold(spark.read.parquet(dir).drop("batch_id"))
      .withColumn("batch_id", lit(epoch))
      .write.mode("overwrite")
      .option("compression", "zstd")
      .partitionBy("batch_id" +: extraPartCols: _*)
      .parquet(staging.toString)
    // all-empty sources (batches that landed zero rows) stage nothing at
    // all — just drop the empty subtrees, there is no data to commit
    if (!fs.exists(new org.apache.hadoop.fs.Path(staging, s"batch_id=$epoch"))) {
      sources.foreach(s => fs.delete(new org.apache.hadoop.fs.Path(root, s), true))
      fs.delete(staging, true)
      return
    }
    // commit point: manifest = epoch + the source subtrees it supersedes,
    // made visible by atomic rename
    val manifestTmp = new org.apache.hadoop.fs.Path(root, "_compact_manifest.tmp")
    val out = fs.create(manifestTmp, true)
    out.write((epoch.toString +: sources).mkString("\n").getBytes("UTF-8"))
    out.close()
    val manifest = new org.apache.hadoop.fs.Path(root, "_compact_manifest")
    fs.delete(manifest, false)
    if (!fs.rename(manifestTmp, manifest))
      throw new java.io.IOException(s"cannot commit compaction manifest at $manifest")
    finishCompaction(fs, root)
  }

  /** Finish (or no-op) a compaction whose manifest is committed: rename the
    * staged epoch subtree in if not already in place, delete superseded
    * sources, clear staging + manifest. Safe to call any time; called
    * automatically by [[compactCells]]. */
  def recoverCompaction(spark: SparkSession, dir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(root, "_compact_manifest")))
      finishCompaction(fs, root)
    else {
      // pre-commit debris from a crashed run: the store was never touched,
      // so the half-written staging (and half-written manifest) just go
      fs.delete(new org.apache.hadoop.fs.Path(root, "_compact_staging"), true)
      fs.delete(new org.apache.hadoop.fs.Path(root, "_compact_manifest.tmp"), false)
    }
  }

  private def finishCompaction(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    val manifest = new org.apache.hadoop.fs.Path(root, "_compact_manifest")
    val in = fs.open(manifest)
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    in.close()
    val epoch = lines.head.toLong
    val sources = lines.tail
    val target = new org.apache.hadoop.fs.Path(root, s"batch_id=$epoch")
    val staged = new org.apache.hadoop.fs.Path(root, s"_compact_staging/batch_id=$epoch")
    if (!fs.exists(target)) {
      if (!fs.exists(staged))
        throw new IllegalStateException(
          s"compaction manifest at $manifest names epoch $epoch but neither " +
            s"$target nor $staged exists — the staged subtree was lost")
      if (!fs.rename(staged, target))
        throw new java.io.IOException(s"cannot rename $staged into $target")
    }
    sources.foreach(s => fs.delete(new org.apache.hadoop.fs.Path(root, s), true))
    fs.delete(new org.apache.hadoop.fs.Path(root, "_compact_staging"), true)
    fs.delete(manifest, false)
  }

  // ------------------------------------------------------------------
  // Tombstone deletes: online right-to-be-forgotten for the dense stores
  // ------------------------------------------------------------------

  /** TOMBSTONE DELETES for the dense stores — the online form of
    * [[graft.sources.IndexBuild.applyDeletes]] (which rewrites batch
    * artifacts wholesale): at corpus scale a takedown / contamination /
    * right-to-be-forgotten request cannot rewrite the store, so the delete
    * lands as a tombstone subtree BESIDE it
    * (`cellsDir/_tombstones/del=N` — underscore-prefixed, so every plain
    * parquet read of the store skips it) and serving masks the dead ids
    * with the broadcast anti-join the pruned paths already have
    * ([[loadDenseStore]] / `excludeIds`). Physical reclamation is deferred
    * to [[compactDenseStores]].
    *
    * Each tombstone row carries `(idCol, cellCol, statsCols...)` — the
    * dead row's OWN histogram key — so the adaptive probe planner stays
    * EXACT between delete and compaction: [[liveCellStats]] subtracts the
    * tombstones' histogram from the persisted cellstats deltas, and both
    * sides count the same landed rows.
    *
    * Idempotent without a cross-store transaction: the affected set is
    * recomputed as (store ⋉ deleteIds) ∖ existing tombstones, and an empty
    * affected set writes nothing — re-running the same delete (or retrying
    * after a crash) is a no-op. The subtree commits by one atomic
    * directory rename; pre-commit staging debris is cleared on the next
    * call.
    *
    * Contract: ids name logical documents, not row versions — a
    * tombstoned id stays masked even if re-ingested, until
    * [[compactDenseStores]] drops both. Masking works against the
    * incremental `batch_id=` layout AND
    * [[graft.operators.Similarity.buildDenseIndex]]'s build-time cells
    * artifact; reclamation needs the batch layout (build-time artifacts
    * rewrite via `applyDeletes`).
    *
    * Returns the number of newly tombstoned rows. */
  def deleteFromDenseIndex(
      spark: SparkSession,
      cellsDir: String,
      deleteIds: DataFrame,
      idCol: String = "vec_id",
      cellCol: String = "cluster",
      statsCols: Seq[String] = Seq.empty): Long = {
    import org.apache.spark.sql.functions._
    if (!pathExists(spark, cellsDir)) return 0L
    val tombRoot = new org.apache.hadoop.fs.Path(cellsDir, "_tombstones")
    val fs = tombRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staging = new org.apache.hadoop.fs.Path(tombRoot, "_staging")
    fs.delete(staging, true) // a crashed run's never-committed debris
    val ids = deleteIds.select(col(deleteIds.columns.head).as(idCol)).distinct()
    // the store layout names the cell column — see [[detectCellCol]]
    val cc = resolveCellCol(spark, cellsDir, cellCol)
    val keep = (idCol +: cc +: statsCols).distinct
    val store = spark.read.parquet(cellsDir).select(keep.map(col): _*)
    val affected = tombstoneIds(spark, cellsDir, idCol)
      .foldLeft(store.join(broadcast(ids), Seq(idCol), "left_semi"))(
        (df, ts) => df.join(broadcast(ts), Seq(idCol), "left_anti"))
      .distinct()
    affected.coalesce(1).write.mode("overwrite")
      .option("compression", "zstd").parquet(staging.toString)
    val n = spark.read.parquet(staging.toString).count()
    if (n == 0) { fs.delete(staging, true); return 0L }
    val next = tombstoneSubtrees(fs, tombRoot)
      .map(_.stripPrefix("del=").toLong).foldLeft(-1L)(math.max) + 1
    // commit point: one atomic rename
    if (!fs.rename(staging, new org.apache.hadoop.fs.Path(tombRoot, s"del=$next")))
      throw new java.io.IOException(s"cannot commit tombstones under $tombRoot")
    n
  }

  private def tombstoneSubtrees(
      fs: org.apache.hadoop.fs.FileSystem,
      tombRoot: org.apache.hadoop.fs.Path): Seq[String] =
    if (!fs.exists(tombRoot)) Seq.empty
    else fs.listStatus(tombRoot).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("del="))
      .map(_.getPath.getName)

  /** The live tombstone rows `(idCol, cellCol, statsCols...)` beside a
    * cells store, or None when no delete has landed (or compaction consumed
    * them all). Read by explicit subtree paths — the underscore-prefixed
    * root is invisible to plain store reads by design. */
  def tombstones(spark: SparkSession, cellsDir: String): Option[DataFrame] = {
    val tombRoot = new org.apache.hadoop.fs.Path(cellsDir, "_tombstones")
    val fs = tombRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val subs = tombstoneSubtrees(fs, tombRoot)
    if (subs.isEmpty) None
    else Some(spark.read.parquet(subs.map(s => s"$cellsDir/_tombstones/$s"): _*))
  }

  /** The distinct tombstoned ids, shaped for the serving paths'
    * `excludeIds` broadcast anti-join. */
  def tombstoneIds(
      spark: SparkSession,
      cellsDir: String,
      idCol: String = "vec_id"): Option[DataFrame] =
    tombstones(spark, cellsDir).map(
      _.select(org.apache.spark.sql.functions.col(idCol)).distinct())

  /** The cells store with tombstoned ids MASKED — the read every serving
    * path should use between a delete and its compaction. With no live
    * tombstones this is the plain store read: zero extra plan nodes. */
  def loadDenseStore(
      spark: SparkSession,
      cellsDir: String,
      idCol: String = "vec_id"): DataFrame = {
    val df = spark.read.parquet(cellsDir)
    tombstoneIds(spark, cellsDir, idCol).fold(df)(ts =>
      graft.operators.Candidates.exclude(df, ts, idCol))
  }

  /** The adaptive-probe histogram CORRECTED for live tombstones: the
    * persisted cellstats deltas minus the tombstone rows' own histogram —
    * exact by construction (both sides aggregate the same landed rows) and
    * zero corpus bytes (the tombstone set is delete-sized). After
    * [[compactDenseStores]] consumes the tombstones this degenerates to
    * the plain delta read. Every crash window in the delete/compact
    * sequence leaves this at worst an OVERCOUNT (the planner probes a
    * touch wider than needed) — never an undercount that would starve
    * recall. */
  def liveCellStats(
      spark: SparkSession,
      statsDir: String,
      cellsDir: String,
      statsCols: Seq[String],
      cellCol: String = "cluster"): DataFrame = {
    import org.apache.spark.sql.functions._
    val stats = spark.read.parquet(statsDir)
    tombstones(spark, cellsDir).fold(stats) { ts =>
      val neg = graft.operators.Similarity.cellStats(ts, statsCols, cellCol)
        .withColumn("cnt", -col("cnt"))
      stats.unionByName(neg, allowMissingColumns = true)
    }
  }

  /** PHYSICAL RECLAMATION of tombstoned rows + compaction of the dense
    * stores in one maintenance call: fold the codes and cells `batch_id=`
    * subtrees with the tombstoned ids ANTI-JOINED OUT, clear the consumed
    * tombstones, then REBUILD the cellstats artifact wholesale from the
    * now-authoritative compacted cells store. The step ORDER is the crash
    * story — at every boundary serving stays correct and the probe planner
    * at worst conservative:
    *
    *  1. codes fold (tombstones applied) — crash after: tombstones still
    *     live, serving still masks; a re-run re-folds idempotently.
    *  2. cells fold (tombstones applied) — crash after: the dead rows no
    *     longer exist, the mask anti-join is a no-op, and
    *     [[liveCellStats]] still subtracts tombstones from deltas that
    *     still COUNT those rows — exact.
    *  3. tombstones cleared — crash after: the stats deltas overcount the
    *     dead rows until step 4; probes run a touch wide, recall unharmed.
    *  4. cellstats rebuilt from the compacted store.
    *
    * Each step is individually crash-safe (the staged-manifest
    * [[compactCells]] protocol, a plain directory delete, or a wholesale
    * rewrite), so the cross-store sequence needs no distributed
    * transaction. Like all maintenance here: one scheduler, never
    * concurrent with ingest. */
  def compactDenseStores(
      spark: SparkSession,
      cellsDir: String,
      codesDir: Option[String] = None,
      statsDir: Option[String] = None,
      statsCols: Seq[String] = Seq.empty,
      idCol: String = "vec_id",
      cellCol: String = "cluster",
      radiiDir: Option[String] = None,
      radiiCentroids: Option[DataFrame] = None,
      vecCol: String = "embedding",
      int8Dir: Option[String] = None,
      binDir: Option[String] = None): Unit = {
    import org.apache.spark.sql.functions._
    require(statsDir.isEmpty || statsCols.nonEmpty,
      "rebuilding the cellstats artifact needs its attribute columns")
    require(radiiDir.isEmpty || radiiCentroids.isDefined,
      "rebuilding the radii artifact needs the centroid table (a max is " +
        "not invertible — the dead rows' contribution cannot be subtracted)")
    val ts = tombstoneIds(spark, cellsDir, idCol)
    // RECLAMATION PRECONDITION: the folds below only rewrite `batch_id=`
    // subtrees — on a build-time artifact layout (no batch subtrees;
    // deleteFromDenseIndex supports it for MASKING) compactStore silently
    // no-ops, and clearing the tombstones anyway would resurrect the
    // deleted ids. Fail loudly BEFORE any mutation: masking stays intact
    // and the caller is pointed at the layout's own rewrite path.
    if (ts.isDefined) {
      val hadoop = spark.sparkContext.hadoopConfiguration
      val nonBatch =
        (cellsDir +: (codesDir.toSeq ++ int8Dir.toSeq ++ binDir.toSeq))
          .filterNot { d =>
        val p = new org.apache.hadoop.fs.Path(d)
        val fs = p.getFileSystem(hadoop)
        fs.exists(p) && fs.listStatus(p).exists(s =>
          s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      }
      require(nonBatch.isEmpty,
        s"cannot physically reclaim tombstoned rows: ${nonBatch.mkString(", ")} " +
          "has no batch_id= subtrees (a build-time artifact layout) — rewrite " +
          "it with graft.sources.IndexBuild.applyDeletes instead; tombstones " +
          "are left in place, so serving keeps masking the deleted ids")
    }
    def minus(df: DataFrame): DataFrame =
      ts.fold(df)(ids => graft.operators.Candidates.exclude(df, ids, idCol))
    // each store's own layout is authoritative — see [[detectCellCol]]
    val cc = resolveCellCol(spark, cellsDir, cellCol)
    // the codes, SQ8 and 1-bit stores reclaim identically: fold the batch
    // subtrees minus the tombstoned ids (r16 — an unreclaimed coarse
    // store keeps dead rows consuming kCoarse shortlist slots forever:
    // results stay correct because the refine joins the masked/compacted
    // cells, but measured recall at the calibrated knobs silently sinks
    // as deletes accumulate)
    (codesDir.toSeq ++ int8Dir.toSeq ++ binDir.toSeq).foreach { cd =>
      val ccCodes = resolveCellCol(spark, cd, cc)
      compactStore(spark, cd,
        df => minus(df).repartition(col(ccCodes)), Seq(ccCodes),
        force = ts.isDefined)
    }
    compactStore(spark, cellsDir,
      df => minus(df).repartition(col(cc)), Seq(cc),
      force = ts.isDefined)
    val tombRoot = new org.apache.hadoop.fs.Path(cellsDir, "_tombstones")
    tombRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(tombRoot, true)
    statsDir.foreach { sd =>
      val root = new org.apache.hadoop.fs.Path(cellsDir)
      val cfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasRows = cfs.exists(root) && cfs.listStatus(root).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      // the rebuild must land with the DELTA store's column types: the
      // cells store surfaces the cell id as an (int-inferred) partition
      // column while the deltas store it as landed data (long) — a
      // type-mixed stats store would fail every later merged read
      val deltaSchema = spark.read.parquet(sd).schema
      val fold: DataFrame => DataFrame =
        if (hasRows)
          _ => {
            val fresh = graft.operators.Similarity.cellStats(
              spark.read.parquet(cellsDir), statsCols, cc)
            fresh.select(fresh.columns.map(c =>
              deltaSchema.find(_.name == c)
                .map(f => col(c).cast(f.dataType).as(c))
                .getOrElse(col(c))): _*).coalesce(1)
          }
        else
          // the fold emptied the store (every row was tombstoned): the
          // histogram folds to empty through the all-empty branch
          df => df.limit(0)
      compactStore(spark, sd, fold, Seq.empty, force = true)
    }
    // radii rebuild from the authoritative compacted store: a stale-HIGH
    // radius is still a valid range-search bound (deletes only shrink the
    // true max), so this step is tightening, not correctness — but it also
    // drops emptied cells so the planner stops probing them at all
    for (rd <- radiiDir; cents <- radiiCentroids) {
      val root = new org.apache.hadoop.fs.Path(cellsDir)
      val cfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val hasRows = cfs.exists(root) && cfs.listStatus(root).exists(s =>
        s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      val deltaSchema = spark.read.parquet(rd).schema
      val fold: DataFrame => DataFrame =
        if (hasRows)
          _ => {
            val fresh = graft.operators.Similarity.cellRadii(
              spark.read.parquet(cellsDir),
              cents.select(col(cents.columns.head).as(cc), col("cv")),
              vecCol = vecCol, clusterCol = cc)
            fresh.select(fresh.columns.map(c =>
              deltaSchema.find(_.name == c)
                .map(f => col(c).cast(f.dataType).as(c))
                .getOrElse(col(c))): _*).coalesce(1)
          }
        else
          df => df.limit(0)
      compactStore(spark, rd, fold, Seq.empty, force = true)
    }
  }

  // ------------------------------------------------------------------
  // Versioned codebook store: drift-gate retrain + ATOMIC index swap
  // ------------------------------------------------------------------

  /** The versioned PQ-index layout behind [[retrainAndSwap]]:
    *
    * {{{
    * indexRoot/
    *   CURRENT              # tiny file holding the live version number
    *   v=N/codebooks/       # (m, c, cbv) parquet
    *   v=N/stats/           # 1-row (train_distortion) parquet
    *   v=N/codes/           # batch_id=.../cell=... — seeded by the retrain's
    *                        #   re-encode epoch, appended by updateDenseIndex
    *   _version_staging/    # invisible until committed
    *   _version_manifest    # commit point (atomic rename)
    * }}}
    *
    * A version is published with the [[compactCells]] protocol: stage the
    * whole `v=N` subtree under `_version_staging`, commit a manifest via
    * atomic rename, then rename the subtree in and flip `CURRENT` — so a
    * reader that resolves `CURRENT` once ([[currentCodebooks]]) reads ONE
    * consistent (codebooks, stats, codes) triple: mid-swap it still
    * resolves the old version, post-swap the new one, never a mixture.
    * The PREVIOUS version is kept for in-flight readers; older ones are
    * pruned. A crash before the manifest leaves the store untouched; a
    * crash after it is finished by [[recoverVersionSwap]] (idempotent,
    * run at the start of every publish). */
  def currentVersion(spark: SparkSession, indexRoot: String): Option[Long] = {
    val root = new org.apache.hadoop.fs.Path(indexRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = new org.apache.hadoop.fs.Path(root, "CURRENT")
    if (fs.exists(cur)) {
      val in = fs.open(cur)
      val v = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      in.close()
      Some(v)
    } else if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted.lastOption
  }

  /** Resolve the live index version ONCE: (codebooks, training distortion,
    * version id, codes dir). Everything returned belongs to the same
    * version — the consistency contract readers rely on across swaps. */
  def currentCodebooks(
      spark: SparkSession,
      indexRoot: String): (DataFrame, Double, Long, String) = {
    val v = currentVersion(spark, indexRoot).getOrElse(
      throw new IllegalStateException(
        s"no published index version under $indexRoot — bootstrap with retrainAndSwap"))
    val cb = spark.read.parquet(s"$indexRoot/v=$v/codebooks")
    val d = spark.read.parquet(s"$indexRoot/v=$v/stats")
      .head.getDouble(0)
    (cb, d, v, s"$indexRoot/v=$v/codes")
  }

  /** The published version's OPQ rotation artifact, when the version was
    * retrained with `opqRotateIters` — None for an unrotated index.
    * Callers thread it into [[updateDenseIndex]]'s `rotation` so landed
    * batches encode in the version's basis. */
  def currentRotation(
      spark: SparkSession,
      indexRoot: String): Option[DataFrame] = {
    val v = currentVersion(spark, indexRoot).getOrElse(
      throw new IllegalStateException(
        s"no published index version under $indexRoot — bootstrap with retrainAndSwap"))
    val p = new org.apache.hadoop.fs.Path(s"$indexRoot/v=$v/rotation")
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      Some(spark.read.parquet(s"$indexRoot/v=$v/rotation"))
    else None
  }

  /** The published version's two-level coarse hierarchy, when the version
    * was retrained with `coarseCentroids` — None for a flat-probe index.
    * The facade threads it into [[graft.operators.Similarity.DenseIndex]]'s
    * `l1`/`l2` so serving dispatches two-level after a swap. Landed
    * BATCHES never stale the hierarchy: it is a function of the coarse
    * centroids alone (which only a retrain moves), so [[updateDenseIndex]]
    * writes no per-batch hierarchy leg — republish-on-retrain is the whole
    * maintenance story. It DOES consume it: [[updateDenseIndexVersioned]]
    * threads the pair into the landing's cell assignment so each batch
    * pays the IMI-style two-stage argmax, not the flat one (r17). */
  def currentHierarchy(
      spark: SparkSession,
      indexRoot: String): Option[(DataFrame, DataFrame)] = {
    val v = currentVersion(spark, indexRoot).getOrElse(
      throw new IllegalStateException(
        s"no published index version under $indexRoot — bootstrap with retrainAndSwap"))
    val p = new org.apache.hadoop.fs.Path(s"$indexRoot/v=$v/l1")
    if (p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p))
      Some((spark.read.parquet(s"$indexRoot/v=$v/l1"),
        spark.read.parquet(s"$indexRoot/v=$v/l2")))
    else None
  }

  /** RETRAIN-AND-SWAP (the drift gate's follow-through): refit PQ
    * codebooks over `trainCorpus` (the accumulated store UNION the
    * drifted, still-unlanded landing rows — retraining on the OLD
    * distribution alone would trip the gate again on replay), recompute
    * the training distortion, re-encode the already-landed `store` rows
    * under the new codebooks, and publish all three as ONE new version
    * with the staged-write + manifest + rename protocol. After the swap,
    * re-running [[updateDenseIndex]] with [[currentCodebooks]]' artifacts
    * replays the gated batch cleanly (it never committed) and serving
    * reads a codebook/codes pair that is never mixed across versions.
    * Returns the published version id. */
  def retrainAndSwap(
      spark: SparkSession,
      indexRoot: String,
      trainCorpus: DataFrame,
      store: Option[DataFrame],
      numSub: Int = 8,
      subDim: Int = 8,
      numCentroids: Int = 16,
      pqIters: Int = 1,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      cellCol: String = "cluster",
      opqRotateIters: Option[Int] = None,
      coarseCentroids: Option[DataFrame] = None,
      coarseGroups: Int = 0): Long = {
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    recoverVersionSwap(spark, indexRoot)
    val root = new org.apache.hadoop.fs.Path(indexRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val next = currentVersion(spark, indexRoot).getOrElse(-1L) + 1
    val staging = s"$indexRoot/_version_staging/v=$next"
    fs.delete(new org.apache.hadoop.fs.Path(s"$indexRoot/_version_staging"), true)
    // OPQ-rotated retrain: a drift-tripped OPQ index refits the ROTATION
    // along with the codebooks (the basis is part of the quantizer), and
    // the published version carries it so [[currentRotation]] readers and
    // the next [[updateDenseIndex]] encode in the matching coordinates
    val rotArt = opqRotateIters.map { it =>
      Similarity.pcaTopComponents(trainCorpus, vecCol,
          m = numSub * subDim, iters = it)
        .coalesce(1).write.mode("overwrite")
        .option("compression", "zstd").parquet(s"$staging/rotation")
      spark.read.parquet(s"$staging/rotation")
    }
    // rotateVectors carries every non-vector column through, so the store
    // re-encode keeps its cell column
    def rotated(df: DataFrame) = rotArt.fold(df)(rot =>
      Similarity.rotateVectors(df, rot, idCol, vecCol,
        allocate = Some((numSub, subDim))))
    val emb = rotated(trainCorpus.select(col(idCol), col(vecCol)))
    val cb = Similarity.pqRefineCodebooks(
      emb, Similarity.pqCodebooks(emb, numSub, subDim, numCentroids, idCol, vecCol),
      numSub, subDim, iters = pqIters, idCol = idCol, vecCol = vecCol)
    val dist = Similarity.quantizationDistortion(emb, cb, numSub, subDim, idCol, vecCol)
    cb.coalesce(1).write.mode("overwrite")
      .option("compression", "zstd").parquet(s"$staging/codebooks")
    cb.unpersist() // pqRefineCodebooks' contract: the caller owns the frame
    spark.range(1).select(lit(dist).as("train_distortion"))
      .write.mode("overwrite").parquet(s"$staging/stats")
    // seed the version's codes with the landed rows re-encoded under the
    // NEW codebooks (one epoch subtree, the compactCells convention);
    // later batches append their own batch_id= subtrees via updateDenseIndex
    store.foreach { st =>
      Similarity.pqEncode(rotated(st), spark.read.parquet(s"$staging/codebooks"),
          numSub, subDim, idCol, vecCol, carry = Seq(cellCol))
        .withColumn("batch_id", lit(-1L))
        .write.mode("append")
        .partitionBy("batch_id", cellCol)
        .parquet(s"$staging/codes")
    }
    // TWO-LEVEL coarse hierarchy (VERDICT r15 #1/#8): when the caller's
    // index serves through the l1/l2 artifact, the retrained version must
    // republish it — a version swap that kept yesterday's hierarchy while
    // the centroid table moved would route probes through stale groups.
    // Staged INSIDE the version subtree, so readers resolve (codebooks,
    // codes, l1, l2) as one consistent set via [[currentHierarchy]].
    coarseCentroids.foreach { cents =>
      graft.operators.Similarity.buildCoarseHierarchy(cents, staging,
        groups = coarseGroups)
    }
    // commit point: manifest names the staged version, made visible by
    // atomic rename; everything before this is invisible debris on crash
    val manifestTmp = new org.apache.hadoop.fs.Path(root, "_version_manifest.tmp")
    val out = fs.create(manifestTmp, true)
    out.write(next.toString.getBytes("UTF-8"))
    out.close()
    val manifest = new org.apache.hadoop.fs.Path(root, "_version_manifest")
    fs.delete(manifest, false)
    if (!fs.rename(manifestTmp, manifest))
      throw new java.io.IOException(s"cannot commit version manifest at $manifest")
    finishVersionSwap(fs, root)
    next
  }

  /** Finish (or no-op) a version swap whose manifest is committed: rename
    * the staged subtree in, flip `CURRENT`, prune versions older than the
    * predecessor, clear staging + manifest. Idempotent; also clears
    * pre-commit debris when no manifest exists. */
  def recoverVersionSwap(spark: SparkSession, indexRoot: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(indexRoot)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(root, "_version_manifest")))
      finishVersionSwap(fs, root)
    else {
      fs.delete(new org.apache.hadoop.fs.Path(root, "_version_staging"), true)
      fs.delete(new org.apache.hadoop.fs.Path(root, "_version_manifest.tmp"), false)
    }
  }

  private def finishVersionSwap(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Unit = {
    val manifest = new org.apache.hadoop.fs.Path(root, "_version_manifest")
    val in = fs.open(manifest)
    val v = scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
    in.close()
    val target = new org.apache.hadoop.fs.Path(root, s"v=$v")
    val staged = new org.apache.hadoop.fs.Path(root, s"_version_staging/v=$v")
    if (!fs.exists(target)) {
      if (!fs.exists(staged))
        throw new IllegalStateException(
          s"version manifest names v=$v but neither $target nor $staged " +
            "exists — the staged version was lost")
      if (!fs.rename(staged, target))
        throw new java.io.IOException(s"cannot rename $staged into $target")
    }
    // flip CURRENT via tmp + rename: readers resolve either the old or the
    // new version file content, never a torn write
    val curTmp = new org.apache.hadoop.fs.Path(root, "CURRENT.tmp")
    val out = fs.create(curTmp, true)
    out.write(v.toString.getBytes("UTF-8"))
    out.close()
    val cur = new org.apache.hadoop.fs.Path(root, "CURRENT")
    fs.delete(cur, false)
    if (!fs.rename(curTmp, cur))
      throw new java.io.IOException(s"cannot flip $cur to v=$v")
    // keep the immediate predecessor for in-flight readers; prune older
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(s => s.getPath.getName.stripPrefix("v=").toLong)
      .filter(_ < v - 1)
      .foreach(old => fs.delete(new org.apache.hadoop.fs.Path(root, s"v=$old"), true))
    fs.delete(new org.apache.hadoop.fs.Path(root, "_version_staging"), true)
    fs.delete(manifest, false)
  }

  /** SELF-HEALING dense-index maintenance — the drift gate's production
    * loop in one call: resolve the live codebook version, run
    * [[updateDenseIndex]] against it, and when the drift gate trips
    * (the batch never lands), [[retrainAndSwap]] over store + pending
    * landing rows, then re-run the maintenance against the NEW version —
    * the checkpointed source replays the gated batch, which now encodes
    * within tolerance of its own distribution. Bootstraps the first
    * version from the landing data when `indexRoot` is empty. The stream
    * no longer stays down awaiting manual retraining. */
  def updateDenseIndexVersioned(
      spark: SparkSession,
      landingDir: String,
      sinkDir: String,
      checkpointDir: String,
      centroids: DataFrame,
      indexRoot: String,
      numSub: Int = 8,
      subDim: Int = 8,
      numCentroids: Int = 16,
      driftTolerance: Double = 1.5,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      centroidIdCol: String = "cluster",
      cellCol: String = "cluster",
      statsCols: Seq[String] = Seq.empty,
      statsDir: Option[String] = None,
      radiiDir: Option[String] = None,
      opqRotateIters: Option[Int] = None,
      int8Dir: Option[String] = None,
      binDir: Option[String] = None,
      coarseHierarchy: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    // same layout-first resolution as [[updateDenseIndex]]
    val cc = resolveCellCol(spark, sinkDir, cellCol)
    // a hierarchy-serving index republishes l1/l2 with EVERY version the
    // loop publishes (VERDICT r15 #8) — a retrain that kept yesterday's
    // hierarchy beside today's codebooks would hand [[currentHierarchy]]
    // readers a mixed version set
    val coarse = if (coarseHierarchy) Some(centroids.select(
      col(centroidIdCol).as("cluster"), col("cv"))) else None
    def landedStore: Option[DataFrame] =
      if (pathExists(spark, sinkDir))
        Some(spark.read.parquet(sinkDir).select(col(idCol), col(vecCol), col(cc)))
      else None
    def trainCorpus: DataFrame = {
      val landing = spark.read.parquet(landingDir).select(col(idCol), col(vecCol))
      landedStore.fold(landing)(st =>
        st.select(col(idCol), col(vecCol)).unionByName(landing).distinct())
    }
    if (currentVersion(spark, indexRoot).isEmpty)
      retrainAndSwap(spark, indexRoot, trainCorpus, landedStore,
        numSub, subDim, numCentroids, idCol = idCol, vecCol = vecCol,
        cellCol = cc, opqRotateIters = opqRotateIters,
        coarseCentroids = coarse)
    def runOnce(): Unit = {
      val (cb, dist, _, codesDir) = currentCodebooks(spark, indexRoot)
      // the version's basis travels with its codebooks: an OPQ-retrained
      // version publishes a rotation artifact, and every landed batch
      // must encode through it
      updateDenseIndex(spark, landingDir, sinkDir, checkpointDir, centroids,
        idCol, vecCol, Some(cb), Some(codesDir), numSub, subDim,
        Some(dist), driftTolerance, centroidIdCol, cc,
        statsCols, statsDir, radiiDir,
        rotation = currentRotation(spark, indexRoot),
        int8Dir = int8Dir, binDir = binDir,
        // the published version's l1/l2 (when it carries one — retrains
        // republish it per version) routes every landed batch through the
        // hierarchical assign instead of the flat argmax (VERDICT r16 #3)
        hierarchy = currentHierarchy(spark, indexRoot))
    }
    try runOnce()
    catch {
      case e: org.apache.spark.sql.streaming.StreamingQueryException
          if Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
            .exists(t => Option(t.getMessage).exists(_.contains("codebook drift"))) =>
        retrainAndSwap(spark, indexRoot, trainCorpus, landedStore,
          numSub, subDim, numCentroids, idCol = idCol, vecCol = vecCol,
          cellCol = cc, opqRotateIters = opqRotateIters,
          coarseCentroids = coarse)
        runOnce()
    }
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
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        import graft.operators.Dedup
        val batch = batch0.repartition(spark.sparkContext.defaultParallelism)
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

  /** INCREMENTAL SPAN-DEDUP — the streaming form of
    * [[graft.operators.Dedup.duplicateSpans]]: each maintenance run
    * shingles ONLY the new documents, marks every span duplicated against
    * the ACCUMULATED shingle-hash index (old text is never re-shingled),
    * writes the merged spans as this batch's `batch_id=` partition of
    * `indexDir/spans`, and lands the batch's distinct hashes into
    * `indexDir/shingle_hashes`. Precedence is ARRIVAL order — anything
    * already indexed beats this batch, and within the batch the smallest
    * `(id, start)` wins, the batch operator's election applied per
    * arrival — so the first-ever copy of a run is never flagged and every
    * later copy is, no matter which ingest run carried it.
    *
    * Steady-state cost per run: O(new docs' shingles) for the feature
    * pass + ONE membership semi-join against the accumulated hash set
    * (8-byte keys; AQE splits hot boilerplate hashes) + the per-document
    * merge window. The index grows by distinct-new-hashes per batch;
    * [[compactCells]]-style folding is unnecessary (it is already
    * hash-distinct per batch) but [[recoverCompaction]]-safe layouts
    * apply if ever compacted. Replay guard like [[updateDedup]]: a
    * crashed attempt's own `batch_id=` partitions must not read back as
    * "old" state or a replay would flag the batch's own first copies. */
  def updateSpanDedup(
      spark: SparkSession,
      landingDir: String,
      indexDir: String,
      checkpointDir: String,
      k: Int = 5,
      idCol: String = "doc_id",
      textCol: String = "text"): Unit = {
    import org.apache.spark.sql.functions._
    val hashesDir = s"$indexDir/shingle_hashes"
    val spansDir = s"$indexDir/spans"
    val schema = spark.read.parquet(landingDir).schema
    val src = spark.readStream.schema(schema).parquet(landingDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        import graft.operators.Dedup
        val batch = batch0.repartition(spark.sparkContext.defaultParallelism)
        val sh = Dedup.tokenShingles(
          batch.select(col(idCol), col(textCol)), idCol, textCol, k).persist()
        val haveOld = pathExists(spark, hashesDir)
        val oldHashes: DataFrame =
          if (!haveOld) sh.select(col("__h")).limit(0)
          else
            try spark.read.parquet(hashesDir)
              .filter(col("batch_id") =!= batchId).drop("batch_id")
              .select(col("__h"))
            catch {
              case _: org.apache.spark.sql.AnalysisException =>
                sh.select(col("__h")).limit(0)
            }
        // duplicated = seen in ANY earlier batch, or not this batch's
        // first occurrence of its hash
        val inOld = sh.join(oldHashes.distinct(), Seq("__h"), "left_semi")
          .select(col(idCol), col("st"))
        val firsts = sh.groupBy(col("__h"))
          .agg(min(struct(col(idCol), col("st"))).as("__first"))
        val notBatchFirst = sh.join(firsts, Seq("__h"))
          .filter(!(col(idCol) === col("__first").getField(idCol) &&
            col("st") === col("__first").getField("st")))
          .select(col(idCol), col("st"))
        val marked = inOld.unionByName(notBatchFirst).distinct()
        writeBatchPartition(Dedup.mergeSpans(marked, idCol, k), batchId, spansDir)
        writeBatchPartition(sh.select(col("__h")).distinct(), batchId, hashesDir)
        sh.unpersist()
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** INCREMENTAL GRAM (moment-matrix) MAINTENANCE — the streaming form of
    * [[graft.operators.Similarity.gramMatrixRaw]]: each maintenance run
    * computes the batch-LOCAL raw Gram of the newly landed vectors ONLY
    * and writes it as this batch's `batch_id=` partition of
    * `indexDir/gram`. Decimal sums are exact and associative
    * ([[graft.operators.Similarity.mergeGramRaw]], spec-pinned), so the
    * accumulated store reads back ([[loadGram]]) as the BIT-EXACT Gram of
    * every vector ever landed, and a PCA refresh
    * ([[graft.operators.Similarity.pcaPowerFitFromGram]]) runs from d²
    * accumulated rows with ZERO re-reads of old batches — the moment
    * matrix joins cells/codes/histograms as an incrementally-maintained
    * artifact. Replay-idempotent: the batch-local Gram is a pure function
    * of the batch, and a crashed attempt's partition is dynamically
    * overwritten by its replay. Store growth is d² rows per batch;
    * compaction = replacing all partitions with their [[loadGram]] merge
    * (exact, any time). */
  def updateGram(
      spark: SparkSession,
      landingDir: String,
      indexDir: String,
      checkpointDir: String,
      vecCol: String = "embedding"): Unit = {
    val gramDir = s"$indexDir/gram"
    val schema = spark.read.parquet(landingDir).schema
    val src = spark.readStream.schema(schema).parquet(landingDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = batch0.repartition(spark.sparkContext.defaultParallelism)
        writeBatchPartition(
          graft.operators.Similarity.gramMatrixRaw(batch, vecCol),
          batchId, gramDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The merged raw-Gram view of the accumulated [[updateGram]] store: one
    * (d×d)-key decimal re-sum over the batch partitions — exactly
    * [[graft.operators.Similarity.mergeGramRaw]] applied to the store. */
  def loadGram(spark: SparkSession, gramDir: String): DataFrame =
    graft.operators.Similarity.mergeGramRaw(Seq(
      spark.read.parquet(gramDir).drop("batch_id")))

  /** INCREMENTAL PROJECTION maintenance — the apply-side twin of
    * [[updateGram]]: each maintenance run projects ONLY the newly landed
    * vectors onto the FROZEN fitted components
    * ([[graft.operators.Similarity.pcaProjectPacked]] — map-only,
    * packed-literal) and lands the packed rows as this batch's
    * `batch_id=` partition of `indexDir/projections`, so the coarse
    * serving artifact ([[graft.operators.Similarity.pcaCoarseRefineSearch]]'s
    * `projections` input) stays current without re-projecting old
    * batches. The components are pinned at call time — per-row output is
    * a pure function of (row, components), so replay overwrites are
    * idempotent and the accumulated store equals the one-shot projection
    * of everything landed (spec-pinned). After a REFIT (components
    * change), rebuild the store — the same full-rebuild boundary the
    * codebook drift gate draws for PQ codes. */
  def updateProjections(
      spark: SparkSession,
      landingDir: String,
      indexDir: String,
      checkpointDir: String,
      components: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): Unit = {
    val projDir = s"$indexDir/projections"
    // collect ONCE — inside foreachBatch the components frame would
    // re-localize per batch, and a concurrent refit could change it
    // mid-run, splitting the store across two geometries
    val frozen = components.sparkSession.createDataFrame(
      java.util.Arrays.asList(components.collect(): _*), components.schema)
    val schema = spark.read.parquet(landingDir).schema
    val src = spark.readStream.schema(schema).parquet(landingDir)
    val q = src.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = batch0.repartition(spark.sparkContext.defaultParallelism)
        writeBatchPartition(
          graft.operators.Similarity.pcaProjectPacked(
            batch, frozen, idCol, vecCol),
          batchId, projDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** The accumulated [[updateProjections]] store as one packed-projection
    * relation (`batch_id` dropped — serving does not care which run
    * landed a row). */
  def loadProjections(spark: SparkSession, projDir: String): DataFrame =
    spark.read.parquet(projDir).drop("batch_id")

  /** Streaming ANN SERVING — the online half of the build/serve split: a
    * stream of query vectors `(query_id LONG, qv ARRAY<FLOAT>)` lands in
    * `queryLandingDir` and every micro-batch is answered from the PERSISTED
    * IVF artifacts via [[graft.operators.Similarity.ivfSearchBatchPruned]]:
    * the batch probes the centroid artifact driver-side (the coarse-
    * quantizer pass) and scans ONLY its probed cells' partitions of the
    * cell store (literal `PartitionFilters`), so per-batch cost is
    * batch-size x probed-cell volume and NOTHING is trained, encoded, or
    * corpus-scanned at serving time. Per-query top-k carries no cross-query
    * or cross-batch state, so the accumulated result is INDEPENDENT of how
    * the stream was batched — the oracle checks it equals the one-shot
    * batch search over the same queries. Results accumulate on the driver
    * (k rows per query — serving-scale output, the analog of the
    * reference's per-request top-k lists). `maxFilesPerTrigger` bounds
    * micro-batch size (and in tests forces a genuinely multi-batch run).
    * Returns `(query_id, vec_id, sim)` for every streamed query. */
  def serveAnnStream(
      spark: SparkSession,
      queryLandingDir: String,
      cells: DataFrame,
      centroids: DataFrame,
      nprobe: Int,
      k: Int,
      maxFilesPerTrigger: Int = 2,
      hierarchy: Option[(DataFrame, DataFrame)] = None,
      nprobeL1: Option[Int] = None): DataFrame = {
    val schema = spark.read.parquet(queryLandingDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(queryLandingDir)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val restoreCkpt = ScratchCheckpoints.install(spark)
    // hierarchy dispatch like the facade (VERDICT r16 #4): a big-nlist
    // stream-serving job probes the sqrt-bounded l1/l2 pair per batch
    // instead of materializing the flat centroid table; full-L1 default
    // keeps bit parity with the flat probe
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val res = (hierarchy match {
          case Some((l1, l2)) =>
            // full-L1 default resolves from the cached group count
            // (ADVICE r17) — not a count job per micro-batch
            graft.operators.Similarity.ivfSearchBatchPrunedTwoLevel(
              cells, l1, l2, batch,
              nprobeL1.getOrElse(
                graft.operators.Similarity.l1GroupCount(l1)), nprobe, k)
          case None =>
            graft.operators.Similarity
              .ivfSearchBatchPruned(cells, centroids, batch, nprobe, k)
        }).collect()
        buf.synchronized {
          buf ++= res.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally restoreCkpt()
    import spark.implicits._
    buf.toSeq.toDF("query_id", "vec_id", "sim")
  }

  /** STREAMING RANGE serving — [[serveAnnStream]]'s radius sibling: each
    * micro-batch of query vectors is answered from the persisted IVF
    * artifacts via [[graft.operators.Similarity.ivfRangeSearchBatchPruned]]
    * (per-query admissible cells under the radii bound, ONE pruned union
    * scan per batch). Range results carry no cross-query or cross-batch
    * state either, so the accumulated stream result is independent of
    * batching and equals the one-shot batch range search — which is what
    * the oracle pins. Output size is threshold-bound rather than
    * k-bound: a production sink would write per-batch instead of
    * accumulating, but serving-scale thresholds keep this driver-side
    * accumulation the same shape as [[serveAnnStream]]'s. */
  def serveRangeStream(
      spark: SparkSession,
      queryLandingDir: String,
      cells: DataFrame,
      centroids: DataFrame,
      radii: DataFrame,
      minScore: Double,
      maxFilesPerTrigger: Int = 2): DataFrame = {
    val schema = spark.read.parquet(queryLandingDir).schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(queryLandingDir)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    val restoreCkpt = ScratchCheckpoints.install(spark)
    val q = src.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val res = graft.operators.Similarity
          .ivfRangeSearchBatchPruned(cells, centroids, radii, batch, minScore)
          .collect()
        buf.synchronized {
          buf ++= res.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally restoreCkpt()
    import spark.implicits._
    buf.toSeq.toDF("query_id", "vec_id", "score")
  }
}
