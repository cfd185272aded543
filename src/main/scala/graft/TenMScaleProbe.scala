package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ONE ORDER OF MAGNITUDE UP: the 10M x d=768 scale probe (VERDICT r17
  * #4). Every committed scale number before r18 tops out at 1M rows;
  * this probe builds the SAME trained big-nlist coarse tier as the 1M
  * surface (nlist init 100k, 2-rows/centroid hash sample, one
  * bulk-kernel Lloyd pass — recipe parity so per-phase walls divide
  * cleanly) over a 10M-row corpus, assigns the corpus THROUGH the
  * hierarchy, and measures joint-pair calibration, recall@20 and
  * serving walls beside the 1M rows. The success criterion is the RATIO
  * TABLE: train is sample-bounded (expected ~1x), hierarchy is
  * nlist-bounded (~1x), assign is corpus-linear (~10x), serving walls
  * scale with probed cell volume (~10x rows/cell) — any super-linear
  * phase is a scale bug this probe exists to catch.
  *
  * INGEST SHAPE: the corpus is never materialized whole on local disk.
  * [[FlagshipCorpus.generate]] yields replica ranges lazily and the
  * assign stage lands them in bounded chunks (1M rows each) appended
  * into the cell-partitioned store — the posture a 100 TB ingest has by
  * necessity (no cluster materializes a 100 TB intermediate; data
  * streams through assignment in bounded batches, and the shuffle high-
  * water mark is one chunk, not the corpus).
  *
  * STAGED + RESUMABLE: each stage (and each assign chunk) writes a done
  * marker under the probe root, so the expensive build stages can run
  * in one session and the serving stages in a later one (also how the
  * calibration stage picks up a recompiled classpath).
  *
  * Run: `GRAFT_PROBE_ROOT=<dir> java -cp classes:spark-jars
  * graft.TenMScaleProbe [stage,stage,...]` with stages from
  * {coarse, hierarchy, assign, serve, pq, quant}; default runs the
  * build stages (coarse,hierarchy,assign). */
object TenMScaleProbe {
  val TargetRows = 10000000L
  val NlistInit = 100000
  val ChunkReplicas = 500 // 1M rows per assign chunk at the 2k-row sf base

  def main(args: Array[String]): Unit = {
    val root = sys.env.getOrElse("GRAFT_PROBE_ROOT",
      sys.error("usage: GRAFT_PROBE_ROOT=<dir> TenMScaleProbe [stages]"))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stages = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set("coarse", "hierarchy", "assign"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val out = s"$root/bignlist10m"
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def done(stage: String) =
      fs.exists(new org.apache.hadoop.fs.Path(s"$out/_done_$stage"))
    def mark(stage: String): Unit =
      fs.create(new org.apache.hadoop.fs.Path(s"$out/_done_$stage"), true).close()
    val times = FlagshipCorpus.replicasFor(spark, sfDir, TargetRows)
    def gen(lo: Int, hi: Int): DataFrame =
      FlagshipCorpus.generate(spark, sfDir, lo, hi)

    // ---- stage: coarse (trained big-nlist tier, BigNlistProbe recipe —
    // the sample pass streams the generator, map-only, nothing written)
    if (stages("coarse") && !done("coarse")) {
      val sampleTarget = 2L * NlistInit
      val cut = (sampleTarget.toDouble / TargetRows * (1L << 60)).toLong
      val sample = gen(0, times).filter(graft.operators.Dedup.hash60(
        concat(lit("trainsample:"), col("vec_id").cast("string"))) < lit(cut))
        .persist()
      val sampled = sample.count()
      val hw = org.apache.spark.sql.expressions.Window
        .orderBy(col("__h"), col("vec_id"))
      val init = sample
        .select(col("vec_id"), col("embedding"), graft.operators.Dedup.hash60(
          concat(lit("kmeans:"), col("vec_id").cast("string"))).as("__h"))
        .orderBy(col("__h"), col("vec_id")).limit(NlistInit)
        .select((row_number().over(hw) - 1).as("cluster"),
          col("embedding").as("cv"))
        .persist()
      init.count()
      val (cents, tFit) = time {
        val assigned = Similarity.assignCellsBulk(
          sample.select(col("vec_id"), col("embedding")), init)
        val next = assigned
          .select(col("cluster"),
            posexplode(col("embedding")).as(Seq("__pos", "__x")))
          .groupBy(col("cluster"), col("__pos"))
          .agg((sum(col("__x").cast("double").cast("decimal(28,12)"))
            .cast("double") / count(lit(1))).as("__m"))
          .select(col("cluster"), col("__pos"),
            round(col("__m"), 8).cast("float").as("__cx"))
          .groupBy(col("cluster"))
          .agg(array_sort(collect_list(struct(col("__pos"), col("__cx")))).as("__a"))
          .select(col("cluster"),
            transform(col("__a"), s => s.getField("__cx")).as("cv"))
        next.coalesce(4).write.mode("overwrite")
          .option("compression", "zstd").parquet(s"$out/centroids")
        spark.read.parquet(s"$out/centroids")
      }
      init.unpersist(); sample.unpersist()
      println(f"[10m] coarse: ${cents.count()} trained centroids from $sampled " +
        f"sample rows (1 bulk-kernel Lloyd pass incl. generator stream), " +
        f"fit ${tFit}%.0f s")
      mark("coarse")
    }
    lazy val cents = spark.read.parquet(s"$out/centroids")

    // ---- stage: hierarchy (nlist-bounded)
    if (stages("hierarchy") && !done("hierarchy")) {
      val (_, t) = time { Similarity.buildCoarseHierarchy(cents, out) }
      val l1n = spark.read.parquet(s"$out/l1").count()
      println(f"[10m] hierarchy: groups=$l1n, build ${t}%.0f s " +
        f"(driver holds ${l1n * 768 * 4 / 1e6}%.1f MB vs " +
        f"${cents.count() * 768L * 4 / 1e6}%.0f MB flat)")
      mark("hierarchy")
    }
    lazy val l1 = spark.read.parquet(s"$out/l1")
    lazy val l2 = spark.read.parquet(s"$out/l2")

    // ---- stage: assign (corpus-linear — the 10x row), chunked: each
    // 1M-row replica range is generated, hierarchy-assigned and appended
    // into the cell-partitioned store; per-chunk walls are printed so a
    // super-linear trend ACROSS chunks (e.g. a cost that grows with the
    // store already on disk) is visible, not averaged away.
    if (stages("assign")) {
      val nChunks = math.ceil(times.toDouble / ChunkReplicas).toInt
      var total = 0.0
      for (c <- 0 until nChunks) {
        if (!done(s"assign_$c")) {
          val lo = c * ChunkReplicas
          val hi = math.min(times, lo + ChunkReplicas)
          val (_, t) = time {
            Similarity.assignCellsHierarchical(gen(lo, hi), l1, l2)
              .repartition(col("cluster"))
              .write.mode("append")
              .option("compression", "zstd")
              .partitionBy("cluster")
              .parquet(s"$out/cells")
          }
          total += t
          println(f"[10m] assign chunk $c/${nChunks - 1} (replicas [$lo,$hi)): ${t}%.0f s")
          mark(s"assign_$c")
        }
      }
      if (!done("assign")) {
        val n = spark.read.parquet(s"$out/cells").count()
        println(f"[10m] hierarchical corpus assign + cells write " +
          f"($nChunks chunks, $n rows): ${total}%.0f s")
        require(n == TargetRows, s"cells store has $n rows, expected $TargetRows")
        mark("assign")
      }
    }
    lazy val cells = spark.read.parquet(s"$out/cells")

    // ---- stage: serve (truth + joint calibration + recall + facade walls)
    if (stages("serve")) {
      val k = 20
      val groups = l1.count().toInt
      val nlist = cents.count()
      val queries = gen(0, 1).filter(col("vec_id") < k)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .persist()
      queries.count()
      val (exact, tExact) = time {
        Similarity.calibrationTruth(cells, queries, k)
      }
      println(f"[10m] exact $k-query truth (one cells scan): ${tExact}%.0f s")
      def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
        val got = rows.map(r => r.getLong(0) -> r.getLong(1))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        exact.map { case (q, ids) =>
          ids.intersect(got.getOrElse(q, Set.empty)).size.toDouble / ids.size
        }.sum / exact.size
      }
      val (pair, tCal) = time {
        Similarity.calibrateNprobePair(cells, l1, l2, queries, k, 0.85,
          TargetRows, truth = Some(exact))
      }
      val (npL1, np) = pair
      println(f"[10m] joint calibrateNprobePair(0.85@$k): (nprobeL1=$npL1 of " +
        f"$groups, nprobe=$np of $nlist) in ${tCal}%.0f s")
      println(f"[10m] driver coarse state: L1 ${groups * 768 * 4 / 1e6}%.1f MB " +
        f"vs flat ${nlist * 768L * 4 / 1e6}%.0f MB")
      val (fRows, tF) = time {
        Similarity.ivfSearchBatchPrunedTwoLevel(
          cells, l1, l2, queries, npL1, np, k).collect()
      }
      println(f"[10m] float two-level (npL1=$npL1, np=$np): " +
        f"recall@$k ${recallOf(fRows)}%.3f, ${tF}%.1f s / $k-query batch")

      // facade serving (TwoLevelProbe dispatch — driver holds L1 only);
      // corpus views project off the cell store (it carries the vectors)
      val kf = cells.select(col("vec_id").as("id"), lit("kf").as("collection"),
        concat(lit("V"), (col("vec_id") / 20).cast("long")).as("video_id"),
        ((col("vec_id") % 20) / 2).cast("int").as("shot_id"),
        (col("vec_id") % 4).cast("int").as("partition_tag"))
      val emb2 = cells.select(col("vec_id").as("id"),
        col("embedding").as("clip"), reverse(col("embedding")).as("clipv2"))
      val shotsV = kf.groupBy(col("video_id"), col("shot_id"))
        .agg(sort_array(collect_list(col("id"))).as("keyframe_ids"))
      val engine = new graft.api.SearchEngine(graft.api.Corpus(kf, emb2, shotsV))
      val idx = Similarity.DenseIndex(
        centroids = cents,
        cells = cells.withColumnRenamed("vec_id", "id")
          .withColumnRenamed("embedding", "clip"),
        codebooks = spark.emptyDataFrame, codes = spark.emptyDataFrame,
        defaultNprobe = Some(np),
        l1 = Some(l1), l2 = Some(l2), defaultNprobeL1 = Some(npL1))
      val qArrs = queries.collect().map(r =>
        r.getLong(0) -> r.getSeq[Float](1).toArray)
      engine.textSearchAnn(idx, qArrs.head._2, k = k).collect() // warm
      var hit = 0.0
      val (_, tServe) = time {
        qArrs.foreach { case (qid, qv) =>
          val ids = engine.textSearchAnn(idx, qv, k = k).collect()
            .flatMap(_.getSeq[Long](2)).toSet
          hit += exact(qid).intersect(ids).size.toDouble / exact(qid).size
        }
      }
      println(f"[10m] facade textSearchAnn THROUGH the hierarchy " +
        f"(npL1=$npL1, np=$np): recall@$k ${hit / qArrs.length}%.3f, " +
        f"${tServe / qArrs.length}%.2f s/request warm serial")
    }

    // ---- stage: pq (corpus-linear encode) + quant serving rows
    if (stages("pq") && !done("pq")) {
      val (numSub, subDim, numCodes) = (96, 8, 256)
      val cut = (100000.0 / TargetRows * (1L << 60)).toLong
      val sample = cells.filter(graft.operators.Dedup.hash60(
        concat(lit("pqtrain:"), col("vec_id").cast("string"))) < lit(cut))
      val (cb, tFit) = time {
        val cb0 = Similarity.pqRefineCodebooks(sample,
          Similarity.pqCodebooks(sample, numSub, subDim, numCodes),
          numSub, subDim, iters = 1)
        cb0.coalesce(1).write.mode("overwrite")
          .option("compression", "zstd").parquet(s"$out/pq/codebooks")
        cb0.unpersist()
        spark.read.parquet(s"$out/pq/codebooks")
      }
      val (_, tEnc) = time {
        graft.sources.Store.writeClustered(
          Similarity.pqEncode(cells, cb, numSub, subDim,
            carry = Seq("cluster")),
          s"$out/pq/codes", "cluster")
      }
      println(f"[10m] PQ leg build: codebook fit ${tFit}%.0f s, " +
        f"encode+write $TargetRows rows ${tEnc}%.0f s")
      mark("pq")
    }
    if (stages("quant")) {
      val (numSub, subDim) = (96, 8)
      val k = 20
      val codebooks = spark.read.parquet(s"$out/pq/codebooks")
      val codes = spark.read.parquet(s"$out/pq/codes")
      val queries = gen(0, 1).filter(col("vec_id") < k)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        .persist()
      queries.count()
      val (exact, _) = time { Similarity.calibrationTruth(cells, queries, k) }
      def recallOf(rows: Array[org.apache.spark.sql.Row]): Double = {
        val got = rows.map(r => r.getLong(0) -> r.getLong(1))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        exact.map { case (q, ids) =>
          ids.intersect(got.getOrElse(q, Set.empty)).size.toDouble / ids.size
        }.sum / exact.size
      }
      val hier = Some((l1, l2))
      val (npL1, np) = (
        sys.env.getOrElse("SPARK_GRAFT_NPL1", "8").toInt,
        sys.env.getOrElse("SPARK_GRAFT_NP", "42").toInt)
      val (aRows, tA) = time {
        Similarity.ivfPqSearchBatchPruned(codes, codebooks, cents, queries,
          np, k, numSub, subDim, hierarchy = hier,
          nprobeL1 = Some(npL1)).collect()
      }
      println(f"[10m] ADC through hierarchy (npL1=$npL1, np=$np): " +
        f"recall@$k ${recallOf(aRows)}%.3f, ${tA}%.1f s/batch")
      for (kc <- Seq(16 * k)) {
        val (rRows, tR) = time {
          Similarity.ivfPqRefineSearchBatch(cells, codes, codebooks, cents,
            queries, np, kc, k, numSub, subDim, hierarchy = hier,
            nprobeL1 = Some(npL1)).collect()
        }
        println(f"[10m] ADC+refine kC=$kc%4d (npL1=$npL1, np=$np): " +
          f"recall@$k ${recallOf(rRows)}%.3f, ${tR}%.1f s/batch")
      }
    }
    spark.stop()
  }
}
