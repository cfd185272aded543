package graft

import graft.operators.Similarity
import graft.streaming.IncrementalIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance ECONOMICS against the persisted production-regime index
  * (VERDICT r12 next-round #3): the question a 100 TB operator actually
  * asks of [[IncrementalIndex]] — what does a landed batch cost, what
  * does compaction cost, and what happens to serving latency while the
  * store fragments and after it is compacted — measured against the
  * 1M x d=768 artifacts an [[IvfPqScaleProbe]] run leaves behind.
  *
  * Flow: serve a 20-query batch-refine baseline from the build store;
  * land `numBatches` batches of `batchRows` fresh rows each through
  * [[IncrementalIndex.updateDenseIndex]] WITH the PQ + int8 + radii legs
  * (every serving artifact stays in lockstep — the full maintenance
  * bill, not just the cells append); re-serve over build ∪ incremental;
  * tombstone a slice ([[IncrementalIndex.deleteFromDenseIndex]]),
  * physically reclaim + compact ([[IncrementalIndex.compactDenseStores]]);
  * re-serve. Each step prints its wall.
  *
  * Run: `java -cp classes:spark-jars graft.IvfPqMaintainProbe
  * <probeRoot> [batchRows] [numBatches]` where probeRoot holds `emb/`
  * and `index/` from an IvfPqScaleProbe run. */
object IvfPqMaintainProbe {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.error("usage: IvfPqMaintainProbe <probeRoot> [batchRows] [numBatches]"))
    val batchRows = args.lift(1).map(_.toLong).getOrElse(10000L)
    val numBatches = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val emb = spark.read.parquet(s"$root/emb")
    val centroids = spark.read.parquet(s"$root/index/centroids")
    val codebooks = spark.read.parquet(s"$root/index/codebooks")
    val baseCells = spark.read.parquet(s"$root/index/cells")
    val baseCodes = spark.read.parquet(s"$root/index/codes")
    val params = spark.read.parquet(s"$root/index/params").head()
    val numSub = params.getAs[Int]("num_sub")
    val subDim = params.getAs[Int]("sub_dim")
    val np = params.getAs[Int]("default_nprobe")
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    println(s"IvfPqMaintainProbe: base store ${emb.count()} rows, " +
      s"PQ ${numSub}x$subDim, serving at persisted nprobe=$np; " +
      s"$numBatches batches x $batchRows rows")

    val work = java.nio.file.Files.createTempDirectory("graft_ivfpq_maint").toString
    val landing = s"$work/landing"
    val cellsInc = s"$work/cells"
    val codesInc = s"$work/codes"
    val int8Inc = s"$work/int8"
    val radiiInc = s"$work/radii"
    val ckpt = s"$work/ckpt"

    val k = 20
    val queries = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .persist()
    queries.count()
    def serveWall(cells: DataFrame, codes: DataFrame, label: String): Double = {
      val (rows, t) = time {
        Similarity.ivfPqRefineSearchBatch(cells, codes, codebooks, centroids,
          queries, np, kCoarse = 100, k = k, numSub = numSub, subDim = subDim)
          .collect()
      }
      println(f"serve[$label]: $t%.1f s for ${queries.count()} queries " +
        f"(${rows.length} result rows)")
      t
    }
    def combined(base: DataFrame, incDir: String): DataFrame =
      if (new java.io.File(incDir).exists())
        base.unionByName(spark.read.parquet(incDir).drop("batch_id"),
          allowMissingColumns = false)
      else base

    serveWall(baseCells, baseCodes, "build store, pre-ingest")

    // fresh rows in NEW directions (the wide-jitter discipline — plain
    // clones would land inside their source's cell and measure nothing),
    // hash-stride-sampled ACROSS the whole corpus so a batch really is
    // ~batchRows rows (the base ids span replicas, not 0..batchRows)
    val nBase = emb.count()
    val stride = math.max(1L, nBase / batchRows)
    def freshBatch(b: Int): DataFrame =
      emb.filter(pmod(graft.operators.Dedup.hash60(
          concat(lit(s"maint$b:"), col("vec_id"))), lit(stride)) === 0)
        .select((col("vec_id") * (numBatches + 1) + lit(b) + lit(maxId + 1))
          .as("vec_id"),
          expr(s"transform(embedding, (x, j) -> cast(x * " +
            s"(0.5d + pmod(${b}L * 2654435761L + j * 40503L, 1024) / 1024.0d) " +
            s"as float))").as("embedding"))

    var landed = 0L
    for (b <- 1 to numBatches) {
      freshBatch(b).write.mode("append").parquet(landing)
      val (_, t) = time {
        IncrementalIndex.updateDenseIndex(spark, landing, cellsInc, ckpt,
          centroids, codebooks = Some(codebooks), codesDir = Some(codesInc),
          numSub = numSub, subDim = subDim,
          radiiDir = Some(radiiInc), int8Dir = Some(int8Inc))
      }
      val total = spark.read.parquet(cellsInc).count()
      println(f"land batch $b (${total - landed} rows, cells+codes+int8+radii): $t%.1f s")
      landed = total
    }

    val incRows = spark.read.parquet(cellsInc).count()
    println(s"incremental store: $incRows rows in " +
      s"${countFiles(cellsInc)} cell files / ${countFiles(codesInc)} code files")
    serveWall(combined(baseCells, cellsInc), combined(baseCodes, codesInc),
      s"build + $numBatches uncompacted batches")

    // tombstone a slice of the landed rows, then physically reclaim + compact
    val delIds = spark.read.parquet(cellsInc)
      .select("vec_id").orderBy("vec_id").limit(2000)
    val (nDel, tDel) = time {
      IncrementalIndex.deleteFromDenseIndex(spark, cellsInc, delIds)
    }
    println(f"tombstone 2000 ids (masking delete): $tDel%.1f s ($nDel marked)")
    val (_, tComp) = time {
      IncrementalIndex.compactDenseStores(spark, cellsInc,
        codesDir = Some(codesInc),
        radiiDir = Some(radiiInc), radiiCentroids = Some(centroids))
    }
    println(f"compactDenseStores (reclaim + fold to one epoch): $tComp%.1f s")
    println(s"compacted store: ${spark.read.parquet(cellsInc).count()} rows in " +
      s"${countFiles(cellsInc)} cell files / ${countFiles(codesInc)} code files")
    serveWall(combined(baseCells, cellsInc), combined(baseCodes, codesInc),
      "build + compacted increment")
    spark.stop()
  }

  private def countFiles(dir: String): Int = {
    def walk(f: java.io.File): Int =
      if (f.isDirectory) f.listFiles().map(walk).sum
      else if (f.getName.endsWith(".parquet")) 1 else 0
    val f = new java.io.File(dir)
    if (f.exists()) walk(f) else 0
  }
}
