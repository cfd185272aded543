package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-regime dimensionality probe (VERDICT r6 #6): the per-round
  * ScaleProbe measures the ANN family at the testbed's d=64 / k=8 cells,
  * but the reference's regime is d=768 CLIP vectors (`create_bin.ipynb`
  * cells 3, 8) and IVF-scale cell counts (k ~ sqrt(N) >= 4096) — where the
  * single-row packed centroid array stops being viable and
  * [[Similarity.assignCellsChunked]]'s bounded-chunk fold plus the
  * driver-side probe economics actually get exercised.
  *
  * The corpus is synthesized deterministically from the sf embeddings:
  * rows replicate with id offsets and a small per-replica scale salt (so
  * replicas are distinct vectors), and each 64-dim vector tiles 12x to
  * d=768. Centroids are the first `k` corpus rows (sampled coarse
  * quantizer — the probe measures economics, not clustering quality).
  *
  * Reported per scale (1x and `factor`x rows):
  *  - build: chunked cell assignment + cell-partitioned write (linear in
  *    rows by design — this is the train/index cost);
  *  - serve_single / serve_batch8: probe (k x 768 driver-side ranking) +
  *    PartitionFilters-pruned scan + top-k — the flat-at-10x property must
  *    hold HERE, where the probe itself costs k x d work per query. */
object DimProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(4608)
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val rowsPerCell1x = 10
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
    val outDir = java.nio.file.Files.createTempDirectory("graft_dim").toString

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val baseN = base.count()
    def corpus(times: Int): DataFrame = (0 until times).map { i =>
      base.select(
        (col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        expr(s"flatten(transform(sequence(0, 11), r -> " +
          s"transform(embedding, x -> CAST(x * (1.0d + r * 0.01d + $i * 0.001d) AS FLOAT))))")
          .as("embedding"))
    }.reduce(_ unionByName _)
    val times1 = math.max(1, math.ceil(k.toDouble * rowsPerCell1x / baseN).toInt)

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    case class Probe(rows: Long, assign: Double, write: Double,
        single: Double, batch: Double,
        int8Enc: Double, int8Serve: Double, radiiBuild: Double, range: Double)
    def run(times: Int, tag: String): Probe = {
      val c = corpus(times)
      val dir = s"$outDir/$tag"
      c.write.mode("overwrite").parquet(s"$dir/emb")
      val emb = spark.read.parquet(s"$dir/emb")
      val rows = emb.count()
      val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      val cents = emb.orderBy("vec_id").limit(k)
        .select((row_number().over(w) - 1).as("cluster"), col("embedding").as("cv"))
        .persist()
      cents.count()
      // stage split: the bulk assignment (the kernel kmeansFit routes this
      // k through — primitive-loop dots over the broadcast centroid matrix)
      // vs the 4608-directory partitioned write (file/commit overhead,
      // constant in rows at one file per cell)
      val assigned = Similarity.assignCellsBulk(emb, cents)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      val (_, tAssign) = time { assigned.count() }
      val (_, tWrite) = time {
        graft.sources.Store.writePartitioned(
          assigned.repartition(col("cluster")), s"$dir/cells", "cluster")
      }
      assigned.unpersist()
      cents.coalesce(1).write.mode("overwrite").parquet(s"$dir/centroids")
      cents.unpersist()
      val centArt = spark.read.parquet(s"$dir/centroids")
      val cells = spark.read.parquet(s"$dir/cells")
      val qv = emb.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
      def single(): Unit =
        Similarity.ivfSearchPruned(cells, centArt, qv, nprobe = 8, k = 20)
          .write.format("noop").mode("overwrite").save()
      val queries = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      def batch(): Unit =
        Similarity.ivfSearchBatchPruned(cells, centArt, queries, nprobe = 8, k = 10)
          .write.format("noop").mode("overwrite").save()
      // SQ8 leg at real dims: the byte-per-dim store is 768 bytes/row vs
      // 3072 — the encode is a one-time corpus pass, the serve scans bytes
      val (_, tEnc) = time {
        graft.sources.Store.writePartitioned(
          Similarity.int8EncodeCells(cells).repartition(col("cluster")),
          s"$dir/int8", "cluster")
      }
      val int8 = spark.read.parquet(s"$dir/int8")
      def int8Refine(): Unit =
        Similarity.ivfInt8RefineSearch(int8, cells, centArt, qv,
            nprobe = 8, kCoarse = 100, k = 20)
          .write.format("noop").mode("overwrite").save()
      // RANGE leg: radii artifact (nlist rows) + radius-bounded serving at
      // a threshold of half the probe row's self-score
      val (_, tRadii) = time {
        Similarity.cellRadii(cells, centArt).coalesce(1)
          .write.mode("overwrite").parquet(s"$dir/radii")
      }
      val radii = spark.read.parquet(s"$dir/radii")
      val self = Similarity.rangeSearch(
        cells.filter(col("vec_id") === 7), qv, minScore = -1e18)
        .head.getDouble(1)
      def range(): Unit =
        Similarity.ivfRangeSearchPruned(cells, centArt, radii, qv,
            minScore = self * 0.5)
          .write.format("noop").mode("overwrite").save()
      single(); batch(); int8Refine(); range() // warm
      val t1 = math.min(time(single())._2, time(single())._2)
      val tb = math.min(time(batch())._2, time(batch())._2)
      val t8 = math.min(time(int8Refine())._2, time(int8Refine())._2)
      val tr = math.min(time(range())._2, time(range())._2)
      val p = Probe(rows, tAssign, tWrite, t1, tb, tEnc, t8, tRadii, tr)
      println(f"[$tag] rows=$rows assign=${p.assign}%.1fs write=${p.write}%.1fs " +
        f"single=${p.single}%.2fs batch=${p.batch}%.2fs int8enc=${p.int8Enc}%.1fs " +
        f"int8serve=${p.int8Serve}%.2fs radii=${p.radiiBuild}%.1fs range=${p.range}%.2fs")
      p
    }

    val p1 = run(times1, "x1")
    // declarative-forms comparison at 1x: the chunked SQL fold computes the
    // identical argmax but evaluates k interpreted HOF-lambda dots per row —
    // the measured gap is why kmeansFit routes IVF-scale k through the
    // bulk kernel (and why the chunked form is the no-driver-matrix
    // fallback, not the default)
    locally {
      val emb1 = spark.read.parquet(s"$outDir/x1/emb")
      val w = org.apache.spark.sql.expressions.Window.orderBy("vec_id")
      val cents1 = emb1.orderBy("vec_id").limit(k)
        .select((row_number().over(w) - 1).as("cluster"), col("embedding").as("cv"))
        .persist()
      cents1.count()
      val (_, tChunk) = time {
        Similarity.assignCellsChunked(emb1, cents1, chunkSize = 1024)
          .write.format("noop").mode("overwrite").save()
      }
      cents1.unpersist()
      println(f"[x1] chunked-SQL assign for comparison: $tChunk%.1fs " +
        f"(bulk kernel: ${p1.assign}%.1fs)")
    }
    if (factor > 1) {
      val pk = run(times1 * factor, s"x$factor")
      println(f"d=768 k=$k chunked-assign probe ($sfDir, ${p1.rows} vs ${pk.rows} rows)")
      println(f"${"metric"}%-22s ${"t_1x(s)"}%10s ${"t_" + factor + "x(s)"}%10s ratio")
      def row(n: String, a: Double, b: Double): Unit =
        println(f"$n%-22s $a%10.2f $b%10.2f ${b / a}%5.1f")
      row("build_assign", p1.assign, pk.assign)
      row("build_cell_write", p1.write, pk.write)
      row("serve_single_nprobe8", p1.single, pk.single)
      row("serve_batch8_nprobe8", p1.batch, pk.batch)
      row("build_int8_encode", p1.int8Enc, pk.int8Enc)
      row("serve_int8_refine", p1.int8Serve, pk.int8Serve)
      row("build_radii", p1.radiiBuild, pk.radiiBuild)
      row("serve_range_half", p1.range, pk.range)
    }

    // PCA leg at real dims: the Gram's d² generator expansion is the
    // documented cost driver at d=768 (589,824 products per row) — the
    // fit runs over a FIXED-SIZE hash sample (corpus-INDEPENDENT, the
    // standard covariance-estimator practice the operator docs point to),
    // so what matters is the per-sample-row cost, not corpus growth; the
    // projection apply and the two-stage serve are then corpus passes of
    // m doubles per row. Measured: fit on a 1000-row sample, packed
    // m=1 projection of the FULL 1x corpus, coarse+refine serve.
    locally {
      val emb1 = spark.read.parquet(s"$outDir/x1/emb")
      val sample = graft.operators.Curation
        .hashSample(emb1, "vec_id", rateBp = (10000000.0 / p1.rows).toInt
          .max(1).min(10000), salt = "pcadim")
        .limit(1000)
      sample.persist(); val ns = sample.count()
      val (_, tFit) = time {
        Similarity.pcaPowerFit(sample, "embedding", iters = 4)
          .coalesce(1).write.mode("overwrite").parquet(s"$outDir/pca/components")
      }
      sample.unpersist()
      val comps = spark.read.parquet(s"$outDir/pca/components")
        .select(col("pos"), col("pc"))
      val (_, tProj) = time {
        Similarity.pcaProjectPacked(emb1, comps)
          .write.mode("overwrite").parquet(s"$outDir/pca/projections")
      }
      val projs = spark.read.parquet(s"$outDir/pca/projections")
      val qv = emb1.filter(col("vec_id") === 7).select(col("embedding").as("qv"))
      def serve(): Unit =
        Similarity.pcaCoarseRefineSearch(emb1, comps, qv,
            kCoarse = 100, k = 20, projections = Some(projs))
          .write.format("noop").mode("overwrite").save()
      serve() // warm
      val tServe = math.min(time(serve())._2, time(serve())._2)
      println(f"[x1] d=768 PCA leg: fit(sample=$ns)=${tFit}%.1fs " +
        f"project(full ${p1.rows} rows)=${tProj}%.1fs serve_refine=${tServe}%.2fs")
    }
    spark.stop()
  }
}
