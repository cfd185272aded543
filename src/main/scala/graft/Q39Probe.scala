package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for `q39_semdedup_e2e` (VERDICT r10 #4: the
  * largest r9→r10 bench mover, 2.76 → 3.87 s). The query composes four
  * stages — blocked cosine pairing, pointer-doubling components, cell
  * assignment, keeper election — and this prints each stage's time plus
  * the pair/component counts that drive them, so a bench-level drift
  * can be attributed to a stage (plan regression) or to the regenerated
  * corpus's pair structure (data). Run:
  * `java -cp classes:spark-jars graft.Q39Probe [sfDir]`. */
object Q39Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"  $label%-22s ${(System.nanoTime() - t0) / 1e9}%6.2f s"); a
    }
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println(s"q39 stage probe ($sfDir, ${emb.count()} rows)")
    val idx = SparkEntry.DenseArtifacts.ivf(spark, sfDir)
    val pairs = time("cosinePairsBlocked") {
      val p = Dedup.cosinePairsBlocked(emb, idx.centroids,
        "vec_id", "embedding", threshold = 0.45, probes = 1)
        .persist()
      println(s"    pairs = ${p.count()}")
      p
    }
    val comps = time("canonicalIds") {
      val c = Dedup.canonicalIds(pairs.select(col("i"), col("j")))
      println(s"    labeled nodes = ${c.count()}, " +
        s"components = ${c.select(col("keep_id")).distinct().count()}")
      c
    }
    val csim = time("assignCells+score") {
      val assigned = Similarity.assignCells(emb, idx.centroids)
      val s = assigned.join(idx.centroids, Seq("cluster"))
        .select(col("vec_id").as("id"),
          round(lit(-1.0) * graft.functions.VectorOps.dot(
            col("embedding"), col("cv")), 6).as("score"))
      s.count(); s
    }
    time("keepBest")(Dedup.keepBest(comps, csim).count())
    pairs.unpersist()

    // SCALE MODE (round 12 — names the cause of q39's super-linear 10x
    // ratio in the ScaleProbe table): blocked pairing's candidate volume
    // is sum(cellSize^2)/2, so at a FIXED cell count (the oracle-pinned
    // nlist=8 DenseArtifacts geometry the bench query must use) 10x data
    // means 100x candidates — quadratic by construction. A production
    // build sizes nlist with the corpus (IvfParams.auto ~ 4*sqrt(N)),
    // which keeps cell size ~sqrt(N) and candidate growth ~linear in N.
    // This measures pairing at `factor`x under both geometries (replicas
    // perturbed into new directions — the ScaleProbe/RecallScaleProbe
    // recipe — so the measurement is not the clone-group artifact).
    val factor = args.lift(1).map(_.toInt).getOrElse(0)
    if (factor > 1) {
      val big = (0 until factor).map { k =>
        if (k == 0) emb.select(col("vec_id"), col("embedding"))
        else {
          val s = 2 * (k % 32) + 1
          emb.select((col("vec_id") + lit(k.toLong * 1000000L)).as("vec_id"),
            expr(s"transform(sequence(0, 63), j -> cast(" +
              s"element_at(embedding, cast((j * $s) % 64 + 1 as int)) * " +
              s"(0.5d + pmod(${k}L * 2654435761L + j * 40503L, 1024) / 1024.0d)" +
              s" as float))").as("embedding"))
        }
      }.reduce(_ unionByName _).persist()
      val n = big.count()
      println(s"q39 scale mode: ${factor}x corpus = $n rows")
      def pairing(tag: String, cents: org.apache.spark.sql.DataFrame): Unit =
        time(s"pairing[$tag]") {
          val p = Dedup.cosinePairsBlocked(big, cents,
            "vec_id", "embedding", threshold = 0.45, probes = 1)
          println(s"    pairs = ${p.count()}")
        }
      pairing("fixed nlist=8", idx.centroids)
      val autoK = math.ceil(4 * math.sqrt(n.toDouble)).toInt
      val autoCents = time(s"kmeansFit k=$autoK") {
        Similarity.kmeansFit(big, autoK, iters = 2)
      }
      pairing(s"auto nlist=$autoK", autoCents)
      autoCents.unpersist()
      big.unpersist()
    }
    spark.stop()
  }
}
