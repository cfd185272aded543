package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ training-depth study at production geometry (round 12): the 1M
  * IVF-PQ probe's ADC recall plateaus at ~0.855 past nprobe=16 — is
  * that the 256-code BUDGET bound or an under-trained-codebook bound?
  * `IvfParams` defaults pqIters=1 from the testbed's measured
  * diminishing-returns point (PqRefineSpec, d=64); this re-measures at
  * the production shape: FLAT ADC (no IVF cut, so coverage loss is
  * zero and the number is pure quantization) recall@20 over 96x8x256
  * codebooks refined 0/1/2/4 Lloyd iterations, with the per-iteration
  * wall (the round's bulk assignment kernel).
  *
  * Run: `java -cp classes:spark-jars graft.PqItersProbe [sfDir] [rows]`. */
object PqItersProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val targetRows = args.lift(1).map(_.toInt).getOrElse(200000)
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
    val outDir = java.nio.file.Files.createTempDirectory("graft_pq_iters").toString
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val baseN = base.count()
    val times = math.max(1, math.ceil(targetRows.toDouble / baseN).toInt)
    val corpus = (0 until times).map { r =>
      val d64 =
        if (r == 0) base
        else {
          val s = 2 * (r % 32) + 1
          base.select((col("vec_id") + lit(r.toLong * 10000000L)).as("vec_id"),
            expr(s"transform(sequence(0, 63), j -> cast(" +
              s"element_at(embedding, cast((j * $s) % 64 + 1 as int)) * " +
              s"(0.5d + pmod(${r}L * 2654435761L + j * 40503L, 1024) / 1024.0d)" +
              s" as float))").as("embedding"))
        }
      d64.select(col("vec_id"),
        expr("flatten(transform(sequence(0, 11), t -> " +
          "transform(embedding, x -> CAST(x * (1.0d + t * 0.01d) AS FLOAT))))")
          .as("embedding"))
    }.reduce(_ unionByName _)
    corpus.write.mode("overwrite").parquet(s"$outDir/emb")
    val emb = spark.read.parquet(s"$outDir/emb")
    val n = emb.count()
    val (numSub, subDim, numCentroids) = (96, 8, 256)

    val k = 20
    val queries = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
      .persist()
    queries.count()
    val exact = Similarity.knnBatch(emb, queries, k)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val init = Similarity.pqCodebooks(emb, numSub, subDim, numCentroids)
      .persist()
    init.count()
    println(s"PqItersProbe: $n rows x d=768, PQ ${numSub}x$subDim " +
      s"x$numCentroids, flat ADC recall@20 (no IVF cut) by Lloyd depth")
    println(f"${"pqIters"}%8s ${"adc recall@20"}%14s ${"refine wall (s)"}%16s ${"encode+adc (s)"}%15s")
    for (iters <- Seq(0, 1, 2, 4)) {
      val (cb, tRef) = time {
        if (iters == 0) init
        else Similarity.pqRefineCodebooks(emb, init, numSub, subDim, iters = iters)
      }
      val cbRows = cb.select(col("m"), col("c"), col("cbv")).collect()
      val (recall, tServe) = time {
        val codes = Similarity.pqEncodeBulk(emb, cbRows, numSub, subDim)
        val ann = Similarity.pqAdcScore(codes, cb, queries, k, numSub, subDim)
          .collect().map(r => r.getLong(0) -> r.getLong(1))
          .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
        exact.map { case (q, ids) =>
          ids.intersect(ann.getOrElse(q, Set.empty)).size.toDouble / ids.size
        }.sum / exact.size
      }
      println(f"$iters%8d $recall%14.3f $tRef%16.1f $tServe%15.1f")
      if (iters > 0) cb.unpersist()
    }
    init.unpersist()
    spark.stop()
  }
}
