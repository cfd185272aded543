package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Gram-fit economics probe at the reference's real d=768 (VERDICT r9 #2):
  * the posexplode×posexplode Gram measured 73.7 s for a 1000-row fit
  * sample (74 ms/row — every row expands to 589,824 decimal-cast
  * products). This probe times the primitive mapPartitions kernel that
  * replaced it as [[Similarity.gramMatrixRaw]] against the kept
  * declarative oracle ([[Similarity.gramMatrixRawExplode]]) on the same
  * tiled-to-768 corpus DimProbe uses, plus the full pcaPowerFit leg on a
  * 1000-row sample. Run:
  * `java -cp classes:spark-jars graft.GramProbe [sfDir] [sampleRows]`. */
object GramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sampleRows = args.lift(1).map(_.toInt).getOrElse(1000)
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

    // the DimProbe d=768 corpus shape: each 64-dim sf vector tiled 12x
    // with a small per-tile scale so coordinates are distinct
    val emb768 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"),
        expr("flatten(transform(sequence(0, 11), r -> " +
          "transform(embedding, x -> CAST(x * (1.0d + r * 0.01d) AS FLOAT))))")
          .as("embedding"))
      .limit(sampleRows)
    emb768.persist(); val n = emb768.count()

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm both, then min-of-two like the other probes
    noop(Similarity.gramMatrixRaw(emb768))
    val tKernel = math.min(
      time(noop(Similarity.gramMatrixRaw(emb768))),
      time(noop(Similarity.gramMatrixRaw(emb768))))
    // the explode oracle at a row count that stays tolerable (74 ms/row)
    val oracleRows = math.min(n, 200L)
    val embO = emb768.limit(oracleRows.toInt).persist()
    embO.count()
    noop(Similarity.gramMatrixRawExplode(embO))
    val tExplode = time(noop(Similarity.gramMatrixRawExplode(embO)))
    val tFit = time {
      Similarity.pcaPowerFit(emb768, "embedding", iters = 4)
        .write.format("noop").mode("overwrite").save()
    }
    // the OPQ build's rotation fit: the FULL d-component deflating fit
    // (arg 3 overrides m; 0 skips) — one corpus pass + m driver-local
    // power+deflate rounds over the collected Gram
    val mRot = args.lift(2).map(_.toInt).getOrElse(768)
    val tRot = if (mRot <= 0) 0.0 else time {
      Similarity.pcaTopComponents(emb768, "embedding", m = mRot, iters = 4)
        .write.format("noop").mode("overwrite").save()
    }
    println(f"d=768 Gram probe ($sfDir, $n sample rows)")
    println(f"gram_kernel          ${tKernel}%8.2f s  (${tKernel * 1000 / n}%6.2f ms/row)")
    println(f"gram_explode_oracle  ${tExplode}%8.2f s  on $oracleRows rows " +
      f"(${tExplode * 1000 / oracleRows}%6.2f ms/row)")
    println(f"kernel speedup: ${(tExplode / oracleRows) / (tKernel / n)}%.0fx per row")
    println(f"pca_fit_iters4       ${tFit}%8.2f s  (kernel Gram + localized iterations)")
    if (mRot > 0)
      println(f"opq_rotation_fit m=$mRot ${tRot}%8.2f s  (full-basis deflating fit)")
    spark.stop()
  }
}
