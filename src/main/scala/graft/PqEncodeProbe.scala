package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** PQ-encode economics at FAISS-production geometry (round 12): the
  * join-form encode materializes numSub x K intermediate rows per vector
  * before the partial min collapses them — 128/row at the oracle's 8x16,
  * but 24,576/row at the FAISS-typical 96x256 over d=768 (the
  * dimensionality of `create_bin.ipynb`'s flat CLIP indexes; IVF-PQ is
  * the scale-up this framework adds at that d). This times the join form vs
  * the bulk mapPartitions kernel (bit-identical output, PqEncodeSpec) on
  * a deterministic d=768 corpus tiled from the sf embeddings, at the
  * geometry the dispatch threshold routes each way.
  * Run: `java -cp classes:spark-jars graft.PqEncodeProbe [sfDir] [rows]`. */
object PqEncodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val targetRows = args.lift(1).map(_.toInt).getOrElse(20000)
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

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val baseN = base.count()
    val times = math.max(1, math.ceil(targetRows.toDouble / baseN).toInt)
    // DimProbe's replication pattern: id offsets + per-replica scale salt,
    // each 64-dim vector tiled 12x to d=768
    val corpus = (0 until times).map { i =>
      base.select(
        (col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        expr(s"flatten(transform(sequence(0, 11), r -> " +
          s"transform(embedding, x -> CAST(x * (1.0d + r * 0.01d + $i * 0.001d) AS FLOAT))))")
          .as("embedding"))
    }.reduce(_ unionByName _).persist()
    val rows = corpus.count()

    for ((numSub, subDim, k, tag) <- Seq(
        (8, 8, 16, "oracle 8x16 (128 pairs/row, d=64 slice)"),
        (96, 8, 256, "production 96x256 (24,576 pairs/row, d=768)"))) {
      val src =
        if (numSub * subDim <= 64)
          corpus.select(col("vec_id"),
            expr(s"slice(embedding, 1, ${numSub * subDim})").as("embedding"))
        else corpus
      val cb = Similarity.pqCodebooks(src, numSub, subDim, k).persist()
      val cbRows = cb.select("m", "c", "cbv").collect()
      println(s"--- $tag, $rows rows, codebook ${cbRows.length} rows ---")
      val (nJ, tJ) = time {
        Similarity.pqEncodeJoin(src, cb, numSub, subDim).count()
      }
      val (nB, tB) = time {
        Similarity.pqEncodeBulk(src, cbRows, numSub, subDim).count()
      }
      println(f"join form: ${tJ}%8.1f s   bulk kernel: ${tB}%8.1f s " +
        f"(${tJ / tB}%.1fx)   rows out: join=$nJ bulk=$nB${
          if (nJ == nB) ", EQUAL" else ", MISMATCH"}")
      val (rbJ, tRJ) = time {
        val r = Similarity.pqRefineCodebooks(src, cb, numSub, subDim,
          iters = 1, maxJoinPairs = Int.MaxValue)
        r.count(); r.unpersist(); r
      }
      val (rbB, tRB) = time {
        val r = Similarity.pqRefineCodebooks(src, cb, numSub, subDim,
          iters = 1, maxJoinPairs = 0)
        r.count(); r.unpersist(); r
      }
      println(f"refine 1 iter: join ${tRJ}%8.1f s   bulk ${tRB}%8.1f s " +
        f"(${tRJ / tRB}%.1fx)")
      cb.unpersist()
    }
    spark.stop()
  }
}
