package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Focused wall for the production build's biggest corpus-bound leg
  * (BASELINE r13 phase table: full-corpus assign = 509 s of the 1543 s
  * build): time [[Similarity.assignCellsBulk]] alone at the production
  * geometry (1M x d=768 corpus, nlist=4000), noop-sinked so the cells
  * write is excluded. The corpus is the [[IvfPqScaleProbe]] expansion
  * recipe; the centroid set is 4000 corpus rows (the KERNEL wall is
  * flop/byte-bound — which vectors the centroids are changes assignment
  * values, not its cost). The r14 row-blocked + deferred-rounding kernel
  * is measured with exactly this probe (before/after in BASELINE.md).
  *
  * Run: `java -cp classes:spark-jars graft.AssignProbe
  * [sfDir] [targetRows] [nlist]`. */
object AssignProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val targetRows = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val nlist = args.lift(2).map(_.toInt).getOrElse(4000)
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
    val outDir = java.nio.file.Files.createTempDirectory("graft_assign").toString

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
    val cents = emb.orderBy("vec_id").limit(nlist)
      .select((col("vec_id") % 1000000L).cast("int").as("cluster"),
        col("embedding").as("cv"))
      .persist()
    val k = cents.count()
    // warm once (scan caching, codegen), then measure
    Similarity.assignCellsBulk(emb, cents)
      .write.format("noop").mode("overwrite").save()
    val t0 = System.nanoTime()
    Similarity.assignCellsBulk(emb, cents)
      .write.format("noop").mode("overwrite").save()
    println(f"assignCellsBulk: $n rows x $k centroids x d=768 in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s (noop sink, warm)")
    spark.stop()
  }
}
