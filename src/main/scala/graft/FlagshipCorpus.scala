package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build-once 1M x d=768 flagship probe corpus (r17 — extracted from
  * [[IvfPqScaleProbe]] so the big-nlist probes can materialize `emb/`
  * without paying the full index build): the sf embeddings replicated
  * into genuinely new directions (RecallScaleProbe's permutation x
  * wide-jitter — clone-structure replicas would measure the data
  * artifact, not the index) and tiled 12x to d=768 (DimProbe's tiling).
  * A row-count-stamped done marker makes re-runs serving-only and
  * invalidates on a target change (the ServeMixFlagshipBench marker
  * discipline). */
object FlagshipCorpus {
  def ensure(
      spark: SparkSession,
      sfDir: String,
      root: String,
      targetRows: Long = 1000000L): DataFrame = {
    val done = new org.apache.hadoop.fs.Path(s"$root/emb/_graft_built")
    val fs = done.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = !fs.exists(done) || {
      val in = fs.open(done)
      val txt = try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      !txt.toLongOption.exists(_ >= targetRows)
    }
    if (stale) {
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
      corpus.write.mode("overwrite").parquet(s"$root/emb")
      val n = spark.read.parquet(s"$root/emb").count()
      val outS = fs.create(done, true)
      try outS.write(n.toString.getBytes("UTF-8")) finally outS.close()
    }
    spark.read.parquet(s"$root/emb")
  }
}
