package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data curation primitives: reproducible sampling, split
  * assignment, and the composed filter->dedup->sample pipeline. (Engine
  * extension beyond the reference surface.)
  *
  * Sampling is HASH-based, not RNG-based: a row is in the p% sample iff
  * `hash60(salt:id) mod 10000 < p*100`. Unlike `TABLESAMPLE`/`rand(seed)`,
  * this is (a) identical across engines, runs, partitionings, and cluster
  * sizes — a hard requirement when a 100 TB curation run must be auditable
  * and resumable; (b) stable under corpus growth — a row's membership never
  * changes when other rows appear; (c) a pure map-side predicate the scan
  * can evaluate — no shuffle, no sort, no global coordination.
  */
object Curation {

  /** Portable per-row sampling key in [0, 10000). */
  def sampleKey(id: Column, salt: String): Column =
    Dedup.hash60(concat(lit(salt), lit(":"), id.cast("string"))) % 10000

  /** Deterministic p-fraction sample (basis points: rateBp = 1500 -> 15%). */
  def hashSample(df: DataFrame, idCol: String, rateBp: Int, salt: String): DataFrame =
    df.filter(sampleKey(col(idCol), salt) < rateBp)

  /** Deterministic train/val/test assignment by hash range. `cuts` are
    * cumulative basis-point upper bounds, e.g. Seq(("train", 9000),
    * ("val", 9500), ("test", 10000)). */
  def assignSplit(
      df: DataFrame, idCol: String, salt: String,
      cuts: Seq[(String, Int)]): DataFrame = {
    val key = sampleKey(col(idCol), salt)
    val assigned = cuts.foldRight(lit(null).cast("string")) {
      case ((name, hi), rest) => when(key < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }

  /** The composed curation pipeline over a document corpus: quality-gate ->
    * exact-dedup (keep lowest id per content hash) -> deterministic sample.
    * Every stage is either a map-side predicate or one partial-aggregated
    * shuffle; the whole pipeline is one plan, resumable and auditable
    * because membership decisions depend only on content and ids. */
  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      minChars: Int, maxWords: Int, sampleBp: Int, salt: String): DataFrame = {
    val gated = docs.filter(
      length(col(textCol)) >= minChars &&
        size(expr(s"regexp_extract_all(lower($textCol), '\\\\w+', 0)")) <= maxWords)
    val kept = gated
      .withColumn("__key", Dedup.hash60(col(textCol)))
      .withColumn("__keep", min(col(idCol))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("__key"))))
      .filter(col(idCol) === col("__keep"))
      .drop("__key", "__keep")
    hashSample(kept, idCol, sampleBp, salt)
  }
}
