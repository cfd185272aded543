package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Result shaping: top-k and group-by-video style nesting.
  *
  * Re-expresses the reference's `group_result_by_video` (reference
  * `utils/search_utils.py:62-93`): rows grouped per video, each group's hits
  * ordered by score descending, and the *groups themselves* ordered by their
  * best (first) hit's score. Top-k itself (`index.search(k)` /
  * `argpartition`, reference `utils/faiss_processing.py:157`,
  * `utils/ocr_retrieval_engine/ocr_retrieval.py:66-75`) maps to Catalyst's
  * `TakeOrderedAndProject`, which is already a per-partition bounded heap +
  * driver merge — the argpartition optimization for free, distributed.
  */
object GroupShaping {

  /** Global top-k with a deterministic total order (tie-broken by `tiebreak`).
    * Plans as TakeOrderedAndProject: no full sort, no single-partition
    * shuffle. */
  def topK(df: DataFrame, k: Int, score: Column, tiebreak: Column*): DataFrame =
    df.orderBy((score.desc +: tiebreak.map(_.asc)): _*).limit(k)

  /** Per-group top-k via ranking window (the per-video variant). */
  def topKPerGroup(
      df: DataFrame, k: Int, group: Column, score: Column,
      tiebreak: Column*): DataFrame = {
    val w = Window.partitionBy(group).orderBy((score.desc +: tiebreak.map(_.asc)): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** `group_result_by_video`: nest hits per group, hits sorted score-desc
    * (tie: id asc), groups sorted by max score desc (reference
    * `search_utils.py:92` sorts groups by their first = best element). */
  def groupResults(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(
        max(col(scoreCol)).as("__best"),
        // sort_array over (-score, id) realizes "score desc, id asc"
        sort_array(collect_list(struct(
          (-col(scoreCol)).as("neg_score"), col(idCol).as("id"))))
          .as("__sorted"))
      .select(
        col(groupCol),
        col("__best").as("best_score"),
        transform(col("__sorted"), s => s.getField("id")).as("ids"),
        transform(col("__sorted"), s => -s.getField("neg_score")).as("scores"))
      .orderBy(col("best_score").desc, col(groupCol))

  /** `groupResults` with the nested arrays encoded as scalar strings for
    * engine-independent comparison: ids comma-joined, scores fixed-point
    * micro-encoded (x1e6, rounded to integer) then comma-joined — integer
    * text formats identically everywhere, double text does not. */
  def groupResultsCsv(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      scoreCol: String): DataFrame =
    groupResults(df, groupCol, idCol, scoreCol)
      .select(
        col(groupCol),
        col("best_score"),
        concat_ws(",", transform(col("ids"), x => x.cast("string"))).as("ids_csv"),
        concat_ws(",", transform(col("scores"),
          x => round(x * lit(1e6)).cast("long").cast("string"))).as("scores_csv"))
}
