package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-channel score fusion.
  *
  * Re-expresses the reference's core fusion operator
  * `merge_searching_results_by_addition` (reference
  * `utils/combine_utils.py:29-65`): per-channel min-max normalize
  * `(s - min) / (max - min + 1e-6)`, then `GROUP BY id SUM(score)`, sorted
  * descending; identity (no normalization) when only one channel is present
  * (`combine_utils.py:36-37`). Also the legacy L2 variant
  * `merge_searching_results` (`combine_utils.py:4-27`).
  *
  * Scale notes: the per-channel min/max is a 2-value global aggregate —
  * computed as a tiny agg broadcast back over the channel, so the only
  * shuffle in the whole fusion is the final groupBy(id), which benefits from
  * map-side partial aggregation. Channel cardinality is top-k-bounded
  * upstream, so at 100 TB the fused relation stays small regardless of corpus
  * size.
  */
object Fusion {

  /** Min-max normalize `scoreCol` across the whole frame (epsilon matches the
    * reference's `+ 1e-6` denominator guard). */
  def minMaxNormalize(df: DataFrame, scoreCol: String): DataFrame = {
    // the stats aggregate + the normalize pass are two consumers of the
    // channel: stage an expensive channel once (r18; channels are top-k-
    // bounded serving results by this object's contract, so the staged
    // frame is serving-scale) instead of re-running its plan twice
    val ch = Mat.stageIfExpensive(df)
    val stats = ch.agg(
      min(col(scoreCol)).as("__mn"), max(col(scoreCol)).as("__mx"))
    ch.crossJoin(broadcast(stats))
      .withColumn(
        scoreCol,
        (col(scoreCol) - col("__mn")) / (col("__mx") - col("__mn") + lit(1e-6)))
      .drop("__mn", "__mx")
  }

  /** `merge_searching_results_by_addition`: normalize each channel, union,
    * sum per id. Single channel passes through unnormalized (reference
    * `combine_utils.py:36-37`). */
  def fuseByAddition(
      channels: Seq[DataFrame],
      idCol: String = "id",
      scoreCol: String = "score"): DataFrame = {
    require(channels.nonEmpty, "fusion needs at least one channel")
    if (channels.sizeIs == 1) channels.head
    else
      channels
        .map(ch => minMaxNormalize(ch.select(col(idCol), col(scoreCol)), scoreCol))
        .reduce(_ unionByName _)
        .groupBy(col(idCol))
        .agg(sum(col(scoreCol)).as(scoreCol))
  }

  /** [[fuseByAddition]] over a channel-TAGGED relation `(chCol, idCol,
    * scoreCol)` — the shape produced by multi-channel scorers like
    * `Lexical.tfidfSearchMulti`. Per-channel min/max is a tiny groupBy
    * broadcast back over the rows (channel count is small; never a
    * single-partition window), then one groupBy(id) sum. */
  def fuseByAdditionKeyed(
      tagged: DataFrame,
      chCol: String = "ch",
      idCol: String = "id",
      scoreCol: String = "score"): DataFrame = {
    val t = Mat.stageIfExpensive(tagged)
    val stats = t.groupBy(col(chCol))
      .agg(min(col(scoreCol)).as("__mn"), max(col(scoreCol)).as("__mx"))
    t
      .join(broadcast(stats), Seq(chCol))
      .withColumn(scoreCol,
        (col(scoreCol) - col("__mn")) / (col("__mx") - col("__mn") + lit(1e-6)))
      .groupBy(col(idCol))
      .agg(sum(col(scoreCol)).as(scoreCol))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
    * `score(id) = Σ_ch 1 / (k0 + rank_ch(id))`, rank 1-based within each
    * channel by score desc with an id tiebreak. Rank-based, so per-channel
    * score calibration is irrelevant — the standard fusion for hybrid
    * sparse+dense retrieval (the reference's addition fusion
    * `combine_utils.py:29-65` needs min-max calibration; RRF does not).
    *
    * Scale notes: channels are top-k-bounded SERVING results (tens to
    * hundreds of rows each, never a corpus), so the unpartitioned ranking
    * window is a single tiny in-memory sort — the fused relation stays
    * k-bounded regardless of corpus size. Do not feed corpus-scale frames
    * here; rank them with a bounded top-k first. */
  def fuseByRrf(
      channels: Seq[DataFrame],
      k0: Int = 60,
      idCol: String = "id",
      scoreCol: String = "score"): DataFrame = {
    require(channels.nonEmpty, "fusion needs at least one channel")
    require(k0 > 0, s"RRF constant must be positive, got $k0")
    channels
      .map { ch =>
        val w = Window.orderBy(col(scoreCol).desc, col(idCol).asc)
        ch.select(col(idCol), col(scoreCol))
          .withColumn("__rrf", lit(1.0) / (lit(k0) + row_number().over(w)))
          .select(col(idCol), col("__rrf"))
      }
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(sum(col("__rrf")).as(scoreCol))
  }

  /** Legacy `merge_searching_results` (`combine_utils.py:4-27`): L2-normalize
    * each channel's score vector, concatenate, keep the best score per id. */
  def fuseLegacyL2(
      channels: Seq[DataFrame],
      idCol: String = "id",
      scoreCol: String = "score"): DataFrame = {
    require(channels.nonEmpty, "fusion needs at least one channel")
    val normed = channels.map { raw =>
      // same two-consumer staging as [[minMaxNormalize]] (r18)
      val ch = Mat.stageIfExpensive(raw)
      val stats = ch.agg(sqrt(sum(col(scoreCol) * col(scoreCol))).as("__l2"))
      ch.select(col(idCol), col(scoreCol))
        .crossJoin(broadcast(stats))
        .withColumn(scoreCol, col(scoreCol) / (col("__l2") + lit(1e-12)))
        .drop("__l2")
    }
    // best-per-id = MAX(score): a hash aggregate with map-side combine, not
    // a per-id sort window — at scale this is the difference between one
    // partial-aggregated shuffle and a full sort of the unioned channels
    normed
      .reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(max(col(scoreCol)).as(scoreCol))
  }
}
