package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Candidate-set algebra: the reference's filter assembly for every search
  * endpoint (reference `app.py:313-328,376-390`):
  * `candidates = id[] ∩ (ALL \ shot-expanded ignore) ∩ SearchSpace[s]`,
  * realized with `np.intersect1d` / `np.delete` over id arrays and pushed
  * into FAISS via `IDSelectorArray`.
  *
  * Here each filter is a semi/anti join on the id column; Catalyst reorders
  * them below scoring, so cost stays proportional to the candidate subset
  * (the reference's `faiss_processing.py:154-166` property) and the small id
  * sets broadcast instead of shuffling the corpus.
  */
object Candidates {

  /** `np.intersect1d`: keep rows of `df` whose id appears in `ids`. */
  def restrictTo(df: DataFrame, ids: DataFrame, idCol: String): DataFrame =
    df.join(broadcast(ids.select(col(idCol)).distinct()), Seq(idCol), "left_semi")

  /** `np.delete`: drop rows of `df` whose id appears in `ids`. */
  def exclude(df: DataFrame, ids: DataFrame, idCol: String): DataFrame =
    df.join(broadcast(ids.select(col(idCol)).distinct()), Seq(idCol), "left_anti")

  /** Neighborhood expansion: each id expands to `[id+lo, id+hi]` (the shot
    * ordinal window of the reference's `search_by_filter`, reference
    * `utils/search_utils.py:148-158`, which expands hits to `[s+1, s+range]`
    * forwards or `[s-range, s-1]` backwards). `sequence` + `explode` is the
    * Generator/UDTF analog — no custom Generator needed. */
  def expandNeighbors(ids: DataFrame, idCol: String, lo: Int, hi: Int): DataFrame =
    ids.select(explode(sequence(col(idCol) + lit(lo), col(idCol) + lit(hi))).as(idCol))
      .distinct()
}
