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

  /** [[restrictTo]] for candidate sets TOO BIG to broadcast (a metadata
    * predicate matching millions of ids): a hand-planted RUNTIME FILTER.
    * Build a compact bloom filter over `xxhash64(id)` (distributed
    * aggregate; ~1.2 MB per million ids at 1% fpp reaches the driver, vs
    * the whole id set under the broadcast hint), prune `df` MAP-SIDE with
    * Catalyst's `BloomFilterMightContain` (stays inside the scan stage —
    * no shuffle of non-candidate rows), then exact left-semi-join only
    * the survivors (~|candidates| × (1 + fpp) rows) WITHOUT a broadcast
    * hint — Spark picks shuffle vs broadcast from the ids' actual size.
    * Bloom filters have no false negatives, so the result is row-for-row
    * identical to [[restrictTo]]; false positives only cost the semi-join
    * a few extra probe rows. This is Spark's own InjectRuntimeFilter
    * shape, planted explicitly because the serving scans are
    * partition-pruned artifact reads the auto-rule does not cover.
    *
    * The candidate set is counted first (one cheap aggregate — it doubles
    * as the empty-set guard); `expectedIds` overrides the bloom sizing
    * when the caller knows better (overestimating wastes bits,
    * underestimating raises fpp). */
  def restrictToScalable(
      df: DataFrame,
      ids: DataFrame,
      idCol: String,
      expectedIds: Long = -1L,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftshim.ColumnShim
    import org.apache.spark.sql.types.BinaryType
    val distinctIds = ids.select(col(idCol)).distinct()
    // the count doubles as the empty guard: Spark's stat.bloomFilter NPEs
    // on zero rows, and an empty candidate set restricts to nothing anyway
    val cnt = distinctIds.count()
    if (cnt == 0) return df.join(distinctIds, Seq(idCol), "left_semi")
    val n = if (expectedIds > 0) expectedIds else cnt
    val bf = distinctIds.select(xxhash64(col(idCol)).as("__h"))
      .stat.bloomFilter("__h", n, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos)
      bos.toByteArray
    }
    val mightContain = ColumnShim.column(BloomFilterMightContain(
      Literal(bytes, BinaryType),
      ColumnShim.expression(xxhash64(col(idCol)))))
    df.filter(mightContain).join(distinctIds, Seq(idCol), "left_semi")
  }

  /** Neighborhood expansion: each id expands to `[id+lo, id+hi]` (the shot
    * ordinal window of the reference's `search_by_filter`, reference
    * `utils/search_utils.py:148-158`, which expands hits to `[s+1, s+range]`
    * forwards or `[s-range, s-1]` backwards). `sequence` + `explode` is the
    * Generator/UDTF analog — no custom Generator needed. */
  def expandNeighbors(ids: DataFrame, idCol: String, lo: Int, hi: Int): DataFrame =
    ids.select(explode(sequence(col(idCol) + lit(lo), col(idCol) + lit(hi))).as(idCol))
      .distinct()
}
