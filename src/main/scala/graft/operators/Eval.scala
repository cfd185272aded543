package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation — the measurement half of serving an ANN
  * index: how good are the approximate results against exact ground truth?
  * (Engine extension; the reference tunes its FAISS `nprobe` by eye —
  * `utils/faiss_processing.py` exposes the knob but ships no recall
  * harness. At 100 TB nobody can eyeball recall; the engine has to
  * measure it.)
  *
  * Conventions:
  *  - both result sets arrive as `(query_id, vec_id, rank)` with rank
  *    1..k assigned on the ROUNDED score plus an id tiebreak (the same
  *    cutoff rule every serving query here uses), so ranks are
  *    engine-portable;
  *  - per-query metric sums (DCG, IDCG) go through decimal-exact sums and
  *    are rounded to 6 — `log2` may differ across libm implementations in
  *    the last ulp, far below the rounding grain;
  *  - queries with ZERO hits stay in the output (recall 0), via a left
  *    join from the truth-side query universe — an inner hit-join would
  *    silently drop exactly the queries an evaluation exists to expose.
  *
  * Scale shape: one equi-join on `(query_id, vec_id)` + one groupBy on
  * `query_id` — both shuffles are on the evaluation batch (q×k rows),
  * never on the corpus. The expensive part is producing the exact
  * ground-truth top-k, which is a one-off audit pass (typically over a
  * hash-sampled query set, [[graft.operators.Curation.hashSample]]).
  */
object Eval {

  /** Attach 1..n ranks per query on (score desc, id asc). `scoreCol`
    * should already be rounded to the serving convention (4-6 decimals)
    * so the rank cutoff is engine-portable. */
  def ranked(results: DataFrame, queryCol: String, idCol: String,
      scoreCol: String): DataFrame = {
    val w = Window.partitionBy(col(queryCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    results.withColumn("rank", row_number().over(w))
  }

  /** Per-query KENDALL-TAU rank correlation between two rankings of the
    * same queries — the ORDER-agreement metric recall cannot see (two
    * result sets can share all k items yet order them oppositely; a
    * re-ranker evaluation needs exactly this signal). Computed over the
    * intersection of the two lists (items both sides ranked): all
    * `m(m-1)/2` pairs are classified concordant/discordant and
    * `tau = (C - D) / (m(m-1)/2)`. Integer pair counts, one rounded
    * division at the end; `m < 2` yields NULL (no pair to agree on), not
    * a division artifact. Everything is k-bounded — the pair join is at
    * most k² rows per query, never corpus-scale.
    *
    * Queries whose two lists share ZERO items — the worst-disagreement
    * case an order metric exists to expose — stay in the output with
    * `m = 0` and NULL tau: the query universe is the UNION of both
    * sides' query ids, not the hit intersection (same retention rule as
    * [[annQuality]]'s zero-hit queries). */
  def rankCorrelation(a: DataFrame, b: DataFrame,
      queryCol: String = "query_id", idCol: String = "vec_id"): DataFrame = {
    // a and b feed the universe AND the intersection join; `both` feeds
    // the per-query m-count AND a self-join (twice). All are q×k-bounded
    // evaluation batches — stage the expensive ones once (r18) instead of
    // re-running the ranking plans per consumer.
    val Seq(as, bs) = Mat.stageAllIfExpensive(Seq(a, b)) // independent: concurrent (r19)
    val universe = as.select(col(queryCol)).union(bs.select(col(queryCol))).distinct()
    val both = Mat.stageIfExpensive(
      as.select(col(queryCol), col(idCol), col("rank").as("__ra"))
        .join(bs.select(col(queryCol), col(idCol), col("rank").as("__rb")),
          Seq(queryCol, idCol)))
    val m = universe.join(
      both.groupBy(col(queryCol)).agg(count(lit(1)).as("__m")),
      Seq(queryCol), "left")
      .select(col(queryCol), coalesce(col("__m"), lit(0L)).as("m"))
    val pairs = both.as("x").join(both.as("y"),
        col(s"x.$queryCol") === col(s"y.$queryCol") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$queryCol").as(queryCol),
        when((col("x.__ra") - col("y.__ra")) * (col("x.__rb") - col("y.__rb")) > 0,
          1L).otherwise(0L).as("__conc"))
    val cd = pairs.groupBy(col(queryCol))
      .agg(sum(col("__conc")).as("__c"),
        (count(lit(1)) - sum(col("__conc"))).as("__d"))
    m.join(cd, Seq(queryCol), "left")
      .select(col(queryCol), col("m"),
        when(col("m") >= 2,
          round((col("__c") - col("__d")) /
            (col("m") * (col("m") - 1) / lit(2.0)), 6)).as("kendall_tau"))
  }

  /** Per-query recall@k, MRR@k, and (binary-gain) nDCG@k of `ann` against
    * `truth`. Inputs are `(query_id, vec_id, rank)` frames ([[ranked]]);
    * both are CLIPPED to `rank <= k` here (a longer-than-k frame cannot
    * push recall or nDCG past 1 by accident). `truth` holds the exact
    * top-k — every truth row is relevant, so per-query IDCG is
    * `Σ_{i=1..n_truth} 1/log2(i+1)` over that query's OWN truth-list
    * size: a corpus shorter than k still scores a perfect result 1.0
    * (a constant k-term series would cap it below 1). RECALL uses the
    * same per-query denominator (`min(k, truth size)` — the truth side
    * is already clipped to k): a perfect result on a short truth list
    * scores recall 1.0 AND ndcg 1.0, never the internally-inconsistent
    * ndcg=1/recall<1 a fixed-k denominator produced. On full-k truth
    * lists (every oracle here) the two denominators coincide. Output:
    * `(query_id, n_hit, recall, mrr, ndcg)`, metrics rounded to 6, one
    * row per truth-side query (zero-hit queries kept, recall 0). */
  def annQuality(ann: DataFrame, truth: DataFrame, k: Int,
      queryCol: String = "query_id", idCol: String = "vec_id"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val annK = ann.filter(col("rank") <= k)
    // truthK feeds both the per-query IDCG aggregate and the hit join —
    // stage an expensive truth plan (typically ranked exact top-k) once
    // (r18) instead of running the exact pass per consumer
    val truthK = Mat.stageIfExpensive(
      if (truth.columns.contains("rank")) truth.filter(col("rank") <= k)
      else truth)
    // per-query IDCG over the truth-list size, with the SAME engine ops
    // the per-query DCG uses (decimal-exact sum of 1/log2(i+1)) so the
    // ratio is bit-stable against the oracle
    val wi = Window.partitionBy(col(queryCol)).orderBy(col(idCol).asc)
    val idcgQ = truthK.select(col(queryCol), col(idCol))
      .withColumn("__i", row_number().over(wi))
      .groupBy(col(queryCol))
      .agg(sum((lit(1.0) / log2(col("__i") + lit(1.0))).cast("decimal(28,12)"))
        .cast("double").as("__idcg"),
        count(lit(1)).as("__nt"))
    val hits = annK.select(col(queryCol), col(idCol), col("rank"))
      .join(truthK.select(col(queryCol), col(idCol)), Seq(queryCol, idCol))
    val perQ = hits.groupBy(col(queryCol))
      .agg(count(lit(1)).as("n_hit"),
        min(col("rank")).as("__first"),
        sum((lit(1.0) / log2(col("rank") + lit(1.0))).cast("decimal(28,12)"))
          .cast("double").as("__dcg"))
    idcgQ
      .join(perQ, Seq(queryCol), "left")
      .select(col(queryCol),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)) / col("__nt").cast("double"), 6)
          .as("recall"),
        round(coalesce(lit(1.0) / col("__first"), lit(0.0)), 6).as("mrr"),
        round(coalesce(col("__dcg"), lit(0.0)) / col("__idcg"), 6).as("ndcg"))
  }
}
