package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins the reference precomputes imperatively at index-build time:
  *
  *  - J3, interval-overlap join: audio speech intervals x shot time ranges
  *    (reference `data_extraction/data_preparation.ipynb` cells 14-16 — a
  *    hand-written sweep with carry-over);
  *  - J4, nearest-neighbor-in-time (as-of) join: each shot midpoint to its
  *    nearest audio-segment midpoints (`find_nearest`, cells 25-26 — argsort
  *    of abs diff over the whole array).
  *
  * Both are re-expressed as scalable relational plans: the overlap join rides
  * an equi-shuffle on a derived time bucket (never a broadcast-nested-loop
  * over the corpus), and the as-of join is a single union + sort per key — a
  * sort-merge as-of, one shuffle, no range explosion.
  */
object TemporalJoins {

  /** Point-in-interval join: rows of `points` matched to rows of `intervals`
    * where `startCol <= tsCol < endCol` (both epoch-like numeric or
    * timestamp columns convertible via `unix_micros`).
    *
    * Scale design: both sides get a derived bucket key
    * `floor(t / bucketMicros)` (intervals explode to every bucket they
    * overlap via `sequence`), so the join is a plain equi-join on
    * (equiKeys..., bucket) with the residual range predicate applied after —
    * shuffle-partitionable and AQE-skew-splittable, unlike a raw non-equi
    * join which Spark would plan as broadcast-nested-loop. Duplicate hits
    * from multi-bucket intervals are impossible: a point belongs to exactly
    * one bucket.
    */
  def pointInIntervalJoin(
      points: DataFrame,
      tsCol: Column,
      intervals: DataFrame,
      startCol: Column,
      endCol: Column,
      equiKeys: Seq[String] = Nil,
      bucketMicros: Long = 3600L * 1000 * 1000): DataFrame = {
    val p = points.withColumn("__t", unix_micros(tsCol.cast("timestamp")))
      .withColumn("__bucket", floor(col("__t") / lit(bucketMicros)))
    val iv = intervals
      .withColumn("__s", unix_micros(startCol.cast("timestamp")))
      .withColumn("__e", unix_micros(endCol.cast("timestamp")))
      .withColumn("__bucket",
        explode(sequence(floor(col("__s") / lit(bucketMicros)),
                         floor(col("__e") / lit(bucketMicros)))))
    p.join(iv, equiKeys :+ "__bucket")
      .filter(col("__t") >= col("__s") && col("__t") < col("__e"))
      .drop("__t", "__s", "__e", "__bucket")
  }

  /** Interval x interval overlap join (J3 proper: audio speech intervals x
    * shot time ranges, `data_preparation.ipynb` cells 14-16 — the hand
    * written sweep with carry-over). Overlap iff `ls < re && rs < le`.
    *
    * Scale design: both interval sets explode to their covered buckets and
    * join on (equiKeys..., bucket); a pair that overlaps several buckets is
    * emitted exactly once by keeping only the bucket containing the overlap
    * start (`floor(greatest(ls, rs) / width)`) — the standard dedupe-free
    * bucketed interval join, no DISTINCT pass needed. */
  def intervalOverlapJoin(
      left: DataFrame, lStart: Column, lEnd: Column,
      right: DataFrame, rStart: Column, rEnd: Column,
      equiKeys: Seq[String] = Nil,
      bucketMicros: Long = 3600L * 1000 * 1000): DataFrame = {
    val l = left
      .withColumn("__ls", unix_micros(lStart.cast("timestamp")))
      .withColumn("__le", unix_micros(lEnd.cast("timestamp")))
      .withColumn("__bucket", explode(sequence(
        floor(col("__ls") / lit(bucketMicros)), floor(col("__le") / lit(bucketMicros)))))
    val r = right
      .withColumn("__rs", unix_micros(rStart.cast("timestamp")))
      .withColumn("__re", unix_micros(rEnd.cast("timestamp")))
      .withColumn("__bucket", explode(sequence(
        floor(col("__rs") / lit(bucketMicros)), floor(col("__re") / lit(bucketMicros)))))
    l.join(r, equiKeys :+ "__bucket")
      .filter(col("__ls") < col("__re") && col("__rs") < col("__le") &&
        col("__bucket") === floor(greatest(col("__ls"), col("__rs")) / lit(bucketMicros)))
      .drop("__ls", "__le", "__rs", "__re", "__bucket")
  }

  /** J4 proper: for each left row, the `k` nearest right rows of the same
    * key by |rightTs - leftTs| (the reference's `find_nearest` on segment
    * midpoints, `data_preparation.ipynb` cells 25-26 — argsort of abs diff,
    * take 2).
    *
    * Relational plan: index right rows per key by time order; compute each
    * left row's insertion position with one union+sort running count (same
    * single-shuffle shape as [[asofBackward]]); the k nearest are always
    * among the k positions on either side, so an explode of 2k candidate
    * indexes + equi-join + per-left rank replaces the reference's full
    * argsort. O((|L|+|R|) log) per key, no range product.
    */
  def nearestInTime(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightId: String,
      k: Int = 2): DataFrame = {
    val rIdx = right.select(col(key), col(rightTs).as("__rts"), col(rightId))
      .withColumn("__ridx", row_number().over(
        Window.partitionBy(col(key)).orderBy(col("__rts"), col(rightId))))
    val rightSide = rIdx.select(col(key), col("__rts").as("__ts"), lit(0).as("__src"))
    val leftSide = left.withColumn("__lrow", monotonically_increasing_id())
      .withColumn("__ts", col(leftTs)).withColumn("__src", lit(1))
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val withPos = leftSide.unionByName(rightSide, allowMissingColumns = true)
      .withColumn("__pos", count(when(col("__src") === 0, 1)).over(w))
      .filter(col("__src") === 1)
      .drop("__ts", "__src")
    val candIdx = withPos.withColumn("__cand",
        explode(array((-k + 1 to k).map(d => col("__pos") + d): _*)))
      .filter(col("__cand") >= 1)
    val rIdxR = rIdx.withColumnRenamed(key, "__rkey")
    val ranked = candIdx.join(rIdxR,
        candIdx(key) === rIdxR("__rkey") && candIdx("__cand") === rIdxR("__ridx"))
      .drop("__rkey")
      .withColumn("__dist", abs(unix_micros(col("__rts").cast("timestamp")) -
        unix_micros(col(leftTs).cast("timestamp"))))
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("__lrow"))
          .orderBy(col("__dist"), col("__ridx"))))
      .filter(col("__rank") <= k)
    ranked.select((left.columns.map(col) :+ col(rightId).as("nearest_id") :+
      col("__rank").cast("long").as("nearest_rank")): _*)
  }

  /** Backward as-of join: for each left row, the latest right row of the same
    * `key` with `rightTs <= leftTs`. `payload` maps right columns to output
    * names (null when no prior right row exists). `toleranceMicros` bounds
    * match staleness (pandas `merge_asof(tolerance=...)` semantics): a
    * match older than `leftTs - tolerance` is treated as absent — without
    * it, an as-of enrichment happily joins state that is hours stale.
    *
    * Implemented as union + per-key sort + running `last(ignoreNulls)`:
    * exactly one shuffle (on `key`), O(n log n) within partition, no range
    * explosion — the distributed analog of a merge-join as-of. The
    * tolerance is a post-window null-out on the carried match timestamp —
    * same plan, no extra shuffle.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Map[String, String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    val rightSide = right.select(
      col(key),
      col(rightTs).as("__ts"),
      struct(col(rightTs).as("__asof_ts") +:
          payload.toSeq.sortBy(_._2).map { case (c, out) => col(c).as(out) }: _*)
        .as("__payload"))
      .withColumn("__src", lit(0))
    val leftSide = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__src", lit(1))
    val unioned = leftSide.unionByName(rightSide, allowMissingColumns = true)
    // At equal ts the right row sorts first (src 0 < 1) => "<=" semantics.
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__src").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val lastMatch = last(col("__payload"), ignoreNulls = true).over(w)
    val guarded = toleranceMicros match {
      case Some(tol) =>
        when(unix_micros(col(leftTs).cast("timestamp")) -
          unix_micros(lastMatch.getField("__asof_ts").cast("timestamp")) <= tol,
          lastMatch)
      case None => lastMatch
    }
    val matched = unioned
      .withColumn("__m", guarded)
      .filter(col("__src") === 1)
    val outCols = left.columns.toSeq.map(col) ++
      payload.values.toSeq.sorted.map(n => col("__m").getField(n).as(n))
    matched.select(outCols: _*)
  }
}
