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

  /** Backward as-of join: for each left row, the latest right row of the same
    * `key` with `rightTs <= leftTs`. `payload` maps right columns to output
    * names (null when no prior right row exists).
    *
    * Implemented as union + per-key sort + running `last(ignoreNulls)`:
    * exactly one shuffle (on `key`), O(n log n) within partition, no range
    * explosion — the distributed analog of a merge-join as-of.
    */
  def asofBackward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      payload: Map[String, String]): DataFrame = {
    val rightSide = right.select(
      col(key),
      col(rightTs).as("__ts"),
      struct(payload.toSeq.sortBy(_._2).map { case (c, out) => col(c).as(out) }: _*)
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
    val matched = unioned
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
    val outCols = left.columns.toSeq.map(col) ++
      payload.values.toSeq.sorted.map(n => col("__m").getField(n).as(n))
    matched.select(outCols: _*)
  }
}
