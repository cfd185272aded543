package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed per-key session assembly — the imperative-state counterpart of the
  * window-function sessionization in `w2_sessionize`.
  *
  * `groupByKey(...).flatMapGroups` is the batch form; the identical fold
  * lifts to Structured Streaming's `flatMapGroupsWithState` by keeping
  * `(lastTs, sessionAgg)` in `GroupState` and emitting on gap/timeout —
  * same per-key ordering contract, state bounded by one open session per
  * key. Used when session logic outgrows what lag/cumsum windows express
  * (e.g. value-dependent gaps); otherwise prefer the window form, which
  * stays in whole-stage codegen.
  */
object Sessionize {

  case class SessionRow(
    user_id: Long, session_id: Long, n_events: Long, start_ms: Long, end_ms: Long)

  /** Gap-based sessions per user over `events`; equals the window-based
    * `w2_sessionize` output (cross-checked in tests). One shuffle on the
    * key; per-group sort happens in memory, so keys must fit a group's
    * events — at 100 TB scale pre-aggregate or use the streaming form. */
  def sessions(
      spark: SparkSession, events: DataFrame, gapUs: Long): Dataset[SessionRow] = {
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        unix_micros(col("ts")).as("t"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroups { (user: Long, rows: Iterator[(Long, Long, Long)]) =>
        val sorted = rows.toArray.sortBy(r => (r._3, r._2))
        val out = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
        var sid = 0L; var n = 0L; var start = 0L; var last = Long.MinValue
        sorted.foreach { case (_, _, t) =>
          if (last == Long.MinValue || t - last > gapUs) {
            if (n > 0) out += SessionRow(user, sid, n, start / 1000, last / 1000)
            sid += 1; n = 0L; start = t
          }
          n += 1; last = t
        }
        if (n > 0) out += SessionRow(user, sid, n, start / 1000, last / 1000)
        out.iterator
      }
  }
}
