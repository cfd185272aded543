package graft.streaming

import graft.operators.Sessionize.SessionRow
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental sessionization over a stream of (user, eventTimeMicros):
  * `flatMapGroupsWithState` keeps one open session per key and emits a
  * session as soon as a later event proves the gap closed it. The batch
  * twin ([[graft.operators.Sessionize.sessions]]) produces the same rows for
  * the same data; this form pays one state-store lookup per key per
  * micro-batch and its state is bounded by (#active keys x 1 open session)
  * regardless of stream length.
  *
  * The reference's closest behavior is restartable incremental extraction
  * (skip-if-done, `clip.ipynb` cell 7); checkpointed state replaces the
  * filesystem-existence checks.
  */
object StatefulSessions {

  case class Open(sid: Long, start: Long, last: Long, n: Long)

  def sessionize(
      ds: Dataset[(Long, Long)], gapUs: Long): Dataset[SessionRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[Open, SessionRow](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[(Long, Long)], state: GroupState[Open]) =>
          val ts = batch.map(_._2).toArray.sorted
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionRow]
          var cur = state.getOption.orNull
          ts.foreach { t =>
            if (cur == null) {
              cur = Open(1L, t, t, 1L)
            } else if (t - cur.last > gapUs) {
              closed += SessionRow(user, cur.sid, cur.n, cur.start / 1000, cur.last / 1000)
              cur = Open(cur.sid + 1, t, t, 1L)
            } else {
              cur = cur.copy(last = math.max(cur.last, t), n = cur.n + 1)
            }
          }
          if (cur != null) state.update(cur)
          closed.iterator
      }
  }
}
