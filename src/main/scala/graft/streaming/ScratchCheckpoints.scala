package graft.streaming

import org.apache.spark.sql.SparkSession

/** Session settings for the PER-INVOCATION THROWAWAY checkpoints the
  * oracle/bench streaming queries create (fresh checkpoint dir + memory
  * sink every run — nothing is ever restarted from them):
  *
  *  - [[org.apache.spark.sql.graftshim.NioCheckpointFileManager]] —
  *    commits checkpoint files in-process instead of through Hadoop's
  *    local filesystem, whose rename/create path forks `readlink`/
  *    `chmod`/`ls` shell processes per file without the native-hadoop
  *    library (the measured dominant blocked time of every state-store
  *    task here, r19).
  *  - checkpoint file CHECKSUMS off — Spark 4's corruption detection
  *    protects checkpoints that will be read back after a failure; a
  *    scratch checkpoint is abandoned at query end, so its tasks only
  *    paid the synchronous checksum-future await on every commit.
  *
  * Durable checkpoints (the incremental-index maintenance paths and any
  * cluster deployment) deliberately do NOT go through this: they keep
  * Spark's default manager and checksum protection.
  */
object ScratchCheckpoints {
  private val FmKey = "spark.sql.streaming.checkpointFileManagerClass"
  private val CkKey = "spark.sql.streaming.checkpoint.fileChecksum.enabled"

  /** Set the scratch-checkpoint conf on `spark`; returns a restore
    * thunk for set/restore callers sharing the session. */
  def install(spark: SparkSession): () => Unit = {
    val prevFm = spark.conf.getOption(FmKey)
    val prevCk = spark.conf.getOption(CkKey)
    spark.conf.set(FmKey,
      "org.apache.spark.sql.graftshim.NioCheckpointFileManager")
    spark.conf.set(CkKey, "false")
    () => {
      prevFm.fold(spark.conf.unset(FmKey))(spark.conf.set(FmKey, _))
      prevCk.fold(spark.conf.unset(CkKey))(spark.conf.set(CkKey, _))
    }
  }
}
