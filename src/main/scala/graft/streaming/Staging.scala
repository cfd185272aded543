package graft.streaming

/** Scratch-landing staging for the streaming oracle queries: the file
  * stream source only accepts directories, so the table file is copied
  * into a temp dir that stands in for the landing directory a real
  * incremental pipeline would watch. A table "file" may itself be a
  * directory of part files (anything Spark wrote, e.g. the ScaleProbe
  * replicas) — stage its parquet parts individually. */
object Staging {

  /** Copy `path` (single parquet file OR a Spark-written directory of
    * part files) into fresh temp dir named by `prefix`; returns the
    * staged dir. */
  def stageTable(path: String, prefix: String): java.nio.file.Path = {
    val stage = java.nio.file.Files.createTempDirectory(prefix)
    val src = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(src)) {
      val parts = java.nio.file.Files.list(src)
      try parts
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .forEach(p => java.nio.file.Files.copy(p, stage.resolve(p.getFileName)))
      finally parts.close()
    } else {
      java.nio.file.Files.copy(src, stage.resolve(src.getFileName))
    }
    stage
  }
}
