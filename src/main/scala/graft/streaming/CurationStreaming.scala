package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** STREAMING CURATION FRONT-END: the filter -> sample -> dedup head of a
  * training-data ingest pipeline as ONE streaming query over a document
  * landing directory. (Engine extension — the batch forms are
  * [[graft.operators.TextAnalysis]] gates, [[graft.operators.Curation]]
  * sampling, [[graft.operators.Dedup.exact]].)
  *
  * Stage order is the scale design: the quality gates and the
  * hash-membership sample are PURE per-row predicates evaluated before the
  * state store, so junk and unsampled rows never enter state; only the
  * 8-byte content hash of surviving rows is keyed by `dropDuplicates` —
  * state holds one entry per distinct admitted document, not per arrival.
  *
  * Determinism: the emitted columns `(content_hash, n_tokens)` are pure
  * functions of the text, so the result SET is arrival-order and
  * batching independent and equals the batch pipeline over the same
  * corpus — which is exactly what the oracle checks (and the spec
  * re-checks under forced multi-batch execution).
  */
object CurationStreaming {

  /** A session CLONE with the state-store shuffle-partition override: the
    * streaming query plans against the clone's conf, so concurrently
    * planned queries on the caller's session (parallel suites, Verify
    * tooling) never see the override — `spark.conf.set` on the shared
    * session would leak it to every query planned during the stream. */
  private def stateSession(spark: SparkSession, n: Int): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    ScratchCheckpoints.install(s) // cloned session: no restore needed
    s
  }

  /** The pipeline over an existing landing directory; one file per
    * micro-batch so multi-batch statefulness is actually exercised. */
  def curateLanding(
      spark: SparkSession,
      landingDir: String,
      minChars: Long = 150L,
      minTokens: Long = 20L,
      rateBp: Int = 6000,
      salt: String = "scur"): DataFrame = {
    val s = stateSession(spark, 8)
    val schema = s.read.parquet(landingDir).schema
    val gated = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landingDir)
      .filter(col("n_chars") >= minChars)
      .filter(graft.operators.Curation.sampleKey(col("doc_id"), salt) < rateBp)
      .select(graft.operators.Dedup.hash60(col("text")).as("content_hash"),
        size(expr("regexp_extract_all(lower(text), '\\\\w+', 0)"))
          .cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= minTokens)
      .dropDuplicates("content_hash")
    val name = s"graft_scur_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = gated.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = s.table(name).orderBy(col("content_hash"))
    rows.cache().count()
    s.catalog.dropTempView(name)
    rows
  }

  /** Oracle-query form: stage the documents table file into a scratch
    * landing dir (stands in for the directory a real ingest watches) and
    * run the pipeline over it. */
  def curateStream(spark: SparkSession, dir: String): DataFrame =
    curateLanding(spark,
      Staging.stageTable(s"$dir/documents.parquet", "graft_scur_src").toString)

  /** STREAMING WEB-FILTER: the q38 composition (C4 line strip -> Gopher
    * document gate -> exact dedup) as one streaming query. Every gate is
    * a map-only projection ([[graft.operators.TextAnalysis.c4Clean]] /
    * [[graft.operators.TextAnalysis.gopherRules]] are scan-shaped), so
    * they all run BEFORE the state store and state again holds only the
    * 8-byte hash of each admitted document's CLEANED text. The emitted
    * columns `(content_hash, n_words)` are pure functions of the text,
    * so the result set is arrival-order and batching independent —
    * streaming dropDuplicates keeps the first ARRIVAL where the batch
    * form keeps the min id, and the oracle can only pin the set because
    * the columns cannot tell those rows apart. `synth` builds the
    * document's line structure from the raw row (the planted corpus the
    * batch oracle uses), keeping the stage a projection. */
  /** STREAMING CLASSIFIER GATE: the GPT-3 document-selection rule
    * ([[graft.operators.Curation.classifierResample]]) as a streaming
    * admission filter. The NB model is a FITTED artifact (fit once on
    * the data freeze — the load-don't-refit discipline every index here
    * follows) entering the stream as a broadcast map literal
    * ([[graft.operators.TextAnalysis.nbQualityScoreMapOnly]]), so score
    * → sigmoid → deterministic-Pareto keep are all pure per-row
    * projections evaluated BEFORE the state store; state again holds
    * only the 8-byte content hash of admitted documents. The emitted
    * columns `(content_hash, p_trusted)` are pure functions of the text
    * under the frozen model, so the result SET is arrival-order and
    * batching independent (a duplicate text is admitted iff ANY of its
    * keep-diced copies is). */
  def classifierGateLanding(
      spark: SparkSession,
      landingDir: String,
      model: DataFrame,
      salt: String = "resample"): DataFrame = {
    import graft.operators.{Curation, Dedup, TextAnalysis}
    val s = stateSession(spark, 8)
    val schema = s.read.parquet(landingDir).schema
    val docs = s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landingDir)
    // score (map-only literal-map fold, text carried through for the
    // content hash) -> sigmoid -> deterministic Pareto keep: all pure
    // per-row projections, nothing touches state until dropDuplicates
    val admitted = Curation.classifierResample(
        TextAnalysis.nbQualityScoreMapOnly(
            docs.select(col("doc_id"), col("text")), model,
            "doc_id", "text", carryCols = Seq("text"))
          .withColumn("p_trusted",
            round(lit(1.0) / (lit(1.0) + exp(-col("nb_score"))), 6)),
        "id", "p_trusted", salt = salt)
      .filter(col("kept") === 1)
      .select(Dedup.hash60(col("text")).as("content_hash"), col("p_trusted"))
      .dropDuplicates("content_hash")
    val name = s"graft_scg_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = admitted.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = s.table(name).orderBy(col("content_hash"))
    rows.cache().count()
    s.catalog.dropTempView(name)
    rows
  }

  /** Oracle-query form of the classifier gate: fit the NB model in
    * BATCH over the staged table (the fit-once freeze), then stream the
    * same files through the gate. */
  def classifierGateStream(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextAnalysis
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = TextAnalysis.nbQualityFit(
      docs.withColumn("trusted", col("lang") === lit("en")),
      "doc_id", "text", "trusted")
    classifierGateLanding(spark,
      Staging.stageTable(s"$dir/documents.parquet", "graft_scg_src").toString,
      model)
  }

  def webfilterLanding(
      spark: SparkSession,
      landingDir: String,
      synth: DataFrame => DataFrame): DataFrame = {
    import graft.operators.{Dedup, TextAnalysis}
    val s = stateSession(spark, 8)
    val schema = s.read.parquet(landingDir).schema
    val docs = synth(s.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(landingDir))
    val c4 = TextAnalysis.c4Clean(docs, "id", "text")
      .filter(col("keep_doc"))
      .select(col("id"), col("text_clean"))
    val gated = TextAnalysis
      .gopherRules(c4, "id", "text_clean", carryText = true)
      .filter(col("keep"))
      .select(Dedup.hash60(col("text_clean")).as("content_hash"),
        col("n_words"))
      .dropDuplicates("content_hash")
    val name = s"graft_swf_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = gated.writeStream
      .format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = s.table(name).orderBy(col("content_hash"))
    rows.cache().count()
    s.catalog.dropTempView(name)
    rows
  }
}
