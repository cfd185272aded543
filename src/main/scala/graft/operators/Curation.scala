package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data curation primitives: reproducible sampling, split
  * assignment, and the composed filter->dedup->sample pipeline. (Engine
  * extension beyond the reference surface.)
  *
  * Sampling is HASH-based, not RNG-based: a row is in the p% sample iff
  * `hash60(salt:id) mod 10000 < p*100`. Unlike `TABLESAMPLE`/`rand(seed)`,
  * this is (a) identical across engines, runs, partitionings, and cluster
  * sizes — a hard requirement when a 100 TB curation run must be auditable
  * and resumable; (b) stable under corpus growth — a row's membership never
  * changes when other rows appear; (c) a pure map-side predicate the scan
  * can evaluate — no shuffle, no sort, no global coordination.
  */
object Curation {

  /** Portable per-row sampling key in [0, 10000). */
  def sampleKey(id: Column, salt: String): Column =
    Dedup.hash60(concat(lit(salt), lit(":"), id.cast("string"))) % 10000

  /** Deterministic p-fraction sample (basis points: rateBp = 1500 -> 15%). */
  def hashSample(df: DataFrame, idCol: String, rateBp: Int, salt: String): DataFrame =
    df.filter(sampleKey(col(idCol), salt) < rateBp)

  /** Deterministic train/val/test assignment by hash range. `cuts` are
    * cumulative basis-point upper bounds, e.g. Seq(("train", 9000),
    * ("val", 9500), ("test", 10000)). */
  def assignSplit(
      df: DataFrame, idCol: String, salt: String,
      cuts: Seq[(String, Int)]): DataFrame = {
    val key = sampleKey(col(idCol), salt)
    val assigned = cuts.foldRight(lit(null).cast("string")) {
      case ((name, hi), rest) => when(key < hi, lit(name)).otherwise(rest)
    }
    df.withColumn("split", assigned)
  }

  /** √-temperature source-mixing rates (the data-mixing step of multi-source
    * training corpora: upsample the tail, downsample the head): target share
    * of source s is `sqrt(n_s) / Σ sqrt(n_t)`, so the per-source sampling
    * rate toward a `targetRows`-row mix is
    * `min(1, sqrt(n_s)/Z * targetRows / n_s)`, expressed in basis points.
    * `sqrt` (unlike `pow`) is IEEE-correctly-rounded in every engine, so
    * the rates — and therefore every membership decision — are bit-stable
    * cross-engine; the Σ goes through a decimal-exact sum. One tiny
    * aggregate; broadcasts everywhere it's used. */
  def temperatureMixRates(
      docs: DataFrame, srcCol: String, targetRows: Long): DataFrame = {
    val counts = docs.groupBy(col(srcCol)).agg(count(lit(1)).as("n"))
    val z = counts
      .agg(sum(sqrt(col("n")).cast("decimal(28,12)")).cast("double").as("z"))
    counts.crossJoin(broadcast(z))
      .withColumn("rate_bp",
        least(lit(10000L),
          floor(sqrt(col("n")) / col("z") * lit(targetRows.toDouble)
            / col("n") * lit(10000.0)).cast("long")))
      .select(col(srcCol), col("n"), col("rate_bp"))
  }

  /** Deterministic temperature-mixed sample: membership =
    * [[sampleKey]] < the source's [[temperatureMixRates]] rate. Map-side
    * predicate after a broadcast join of the (tiny) rate table. Pass a
    * precomputed `rates` frame when the caller also reports on it —
    * otherwise the per-source count aggregate would run twice. */
  def temperatureSample(
      docs: DataFrame, idCol: String, srcCol: String,
      targetRows: Long, salt: String,
      rates: Option[DataFrame] = None): DataFrame = {
    val r = rates.getOrElse(temperatureMixRates(docs, srcCol, targetRows))
    docs.join(broadcast(r.select(col(srcCol), col("rate_bp"))), Seq(srcCol))
      .filter(sampleKey(col(idCol), salt) < col("rate_bp"))
      .drop("rate_bp")
  }

  /** CLUSTER-BALANCED temperature mixing — topic balancing for training
    * mixes: balance by SEMANTIC cluster rather than by source label (the
    * source-label form, [[temperatureSample]], cannot rebalance topics
    * inside one giant source — exactly the situation of a web crawl).
    * Each row is assigned to its nearest centroid with the map-only
    * packed-seed [[graft.operators.Similarity.knnJoin]] (k=1 — zero
    * corpus shuffle, the [[graft.operators.Similarity.assignCells]]
    * shape), then sqrt-temperature-resampled per CLUSTER with the same
    * IEEE-exact rate table and hash-membership rule as
    * [[temperatureSample]]: head topics downsample toward
    * `sqrt(n_c)/Σ sqrt`, tail topics keep ~every row, and membership
    * stays a pure function of `(salt, id)` — stable under corpus growth,
    * auditable at 100 TB. Returns the sampled rows with their `cluster`
    * column. Pass the (tiny) `seeds` as `(seed_id, sv)` — persisted
    * centroids from [[graft.operators.Similarity.buildDenseIndex]] or any
    * fitted geometry. */
  def clusterTemperatureSample(
      rows: DataFrame,
      seeds: DataFrame,
      targetRows: Long,
      salt: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assigned = graft.operators.Similarity
      .knnJoin(rows.select(col(idCol), col(vecCol)), seeds, k = 1,
        idCol = idCol, vecCol = vecCol)
      .select(col(idCol), col("seed_id").as("cluster"))
    temperatureSample(rows.join(assigned, Seq(idCol)), idCol, "cluster",
      targetRows, salt)
  }

  /** DSIR importance weights (the hashed-n-gram importance-resampling
    * data-selection method of Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every RAW document
    * by the log-likelihood ratio of its hashed-bigram features under the
    * TARGET distribution vs the RAW distribution —
    * `Σ ln( p_target(b) / p_raw(b) )` over the doc's bigram instances,
    * with add-one smoothing over `buckets` hash buckets. High weight =
    * looks like the target domain; selection is then a rank cut
    * ([[dsirSelect]]). The published method perturbs with Gumbel noise
    * before the cut; the deterministic rank form here is the auditable
    * variant (same estimator, reproducible membership).
    *
    * Scale shape: both feature passes are corpus-linear projections into
    * an 8-byte bucket id (hashed feature space — vocabulary never
    * materializes), the model is a `buckets`-row table built by two
    * map-side-combined counts and BROADCAST into one scoring pass over
    * the raw corpus's bigram instances, and the per-doc weight goes
    * through a decimal-exact sum so partition order cannot move it. Zero
    * all-pairs, zero global sorts; the only shuffle keys are the bucket
    * id and the doc id. Output `(id, n_bigrams, dsir_weight)`; docs with
    * < 2 tokens have no features and drop out. */
  def dsirWeights(
      raw: DataFrame,
      target: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 10000): DataFrame =
    dsirScoreFromModel(raw, dsirFit(raw, target, idCol, textCol, buckets),
      idCol, textCol, buckets)

  /** The FIT half of DSIR as a persistable artifact — the `(b, llr)`
    * bucket model, one row per raw-occupied bucket, add-one smoothed on
    * both sides. Train ONCE per (target, raw-distribution) pair, write
    * the buckets-row table next to the other fitted artifacts, and score
    * every future shard with [[dsirScoreFromModel]] — the raw/target
    * corpora are never re-featurized at scoring time (the load-don't-
    * refit convention every fitted index here follows). The raw corpus
    * passed to fit stands for the raw DISTRIBUTION: any representative
    * sample works, and the model stays valid until that distribution
    * drifts.
    *
    * Default bucket space = 10^4, the paper's, justified by the round-9
    * fidelity study ([[graft.DsirBucketStudy]], BASELINE.md): at sf0.1 a
    * 1024-bucket model kept only 33% of the 10^4 selection (hash
    * collisions wash out the likelihood ratio), while 10^4 vs 10^5 agree
    * at 91% — the signal has converged at 10^4 and the model stays a
    * trivially-broadcast ~10^4-row table. */
  def dsirFit(
      raw: DataFrame,
      target: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 10000): DataFrame = {
    require(buckets > 0, s"bucket count must be positive, got $buckets")
    val rawB = dsirFeatures(raw, idCol, textCol, buckets)
    val tgtB = dsirFeatures(target, idCol, textCol, buckets)
    // the two count tables are independent: stage them CONCURRENTLY
    // (Mat.stageAllIfExpensive, r19) instead of two serial blocking jobs
    val Seq(cR, cT) = Mat.stageAllIfExpensive(Seq(
      rawB.groupBy(col("b")).agg(count(lit(1)).as("c_r")),
      tgtB.groupBy(col("b")).agg(count(lit(1)).as("c_t"))))
    // instance totals = the sum of the per-bucket counts (identical by
    // definition; buckets are non-null) — derived from the staged count
    // tables instead of a SECOND featurize pass over each corpus (r18)
    val nR = cR.agg(sum(col("c_r")).as("n_r"))
    val nT = cT.agg(sum(col("c_t")).as("n_t"))
    // buckets absent from the raw corpus can never be scored — the model
    // only needs raw-occupied rows, each add-one smoothed on both sides
    cR.join(cT, Seq("b"), "left")
      .na.fill(0L, Seq("c_t"))
      .crossJoin(broadcast(nT)).crossJoin(broadcast(nR))
      .select(col("b"),
        log(((col("c_t") + lit(1.0)) / (col("n_t") + lit(buckets))) /
          ((col("c_r") + lit(1.0)) / (col("n_r") + lit(buckets)))).as("llr"))
  }

  /** The SCORE half: one featurize pass over the docs + a broadcast join
    * against the (tiny, possibly persisted) bucket model. A bucket
    * missing from the model contributes nothing — for in-distribution
    * corpora that bucket was empty in the fit's raw sample too, so the
    * instance carries no evidence either way. */
  def dsirScoreFromModel(
      docs: DataFrame,
      model: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 10000): DataFrame =
    dsirFeatures(docs, idCol, textCol, buckets)
      .join(broadcast(model.select(col("b"), col("llr"))), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("llr").cast("decimal(28,12)")).cast("double").as("dsir_weight"))
      .select(col("id"), col("n_bigrams"), col("dsir_weight"))

  /** Hashed-bigram instance features `(id, b)` — the vocabulary never
    * materializes; only the 8-byte bucket id leaves the stage. */
  private def dsirFeatures(
      docs: DataFrame, idCol: String, textCol: String, buckets: Int): DataFrame =
    Lexical.ngrams(docs, idCol, textCol, 2)
      .select(col("id"), (Dedup.hash60(col("ngram")) % buckets).as("b"))

  /** The selection cut over [[dsirWeights]]: the `targetRows` highest-
    * weight documents (weight desc, id asc — deterministic). */
  def dsirSelect(
      raw: DataFrame,
      target: DataFrame,
      targetRows: Int,
      idCol: String = "doc_id",
      textCol: String = "text",
      buckets: Int = 10000): DataFrame =
    GroupShaping.topK(
      dsirWeights(raw, target, idCol, textCol, buckets)
        .select(col("id"), col("n_bigrams"), round(col("dsir_weight"), 6).as("dsir_weight")),
      targetRows, col("dsir_weight"), col("id"))

  /** Token-budget sequence packing (the fixed-context batching pre-pass of
    * LM training pipelines): within each `byCol` stream, docs are laid out
    * in id order and assigned to consecutive bins of `budgetTokens`; a doc
    * starts at `offset_tokens` = cumulative tokens before it, in bin
    * `cum_before div budget` (boundary docs straddle into the next bin —
    * the packer's splitting convention).
    *
    * SCALE SHAPE (r14, second pass): deterministic packing is a prefix
    * sum over an id-ordered stream, which the obvious window form
    * ([[packSequencesWindowed]], kept as the parity oracle) serializes
    * into ONE task per stream — with a single stream the whole corpus
    * funnels through one core. The first r14 form was a two-pass
    * partition-subtotal kernel; the bench caught two real problems with
    * it: (a) its two ACTIONS re-evaluated the whole upstream pipeline
    * twice (q36_curation_e2e ran 2.4x slower — the packer sits at the
    * end of an expensive pipeline), and (b) it keyed driver-side offsets
    * by `spark_partition_id`, but the two actions plan two independent
    * `repartitionByRange` exchanges whose sampled bounds are seeded per
    * physical RDD — a boundary row may land in DIFFERENT partitions
    * across the passes, silently corrupting the prefix. This form is the
    * CHUNKED parallel prefix instead, one declarative plan with no
    * partition-id coupling and no driver collect:
    *  (1) materialize the (stream, id, n_tokens) projection ONCE — the
    *      upstream pipeline runs exactly once even though two consumers
    *      (the chunk aggregate and the row pass) read it below. Scratch
    *      goes through CLUSTER-SAFE channels only: a reliable
    *      `checkpoint` when the session has a checkpoint dir configured
    *      (cluster FS), else an eager `localCheckpoint` through the
    *      block manager (executor-resident blocks, freed by the
    *      ContextCleaner once the plan is GC'd). The r14 form wrote a
    *      driver-local `java.io.tmpdir` parquet — correct at local[*]
    *      but SILENT DATA LOSS on a multi-node cluster, where each
    *      executor commits its part files to its own local disk and the
    *      read-back sees a subset. Materialization is also COST-GATED:
    *      a cheap upstream (pure scan/filter/project — no join,
    *      aggregate, window, sort or generate in the optimized plan)
    *      skips it entirely, since re-scanning twice costs less than
    *      any round-trip (q36 pays the checkpoint because its upstream
    *      is the webfilter pipeline; the plain `curation_pack_*`
    *      oracles no longer pay anything);
    *  (2) `chunk = floor(id / chunkSize)` — an ORDER-ALIGNED coarsening
    *      of the id axis (integral ids; exact long floor-div: strip the
    *      positive remainder with pmod, then integral `div` — never
    *      `/`, which routes through double and loses exactness past
    *      2^53);
    *  (3) chunk-level exclusive prefix: a window over the per-(stream,
    *      chunk) subtotals — n/chunkSize rows per stream, 4096x smaller
    *      than the row-level window (recurse the same trick if a stream
    *      ever exceeds ~10^9 chunks);
    *  (4) in-chunk exclusive prefix: a window partitioned by (stream,
    *      chunk) — bounded by chunkSize rows per task, corpus-parallel;
    *  (5) `cum_before = chunk_before + in_chunk`, joined on (stream,
    *      chunk). All integer arithmetic — engine-portable.
    * PipelineOpsSpec pins parity against the window oracle; ScaleProbe
    * carries the one-stream row. Non-integral id types fall back to the
    * window form (they have no cheap order-aligned chunking). */
  def packSequences(
      docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, byCol: String, chunkSize: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    val integralId = docs.schema(idCol).dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    if (!integralId)
      return packSequencesWindowed(docs, idCol, textCol, budgetTokens, byCol)
    val toks = docs
      .select(col(byCol), col(idCol),
        size(expr(s"regexp_extract_all(lower($textCol), '\\\\w+', 0)"))
          .cast("long").as("n_tokens"))
    // materialize the narrow projection once (the chunk aggregate + row
    // pass below are two consumers) — but only when the upstream is
    // worth it, and never through the driver's filesystem (see Scaladoc)
    val t = Mat.stageIfExpensive(toks)
    // exact floor-div for any long id (negative ids included): SQL `div`
    // truncates toward zero, so subtract the positive remainder first;
    // all-integral (Column `/` would route the quotient through double)
    val chunkOf =
      expr(s"(cast(`$idCol` as bigint) - pmod(cast(`$idCol` as bigint), " +
        s"${chunkSize.toLong}L)) div ${chunkSize.toLong}L")
    val wChunks = org.apache.spark.sql.expressions.Window
      .partitionBy(col(byCol)).orderBy(col("__chunk"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val chunkPrefix = t
      .withColumn("__chunk", chunkOf.cast("long"))
      .groupBy(col(byCol), col("__chunk"))
      .agg(sum(col("n_tokens")).as("__ct"))
      .withColumn("__chunk_before",
        coalesce(sum(col("__ct")).over(wChunks), lit(0L)))
      .select(col(byCol), col("__chunk"), col("__chunk_before"))
    val wIn = org.apache.spark.sql.expressions.Window
      .partitionBy(col(byCol), col("__chunk")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    // NULL-SAFE join keys: a null stream or a null id (null __chunk) is a
    // legitimate group in the window oracle — an equi-join would silently
    // drop those rows
    val cp = chunkPrefix
      .withColumnRenamed(byCol, "__byR").withColumnRenamed("__chunk", "__chR")
    t.withColumn("__chunk", chunkOf.cast("long"))
      .withColumn("__in", coalesce(sum(col("n_tokens")).over(wIn), lit(0L)))
      .join(cp, col(byCol) <=> col("__byR") && col("__chunk") <=> col("__chR"))
      .withColumn("cum_before", col("__chunk_before") + col("__in"))
      .withColumn("bin", expr(s"cum_before div ${budgetTokens}L"))
      .withColumn("offset_tokens", col("cum_before") % lit(budgetTokens))
      .select(col(byCol), col(idCol), col("n_tokens"),
        col("bin"), col("offset_tokens"))
  }

  /** The materialization gate for [[packSequences]]: an upstream plan is
    * worth checkpointing only when evaluating it twice would repeat real
    * work — a join, aggregate, window, sort, or row-multiplying generate
    * in the OPTIMIZED plan. A pure scan/filter/project re-reads the same
    * parquet footers twice, which is strictly cheaper than any
    * materialization round-trip — UNLESS the plan carries a
    * nondeterministic expression (rand()/uuid()/monotonically_increasing_id):
    * then the two evaluations can diverge and silently corrupt the packing
    * prefix, so materialization is mandatory regardless of plan cost. */
  private[graft] def hasExpensiveUpstream(df: DataFrame): Boolean =
    Mat.isExpensive(df)

  /** The single-window form of [[packSequences]] — ONE task per `byCol`
    * stream, the exact declarative spelling of the packing contract. Kept
    * as the PARITY ORACLE for the two-pass form (PipelineOpsSpec asserts
    * bit-identical output); not for production corpora (a one-stream
    * corpus serializes into a single task). */
  def packSequencesWindowed(
      docs: DataFrame, idCol: String, textCol: String,
      budgetTokens: Long, byCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(byCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    docs
      .select(col(byCol), col(idCol),
        size(expr(s"regexp_extract_all(lower($textCol), '\\\\w+', 0)"))
          .cast("long").as("n_tokens"))
      .withColumn("cum_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .withColumn("bin", expr(s"cum_before div ${budgetTokens}L"))
      .withColumn("offset_tokens", col("cum_before") % lit(budgetTokens))
      .drop("cum_before")
  }

  /** CCNet-style PERPLEXITY BUCKETING (Wenzek et al. 2020 §4.4: the
    * head/middle/tail split CCNet publishes its corpus in): per group
    * (language), rank docs by LM quality — higher `scoreCol` (log-prob) =
    * lower perplexity = "head" — and cut into terciles with INTEGER-exact
    * boundaries (`ceil(n/3)` as `(n+2) div 3`; no float percentile to
    * diverge). Ranking uses the ROUNDED score plus an id tiebreak, so
    * bucket membership is deterministic and engine-portable. One ranking
    * window per group, same scale shape as [[stratifiedSample]]. Adds a
    * `bucket` column ('head' | 'middle' | 'tail'). */
  def perplexityBuckets(
      scored: DataFrame, byCol: String, scoreCol: String,
      idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(byCol)).orderBy(col(scoreCol).desc, col(idCol).asc)
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col(byCol))
    scored.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .withColumn("bucket",
        when(col("__rk") <= expr("(__n + 2) div 3"), lit("head"))
          .when(col("__rk") <= expr("(2 * __n + 2) div 3"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("__rk", "__n")
  }

  /** EXACT-QUOTA stratified sampling: each stratum contributes exactly
    * `ceil(n_s * fracBp / 10000)` rows — the per-stratum proportions of the
    * output match the corpus per-stratum proportions by construction, where
    * [[hashSample]]'s per-row coin gives each stratum binomial variance
    * around its expectation (a 2% lang gets 0 rows in an unlucky small
    * sample; an eval set built that way silently loses the tail strata).
    * Rows are chosen by hash rank within the stratum (ties by id), so the
    * kept set is deterministic, engine-portable, and a new row displaces
    * only lower-ranked rows of ITS OWN stratum. The quota is integer-exact
    * (`(n*bp + 9999) div 10000`) — no float ceil. One ranking window per
    * stratum (a single shuffle on the stratum key); at 100 TB the window
    * input can be pre-filtered by a hash-range over-approximation of the
    * cutoff exactly like [[capPerSource]]. */
  def stratifiedSample(
      docs: DataFrame, idCol: String, strataCol: String,
      fracBp: Int, salt: String): DataFrame = {
    require(fracBp >= 0 && fracBp <= 10000,
      s"fracBp must be in [0, 10000], got $fracBp")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol))
      .orderBy(sampleKey(col(idCol), salt).asc, col(idCol).asc)
    val cw = org.apache.spark.sql.expressions.Window.partitionBy(col(strataCol))
    docs.withColumn("__rk", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rk") <= expr(s"(__n * $fracBp + 9999) div 10000"))
      .drop("__rk", "__n")
  }

  /** Leakage-safe split assignment: docs in the same NEAR-DUP component get
    * the same train/val/test split — splitting by raw doc id would leak
    * near-identical text across the train/eval boundary. The split key is
    * the component representative ([[Dedup.canonicalIds]] keep_id;
    * singletons represent themselves), hashed exactly like [[assignSplit]].
    * One broadcast-or-shuffle join of the (pairs-sized, usually tiny
    * relative to the corpus) component map onto the corpus. */
  def leakageSafeSplit(
      docs: DataFrame, pairs: DataFrame, idCol: String, salt: String,
      cuts: Seq[(String, Int)]): DataFrame = {
    val comp = Dedup.canonicalIds(pairs)
      .select(col("id").as(idCol), col("keep_id"))
    val keyed = docs.join(comp, Seq(idCol), "left")
      .withColumn("__rep", coalesce(col("keep_id"), col(idCol)))
    val key = sampleKey(col("__rep"), salt)
    val assigned = cuts.foldRight(lit(null).cast("string")) {
      case ((name, hi), rest) => when(key < hi, lit(name)).otherwise(rest)
    }
    keyed.withColumn("split", assigned).drop("keep_id", "__rep")
  }

  /** Per-source contribution cap (domain balancing: no single domain may
    * dominate the mix): keep at most `cap` docs per source, chosen by HASH
    * rank — deterministic, order-free, stable under corpus growth for the
    * kept set's priority order (a new doc can displace only lower-ranked
    * docs of ITS OWN source). One ranking window per source; at scale the
    * window input can be pre-filtered by a hash-range guess of the cutoff. */
  def capPerSource(
      docs: DataFrame, idCol: String, srcCol: String,
      cap: Int, salt: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(srcCol))
      .orderBy(sampleKey(col(idCol), salt).asc, col(idCol).asc)
    docs.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap)
      .drop("__rk")
  }

  /** The composed curation pipeline over a document corpus: quality-gate ->
    * exact-dedup (keep lowest id per content hash) -> deterministic sample.
    * Every stage is either a map-side predicate or one partial-aggregated
    * shuffle; the whole pipeline is one plan, resumable and auditable
    * because membership decisions depend only on content and ids. */
  def curate(
      docs: DataFrame, idCol: String, textCol: String,
      minChars: Int, maxWords: Int, sampleBp: Int, salt: String): DataFrame = {
    val gated = docs.filter(
      length(col(textCol)) >= minChars &&
        size(expr(s"regexp_extract_all(lower($textCol), '\\\\w+', 0)")) <= maxWords)
    val kept = gated
      .withColumn("__key", Dedup.hash60(col(textCol)))
      .withColumn("__keep", min(col(idCol))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("__key"))))
      .filter(col(idCol) === col("__keep"))
      .drop("__key", "__keep")
    hashSample(kept, idCol, sampleBp, salt)
  }

  /** PARETO-NOISED classifier resampling — GPT-3's document-selection
    * rule (Brown et al. 2020, Appendix A: keep a document iff
    * `np.random.pareto(α) > 1 − score`, α = 9): high-scoring documents
    * are kept near-surely while low scorers survive with a heavy-tailed
    * residual probability, so the kept corpus is quality-TILTED without
    * the hard-threshold cliff that wipes out distributional diversity.
    * Deterministic here: the Pareto draw comes from the portable hash
    * via inverse transform (`u` in [0,1) from [[sampleKey]]'s hash at
    * 10⁻⁶ resolution; `draw = round((1−u)^(−1/α) − 1, 8)` — the Lomax
    * quantile function, rounded so the keep boundary is engine-portable
    * like every score cutoff here). `scoreCol` is a probability-like
    * score in [0,1] (sigmoid a [[graft.operators.TextAnalysis
    * .nbQualityFit]] mean LLR first); NULL scores count as 0 — the
    * untrusted prior. Map-only: one hash + one pow per row, no shuffle.
    * Output: the input plus `(pareto_draw, kept INT)`. */
  def classifierResample(
      scored: DataFrame, idCol: String, scoreCol: String,
      alpha: Int = 9, salt: String = "resample"): DataFrame = {
    require(alpha >= 1, s"alpha must be >= 1, got $alpha")
    val u = (Dedup.hash60(concat(lit(salt), lit(":"), col(idCol).cast("string")))
      % 1000000L).cast("double") / lit(1000000.0)
    val draw = round(pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0), 8)
    scored
      .withColumn("pareto_draw", draw)
      .withColumn("kept",
        (col("pareto_draw") >
          lit(1.0) - coalesce(col(scoreCol), lit(0.0))).cast("int"))
  }
}
