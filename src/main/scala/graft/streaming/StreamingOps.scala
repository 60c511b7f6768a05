package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (extension — the reference is batch-only,
  * SURVEY.md §2.3). Transform builders are pure functions over DataFrames
  * so the identical logic runs on a batch frame (tested against the
  * DuckDB oracle via st1_sessionize) and on a `readStream` frame.
  */
object StreamingOps {

  /** Tumbling event-time window counts with a watermark — the canonical
    * streaming aggregation. Works on batch or streaming input. */
  def windowedCounts(events: DataFrame, window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("wstart"), col("event_type"),
        col("n"), col("sum_value"))

  final case class Event(user_id: Long, event_id: Long, tsUs: Long)
  final case class SessionUpdate(user_id: Long, n_events: Long,
      start_us: Long, end_us: Long, closed: Boolean)
  private final case class SessionState(n: Long, start: Long, end: Long)

  implicit val longEnc: Encoder[Long] = Encoders.scalaLong
  implicit val evEnc: Encoder[Event] = Encoders.product[Event]
  implicit val suEnc: Encoder[SessionUpdate] = Encoders.product[SessionUpdate]
  private implicit val stEnc: Encoder[SessionState] = Encoders.product[SessionState]

  val SessionGapUs: Long = 30L * 60 * 1000 * 1000

  /** Custom stateful operator: session tracking per user with a
    * processing-time timeout — the `mapGroupsWithState` surface. */
  def sessionizeStream(events: Dataset[Event]): Dataset[SessionUpdate] =
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.ProcessingTimeTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            SessionUpdate(userId, st.n, st.start, st.end, closed = true)
          } else {
            val evs = batch.toSeq.sortBy(e => (e.tsUs, e.event_id))
            val init = state.getOption.getOrElse(
              SessionState(0, evs.head.tsUs, evs.head.tsUs))
            val st = evs.foldLeft(init) { (acc, e) =>
              if (acc.n > 0 && e.tsUs - acc.end > SessionGapUs)
                SessionState(1, e.tsUs, e.tsUs) // new session (prior one closes)
              else SessionState(acc.n + 1, acc.start, e.tsUs)
            }
            state.update(st)
            state.setTimeoutDuration("30 minutes")
            SessionUpdate(userId, st.n, st.start, st.end, closed = false)
          }
        })

  /** flatMapGroupsWithState variant: emits ONLY closed sessions (0..n
    * outputs per group per batch — the shape mapGroupsWithState can't
    * express). Sessions close when a new event arrives past the gap. */
  def closedSessions(events: Dataset[Event]): Dataset[SessionUpdate] =
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          val evs = batch.toSeq.sortBy(e => (e.tsUs, e.event_id))
          var st = state.getOption.orNull
          val closed = Seq.newBuilder[SessionUpdate]
          evs.foreach { e =>
            if (st == null) st = SessionState(1, e.tsUs, e.tsUs)
            else if (e.tsUs - st.end > SessionGapUs) {
              closed += SessionUpdate(userId, st.n, st.start, st.end, closed = true)
              st = SessionState(1, e.tsUs, e.tsUs)
            } else st = SessionState(st.n + 1, st.start, e.tsUs)
          }
          if (st != null) state.update(st)
          closed.result().iterator
        })

  /** Streaming exact dedup — the dd1 twin for continuous ingestion:
    * per-key first-wins within the watermark horizon
    * (dropDuplicatesWithinWatermark: dedup state is keyed by the key
    * columns alone and AGES OUT with the watermark). Bounded state is
    * what makes this viable on an unbounded stream at 100 TB/day — a
    * plain dropDuplicates(keys) would grow state forever, and
    * including the timestamp in the key misses re-sends with a new
    * timestamp. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Corpus-curation transform shared VERBATIM by batch and streaming
    * inputs — the quality gates (t7 repetition stats) and PII redaction
    * (t8) are pure per-row projections/filters, so the identical Column
    * program runs on a `readStream` frame with no stateful operators:
    * the streaming ingest path of a training-data pipeline (filter +
    * redact at landing time, before anything is persisted). Expects
    * (doc_id, lang, text); emits the survivors with redacted text. */
  def curateDocs(docs: DataFrame,
      minUniqWordFrac: Double = 0.3,
      maxTop2GramFrac: Double = 0.5): DataFrame = {
    graft.functions.HashFunctions.register(docs.sparkSession)
    import graft.functions.HashFunctions.{wordNGrams => ngrams}
    val toks = ngrams(col("text"), 1)
    val g2 = ngrams(col("text"), 2)
    val top2 = aggregate(array_distinct(g2), lit(0), (acc, g) =>
      greatest(acc, size(filter(g2, x => x === g))))
    val uniqFrac = size(array_distinct(toks)).cast("double") /
      size(toks).cast("double")
    val top2Frac = when(size(g2) === 0, lit(0.0))
      .otherwise(top2.cast("double") / size(g2).cast("double"))
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "555-[0-9]{4}"
    docs
      .filter(uniqFrac >= minUniqWordFrac && top2Frac <= maxTop2GramFrac)
      .select(col("doc_id"), col("lang"),
        regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
          phoneRe, "<PHONE>").as("clean_text"))
  }

  /** Continuous ingest-and-dedup engine shared by all three signature
    * families (MinHash/Jaccard, 64-bit Hamming, hyperplane-LSH/cosine —
    * see the wrappers below). Per micro-batch: read the persisted
    * corpus signature asset, emit the batch's near-dup pairs against it
    * (and within the batch) via `pairFn`, then APPEND the batch's own
    * `sigFn` signatures to the asset — so every batch dedups against
    * the seed corpus plus all earlier batches, and the union of
    * per-batch pair outputs equals ONE batch incremental run over the
    * whole increment (StreamingSpec pins the equality across
    * micro-batches for each family).
    *
    * Exactly-once discovery under retries: both writes go to
    * deterministic per-batch subdirs with overwrite (`pairs/batch=<id>`,
    * `sigs/inc_<id>`), and the corpus read EXCLUDES the current batch's
    * own subdir, so a replayed batch recomputes the same pairs instead
    * of pairing against its failed attempt's signatures. The asset is
    * read through [[graft.api.Dedup.readSignatureAsset]], so it
    * composes with [[graft.api.Dedup.compactSignatureAsset]] run
    * between batches (folded inc dirs are skipped via the generation
    * manifest). Inner operator barriers are released per batch
    * ([[graft.api.Barrier.scoped]]), so `persist` barrier mode does not
    * accumulate cached frames over a long stream.
    *
    * Lifecycle guard: the asset root is stamped with a `_lineage`
    * marker naming this query's checkpoint dir. Restarting against the
    * same asset with a DIFFERENT checkpoint restarts batchIds at 0,
    * which would silently OVERWRITE `inc_0` (dropping a prior run's
    * signatures) — the marker turns that into a loud failure. Delete
    * `_lineage` (or the whole checkpoint+asset pair) to intentionally
    * re-seed.
    *
    * `assertDisjointIds` (opt-in; one corpus scan per batch): fail loud
    * when a batch re-uses an id already in the asset — e.g. a re-ingested
    * document. WITHOUT the flag a collision is SILENT corruption, not an
    * error: the verification union holds both rows and the batch emits
    * duplicate/incorrect pairs ([[graft.api.Dedup.assertDisjointIds]]).
    *
    * GUARD COST per micro-batch (r15, histogram-backed since r16):
    * the incremental pair generators run their two-sided
    * pair/candidate-budget prechecks PER CALL. `histKeys` (the
    * family's guard-key projection — the wrappers below pass theirs)
    * feeds each batch the asset's `_pairhist` sidecar
    * ([[graft.api.Dedup.readSignatureHistogram]]), making the precheck
    * Θ(batch + un-compacted incs) — the corpus signature asset is
    * scanned ONCE per batch (by the pair join), not twice. Before the
    * first compaction-with-`guardKeys` there is no sidecar and the
    * precheck falls back to the full aggregate (one additional
    * slim-column streamed asset scan per batch — measured
    * +0.14–0.48 s per call at sf0.1, the A/B table in STATUS r15);
    * `compactOnFinish` threads `histKeys` into the fold, so a
    * compacted asset upgrades every later run. A duplicate-heap batch
    * kills the stream LOUDLY with the estimate and remedy instead of
    * OOM'ing an executor mid-join — intended. Pipelines that pre-dedup
    * their ingest and want the scan back can set the conf
    * ([[graft.api.Dedup.PairBudgetConfKey]] /
    * [[graft.api.Dedup.CandBudgetConfKey]]) to `warn` or `off` on the
    * STREAM's session. */
  /** `groupsAsset = Some((dir, aCol, bCol))` additionally maintains a
    * CONTINUOUS (doc_id, group_id) asset — dd10's streaming twin: per
    * batch, the batch's pairs run through
    * [[graft.api.Dedup.incrementalGroups]] against the resolved groups
    * asset and the touched components' rows land as upsert dir
    * `inc_<batchId>` (latest-wins merge-on-read via
    * [[graft.api.Dedup.readGroupsAsset]];
    * [[graft.api.Dedup.compactGroupsAsset]] folds the upserts away).
    * Seed the groups dir (e.g. `base/`) with [[graft.api.Dedup
    * .duplicateGroups]] output over the corpus pairs. The resolved
    * asset after N batches equals ONE batch `duplicateGroups` over
    * corpus ∪ all processed increments — the FULL table, not just
    * touched components (StreamingSpec pins the equality).
    *
    * `compactOnFinish = true` makes the call BLOCK until the
    * AvailableNow drain terminates, then folds both assets' inc dirs
    * ([[graft.api.Dedup.compactSignatureAsset]] /
    * [[graft.api.Dedup.compactGroupsAsset]]) — the stream's natural
    * quiesce point, so the fold can never race a micro-batch.
    * `keepSuperseded` threads through to both folds (same contract as
    * the Dedup API: 0 = immediate cleanup, default 1 lets a reader
    * that planned against the previous generation finish).
    * `maxUpsertDirs` threads to the per-batch groups-asset read
    * ([[graft.api.Dedup.readGroupsAsset]]'s accumulation guard): a
    * stream draining a backlog larger than the default 64 batches
    * between compactions must either raise it here or compact — the
    * knob must be reachable from the streaming API, or the guard's
    * documented remedy would be unreachable exactly where batches
    * accumulate. */
  def incrementalPairStream(docs: DataFrame,
      sigFn: DataFrame => DataFrame,
      pairFn: (DataFrame, DataFrame, Option[DataFrame]) => DataFrame,
      corpusSigDir: String, pairsOutDir: String, checkpointDir: String,
      idCol: String = "doc_id", assertDisjointIds: Boolean = false,
      groupsAsset: Option[(String, String, String)] = None,
      compactOnFinish: Boolean = false,
      keepSuperseded: Int = 1,
      maxUpsertDirs: Int = graft.api.Dedup.DefaultMaxUpsertDirs,
      histKeys: Option[DataFrame => DataFrame] = None):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val query = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        requireLineage(s, corpusSigDir, checkpointDir)
        groupsAsset.foreach { case (gDir, _, _) =>
          requireLineage(s, gDir, checkpointDir) }
        val corpusSigs = graft.api.Dedup.readSignatureAsset(
          s, corpusSigDir, excludeInc = Some(s"inc_$batchId"))
        // the guard sidecar shares the asset read's exclusion contract:
        // a replayed batch must not precheck against its failed attempt
        val corpusHist = histKeys.flatMap(gk =>
          graft.api.Dedup.readSignatureHistogram(
            s, corpusSigDir, gk, excludeInc = Some(s"inc_$batchId")))
        graft.api.Barrier.scoped {
          val incSigs = graft.api.Barrier(sigFn(batch.toDF()))
          if (assertDisjointIds)
            graft.api.Dedup.assertDisjointIds(corpusSigs, incSigs, idCol)
          pairFn(corpusSigs, incSigs, corpusHist)
            .write.mode("overwrite").parquet(s"$pairsOutDir/batch=$batchId")
          groupsAsset.foreach { case (gDir, aCol, bCol) =>
            // read back the just-written pairs (deterministic, avoids
            // recomputing the band join) and upsert the touched
            // components; the groups read excludes this batch's own
            // upsert so a replayed batch resolves the same base state
            val batchPairs = s.read.parquet(s"$pairsOutDir/batch=$batchId")
            graft.api.Dedup.incrementalGroups(
                graft.api.Dedup.readGroupsAsset(
                  s, gDir, excludeInc = Some(s"inc_$batchId"),
                  maxUpsertDirs = maxUpsertDirs),
                batchPairs, aCol, bCol)
              .write.mode("overwrite").parquet(s"$gDir/inc_$batchId")
          }
          incSigs.write.mode("overwrite").parquet(s"$corpusSigDir/inc_$batchId")
        }
        ()
      }
      .start()
    // Compaction at the stream's natural quiesce point: AvailableNow
    // drains the source and terminates, so after awaitTermination no
    // batch can be in flight — exactly the window the compaction
    // contract requires. Opting in makes this call BLOCK until the
    // drain completes; both assets then fold their inc dirs (retention
    // defaults apply). A failed stream skips compaction — the exception
    // surfaces from awaitTermination untouched.
    if (compactOnFinish) {
      query.awaitTermination()
      val s = docs.sparkSession
      graft.api.Dedup.compactSignatureAsset(s, corpusSigDir, keepSuperseded,
        histKeys)
      groupsAsset.foreach { case (gDir, _, _) =>
        graft.api.Dedup.compactGroupsAsset(s, gDir, keepSuperseded) }
    }
    query
  }

  /** Couple the asset's lifecycle to ONE checkpoint lineage: batchIds
    * are only unique within a checkpoint, and `inc_<batchId>` names key
    * the asset's retry idempotence. First batch stamps the marker;
    * later batches (and restarts from the same checkpoint) verify it.
    * Both sides compare FS-QUALIFIED (scheme + absolute, slash-
    * normalized), so the same checkpoint passed as relative vs
    * absolute, with a trailing slash, or through an explicit file:
    * scheme never false-fails a legitimate restart. The first stamp is
    * create-if-absent (overwrite = false): two streams adopting a
    * fresh asset concurrently race to one winner, and the loser
    * verifies against the winner's stamp instead of clobbering it. */
  private[streaming] def requireLineage(s: SparkSession, corpusSigDir: String,
      checkpointDir: String): Unit = {
    val conf = s.sparkContext.hadoopConfiguration
    def qualified(d: String): String = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).makeQualified(p).toString
    }
    val marker = new org.apache.hadoop.fs.Path(corpusSigDir, "_lineage")
    val fs = marker.getFileSystem(conf)
    val mine = qualified(checkpointDir)
    def verify(): Unit = {
      val in = fs.open(marker)
      val prior =
        try scala.io.Source.fromInputStream(in).mkString.trim
        finally in.close()
      // create-then-write is not atomic: an empty marker is either the
      // stamp race's microsecond window (retry resolves it) or a
      // stamping stream that crashed mid-write (delete to re-stamp) —
      // fail with THAT diagnosis, not a Path-from-empty-string error
      require(prior.nonEmpty,
        s"empty _lineage marker at $marker — a stamping stream crashed " +
          "between create and write (or is stamping right now). Retry; " +
          "if the marker stays empty, delete it to re-stamp.")
      require(qualified(prior) == mine,
        s"signature asset at $corpusSigDir belongs to checkpoint lineage " +
          s"'$prior' but this query runs under '$checkpointDir' — a fresh " +
          "checkpoint restarts batchIds at 0 and would silently overwrite " +
          "inc_0. Reuse the original checkpoint dir, or delete the " +
          "_lineage marker to intentionally adopt the asset.")
    }
    if (fs.exists(marker)) verify()
    else try {
      val out = fs.create(marker, false) // atomic first-stamp
      try out.write((mine + "\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch { // lost the stamp race: hold this stream to the winner's lineage
      case _: java.io.IOException => verify()
    }
  }

  /** dd7's streaming twin — MinHash/Jaccard family. `corpusSigDir` must
    * be seeded (e.g. subdir `base/`) with
    * [[graft.api.Dedup.minhashSignatures]] output of the same
    * (bands, rows) geometry. `groupsDir` (optional) additionally
    * maintains the continuous (doc_id, group_id) asset — see
    * [[incrementalPairStream]]. */
  def incrementalDedupStream(docs: DataFrame, idCol: String, textCol: String,
      corpusSigDir: String, pairsOutDir: String, checkpointDir: String,
      bands: Int, rows: Int, threshold: Double,
      assertDisjointIds: Boolean = false,
      groupsDir: Option[String] = None,
      compactOnFinish: Boolean = false,
      keepSuperseded: Int = 1,
      maxUpsertDirs: Int = graft.api.Dedup.DefaultMaxUpsertDirs):
      org.apache.spark.sql.streaming.StreamingQuery =
    incrementalPairStream(docs,
      df => graft.api.Dedup.minhashSignatures(df, idCol, textCol, bands, rows),
      (c, i, h) => graft.api.Dedup.incrementalJaccardPairs(c, i, threshold, h),
      corpusSigDir, pairsOutDir, checkpointDir, "doc_id", assertDisjointIds,
      groupsDir.map(d => (d, "doc_a", "doc_b")), compactOnFinish,
      keepSuperseded, maxUpsertDirs,
      histKeys = Some(graft.api.Dedup.jaccardGuardKeys))

  /** dd8's streaming twin — 64-bit Hamming family (SimHash text sigs,
    * mm8 perceptual image hashes). Input stream carries PRECOMPUTED
    * signatures (idCol, sigCol); seed the asset with the same (id, sig)
    * projection of the corpus. */
  def incrementalHammingStream(sigs: DataFrame, idCol: String, sigCol: String,
      corpusSigDir: String, pairsOutDir: String, checkpointDir: String,
      maxHamming: Int = 3, assertDisjointIds: Boolean = false,
      groupsDir: Option[String] = None,
      compactOnFinish: Boolean = false,
      keepSuperseded: Int = 1,
      maxUpsertDirs: Int = graft.api.Dedup.DefaultMaxUpsertDirs):
      org.apache.spark.sql.streaming.StreamingQuery =
    incrementalPairStream(sigs,
      df => df.select(col(idCol).as("doc_id"), col(sigCol).as("sig")),
      (c, i, h) => graft.api.Dedup.incrementalHammingPairs(
        c, i, "doc_id", "sig", maxHamming, h),
      corpusSigDir, pairsOutDir, checkpointDir, "doc_id", assertDisjointIds,
      groupsDir.map(d => (d, "doc_a", "doc_b")), compactOnFinish,
      keepSuperseded, maxUpsertDirs,
      histKeys = Some(graft.api.Dedup.hammingGuardKeys("sig")))

  /** dd9's streaming twin — hyperplane-LSH/cosine family. Seed the
    * asset with [[graft.api.Dedup.lshSignatureTable]] output of the
    * same (tables, planes) geometry. `radius` (default 1, the
    * pre-r18 contract) expands each micro-batch's probe masks like
    * the batch verb — size it with
    * [[graft.api.Similarity.lshIncRadiusFor]] at the asset geometry,
    * or use the `(tables, planes, threshold, recallTarget)` AUTO
    * overload below (r19), which derives it the same way; the
    * candidate guard prices the expanded mask set per batch
    * through the sidecar path. */
  def incrementalEmbeddingStream(vecs: DataFrame, idCol: String, vecCol: String,
      corpusSigDir: String, pairsOutDir: String, checkpointDir: String,
      tables: Int, planes: Int, threshold: Double, probes: Int = 0,
      assertDisjointIds: Boolean = false,
      groupsDir: Option[String] = None,
      compactOnFinish: Boolean = false,
      keepSuperseded: Int = 1,
      maxUpsertDirs: Int = graft.api.Dedup.DefaultMaxUpsertDirs,
      radius: Int = 1):
      org.apache.spark.sql.streaming.StreamingQuery =
    incrementalPairStream(vecs,
      df => graft.api.Dedup.lshSignatureTable(df, idCol, vecCol, tables, planes),
      (c, i, h) => graft.api.Dedup.incrementalEmbeddingPairs(
        c, i, threshold, probes, h, radius),
      corpusSigDir, pairsOutDir, checkpointDir, "vec_id", assertDisjointIds,
      groupsDir.map(d => (d, "vec_a", "vec_b")), compactOnFinish,
      keepSuperseded, maxUpsertDirs,
      histKeys = Some(graft.api.Dedup.embeddingGuardKeys))

  /** AUTO-RADIUS [[incrementalEmbeddingStream]] (r18 verdict item #3
    * — the batch `(tables, planes)` auto overload mirrored to the
    * stream twin, which until r19 asked the caller to size the probe
    * radius by hand): `tables`/`planes` are the geometry the
    * signature ASSET at `corpusSigDir` was built at (fixed —
    * re-sizing them re-encodes the corpus), probes = planes (full
    * multi-probe, dd9's committed discipline), and the per-batch
    * probe RADIUS comes from [[graft.api.Similarity.lshIncRadiusFor]]
    * at `recallTarget`: the first rung of the 1–3 ladder whose
    * closed-form model recall holds the target at `threshold` inside
    * the [[graft.api.Similarity.LshMaxCandFracKey]] candidate
    * budget. The ladder is pure arithmetic over the asset geometry —
    * no data is touched — so the radius is derived once at stream
    * start and every micro-batch probes at it; the candidate guard
    * still prices each batch's expanded mask set through the sidecar
    * path. Output ≡ the batch auto overload over the accumulated
    * increments (batch≡stream pinned in StreamingSpec). No default
    * arguments (Scala allows one defaulted overload per name — the
    * manual-radius overload holds them); compose `groupsDir`/
    * compaction via that overload, passing the derived radius
    * explicitly. */
  def incrementalEmbeddingStream(vecs: DataFrame, idCol: String, vecCol: String,
      corpusSigDir: String, pairsOutDir: String, checkpointDir: String,
      tables: Int, planes: Int, threshold: Double, recallTarget: Double):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val radius = graft.api.Similarity.lshIncRadiusFor(
      tables, planes, planes, threshold, vecs.sparkSession, recallTarget)
    incrementalEmbeddingStream(vecs, idCol, vecCol, corpusSigDir,
      pairsOutDir, checkpointDir, tables, planes, threshold,
      probes = planes, radius = radius)
  }

  /** s7's streaming twin — CONTINUOUS PQ index maintenance: each
    * micro-batch of new vectors is encoded against the FROZEN
    * codebooks at `booksDir` (one map-only pass — no retraining, the
    * standard PQ operating discipline) and appended to the index asset
    * at `indexDir` as `inc_<batchId>` — replay-idempotent (overwrite),
    * lineage-stamped like the dedup assets, and visible to
    * [[graft.api.Similarity.pqTopKFromIndex]] readers through the same
    * manifest-gated [[graft.api.Dedup.readSignatureAsset]] layout
    * (seed the asset with [[graft.api.Similarity.pqEncodeIndex]]
    * output under `base/`). `compactOnFinish` folds the drained
    * batches at the AvailableNow quiesce point, exactly as the
    * signature assets do. */
  def pqIndexStream(vecs: DataFrame, idCol: String, vecCol: String,
      booksDir: String, indexDir: String, checkpointDir: String,
      compactOnFinish: Boolean = false, keepSuperseded: Int = 1):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val query = vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        requireLineage(s, indexDir, checkpointDir)
        graft.api.Barrier.scoped {
          graft.api.Similarity.pqEncodeIndex(
              batch.toDF(), s.read.parquet(booksDir), idCol, vecCol)
            .write.mode("overwrite").parquet(s"$indexDir/inc_$batchId")
        }
        ()
      }
      .start()
    if (compactOnFinish) {
      query.awaitTermination()
      graft.api.Dedup.compactSignatureAsset(
        vecs.sparkSession, indexDir, keepSuperseded)
      ()
    }
    query
  }

  /** ex5's streaming twin — CONTINUOUS sequence packing: each
    * micro-batch of documents continue-packs AFTER the frozen corpus
    * layout ([[graft.api.Export.packSequencesAfter]] — corpus
    * sequences never rewritten, Θ(batch) work + one broadcast row),
    * appending `inc_<batchId>` to the pack asset at `packDir` (seed
    * with [[graft.api.Export.seedPackAsset]]) and advancing the
    * `_totals` sidecar — the sidecar row is derived from the WRITTEN
    * inc dir and lands strictly after it, so a crashed attempt is
    * invisible to the next batch. Replay-idempotent: a replayed batch
    * overwrites its own dirs and reads its PREDECESSOR's total (its
    * own sidecar row is excluded from the max). Lineage-stamped like
    * the dedup assets. `compactOnFinish` folds the drained inc dirs
    * into a new generation at the AvailableNow quiesce point — pure
    * concatenation, since the per-batch layouts are disjoint token
    * ranges — and collapses the sidecar. Batch ≡ stream (pinned in
    * StreamingSpec): the asset after N batches equals applying
    * packSequencesAfter sequentially at the same batch boundaries. */
  def packIncrementStream(docs: DataFrame, idCol: String, tokensCol: String,
      packDir: String, checkpointDir: String, seed: Long, seqLen: Long,
      compactOnFinish: Boolean = false, keepSuperseded: Int = 1):
      org.apache.spark.sql.streaming.StreamingQuery = {
    val query = docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        requireLineage(s, packDir, checkpointDir)
        graft.api.Barrier.scoped {
          val prev = graft.api.Export.readPackTotal(s, packDir,
            exclude = Some(s"inc_$batchId"))
          val base = s.range(1).select(lit(prev).as("base_tokens"))
          graft.api.Export.packSequencesAfter(batch.toDF(), idCol, tokensCol,
              base, seed, seqLen)
            .write.mode("overwrite").parquet(s"$packDir/inc_$batchId")
          s.read.parquet(s"$packDir/inc_$batchId")
            .agg(coalesce(max(col("cum_before") + col(tokensCol)), lit(prev))
              .as("end_total"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$packDir/_totals/inc_$batchId")
        }
        ()
      }
      .start()
    if (compactOnFinish) {
      query.awaitTermination()
      graft.api.Dedup.compactSignatureAsset(
        docs.sparkSession, packDir, keepSuperseded)
      graft.api.Export.collapsePackTotals(docs.sparkSession, packDir)
      ()
    }
    query
  }

  /** Idempotent micro-batch sink: foreachBatch + deterministic
    * per-batch output paths, the standard exactly-once-to-storage
    * recipe (a replayed batch overwrites the same path instead of
    * appending duplicates). */
  def toIdempotentParquetSink(df: DataFrame, outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
      batch.write.mode("overwrite").parquet(s"$outDir/batch=$id")
    }

  /** The landing schema's `ts` type. A file stream needs its schema up
    * front, so dispatch-on-observed-type means probing an existing
    * file's footer: batch-infer if the landing dir already has data
    * (a stream started on a populated dir — the spec and backfill
    * shape), else assume the current fixture generation's
    * TIMESTAMP(MICROS)/NTZ. An old TIMESTAMP(NANOS) file dropped into
    * a dir probed as NTZ still fails loud at read — format MIXES
    * within one landing dir are not supported, only drift between
    * generations. */
  private def probeTsType(spark: SparkSession, dirOrGlob: String) = {
    import org.apache.spark.sql.types._
    graft.Tables.ensureNanosAsLong(spark)
    try spark.read.parquet(dirOrGlob).schema("ts").dataType
    catch { case scala.util.control.NonFatal(_) => TimestampNTZType }
  }

  private def rawEventSchema(tsType: org.apache.spark.sql.types.DataType) = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** Watch a landing directory (or glob) of event parquet files as a
    * stream — the production file-source shape: upstream drops files
    * into the dir, the query picks them up per trigger (incl.
    * `Trigger.AvailableNow` for drain-and-stop runs). `ts`'s physical
    * type is probed from the landing dir's existing files (see
    * [[probeTsType]] for the empty-dir fallback and the no-mixed-
    * formats caveat) and normalized to the session-zoned
    * TimestampType by the same one-place dispatch the batch reader
    * uses ([[graft.Tables.normalizeEventTs]]) — nanos-era and
    * micros-era fixtures both land correctly. */
  def eventLanding(spark: SparkSession, dirOrGlob: String): DataFrame =
    graft.Tables.normalizeEventTs(
      spark.readStream
        .schema(rawEventSchema(probeTsType(spark, dirOrGlob)))
        .parquet(dirOrGlob))

  /** The sf events table as a bounded stream: the file-stream source
    * accepts globs (a bare file path fails basePath validation; a glob
    * resolves basePath to the parent dir), so this selects the table
    * file directly — no copy into a temp dir, nothing to clean up. */
  def eventStream(spark: SparkSession, sfDir: String): DataFrame =
    eventLanding(spark, s"$sfDir/events.*")
}
