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

  /** Continuous ingest-and-dedup — the streaming twin of dd7
    * ([[graft.api.Dedup.incrementalJaccardPairs]]). Per micro-batch:
    * read the persisted corpus signature asset, emit the batch's
    * near-dup pairs against it (and within the batch), then APPEND the
    * batch's own signatures to the asset — so every batch dedups
    * against the seed corpus plus all earlier batches, and the union
    * of per-batch pair outputs equals ONE batch dd7 over the whole
    * increment (StreamingSpec pins the equality across micro-batches).
    *
    * Exactly-once discovery under retries: both writes go to
    * deterministic per-batch subdirs with overwrite (`pairs/batch=<id>`,
    * `sigs/inc_<id>`), and the corpus read EXCLUDES the current batch's
    * own subdir, so a replayed batch recomputes the same pairs instead
    * of pairing against its failed attempt's signatures. Scale shape
    * per batch is dd7's: only slim (doc_id, band, bkey) probe rows of
    * the batch shuffle/broadcast; the asset is scanned, never
    * re-paired. `corpusSigDir` must be seeded (e.g. subdir `base/`)
    * with [[graft.api.Dedup.minhashSignatures]] output of the same
    * (bands, rows) geometry. */
  def incrementalDedupStream(docs: DataFrame, idCol: String, textCol: String,
      corpusSigDir: String, pairsOutDir: String, checkpointDir: String,
      bands: Int, rows: Int, threshold: Double):
      org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val s = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(corpusSigDir)
        val fs = root.getFileSystem(s.sparkContext.hadoopConfiguration)
        val corpusParts = fs.listStatus(root).map(_.getPath)
          .filter(p => !p.getName.startsWith("_"))
          .filterNot(_.getName == s"inc_$batchId") // retry idempotence
          .map(_.toString)
        require(corpusParts.nonEmpty,
          s"corpus signature asset at $corpusSigDir is unseeded — write " +
            "Dedup.minhashSignatures output (e.g. under base/) first")
        val corpusSigs = s.read.parquet(corpusParts.toIndexedSeq: _*)
        val incSigs = graft.api.Barrier(graft.api.Dedup.minhashSignatures(
          batch.toDF(), idCol, textCol, bands, rows))
        try {
          graft.api.Dedup.incrementalJaccardPairs(corpusSigs, incSigs, threshold)
            .write.mode("overwrite").parquet(s"$pairsOutDir/batch=$batchId")
          incSigs.write.mode("overwrite").parquet(s"$corpusSigDir/inc_$batchId")
        } finally graft.api.Barrier.release(incSigs)
        ()
      }
      .start()

  /** Idempotent micro-batch sink: foreachBatch + deterministic
    * per-batch output paths, the standard exactly-once-to-storage
    * recipe (a replayed batch overwrites the same path instead of
    * appending duplicates). */
  def toIdempotentParquetSink(df: DataFrame, outDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
      batch.write.mode("overwrite").parquet(s"$outDir/batch=$id")
    }

  private def rawEventSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
  }

  /** Watch a landing directory (or glob) of event parquet files as a
    * stream — the production file-source shape: upstream drops files
    * into the dir, the query picks them up per trigger (incl.
    * `Trigger.AvailableNow` for drain-and-stop runs). Reading the
    * TIMESTAMP(NANOS) fixture requires the same session conf
    * `Tables.events` uses; that requirement is owned by
    * [[graft.Tables.ensureNanosAsLong]] (explicit + idempotent), not
    * mutated here as a hidden side effect. */
  def eventLanding(spark: SparkSession, dirOrGlob: String): DataFrame = {
    graft.Tables.ensureNanosAsLong(spark)
    spark.readStream
      .schema(rawEventSchema)
      .parquet(dirOrGlob)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** The sf events table as a bounded stream: the file-stream source
    * accepts globs (a bare file path fails basePath validation; a glob
    * resolves basePath to the parent dir), so this selects the table
    * file directly — no copy into a temp dir, nothing to clean up. */
  def eventStream(spark: SparkSession, sfDir: String): DataFrame =
    eventLanding(spark, s"$sfDir/events.*")
}
