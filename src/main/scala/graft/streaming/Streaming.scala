package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators. The reference has no streaming surface
  * (SURVEY §2.10) — this is the scale extension the north star asks for:
  * the same aggregation vocabulary over an unbounded events stream.
  *
  * Design: `readStream` → event-time windowed aggregation with watermarks
  * (late data bounded), and stateful sessionization via
  * `flatMapGroupsWithState` — the streaming twins of q28 (tumbling
  * windows) and q51 (sessionize), so batch and stream share semantics.
  */
object Streaming {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, n_events: Long,
      start_ts: Long, end_ts: Long)

  // public: the streaming state encoder's generated code constructs and
  // reads this class; `private` breaks codegen access at runtime
  final case class SessionState(n: Long, start: Long, last: Long)

  /** Tagged input row for [[asofJoinStream]]: `side` 0 = right (reference)
    * stream, 1 = left (probe) stream — the same union encoding the batch
    * [[graft.ops.EventAnalytics.asofJoin]] uses internally. */
  final case class AsofEvent(key: Long, ts: Long, side: Int, id: Long,
      value: Double)

  /** [[asofJoinStream]] output: one row per left event with the matched
    * right row's ts/value (None before any right row is seen). */
  final case class AsofJoined(key: Long, id: Long, ts: Long,
      matched_ts: Option[Long], value: Option[Double])

  // public for the streaming state encoder's generated code
  final case class AsofRightState(ts: Long, id: Long, value: Double)

  /** Streaming as-of join — the temporal-join twin of
    * [[graft.ops.EventAnalytics.asofJoin]] (Flink's temporal join shape):
    * per key the state holds ONLY the latest right row (O(1), bounded
    * forever), each left event emits with the most recent right row whose
    * `(ts, id)` does not exceed its own ts. Rows within a micro-batch are
    * sorted by `(ts, side, id)` (right before left at equal ts — `>=`
    * match semantics, ties to the larger right id, exactly the batch
    * operator's window order), and the state carries the running last
    * right row across batches. Stream ≡ batch whenever ingestion is
    * per-key time-ordered ACROSS batches (in-order sources); an
    * out-of-order right row older than the retained one is ignored rather
    * than buffered — the O(1)-state trade every streaming asof makes. */
  def asofJoinStream(rows: Dataset[AsofEvent]): Dataset[AsofJoined] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_.key)
      .flatMapGroupsWithState[AsofRightState, AsofJoined](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, it, state: GroupState[AsofRightState]) =>
          var last: Option[AsofRightState] = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[AsofJoined]
          it.toSeq.sortBy(e => (e.ts, e.side, e.id)).foreach { e =>
            if (e.side == 0) {
              if (last.forall(r =>
                r.ts < e.ts || (r.ts == e.ts && r.id <= e.id)))
                last = Some(AsofRightState(e.ts, e.id, e.value))
            } else {
              // a left event OLDER than the retained right state (late
              // arrival across batches) must get NO match, not an
              // anti-causal future one — the state only answers lefts
              // at or after its own timestamp
              val visible = last.filter(_.ts <= e.ts)
              out += AsofJoined(key, e.id, e.ts,
                visible.map(_.ts), visible.map(_.value))
            }
          }
          last.foreach(state.update)
          out.iterator
      }
  }

  /** Tumbling event-time windows with a watermark: the streaming twin of
    * the batch `q28_events_hourly`. The grouping key must be the window
    * struct itself — `window(...).getField("start")` strips the
    * event-time metadata, so the watermark would never bound state and
    * append mode would be rejected; `.start` is projected AFTER the
    * aggregation instead. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("value_sum"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** Streaming exact dedup: the streaming twin of `Dedup.exactDedup`.
    * Keys on a content hash (sha-256 of the dedup columns) and drops
    * duplicates whose event time falls inside the watermark horizon —
    * state is bounded by the horizon instead of growing forever, which is
    * the only dedup that survives an unbounded stream. Rows older than
    * the watermark are late data and already dropped by the watermark
    * itself. */
  def dedupExact(rows: DataFrame, tsCol: String, keyCols: Seq[String],
      watermark: String = "1 hour"): DataFrame =
    rows
      // hash the JSON of the key struct: null-safe and unambiguous (a
      // separator-joined concat SKIPS nulls, so ("x", null) and (null,
      // "x") would collide and wrongly dedup distinct rows)
      .withColumn("__content_hash__",
        sha2(to_json(struct(keyCols.map(col): _*)), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("__content_hash__")
      .drop("__content_hash__")

  /** Streaming corpus filter: the per-row text-pipeline stages — language
    * ID, quality scoring, PII redaction — applied to an unbounded document
    * stream. Every op is a pure codegen'd column expression (no shuffle,
    * no state, no watermark needed), so the BATCH operators compose with
    * `readStream` unchanged; this wrapper pins that contract (and its
    * batch≡stream equivalence) with a spec. At 100 TB/day ingest this is
    * the shape that matters: per-row filters run at source parallelism
    * with zero streaming state. */
  def filterDocuments(docs: DataFrame, textCol: String = "text",
      minQuality: Double = 0.5): DataFrame = {
    val (redacted, counts) = graft.ops.Corpus.redactPii(col(textCol))
    val flagged = docs
      .withColumn("lang", graft.ops.TextAnalysis.languageId(col(textCol)))
      .withColumn("quality", graft.ops.TextAnalysis.qualityScore(col(textCol)))
      .filter(col("quality") >= minQuality)
    counts.foldLeft(flagged) { case (df, (n, c)) =>
      df.withColumn(n, c.cast("long"))
    }.withColumn(textCol, redacted)
  }

  /** Streaming mixture sampling: [[graft.ops.Corpus.sampleMixture]]
    * composes with `readStream` UNCHANGED — the epoch explode is a
    * stateless per-row generate (no shuffle, no watermark, no state), so
    * the batch operator IS the streaming operator. This wrapper pins
    * that contract (and its batch≡stream equivalence) with a spec. */
  def sampleMixture(docs: DataFrame, sourceCol: String, textCol: String,
      weights: Map[String, Double], defaultWeight: Double = 1.0): DataFrame =
    graft.ops.Corpus.sampleMixture(docs, sourceCol, textCol, weights,
      defaultWeight)

  /** Streaming winnowing fingerprints:
    * [[graft.ops.Dedup.winnowFingerprints]] composes with `readStream`
    * UNCHANGED — the per-document window-min fold and the fingerprint
    * explode are stateless per-row work (no shuffle, no watermark, no
    * state), so the batch operator IS the streaming operator: the shape
    * an ingest pipeline needs to fingerprint documents as they land,
    * joining against the fingerprint store downstream. This wrapper
    * pins that contract with a batch≡stream spec. */
  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4): DataFrame =
    graft.ops.Dedup.winnowFingerprints(docs, idCol, textCol, k, w)

  /** Streaming benchmark decontamination: the batch
    * [[graft.ops.Dedup.decontaminate]] applied per micro-batch via
    * `foreachBatch`. Value-identical to the batch operator because
    * contamination is per-DOCUMENT against a STATIC benchmark — no
    * cross-batch state exists, and the benchmark's distinct-gram set
    * broadcasts into every micro-batch exactly as it does into a batch
    * job. (The per-doc gram explode + re-aggregation inside the op is a
    * streaming aggregation if expressed directly on the stream; running
    * it per micro-batch is the idiomatic Spark shape for a
    * stateless-per-row-result op whose INTERNAL plan aggregates.) */
  def decontaminateForEachBatch(
      bench: DataFrame, benchTextCol: String, n: Int,
      idCol: String, textCol: String)(
      sink: DataFrame => Unit): (Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, _) => sink(graft.ops.Dedup.decontaminate(
      batch.toDF(), idCol, textCol, bench, benchTextCol, n))

  /** Streaming MinHash near-dup probe: crawl ingest vs a FROZEN corpus
    * band index. The index ([[graft.ops.Dedup.minhashIndexCorpus]] —
    * capped band table + shingle-hash sets, both persisted) is built
    * ONCE when the closure is created; every micro-batch bands its own
    * documents and probes the index
    * ([[graft.ops.Dedup.minhashProbeWith]]) — no cross-batch state, the
    * [[decontaminateForEachBatch]] posture. Value-identical to the
    * batch [[graft.ops.Dedup.minhashNearDupsAgainst]] on the union of
    * micro-batches because each batch doc's pairs depend only on that
    * doc and the frozen index (asserted cross-batch in StreamingSpec).
    * Per-batch cost is batch-sized: the corpus is never re-banded.
    * Caller releases the pinned index via `Caches.releaseAll()` after
    * stopping the stream. */
  def minhashProbeStream(
      corpus: DataFrame, idCol: String, textCol: String,
      bands: Int = 8, rows: Int = 4, shingleK: Int = 3,
      threshold: Double = 0.7, maxBucketSize: Int = Int.MaxValue)(
      sink: DataFrame => Unit): (Dataset[org.apache.spark.sql.Row], Long) => Unit = {
    val index = graft.ops.Dedup.minhashIndexCorpus(corpus, idCol, textCol,
      bands, rows, shingleK, maxBucketSize, hashedBandKeys = true,
      persist = true)
    (batch, _) => sink(graft.ops.Dedup.minhashProbeWith(
      index, batch.toDF(), idCol, textCol, threshold))
  }

  /** Streaming ANN probe against a FROZEN IVF index — the
    * [[minhashProbeStream]] pattern applied to retrieval: the index is
    * built ([[graft.ops.Similarity.ivfBuild]]) or loaded
    * ([[graft.ops.Similarity.ivfLoad]]) ONCE by the caller; every
    * micro-batch of query vectors probes it via
    * [[graft.ops.Similarity.ivfTopKWith]] (queries broadcast, only the
    * routed inverted lists scanned). No cross-batch state: each query
    * row's top-k is a pure function of that row and the frozen index,
    * so stream output over any batch split EQUALS the batch probe over
    * the union (asserted cross-batch in StreamingSpec). Per-batch cost
    * is batch-sized routed-list scans — the corpus is never rescanned,
    * never re-clustered. The assignment table is pinned
    * (persist + [[graft.ops.Caches]]) so a built-not-loaded index does
    * not replay its corpus scan per batch; caller releases via
    * `Caches.releaseAll()` after stopping the stream. Index freshness
    * across batches is the caller's loop:
    * [[graft.ops.Similarity.ivfAppend]] + `ivfWrite` between stream
    * restarts, watched by [[graft.ops.Similarity.ivfStats]]. */
  def ivfProbeStream(index: graft.ops.Similarity.IvfIndex,
      idCol: String, vecCol: String, k: Int, nProbe: Int = 4)(
      sink: DataFrame => Unit): (Dataset[org.apache.spark.sql.Row], Long) => Unit = {
    val pinned = graft.ops.Similarity.IvfIndex(index.centroids,
      graft.ops.Caches.registerDf(index.assignments
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)))
    (batch, _) => sink(graft.ops.Similarity.ivfTopKWith(
      pinned, batch.toDF(), idCol, vecCol, k, nProbe))
  }

  /** Streaming LM quality scoring: the add-one unigram model trains
    * ONCE from the static `train` corpus (persisted vocabulary + two
    * scalars) and every micro-batch scores against it — value-identical
    * to [[graft.ops.Corpus.lmScore]] because scoring is per-document
    * against fixed state (no cross-batch coupling). Re-aggregating the
    * train corpus per batch is the trap this closure shape avoids; the
    * caller releases the model's persisted counts via `Caches` after
    * stopping the stream. */
  def lmScoreForEachBatch(
      train: DataFrame, trainTextCol: String,
      idCol: String, textCol: String)(
      sink: DataFrame => Unit): (Dataset[org.apache.spark.sql.Row], Long) => Unit = {
    val model = graft.ops.Corpus.lmTrain(train, trainTextCol)
    (batch, _) => sink(graft.ops.Corpus.lmScoreWith(
      model, batch.toDF(), idCol, textCol))
  }

  /** Streaming contamination-span audit: the benchmark's distinct
    * L-gram hash set ([[graft.ops.Dedup.benchGramSet]]) builds ONCE,
    * persisted; every micro-batch of ingest documents reports its
    * maximal leaked spans against it
    * ([[graft.ops.Dedup.contaminationSpansWith]]). Value-identical to
    * the batch [[graft.ops.Dedup.contaminationSpans]] because spans are
    * per-DOCUMENT against a static benchmark — the islands window is
    * per-doc, so no cross-batch state exists
    * (the [[decontaminateForEachBatch]] posture, at span grain).
    * Caller releases the pinned gram set via `Caches.releaseAll()`
    * after stopping the stream. */
  def contaminationSpansStream(
      bench: DataFrame, benchTextCol: String, minLen: Int,
      idCol: String, textCol: String)(
      sink: DataFrame => Unit): (Dataset[org.apache.spark.sql.Row], Long) => Unit = {
    val benchSet = graft.ops.Caches.registerDf(
      graft.ops.Dedup.benchGramSet(bench, benchTextCol, minLen)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    (batch, _) => sink(graft.ops.Dedup.contaminationSpansWith(
      benchSet, batch.toDF(), idCol, textCol, minLen))
  }

  /** Streaming Kneser–Ney bigram LM scoring: the interpolated-KN model
    * trains ONCE from the static `train` corpus
    * ([[graft.ops.Corpus.knTrain]] — persisted bigram table + two
    * scalars) and every micro-batch scores against it
    * ([[graft.ops.Corpus.knScoreWith]]) — value-identical to the batch
    * [[graft.ops.Corpus.knScore]] because scoring is per-document
    * against fixed state (the [[lmScoreForEachBatch]] posture;
    * re-counting the train bigrams per batch is the trap this closure
    * shape avoids). The perplexity-bucket ingest filter (CCNet's
    * head/middle/tail) run live as data lands; caller releases the
    * model's persisted counts via `Caches` after stopping the stream. */
  def knScoreForEachBatch(
      train: DataFrame, trainTextCol: String,
      idCol: String, textCol: String)(
      sink: DataFrame => Unit): (Dataset[org.apache.spark.sql.Row], Long) => Unit = {
    val model = graft.ops.Corpus.knTrain(train, trainTextCol)
    (batch, _) => sink(graft.ops.Corpus.knScoreWith(
      model, batch.toDF(), idCol, textCol))
  }

  /** Streaming unigram-tokenizer fertility scoring: the piece table
    * trains ONCE from the static `train` corpus
    * ([[graft.ops.Corpus.trainUnigramLm]] — a driver-scale literal) and
    * every micro-batch encodes against it
    * ([[graft.ops.Corpus.unigramEncodeStats]]) — value-identical to the
    * batch op because encoding is per-document against fixed state (the
    * [[lmScoreForEachBatch]] posture; re-training per batch is the trap
    * this closure shape avoids). The live tokens-per-word monitor a
    * crawl ingest runs to catch tokenizer/corpus drift as data lands. */
  def unigramEncodeForEachBatch(
      train: DataFrame, trainTextCol: String,
      idCol: String, textCol: String)(
      sink: DataFrame => Unit): (Dataset[org.apache.spark.sql.Row], Long) => Unit = {
    val trained = graft.ops.Corpus.trainUnigramLm(train, trainTextCol)
      .collect().map(r => (r.getString(1), r.getLong(2))).toSeq
    (batch, _) => sink(graft.ops.Corpus.unigramEncodeStats(
      batch.toDF(), idCol, textCol, trained))
  }

  /** Streaming per-key quota cap: admit at most `maxPerKey` rows per key
    * over the stream's lifetime — the streaming twin of
    * [[graft.ops.Corpus.capPerKey]], with the ONE semantic difference
    * streaming forces: admission is ARRIVAL order (batch picks the
    * lowest `orderCol` globally; an unbounded stream cannot). State per
    * key is a single admitted-count long, bounded by the key cardinality
    * and never by the stream length. Emits `(key, order)` pairs of the
    * admitted rows; join back by key+order for full rows. */
  def capPerKeyStream(rows: Dataset[(String, Long)],
      maxPerKey: Int): Dataset[(String, Long)] = {
    import rows.sparkSession.implicits._
    require(maxPerKey >= 1, s"maxPerKey must be >= 1, got $maxPerKey")
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, it, state: GroupState[Long]) =>
          val admitted = state.getOption.getOrElse(0L)
          val take = it.take(
            math.max(0, maxPerKey - admitted).toInt).toSeq
          state.update(admitted + take.length)
          take.iterator
      }
  }

  /** Streaming twin of [[graft.ops.EventAnalytics.trend]]: the per-key
    * OLS sufficient statistics `(n, Σx, Σy, Σx², Σxy)` maintained as
    * O(1) running state per key (BigInt mirrors the batch op's
    * decimal(38,0)); each micro-batch folds its rows and emits every
    * touched key's refreshed `(n, slope_num, slope_den)` — update
    * semantics, downstream upserts by key. Because the statistics are
    * the batch op's mergeable moments, stream state after any prefix
    * EQUALS the batch aggregate over the same rows (asserted in
    * StreamingSpec), arrival order irrelevant — addition commutes. */
  def trendStream(rows: Dataset[(String, Long, Long)])
      : Dataset[(String, Long, String, String)] = {
    import rows.sparkSession.implicits._
    // moments persist as decimal STRINGS (BigInt has no Spark encoder)
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, String, String, String, String),
        (String, Long, String, String)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, it,
            state: GroupState[(Long, String, String, String, String)]) =>
          val st = state.getOption.getOrElse((0L, "0", "0", "0", "0"))
          var n = st._1
          var sx = BigInt(st._2); var sy = BigInt(st._3)
          var sxx = BigInt(st._4); var sxy = BigInt(st._5)
          it.foreach { case (_, x, y) =>
            n += 1; sx += x; sy += y
            sxx += BigInt(x) * x; sxy += BigInt(x) * y
          }
          state.update((n, sx.toString, sy.toString,
            sxx.toString, sxy.toString))
          val num = BigInt(n) * sxy - sx * sy
          val den = BigInt(n) * sxx - sx * sx
          Iterator.single((key, n, num.toString, den.toString))
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.passAtK]] — the live
    * eval-harness dashboard: per task O(1) state (n samples, c
    * correct), each micro-batch emitting the task's refreshed
    * `(task, n, c, pass@k per requested k)`. The estimator replays the
    * batch op's exact arithmetic — the same left-to-right product fold
    * over `max(0, (n−c−i)/(n−i))` in doubles and the same HALF_UP
    * 6-decimal rounding Spark's `round` applies — so every emitted row
    * equals the batch twin run on all rows arrived so far
    * (StreamingSpec differential); `None` where n < k, the batch null.
    * Counts commute, so arrival order never matters. */
  def passAtKStream(rows: Dataset[(String, Boolean)], ks: Seq[Int])
      : Dataset[(String, Long, Long, Seq[Option[Double]])] = {
    import rows.sparkSession.implicits._
    require(ks.nonEmpty && ks.forall(_ >= 1), "ks must be >= 1")
    require(ks.distinct.size == ks.size, "duplicate k")
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long),
        (String, Long, Long, Seq[Option[Double]])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (task, it, state: GroupState[(Long, Long)]) =>
          var (n, c) = state.getOption.getOrElse((0L, 0L))
          it.foreach { case (_, ok) => n += 1; if (ok) c += 1 }
          state.update((n, c))
          val passes = ks.map { k =>
            if (n < k) None
            else {
              val prod = (0 until k).foldLeft(1.0) { (acc, i) =>
                acc * math.max(0.0, (n - c - i).toDouble / (n - i))
              }
              Some(java.math.BigDecimal.valueOf(1.0 - prod)
                .setScale(6, java.math.RoundingMode.HALF_UP)
                .doubleValue())
            }
          }
          Iterator.single((task, n, c, passes))
      }
  }

  /** Streaming twin of [[graft.ops.EventAnalytics.debounce]]: emit the
    * FIRST event of each burst as it opens (a gap `> cooldown` from the
    * key's previous event — kept or not — opens a burst), suppressing
    * the chatter behind it with O(1) state per key: just the last-seen
    * timestamp, never a buffer. Stream ≡ batch keep-first rows under
    * per-key in-order arrival (asserted in StreamingSpec across
    * micro-batches, including a burst CHAIN that spans batches); the
    * batch op's burst ordinals and sizes need hindsight an unbounded
    * stream cannot have, so the twin emits the kept `(key, ts)` pairs.
    * Within a micro-batch rows sort by ts locally (iterator order is
    * not arrival order). */
  def debounceStream(rows: Dataset[(String, Long)],
      cooldownUs: Long): Dataset[(String, Long)] = {
    import rows.sparkSession.implicits._
    require(cooldownUs >= 0, s"cooldown must be >= 0, got $cooldownUs")
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, it, state: GroupState[Long]) =>
          var last = state.getOption.getOrElse(Long.MinValue)
          val out = it.toSeq.sortBy(_._2).flatMap { case (_, ts) =>
            val keep = last == Long.MinValue || ts - last > cooldownUs
            last = ts
            if (keep) Some((key, ts)) else None
          }
          state.update(last)
          out.iterator
      }
  }

  /** Streaming twin of [[graft.ops.EventAnalytics.funnel]]: per-entity
    * ordered-step progression maintained as O(|steps|) state — the
    * earliest timestamp each step was reached, a step only arming after
    * its predecessor (strictly later, the batch op's `ts > t_i` rule).
    * Each micro-batch emits every touched entity's refreshed
    * `steps_completed` (update semantics). Stream ≡ batch under per-key
    * in-order arrival: in-order, the first qualifying arrival IS the
    * batch `min(ts)` for that step. Entities that never reach step 1
    * hold no state and emit nothing, matching the batch op's inner
    * first-step join. Within a micro-batch rows sort by ts locally
    * (iterator order is not arrival order). */
  def funnelStream(rows: Dataset[(String, Long, String)],
      steps: Seq[String]): Dataset[(String, Long)] = {
    import rows.sparkSession.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    val sentinel = Long.MinValue
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Seq[Long], (String, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, it, state: GroupState[Seq[Long]]) =>
          val times = state.getOption
            .getOrElse(Seq.fill(steps.size)(sentinel)).toArray
          var touched = false
          it.toSeq.sortBy(_._2).foreach { case (_, ts, tpe) =>
            val i = steps.indexOf(tpe)
            if (i >= 0 && times(i) == sentinel &&
              (i == 0 || (times(i - 1) != sentinel && ts > times(i - 1)))) {
              times(i) = ts; touched = true
            }
          }
          if (!touched && state.getOption.isEmpty) Iterator.empty
          else {
            state.update(times.toSeq)
            if (times(0) == sentinel) Iterator.empty
            else Iterator.single(
              (key, times.count(_ != sentinel).toLong))
          }
      }
  }

  /** Streaming twin of [[graft.ops.EventAnalytics.interArrivalProfile]]:
    * per-key gap statistics (n, min, max, sum — the same mergeable
    * integers) plus the bot verdict, maintained with O(1) state: the
    * last-seen timestamp and the four accumulators. Every micro-batch
    * emits each touched key's refreshed profile (update semantics;
    * keys still on their first event emit nothing — no gap exists,
    * matching the batch op's lag-null filter). Stream ≡ batch under
    * per-key in-order arrival; equal timestamps produce 0 gaps in any
    * order, so ties need no id tiebreak here. */
  def interArrivalStream(rows: Dataset[(String, Long)],
      minEvents: Long, maxMinGapUs: Long)
      : Dataset[(String, Long, Long, Long, Long, Boolean)] = {
    import rows.sparkSession.implicits._
    require(minEvents >= 1 && maxMinGapUs >= 0, "bad interArrival params")
    // state: (lastTs, nGaps, minGap, maxGap, sumGap)
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long, Long),
        (String, Long, Long, Long, Long, Boolean)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, it, state: GroupState[(Long, Long, Long, Long, Long)]) =>
          var (last, n, mn, mx, sm) = state.getOption
            .getOrElse((Long.MinValue, 0L, Long.MaxValue, Long.MinValue, 0L))
          it.toSeq.sortBy(_._2).foreach { case (_, ts) =>
            if (last != Long.MinValue) {
              val g = ts - last
              n += 1; mn = math.min(mn, g); mx = math.max(mx, g); sm += g
            }
            last = ts
          }
          state.update((last, n, mn, mx, sm))
          if (n == 0) Iterator.empty
          else Iterator.single((key, n, mn, mx, sm,
            n >= minEvents && mn <= maxMinGapUs))
      }
  }

  /** Streaming twin of
    * [[graft.ops.EventAnalytics.rollingActiveUsersApprox]]: the DAU/WAU
    * health monitor maintained CONTINUOUSLY — the canonical "is the
    * product alive" readout a batch job only refreshes daily. Input rows
    * are `(entity, day)` presences (day bucketing upstream, exactly the
    * batch op's `floor(unix_micros/86400e6)`); each presence fans out to
    * its W window-end days (the batch op's bounded explode, applied
    * per-row), and per window-end day the state is ONE updatable
    * Datasketches HLL sketch — O(2^lgK) bytes per day forever, entities
    * never retained. Every micro-batch emits each touched day's
    * refreshed `(day, wau_approx)` estimate (update semantics,
    * downstream upserts by day).
    *
    * Stream ≡ batch because HLL update/union is an order-insensitive
    * commutative monoid: folding entities batch-by-batch into the day's
    * sketch reaches the same sketch as the batch op's day-sketch union
    * (bit-identical in the exact coupon regime, same ±1.04/√2^lgK
    * estimate beyond it) — asserted cross-batch in StreamingSpec against
    * the batch op's output. */
  def rollingActiveHllStream(rows: Dataset[(Long, Long)],
      windowDays: Int, lgK: Int = 14): Dataset[(Long, Long)] = {
    import rows.sparkSession.implicits._
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(lgK >= 4 && lgK <= 21, s"lgK must be in [4, 21], got $lgK")
    rows.flatMap { case (e, day) =>
      (0 until windowDays).map(i => (day + i, e))
    }.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], (Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (day, it, state: GroupState[Array[Byte]]) =>
          val sk = state.getOption
            .map(b => org.apache.datasketches.hll.HllSketch.heapify(b))
            .getOrElse(new org.apache.datasketches.hll.HllSketch(lgK))
          it.foreach { case (_, e) => sk.update(e) }
          state.update(sk.toUpdatableByteArray)
          Iterator.single((day, Math.round(sk.getEstimate)))
      }
  }

  /** Streaming per-group quantile monitor — the p50/p95/p99 latency
    * readout maintained continuously, the streaming sibling of the
    * [[graft.ops.Corpus.filterByQuantileApprox]]/`winsorizeApprox`
    * Greenwald–Khanna swap (and built on the SAME summary structure
    * Spark's `approx_percentile` uses, `QuantileSummaries`, so the
    * error contract is identical: rank error ≤ relativeError · count,
    * state O(1/relativeError · log(εn)) per group forever — values are
    * never retained).
    *
    * Each micro-batch folds its values into the group's summary
    * (inserted in sorted order, so the summary — and therefore every
    * emitted estimate — is a deterministic function of the batch
    * CONTENTS, not of partition visit order) and emits the group's
    * refreshed `(group, count, estimates)` row (update semantics).
    * StreamingSpec asserts the cross-batch estimates hit the GK rank
    * bound against the exact sorted data. */
  def quantileMonitorStream(rows: Dataset[(String, Long)],
      qs: Seq[Double], relativeError: Double = 0.001)
      : Dataset[(String, Long, Seq[Double])] = {
    import rows.sparkSession.implicits._
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      s"quantiles must be in [0, 1], got $qs")
    require(relativeError > 0 && relativeError < 1,
      s"relativeError must be in (0, 1), got $relativeError")
    import org.apache.spark.sql.catalyst.util.QuantileSummaries
    // state persists as an EXPLICIT stable encoding — (compressThreshold,
    // relativeError, count, compressed, then the (value, g, delta)
    // triples), NOT Java serialization of the catalyst-internal class: a
    // Spark upgrade that touches that private class must not make
    // existing streaming checkpoints unrecoverable (the summary is
    // rebuilt through its public constructor on load)
    def ser(s: QuantileSummaries): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + 8 + 8 + 1 + 4 +
        s.sampled.length * 24)
      bb.putInt(s.compressThreshold).putDouble(s.relativeError)
        .putLong(s.count).put(if (s.compressed) 1.toByte else 0.toByte)
        .putInt(s.sampled.length)
      s.sampled.foreach(st =>
        bb.putDouble(st.value).putLong(st.g).putLong(st.delta))
      bb.array()
    }
    def deser(b: Array[Byte]): QuantileSummaries = {
      val bb = java.nio.ByteBuffer.wrap(b)
      val ct = bb.getInt; val re = bb.getDouble
      val n = bb.getLong; val comp = bb.get() == 1.toByte
      val sampled = Array.fill(bb.getInt)(
        QuantileSummaries.Stats(bb.getDouble, bb.getLong, bb.getLong))
      new QuantileSummaries(ct, re, sampled, n, comp)
    }
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Byte], (String, Long, Seq[Double])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, it, state: GroupState[Array[Byte]]) =>
          var s = state.getOption.map(deser).getOrElse(
            new QuantileSummaries(QuantileSummaries.defaultCompressThreshold,
              relativeError))
          it.map(_._2).toSeq.sorted.foreach(v => s = s.insert(v.toDouble))
          s = s.compress()
          state.update(ser(s))
          Iterator.single((key, s.count,
            qs.map(q => s.query(q).getOrElse(Double.NaN))))
      }
  }

  /** Streaming twin of [[graft.ops.Incremental]]: the pre-aggregated
    * sink maintained CONTINUOUSLY from a signed CDC stream of
    * `(key, sign, value)` rows (+1 insert, -1 delete). Per-key state is
    * the same (n, Σ value·sign) monoid the batch merge adds — O(1) per
    * key forever; each micro-batch folds its rows and emits every
    * touched key's REFRESHED aggregate (update semantics: downstream
    * upserts by key). A key retracted to n = 0 emits its zero row as
    * the delete signal — the state the batch [[graft.ops.Incremental
    * .merge]] expresses by DROPPING the key; StreamingSpec asserts the
    * stream's final states equal the batch merge over the same rows
    * modulo exactly that representation. */
  def preaggStream(rows: Dataset[(String, Long, Long)])
      : Dataset[(String, Long, Long)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long), (String, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (key, it, state: GroupState[(Long, Long)]) =>
          var (n, s) = state.getOption.getOrElse((0L, 0L))
          it.foreach { case (_, sign, v) => n += sign; s += sign * v }
          state.update((n, s))
          Iterator.single((key, n, s))
      }
  }

  /** Streaming twin of
    * [[graft.ops.EventAnalytics.anomalousBucketsPrequential]]: rows are
    * CLOSED buckets `(group, bucket, n)` (e.g. from an upstream
    * watermarked windowed count); per-group state is the three running
    * moments `(m, S, SS)` — O(1) per key forever — and each bucket is
    * flagged against the moments including itself, exactly the batch
    * op's prequential z² test (BigInt arithmetic mirrors its
    * decimal(38,0)). Stream ≡ batch under per-key in-order bucket
    * arrival, asserted in StreamingSpec across micro-batches. */
  def anomalousBucketsStream(rows: Dataset[(String, Long, Long)],
      zNum: Long = 3, zDen: Long = 1)
      : Dataset[(String, Long, Long, Boolean)] = {
    import rows.sparkSession.implicits._
    require(zNum > 0 && zDen > 0, "zNum, zDen must be positive")
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long),
        (String, Long, Long, Boolean)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (key, it, state: GroupState[(Long, Long, Long)]) =>
          var (m, s, ss) = state.getOption.getOrElse((0L, 0L, 0L))
          // micro-batch iterator order is not bucket order — sort locally
          val out = it.toSeq.sortBy(_._2).map { case (_, bucket, n) =>
            m += 1; s += n; ss += n * n
            val dev = BigInt(m) * BigInt(n) - BigInt(s)
            val lhs = dev * dev * BigInt(zDen * zDen)
            val rhs = BigInt(zNum * zNum) *
              (BigInt(m) * BigInt(ss) - BigInt(s) * BigInt(s))
            (key, bucket, n, lhs > rhs)
          }
          state.update((m, s, ss))
          out.iterator
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.psi]]: a live drift monitor
    * scoring the stream-so-far against a STATIC baseline histogram
    * (boundaries + per-bin counts, both computed batch-side with
    * [[graft.ops.Profiling.quantileBoundaries]] and frozen — the
    * deployment shape: the reference window is fixed, the comparison
    * side accumulates). Each value maps to its bin with the batch op's
    * rule (`1 + #{boundaries below}`) in a distributed per-row map; the
    * stateful stage then only consumes bin INDICES under one logical
    * key whose state is the |bins|-sized cumulative histogram — O(bins)
    * state forever. Emits `(n_seen, psi)` after every micro-batch, with
    * the batch op's exact Laplace-smoothed term fold in bin order, so
    * stream ≡ batch at every prefix (asserted in StreamingSpec).
    *
    * At production volume, pre-aggregate (bin, count) upstream per
    * micro-batch (the [[anomalousBucketsStream]] posture) so the
    * single-key stage consumes |bins| rows, not |events|. */
  def psiStream(rows: Dataset[Long], boundaries: Seq[Long],
      baseCounts: Seq[Long]): Dataset[(Long, Double)] = {
    import rows.sparkSession.implicits._
    require(baseCounts.length == boundaries.length + 1,
      s"need ${boundaries.length + 1} baseline bins, got ${baseCounts.length}")
    val nBins = baseCounts.length
    val bs = boundaries.toArray
    val ta = baseCounts.sum
    rows.map { v =>
      var b = 1
      var i = 0
      while (i < bs.length) { if (v > bs(i)) b += 1; i += 1 }
      b
    }.groupByKey(_ => "psi")
      .flatMapGroupsWithState[Seq[Long], (Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[Seq[Long]]) =>
          val counts = state.getOption
            .getOrElse(Seq.fill(nBins)(0L)).toArray
          it.foreach(b => counts(b - 1) += 1)
          state.update(counts.toSeq)
          val tb = counts.sum
          var acc = 0.0
          var i = 0
          while (i < nBins) {
            val pa = (baseCounts(i) + 1).toDouble / (ta + nBins).toDouble
            val pb = (counts(i) + 1).toDouble / (tb + nBins).toDouble
            acc += (pa - pb) * math.log(pa / pb)
            i += 1
          }
          val psi = BigDecimal(acc)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Iterator.single((tb, psi))
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.calibration]]: a live ECE
    * monitor over (score_mil, label) predictions — the model-rot alarm
    * for a deployed filter (labels arrive with feedback delay; the
    * cumulative reliability curve drifting from the diagonal pages
    * someone before the corpus does). State is the 10-bin
    * (n, Σscore, Σpos) table under one logical key — O(1) forever; each
    * micro-batch emits (n_seen, ece_mil) with the batch op's exact
    * per-bin ratios and bin-ordered term fold, so stream ≡ batch at
    * every prefix (asserted in StreamingSpec). Pre-aggregate per-batch
    * bin counts upstream at volume (the [[psiStream]] posture). */
  def calibrationStream(rows: Dataset[(Long, Boolean)])
      : Dataset[(Long, Double)] = {
    import rows.sparkSession.implicits._
    rows.map { case (s, y) =>
      (math.min(s / 100, 9L).toInt, s, if (y) 1L else 0L)
    }.groupByKey(_ => "ece")
      .flatMapGroupsWithState[Seq[(Long, Long, Long)], (Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[Seq[(Long, Long, Long)]]) =>
          val bins = state.getOption
            .getOrElse(Seq.fill(10)((0L, 0L, 0L))).toArray
          it.foreach { case (b, s, y) =>
            val (n, ss, sy) = bins(b)
            bins(b) = (n + 1, ss + s, sy + y)
          }
          state.update(bins.toSeq)
          val nt = bins.map(_._1).sum
          var acc = 0.0
          var b = 0
          while (b < 10) {
            val (n, ss, sy) = bins(b)
            if (n > 0) {
              val conf = ss.toDouble / n.toDouble
              val a = sy.toDouble * 1000.0 / n.toDouble
              acc += math.abs(a - conf) * (n.toDouble / nt.toDouble)
            }
            b += 1
          }
          val ece = BigDecimal(acc)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Iterator.single((nt, ece))
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.srmCheck]]: a live
    * sample-ratio-mismatch monitor over the experiment ASSIGNMENT
    * stream — one row per newly-assigned unit carrying its variant (the
    * assignment log is unique per unit by construction, which is what
    * keeps state O(|variants|); monitoring raw exposure events would
    * need per-unit dedup state instead). Unknown variants are someone
    * else's bug and are ignored, exactly like the batch op. Each
    * micro-batch emits `(n_units, chi2, srm)` with the batch op's exact
    * arithmetic — expected counts from integer weights, per-term
    * half-up 6dp rounding, variant-ordered fold — so stream ≡ batch at
    * every prefix (asserted in StreamingSpec). An alarm BEFORE the
    * readout: a broken splitter pages on day one, not at analysis. */
  def srmStream(assignments: Dataset[String],
      expected: Seq[(String, Long)], crit: Double)
      : Dataset[(Long, Double, Boolean)] = {
    import assignments.sparkSession.implicits._
    require(expected.size >= 2, "need at least two expected variants")
    require(expected.forall(_._2 > 0), "expected weights must be > 0")
    val variants = expected.map(_._1).toArray
    val weights = expected.map(_._2).toArray
    val wDen = weights.sum
    val idx = variants.zipWithIndex.toMap
    // variant-name fold order, fixed up front like the batch sort_array
    val foldOrder = variants.indices.sortBy(variants(_)).toArray
    assignments.flatMap(v => idx.get(v))
      .groupByKey(_ => "srm")
      .flatMapGroupsWithState[Seq[Long], (Long, Double, Boolean)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[Seq[Long]]) =>
          val counts = state.getOption
            .getOrElse(Seq.fill(variants.length)(0L)).toArray
          it.foreach(i => counts(i) += 1)
          state.update(counts.toSeq)
          val n = counts.sum
          def term(i: Int): Double = {
            val e = n.toDouble * weights(i) / wDen
            val t = (counts(i) - e) * (counts(i) - e) / e
            BigDecimal(t).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble
          }
          val chi2 = BigDecimal(
            foldOrder.foldLeft(0.0)((a, i) => a + term(i)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Iterator.single((n, chi2, chi2 > crit))
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.liftTable]] against FROZEN
    * bucket boundaries (the [[psiStream]] posture: quantile boundaries
    * come from the training/baseline snapshot and stay fixed, so the
    * monitor detects the SCORES drifting off the ranking, not the bins
    * chasing them). Input rows are (score, label); state is the
    * per-bucket (n, n_pos) table — O(|boundaries|+1) forever. Each
    * micro-batch emits one row per non-empty bucket, highest first,
    * with the batch op's exact arithmetic (integer cross-product lift,
    * 6dp half-up), so stream ≡ batch at every prefix given the same
    * literal boundaries (asserted in StreamingSpec); while no positive
    * has arrived yet, nothing emits (the batch op's all-null row has no
    * useful streaming rendering). A top-decile lift sagging toward 1.0
    * means the model stopped ranking — pages before the campaign
    * wastes its budget. */
  def liftStream(rows: Dataset[(Long, Boolean)], boundaries: Seq[Long])
      : Dataset[(Int, Long, Long, Long, Long, Double, Double)] = {
    import rows.sparkSession.implicits._
    require(boundaries.nonEmpty && boundaries == boundaries.sorted,
      "boundaries must be non-empty and ascending")
    val bs = boundaries.toArray
    val nBins = bs.length + 1
    rows.map { case (s, y) =>
      var b = 1
      var i = 0
      while (i < bs.length) { if (s > bs(i)) b += 1; i += 1 }
      (b, if (y) 1L else 0L)
    }.groupByKey(_ => "lift")
      .flatMapGroupsWithState[Seq[(Long, Long)],
        (Int, Long, Long, Long, Long, Double, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, it, state: GroupState[Seq[(Long, Long)]]) =>
          val bins = state.getOption
            .getOrElse(Seq.fill(nBins)((0L, 0L))).toArray
          it.foreach { case (b, y) =>
            val (n, p) = bins(b - 1); bins(b - 1) = (n + 1, p + y)
          }
          state.update(bins.toSeq)
          val tn = bins.map(_._1).sum
          val tp = bins.map(_._2).sum
          def rnd(x: Double) = BigDecimal(x)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          var cumN = 0L
          var cumP = 0L
          val out = Vector.newBuilder[
            (Int, Long, Long, Long, Long, Double, Double)]
          var b = nBins - 1
          while (b >= 0) {
            val (n, p) = bins(b)
            if (n > 0) {
              cumN += n; cumP += p
              if (tp > 0)
                out += ((b + 1, n, p, cumN, cumP,
                  rnd(cumP.toDouble / tp.toDouble),
                  rnd((cumP * tn).toDouble / (cumN * tp).toDouble)))
            }
            b -= 1
          }
          out.result().iterator
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.hhi]] — the live corpus-
    * concentration monitor: as an ingest stream runs, is one source
    * quietly taking over a language's share? Input rows are
    * (group, key); state per group is the key→count table — O(|keys in
    * that group|), the same key domain the batch op aggregates (sources,
    * variants, domains — bounded vocabularies, not entities). Each
    * micro-batch emits the group's refreshed row with the batch op's
    * exact integer moments, so stream ≡ batch at every prefix (asserted
    * in StreamingSpec). */
  def hhiStream(rows: Dataset[(String, String)])
      : Dataset[(String, Long, Long, Long, Long, Double)] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long],
        (String, Long, Long, Long, Long, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, it, state: GroupState[Map[String, Long]]) =>
          var counts = state.getOption.getOrElse(Map.empty[String, Long])
          it.foreach { case (_, k) =>
            counts = counts.updated(k, counts.getOrElse(k, 0L) + 1L)
          }
          state.update(counts)
          val n = counts.valuesIterator.sum
          val sumSq = counts.valuesIterator.map(c => c * c).sum
          Iterator.single((g, n, counts.size.toLong,
            counts.valuesIterator.max, sumSq,
            sumSq.toDouble / (n.toDouble * n.toDouble)))
      }
  }

  /** Streaming Page's-test CUSUM detector — the ONLINE half of
    * [[graft.ops.EventAnalytics.cusumDrift]] (which localizes a shift
    * after the fact; this one fires WHILE it happens): against a FROZEN
    * target mean `mu` with slack `k` (the [[psiStream]] frozen-baseline
    * posture — the target comes from the healthy baseline window and
    * does not chase the drift), fold each sample
    * `S⁺ = max(0, S⁺ + x − mu − k)`, `S⁻ = max(0, S⁻ + mu − x − k)`,
    * alarm when either reaches the decision limit `h`, then reset both
    * to 0 (the classic restart, so repeated shifts re-alarm). All
    * integer arithmetic in the caller's unit.
    *
    * Input rows are (group, seq, x); the per-batch fold applies in
    * `seq` order (shuffle delivery order is not contractual — an
    * unordered fold would make WHICH sample trips the limit
    * nondeterministic). State per group is (S⁺, S⁻, n, alarms) —
    * O(1) forever. Each batch emits the group's refreshed
    * (n, s_plus, s_minus, n_alarms); prefix-equivalence with a direct
    * fold is asserted in StreamingSpec. */
  def cusumStream(rows: Dataset[(String, Long, Long)], mu: Long,
      slack: Long, h: Long)
      : Dataset[(String, Long, Long, Long, Long)] = {
    import rows.sparkSession.implicits._
    require(h > 0, "decision limit h must be > 0")
    require(slack >= 0, "slack must be >= 0")
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long),
        (String, Long, Long, Long, Long)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, it, state: GroupState[(Long, Long, Long, Long)]) =>
          var (sp, sm, n, alarms) =
            state.getOption.getOrElse((0L, 0L, 0L, 0L))
          it.toSeq.sortBy(_._2).foreach { case (_, _, x) =>
            n += 1
            sp = math.max(0L, sp + x - mu - slack)
            sm = math.max(0L, sm + mu - x - slack)
            if (sp >= h || sm >= h) { alarms += 1; sp = 0L; sm = 0L }
          }
          state.update((sp, sm, n, alarms))
          Iterator.single((g, n, sp, sm, alarms))
      }
  }

  /** Streaming coverage monitor for a FROZEN split-conformal gate —
    * the online half of [[graft.ops.Profiling.conformalThreshold]]
    * (that one CALIBRATES the cutoff batch-side; this one watches
    * whether production data still honors it): per group, count scores
    * above the frozen threshold and flag when the realized exceedance
    * rate breaks the α contract by exact integer cross-multiplication
    * `n_exceed · alphaDen > alphaNum · n` — a breach means the
    * calibration distribution has drifted and the gate needs
    * re-calibrating (the [[psiStream]] frozen-baseline posture; a
    * threshold that chased the stream would hide exactly the drift it
    * must expose). State per group is (n, n_exceed) — O(1) forever.
    * Each batch emits the refreshed
    * (group, n, n_exceed, exceed_micro, breach); prefix-equivalence
    * with the direct count is asserted in StreamingSpec. */
  def conformalStream(rows: Dataset[(String, Long)],
      thresholds: Map[String, Long], alphaNum: Long, alphaDen: Long)
      : Dataset[(String, Long, Long, Long, Boolean)] = {
    import rows.sparkSession.implicits._
    require(alphaNum >= 0 && alphaDen > 0 && alphaNum <= alphaDen,
      s"alpha must be in [0,1]: $alphaNum/$alphaDen")
    require(thresholds.nonEmpty, "need at least one group threshold")
    rows.filter(r => thresholds.contains(r._1))
      .groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long),
        (String, Long, Long, Long, Boolean)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, it, state: GroupState[(Long, Long)]) =>
          var (n, exceed) = state.getOption.getOrElse((0L, 0L))
          val thr = thresholds(g)
          it.foreach { case (_, s) =>
            n += 1
            if (s > thr) exceed += 1
          }
          state.update((n, exceed))
          Iterator.single((g, n, exceed,
            if (n > 0) exceed * 1000000L / n else 0L,
            exceed * alphaDen > alphaNum * n))
      }
  }

  /** Streaming twin of [[graft.ops.EventAnalytics.seasonalAnomalies]]
    * against a FROZEN per-slot baseline (the [[psiStream]] posture: the
    * baseline comes from a healthy historical window and does not chase
    * the drift): input rows are (group, bucket, count-increment);
    * per-group state accumulates bucket totals ACROSS batches (late
    * increments to an open hour fold in), pruned to the most recent
    * `keepBuckets` buckets so state is O(keepBuckets) forever. Each
    * batch re-emits every bucket it touched with the refreshed total
    * and the batch op's exact cross-multiplied verdict
    * `|n·den − num| ≥ thresholdAbs·den` against the bucket's
    * hour-of-period slot. Unknown (group, slot) pairs — absent from the
    * frozen baseline — emit `is_anomaly = true` (an hour the baseline
    * never saw IS the anomaly). */
  def seasonalAnomalyStream(rows: Dataset[(String, Long, Long)],
      baseline: Seq[(String, Long, Long, Long)], thresholdAbs: Long,
      periodBuckets: Int = 24, keepBuckets: Int = 168)
      : Dataset[(String, Long, Long, Boolean)] = {
    import rows.sparkSession.implicits._
    require(thresholdAbs >= 0 && periodBuckets >= 1 && keepBuckets >= 1,
      "bad seasonalAnomalyStream params")
    val base: Map[(String, Long), (Long, Long)] =
      baseline.map { case (g, slot, num, den) => (g, slot) -> (num, den) }
        .toMap
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, Long],
        (String, Long, Long, Boolean)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, it, state: GroupState[Map[Long, Long]]) =>
          var counts = state.getOption.getOrElse(Map.empty[Long, Long])
          val touched = scala.collection.mutable.LinkedHashSet.empty[Long]
          it.foreach { case (_, b, inc) =>
            counts = counts.updated(b, counts.getOrElse(b, 0L) + inc)
            touched += b
          }
          if (counts.nonEmpty) {
            val hi = counts.keysIterator.max
            counts = counts.filter(_._1 > hi - keepBuckets)
          }
          state.update(counts)
          touched.iterator.filter(counts.contains).map { b =>
            val n = counts(b)
            val verdict = base.get((g, b % periodBuckets)) match {
              case Some((num, den)) =>
                math.abs(n * den - num) >= thresholdAbs * den
              case None => true
            }
            (g, b, n, verdict)
          }
      }
  }

  /** One micro-batch's worth of events for one user folded into the open
    * session state; returns the new state + closed sessions. Separated
    * from the streaming plumbing so the CROSS-batch semantics (late
    * events) are directly testable.
    *
    * Implemented as a chronological INTERVAL MERGE: the open state is one
    * interval, each event a point interval; adjacent intervals closer
    * than the gap merge (so a late event widens the open session rather
    * than dragging `last` backward, and stragglers within the gap of
    * EACH OTHER form one session instead of singleton spam). Every
    * merged session except the latest is already followed by a
    * super-gap silence, so it closes; the latest stays open in state.
    * Sessions older than what Append mode already emitted cannot be
    * retracted — they emit as fresh (late) summaries. */
  private[graft] def foldEvents(
      userId: Long, ts: Seq[Long], st: Option[SessionState], gapMs: Long
  ): (Option[SessionState], Seq[SessionSummary]) = {
    val items = (st.map(s => (s.start, s.last, s.n)).toSeq ++
      ts.map(t => (t, t, 1L))).sortBy(i => (i._1, i._2))
    if (items.isEmpty) return (st, Nil)
    val merged = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    items.foreach { case (s, e, n) =>
      merged.lastOption match {
        case Some((ps, pe, pn)) if s - pe <= gapMs =>
          merged(merged.length - 1) = (ps, math.max(pe, e), pn + n)
        case _ => merged += ((s, e, n))
      }
    }
    val closed = merged.init.map { case (s, e, n) =>
      SessionSummary(userId, n, s, e)
    }
    val (os, oe, on) = merged.last
    (Some(SessionState(on, os, oe)), closed.toSeq)
  }

  /** Stateful sessionization: 30-minute inactivity gap closes a session
    * (processing-time timeout stands in for event-time session windows).
    * Emits one summary row per closed session. */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        case (userId, it, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionSummary(userId, s.n, s.start, s.last))
          } else {
            val (cur, closed) =
              foldEvents(userId, it.map(_.ts.getTime).toSeq,
                state.getOption, gapMs)
            cur.foreach(state.update)
            state.setTimeoutDuration(gapMs)
            closed.iterator
          }
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.mcnemar]]: a live paired
    * A-vs-B eval monitor. O(1) state per group — (n, only_a, only_b) —
    * and each micro-batch emits the batch-identical verdict over
    * everything arrived: the same single division for χ² (HALF_UP to 6
    * like the batch `round`) and the same EXACT integer
    * cross-multiplication for significance, so stream ≡ batch at every
    * prefix, not just in the limit. Rows are (group, okA, okB). */
  def mcnemarStream(rows: Dataset[(String, Boolean, Boolean)],
      chiCrit: Double = 3.841): Dataset[(String, Long, Long, Long,
      Option[Double], Option[Boolean])] = {
    import rows.sparkSession.implicits._
    val critMicro = math.round(chiCrit * 1e6)
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long),
        (String, Long, Long, Long, Option[Double], Option[Boolean])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, it, state: GroupState[(Long, Long, Long)]) =>
          var (n, b, c) = state.getOption.getOrElse((0L, 0L, 0L))
          it.foreach { case (_, a, bb) =>
            n += 1
            if (a && !bb) b += 1
            if (!a && bb) c += 1
          }
          state.update((n, b, c))
          val disc = b + c
          val chi2 = if (disc > 0) {
            val d = b - c
            Some(java.math.BigDecimal
              .valueOf(d.toDouble * d.toDouble / disc.toDouble)
              .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
          } else None
          val sig = if (disc > 0) {
            val d = BigInt(b) - BigInt(c)
            Some(d * d * 1000000 >= BigInt(critMicro) * disc)
          } else None
          Iterator.single((g, n, b, c, chi2, sig))
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.groupSequential]] — the
    * op's natural home: a LIVE experiment monitor that is peeking-safe
    * BY DESIGN (every micro-batch re-emits the full interim table, and
    * each interim's verdict compares against its OBF-style boundary, so
    * refreshing the dashboard costs nothing statistically). State per
    * group is the K-bounded per-interim count map; each emission
    * replays the batch arithmetic over everything arrived — cumulative
    * exact integer sums in interim order, the same z² expression, the
    * same latched `decided` — so stream ≡ batch at every prefix. Rows
    * are (group, interim, treated, ok); interims outside 1..K are
    * dropped like the batch op. */
  def groupSequentialStream(
      rows: Dataset[(String, Long, Boolean, Boolean)],
      totalInterims: Int, zAlpha: Double = 1.959964)
      : Dataset[(String, Long, Long, Long, Option[Double], Double,
      Option[Boolean], Boolean)] = {
    import rows.sparkSession.implicits._
    require(totalInterims >= 1, "need totalInterims >= 1")
    rows.filter(r => r._2 >= 1 && r._2 <= totalInterims)
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, (Long, Long, Long, Long)],
        (String, Long, Long, Long, Option[Double], Double,
          Option[Boolean], Boolean)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, it, state) =>
          var m = state.getOption
            .getOrElse(Map.empty[Long, (Long, Long, Long, Long)])
          it.foreach { case (_, k, t, ok) =>
            val (na, ka, nb, kb) = m.getOrElse(k, (0L, 0L, 0L, 0L))
            m = m.updated(k,
              (na + (if (t) 1 else 0),
                ka + (if (t && ok) 1 else 0),
                nb + (if (!t) 1 else 0),
                kb + (if (!t && ok) 1 else 0)))
          }
          state.update(m)
          var (cna, cka, cnb, ckb) = (0L, 0L, 0L, 0L)
          var decided = false
          def r6(x: Double) = java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          m.keys.toSeq.sorted.iterator.map { k =>
            val (na, ka, nb, kb) = m(k)
            cna += na; cka += ka; cnb += nb; ckb += kb
            val bound = zAlpha *
              math.sqrt(totalInterims.toDouble / k.toDouble)
            val testable = cna > 0 && cnb > 0
            val (z2, crossed) = if (!testable) (None, None) else {
              val pA = cka.toDouble / cna.toDouble
              val pB = ckb.toDouble / cnb.toDouble
              val pBar = (cka + ckb).toDouble / (cna + cnb).toDouble
              val den = pBar * (1.0 - pBar) *
                (1.0 / cna.toDouble + 1.0 / cnb.toDouble)
              if (den > 0) {
                val z = (pA - pB) * (pA - pB) / den
                (Some(r6(z)), Some(z >= bound * bound))
              } else (None, None)
            }
            if (crossed.contains(true)) decided = true
            (g, k, cna, cnb, z2, r6(bound), crossed, decided)
          }
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.wilsonInterval]]: live
    * pass rates WITH their error bars — the number every streaming
    * eval dashboard shows next to the rate, because a 3-sample 100% and
    * a 3000-sample 100% are different claims. O(1) (n, k) state per
    * group; each micro-batch emits the batch-identical bounds (same
    * expression order, same HALF_UP rounding), so stream ≡ batch at
    * every prefix. Rows are (group, ok). */
  def wilsonStream(rows: Dataset[(String, Boolean)],
      z: Double = 1.959964)
      : Dataset[(String, Long, Long, Double, Double, Double)] = {
    import rows.sparkSession.implicits._
    val z2 = z * z
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long),
        (String, Long, Long, Double, Double, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, it, state: GroupState[(Long, Long)]) =>
          var (n, k) = state.getOption.getOrElse((0L, 0L))
          it.foreach { case (_, ok) => n += 1; if (ok) k += 1 }
          state.update((n, k))
          def r6(x: Double) = java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          val nD = n.toDouble
          val p = k.toDouble / nD
          val denom = 1.0 + z2 / nD
          val center = (p + z2 / (2.0 * nD)) / denom
          val hw = z * math.sqrt(p * (1.0 - p) / nD +
            z2 / (4.0 * nD * nD)) / denom
          Iterator.single((g, n, k, r6(p), r6(center - hw),
            r6(center + hw)))
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.equivalenceTest]] — the
    * live model-rollout gate: as candidate traffic ramps, every
    * micro-batch re-answers "is it still non-inferior / equivalent
    * within ±δ?" with the batch-identical TOST arithmetic. O(1)
    * (n_b, k_b, n_c, k_c) state per group; verdicts are null until both
    * arms have data, then batch ≡ stream at every prefix. Rows are
    * (group, isCandidate, ok). */
  def equivalenceStream(rows: Dataset[(String, Boolean, Boolean)],
      marginMicro: Long, zAlpha: Double = 1.644854)
      : Dataset[(String, Long, Long, Option[Double], Option[Boolean],
      Option[Boolean])] = {
    import rows.sparkSession.implicits._
    require(marginMicro > 0, "margin must be positive micro units")
    val delta = marginMicro.toDouble / 1e6
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long, Long),
        (String, Long, Long, Option[Double], Option[Boolean],
          Option[Boolean])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, it, state) =>
          var (nb, kb, nc, kc) = state.getOption
            .getOrElse((0L, 0L, 0L, 0L))
          it.foreach { case (_, cand, ok) =>
            if (cand) { nc += 1; if (ok) kc += 1 }
            else { nb += 1; if (ok) kb += 1 }
          }
          state.update((nb, kb, nc, kc))
          def r6(x: Double) = java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          val out = if (nb > 0 && nc > 0) {
            val pb = kb.toDouble / nb.toDouble
            val pc = kc.toDouble / nc.toDouble
            val diff = pc - pb
            val se = math.sqrt(pb * (1.0 - pb) / nb.toDouble +
              pc * (1.0 - pc) / nc.toDouble)
            if (se > 0) {
              val ni = (diff + delta) / se >= zAlpha
              val eq = ni && (delta - diff) / se >= zAlpha
              (Some(r6(diff)), Some(ni), Some(eq))
            } else (Some(r6(diff)), None, None)
          } else (None, None, None)
          Iterator.single((g, nb, nc, out._1, out._2, out._3))
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.chiSquared]]: a live
    * contingency-drift monitor ("is the outcome mix still independent
    * of the segment?"). State per group is the label-bounded (a, b)
    * count map — never row-sized; each micro-batch replays the batch
    * op's arithmetic over everything arrived: expected counts from
    * exact integer marginals, per-cell float terms folded in
    * (a,b)-sorted order, df from labels seen so far, verdict from the
    * same critical-value table. Stream ≡ batch at every prefix. Rows
    * are (group, a, b); output is (group, n, r, c, dof, chi2,
    * cramers_v, significant). */
  def chiSquaredStream(rows: Dataset[(String, String, String)],
      critByDf: Map[Int, Double] = graft.ops.Profiling.chi2Crit95)
      : Dataset[(String, Long, Long, Long, Int, Option[Double],
      Option[Double], Option[Boolean])] = {
    import rows.sparkSession.implicits._
    val critMicro: Map[Int, Long] =
      critByDf.map { case (k, v) => k -> math.round(v * 1e6) }
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Map[String, Long],
        (String, Long, Long, Long, Int, Option[Double], Option[Double],
          Option[Boolean])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (g, it, state: GroupState[Map[String, Long]]) =>
          var cells = state.getOption.getOrElse(Map.empty[String, Long])
          it.foreach { case (_, a, b) =>
            if (a != null && b != null) {
              val k = a + "\u0000" + b
              cells = cells.updated(k, cells.getOrElse(k, 0L) + 1L)
            }
          }
          state.update(cells)
          val split = cells.toSeq.map { case (k, o) =>
            val Array(a, b) = k.split("\u0000", 2)
            (a, b, o)
          }
          val n = split.map(_._3).sum
          val ra = split.groupBy(_._1).map { case (a, v) =>
            a -> v.map(_._3).sum }
          val cb = split.groupBy(_._2).map { case (b, v) =>
            b -> v.map(_._3).sum }
          val r = ra.size.toLong
          val c = cb.size.toLong
          val dof = ((r - 1) * (c - 1)).toInt
          // full r×c grid in (a,b)-sorted order, zero cells included —
          // the batch fold's exact term sequence
          val byCell = split.map(t => (t._1, t._2) -> t._3).toMap
          val chi2 = if (dof > 0 && n > 0) {
            val s = for {
              a <- ra.keys.toSeq.sorted
              b <- cb.keys.toSeq.sorted
            } yield {
              val o = byCell.getOrElse((a, b), 0L).toDouble
              val e = (BigInt(ra(a)) * BigInt(cb(b))).toDouble /
                n.toDouble
              (o - e) * (o - e) / e
            }
            Some(s.foldLeft(0.0)(_ + _))
          } else None
          def r6(x: Double) = java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          val v = chi2.map(x =>
            r6(math.sqrt(x / (n.toDouble * math.min(r - 1, c - 1)))))
          val sig = chi2.flatMap(x => critMicro.get(dof)
            .map(cm => x * 1000000.0 >= cm.toDouble))
          Iterator.single((g, n, r, c, dof, chi2.map(r6), v, sig))
      }
  }

  /** Streaming twin of [[graft.ops.Profiling.qiniCurve]] — the live
    * uplift-campaign dashboard: as scored (score, treated, converted)
    * outcomes stream in, each micro-batch re-emits the cumulative
    * incremental-conversion curve over FROZEN score boundaries (the
    * [[liftStream]] posture — tiles are design-time constants online,
    * the batch op's data-driven tiles need the full population).
    * State is O(bins) exact counters. Rows are (score, treated, ok);
    * output per populated tile (descending score = tile 1 first):
    * (tile, n_t, k_t, n_c, k_c, uplift — null until the cumulative
    * prefix has control mass). */
  def qiniStream(rows: Dataset[(Long, Boolean, Boolean)],
      boundaries: Seq[Long])
      : Dataset[(Int, Long, Long, Long, Long, Option[Double])] = {
    import rows.sparkSession.implicits._
    require(boundaries.nonEmpty && boundaries == boundaries.sorted,
      "boundaries must be non-empty and ascending")
    val bs = boundaries.toArray
    val nBins = bs.length + 1
    rows.map { case (s, t, ok) =>
      // tile 1 = HIGHEST scores (above the last boundary)
      var b = nBins
      var i = 0
      while (i < bs.length) { if (s > bs(i)) b -= 1; i += 1 }
      (b, t, ok)
    }.groupByKey(_ => "qini")
      .flatMapGroupsWithState[Seq[(Long, Long, Long, Long)],
        (Int, Long, Long, Long, Long, Option[Double])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          val bins = state.getOption
            .getOrElse(Seq.fill(nBins)((0L, 0L, 0L, 0L))).toArray
          it.foreach { case (b, t, ok) =>
            val (nt, kt, nc, kc) = bins(b - 1)
            bins(b - 1) =
              if (t) (nt + 1, kt + (if (ok) 1L else 0L), nc, kc)
              else (nt, kt, nc + 1, kc + (if (ok) 1L else 0L))
          }
          state.update(bins.toSeq)
          def rnd(x: Double) = BigDecimal(x)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          var (cnt, ckt, cnc, ckc) = (0L, 0L, 0L, 0L)
          val out = Vector.newBuilder[
            (Int, Long, Long, Long, Long, Option[Double])]
          var b = 0
          while (b < nBins) {
            val (nt, kt, nc, kc) = bins(b)
            if (nt + nc > 0) {
              cnt += nt; ckt += kt; cnc += nc; ckc += kc
              val uplift = if (cnc > 0)
                Some(rnd(ckt.toDouble -
                  ckc.toDouble * cnt.toDouble / cnc.toDouble))
              else None
              out += ((b + 1, cnt, ckt, cnc, ckc, uplift))
            }
            b += 1
          }
          out.result().iterator
      }
  }

  /** Streaming twin of [[graft.ops.EventAnalytics.holt]] — the live
    * trend-following forecast: O(1) (n, lastT, level, trend) state per
    * key, each micro-batch advances the double-exponential recursion
    * with the batch-identical float ops and emits the refreshed
    * one-step forecast. Contract: per key, time must be NON-DECREASING
    * across batches (the recursion cannot rewind); rows at or below
    * the high-water mark are dropped and COUNTED (`n_dropped`), never
    * silently absorbed. Within a batch rows are processed t-sorted.
    * Rows are (key, t, value). */
  def holtStream(rows: Dataset[(String, Long, Long)], alpha: Double,
      beta: Double)
      : Dataset[(String, Long, Long, Double, Option[Double],
      Option[Double])] = {
    import rows.sparkSession.implicits._
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta must be in [0,1], got $beta")
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Double, Double, Long),
        (String, Long, Long, Double, Option[Double], Option[Double])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (k, it, state) =>
          var (n, lastT, l, b, dropped) =
            state.getOption.getOrElse((0L, Long.MinValue, 0.0, 0.0, 0L))
          it.toSeq.sortBy(r => (r._2, r._3)).foreach { case (_, t, v) =>
            if (n > 0 && t <= lastT) dropped += 1
            else {
              val y = v.toDouble
              if (n == 0) { l = y }
              else if (n == 1) {
                val b0 = y - l
                val nl = alpha * y + (1.0 - alpha) * (l + b0)
                b = beta * (nl - l) + (1.0 - beta) * b0
                l = nl
              } else {
                val nl = alpha * y + (1.0 - alpha) * (l + b)
                b = beta * (nl - l) + (1.0 - beta) * b
                l = nl
              }
              n += 1; lastT = t
            }
          }
          state.update((n, lastT, l, b, dropped))
          def r6(x: Double) = java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          Iterator.single((k, n, dropped, r6(l),
            if (n >= 2) Some(r6(b)) else None,
            if (n >= 2) Some(r6(l + b)) else None))
      }
  }

  /** Streaming twin of [[graft.ops.EventAnalytics.forecastAccuracy]] —
    * the live forecast-QA dashboard: as (key, t, actual, forecast)
    * points land, every micro-batch re-emits the batch-identical
    * MAE/sMAPE/MASE scorecard over everything arrived. State is the
    * per-key (t → (a, f)) series map — O(grid span), the same
    * span-not-rows bound the batch op's naive join carries; a
    * re-delivered (key, t) UPSERTS (last write wins), and a
    * late-arriving t forms its seasonal-naive pairs retroactively —
    * exactly what the batch replay over the full table would produce.
    * All sums are exact integers (order-free), divisions and HALF_UP
    * rounding match the batch op term for term. Rows are
    * (key, t, actual, forecast). */
  def forecastAccuracyStream(rows: Dataset[(String, Long, Long, Long)],
      season: Int = 1)
      : Dataset[(String, Long, Double, Double, Long, Option[Double])] = {
    import rows.sparkSession.implicits._
    require(season >= 1, s"season must be >= 1; got $season")
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Map[Long, (Long, Long)],
        (String, Long, Double, Double, Long, Option[Double])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (k, it, state) =>
          var m = state.getOption.getOrElse(Map.empty[Long, (Long, Long)])
          it.foreach { case (_, t, a, f) => m += t -> ((a, f)) }
          state.update(m)
          val n = m.size.toLong
          var se = BigInt(0); var ss = 0L
          m.foreach { case (_, (a, f)) =>
            val err = math.abs(a - f); se += err
            val den = math.abs(a) + math.abs(f)
            if (den > 0) ss += 2000000L * err / den
          }
          var nn = 0L; var sn = BigInt(0)
          m.foreach { case (t, (a, _)) =>
            m.get(t - season).foreach { case (pa, _) =>
              nn += 1; sn += BigInt(a - pa).abs
            }
          }
          def r6(x: Double) = java.math.BigDecimal.valueOf(x)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
          val mae = se.toDouble / n.toDouble
          val mase = if (nn > 0 && sn > 0)
            Some(r6(mae / (sn.toDouble / nn.toDouble))) else None
          Iterator.single((k, n, r6(mae),
            r6(ss.toDouble / (n.toDouble * 1000000.0)), nn, mase))
      }
  }
}
