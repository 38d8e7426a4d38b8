package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming form of the reference's incremental semantics
  * (SURVEY.md §2.11).
  *
  * The reference's "stream" is a daily cron pulling an explicit
  * (date_from, date_to) window with a Monday weekend-widening rule
  * (/root/reference/dags/dag_maestros.py:10-22,42) and dedup/staging for
  * idempotent re-delivery. The streaming twins:
  *  - explicit date window        -> event-time window + watermark
  *  - weekend catch-up / late rows -> the watermark's lateness allowance
  *  - dedup-before-load            -> dropDuplicatesWithinWatermark
  *  - per-entity incremental state -> flatMapGroupsWithState sessionization
  *
  * All transforms take a DataFrame/Dataset so the SAME code runs in batch
  * (tests, backfills) and streaming (readStream) — Spark's unified model.
  */
final case class SessionState(startMs: Long, lastMs: Long, n: Int, sumValue: Double)

object Streams {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String, value: Double)
  final case class Session(user_id: Long, start: Timestamp, end: Timestamp,
                           n_events: Int, total_value: Double)

  /** Watermarked tumbling-window aggregation (streaming twin of
    * w4_window_hourly).
    */
  def windowedCounts(events: DataFrame, watermark: String = "10 minutes",
                     windowLen: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum("value"), 2).as("value_sum"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("cnt"), col("value_sum"))

  /** Exactly-once-ish dedup across micro-batches, the streaming analog of
    * the dedup-before-load guard (/root/reference/dags/CotyData_IPN.py:166).
    */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-static enrichment (the streaming twin of the J3/J5 dimension
    * lookup): joining a stream against a static dim is STATE-FREE — Spark
    * re-plans the static side per micro-batch and broadcasts it when
    * small, so there is no watermark, no state store, and the dim can be
    * swapped on disk between batches (slowly-changing dimension pickup
    * for free). Contrast with stream-stream joins, which buffer state.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame,
                    streamKey: String, dimKey: String): DataFrame =
    stream.join(broadcast(dim), col(streamKey) === col(dimKey))

  /** Stream-stream interval join: left rows matched to right rows with the
    * same key whose timestamp falls in [leftTs - window, leftTs). Unlike
    * [[enrichWithDim]] both sides buffer state; the time-range condition
    * plus the two watermarks are what let Spark EVICT that state — without
    * them an inner stream-stream join holds both streams forever. Matches
    * are emitted as soon as both sides have arrived, so the result set is
    * independent of micro-batch cut points (pinned by the st5 gate query
    * against the batch oracle). Column names must not collide across the
    * two sides.
    */
  def intervalJoin(left: DataFrame, right: DataFrame,
                   leftKey: String, rightKey: String,
                   leftTs: String, rightTs: String,
                   windowSpec: String = "5 minutes",
                   watermark: String = "10 minutes"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) < col(leftTs) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $windowSpec"))

  /** LEFT OUTER stream-stream interval join: [[intervalJoin]]'s matches
    * plus a null-extended row for every left event that found no partner.
    * The outer row CANNOT be emitted when the left event arrives — a
    * matching right may still be in flight — so it is emitted by state
    * EVICTION: once the watermark passes the point where the join
    * condition admits no future right, the buffered left row leaves the
    * state store as a null-extended result. Rows younger than the final
    * watermark are still awaiting partners when the stream ends and are
    * therefore NOT emitted — that trailing holdback is inherent to
    * watermark semantics, deterministic for a fixed input (the watermark
    * derives from data timestamps, never wall-clock), and disappears in a
    * live deployment where the stream keeps running.
    */
  def intervalJoinOuter(left: DataFrame, right: DataFrame,
                        leftKey: String, rightKey: String,
                        leftTs: String, rightTs: String,
                        windowSpec: String = "5 minutes",
                        watermark: String = "10 minutes"): DataFrame =
    left.withWatermark(leftTs, watermark)
      .join(right.withWatermark(rightTs, watermark),
        col(leftKey) === col(rightKey) &&
          col(rightTs) < col(leftTs) &&
          col(rightTs) >= col(leftTs) - expr(s"INTERVAL $windowSpec"),
        "leftOuter")

  /** Streaming ingestion into a document collection (S7/K8 store) with
    * dedup-before-insert: each micro-batch keeps only keys the collection
    * has not seen — the Bloom fast-path anti-join, so the bloom-negative
    * bulk of every batch skips the exact join entirely — and appends them
    * as one manifest-committed generation. Replayed or overlapping batches
    * are idempotent by construction: the reference's staged-sync contract
    * (K2, /root/reference/dags/CotyData_IPN.py:166 dedup-before-load)
    * carried into streaming.
    */
  def ingestToDocStore(stream: DataFrame, path: String, key: String,
                       expectedKeys: Long = 1000000L,
                       autoCompactAt: Int = 0,
                       autoCompactSmallBytes: Long = 0L)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        // dedup WITHIN the batch first: the anti-join only filters against
        // keys already in the store, so a batch carrying the same key twice
        // (or the very first batch, which sees an empty store) would insert
        // duplicates without this
        val unique = batch.dropDuplicates(key)
        val existing = graft.sources.DocStore.find(spark, path)
        val fresh =
          if (existing.columns.contains(key))
            graft.ops.BloomJoin.bloomAntiJoin(
              unique, existing.select(key), key, key, expectedKeys)
          else unique // first batch into an empty collection
        if (!fresh.isEmpty) graft.sources.DocStore.insertMany(fresh, path)
        // the small-files policy rides the sink: every micro-batch appends
        // files, so an unattended ingest needs the compaction built in.
        // foreachBatch serializes batches, so the rewrite never even races
        // an append here (and if it did, DocStore's salvage protocol would
        // carry the raced batch into the committed generation).
        // autoCompactSmallBytes > 0 keeps the self-maintenance
        // INCREMENTAL: only the sub-threshold append tail merges (large
        // files carry by reference), so a long-running ingest never pays
        // a corpus rewrite just to stay under its file budget
        if (autoCompactAt > 0)
          graft.sources.DocStore.maybeCompact(spark, path, autoCompactAt,
            targetFiles = math.max(1, autoCompactAt / 4),
            smallBytes = autoCompactSmallBytes)
        ()
      }
      .start()

  /** Incrementally maintained count-min sketch over a stream: each
    * micro-batch builds its own bounded cell table
    * ([[graft.ops.Sketch.cmsBuild]] — map-side combined, at most
    * depth x width rows whatever the batch size) and cell-wise merges it
    * into driver-held counters — CMS mergeability doing for streams what
    * `cmsMerge` does for partitions. The accumulated state is depth x
    * width longs, the same bounded model-state class as an IVF codebook;
    * the stream itself is never retained. Returns the running query and a
    * snapshot accessor producing a queryable [[graft.ops.Sketch.CmsSketch]]
    * at any point (estimates from a snapshot can only over-count, exactly
    * as in batch).
    */
  def maintainCms(stream: DataFrame, key: String, depth: Int, width: Int)
      : (org.apache.spark.sql.streaming.StreamingQuery,
         () => graft.ops.Sketch.CmsSketch) = {
    val cells = scala.collection.mutable.HashMap.empty[(Int, Long), Long]
    // resolve the key's type from the stream schema UP FRONT: a snapshot
    // taken before the first batch must still carry a probeable type (an
    // empty sketch estimates every key as 0, it doesn't fail analysis)
    @volatile var keyType: org.apache.spark.sql.types.DataType =
      stream.schema(key).dataType
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val sk = graft.ops.Sketch.cmsBuild(batch, col(key), depth, width)
        val rows = sk.cells.collect() // bounded: <= depth x width cells
        // foreachBatch callbacks run sequentially; synchronize only against
        // concurrent snapshot() readers
        cells.synchronized {
          keyType = sk.keyType
          rows.foreach { r =>
            val k = (r.getInt(0), r.getLong(1))
            cells(k) = cells.getOrElse(k, 0L) + r.getLong(2)
          }
        }
        ()
      }
      .start()
    val spark = stream.sparkSession
    def snapshot(): graft.ops.Sketch.CmsSketch = {
      import spark.implicits._
      val (rows, kt) = cells.synchronized {
        (cells.iterator.map { case ((r, b), c) => (r, b, c) }.toSeq, keyType)
      }
      graft.ops.Sketch.CmsSketch(rows.toDF("r", "bucket", "cnt"), depth, width, kt)
    }
    (q, () => snapshot())
  }

  /** Incrementally maintained HyperLogLog registers over a stream: each
    * micro-batch builds its bounded register table
    * ([[graft.ops.Hll.hllBuild]] — at most 2^p rows whatever the batch)
    * and folds register-wise max into a driver-held array. Register max
    * is idempotent AND commutative, so replayed or reordered batches
    * cannot corrupt the summary — stronger than CMS's additive merge,
    * which double-counts on replay. Driver state: 2^p bytes-ish of ints.
    */
  def maintainHll(stream: DataFrame, key: String, p: Int = 12)
      : (org.apache.spark.sql.streaming.StreamingQuery,
         () => graft.ops.Hll.HllSketch) = {
    val regs = new Array[Int](1 << p)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val rows = graft.ops.Hll.hllBuild(batch, col(key), p)
          .registers.collect() // bounded: <= 2^p rows
        regs.synchronized {
          rows.foreach { r =>
            val b = r.getInt(0)
            if (r.getInt(1) > regs(b)) regs(b) = r.getInt(1)
          }
        }
        ()
      }
      .start()
    val spark = stream.sparkSession
    def snapshot(): graft.ops.Hll.HllSketch = {
      import spark.implicits._
      val rows = regs.synchronized {
        regs.iterator.zipWithIndex.collect {
          case (rho, b) if rho > 0 => (b, rho)
        }.toSeq
      }
      graft.ops.Hll.HllSketch(rows.toDF("bucket", "max_rho"), p)
    }
    (q, () => snapshot())
  }

  /** Incrementally maintained quantile sketch over a stream: each
    * micro-batch aggregates into ONE bounded sketch
    * ([[graft.functions.QuantileSketch]] — O(k log(n/k)) doubles whatever
    * the batch size) and merges into a driver-held buffer. Merge is
    * ADDITIVE, so like the CMS fold (and unlike HLL's idempotent register
    * max) an at-least-once replay would double-count — production
    * deployments dedupe by batchId in foreachBatch; the drained bench
    * shape replays nothing, and the spec pins streamed n == batch n
    * exactly plus the standard rank-error bound.
    */
  def maintainQuantileSketch(stream: DataFrame, valueCol: String, k: Int = 256)
      : (org.apache.spark.sql.streaming.StreamingQuery,
         () => graft.functions.QuantileSketch.Buffer) = {
    val holder = new graft.functions.QuantileSketch.Buffer(k)
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bytes = batch
          .agg(graft.functions.QuantileSketch
            .quantile_sketch(col(valueCol), k).as("s"))
          .head().getAs[Array[Byte]](0) // bounded: one sketch per batch
        holder.synchronized {
          holder.mergeIn(graft.functions.QuantileSketch.deserialize(bytes))
        }
        ()
      }
      .start()
    // snapshots hand out defensive copies: the live buffer keeps merging
    (q, () => holder.synchronized {
      graft.functions.QuantileSketch.deserialize(holder.serialize())
    })
  }

  /** STORED per-batch quantile sketches: each micro-batch aggregates to
    * ONE bounded sketch row written to `sketchDir/batch_id=N/` — the
    * read-side twin of [[maintainQuantileSketch]]. Where the driver-held
    * fold answers only within this process, the stored table is the
    * build-once/query-many warehouse shape: any later percentile
    * question is `sketch_quantiles(quantile_sketch_merge(sk), probs)`
    * over a table with one small row per batch — plain SQL, any session,
    * surviving driver restarts — and never a rescan of the stream's rows.
    *
    * Replay-immune where the driver fold is not: the batch's OUTPUT
    * PARTITION is keyed by batchId and written with overwrite, so an
    * at-least-once redelivery rewrites the same row instead of
    * double-counting (the foreachBatch idempotence idiom).
    */
  def storeQuantileSketches(stream: DataFrame, valueCol: String,
                            sketchDir: String, k: Int = 256)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch
          .agg(graft.functions.QuantileSketch
            .quantile_sketch(col(valueCol), k).as("sk"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$sketchDir/batch_id=$batchId")
        ()
      }
      .start()

  /** One bounded KMV sketch row per (micro-batch, group): the streaming
    * build side of [[graft.ops.Kmv]]. `stream` must already carry the
    * group column and a deterministic long hash column (ops.Kmv.hashKey
    * for the oracle-exact md5 form). Per batch the aggregate ships at
    * most k longs per group; `overwrite` into `batch_id=N` makes an
    * at-least-once replay REWRITE its batch instead of duplicating it —
    * and because bottom-k-of-bottom-ks == bottom-k-of-union (KmvSpec),
    * the merged read side equals the one-shot batch build EXACTLY, so
    * the streamed sketch crosses the same DuckDB oracle the batch sketch
    * does (st16 — unlike the quantile sketch, whose merge is order-
    * sensitive by contract).
    */
  def storeKmvSketches(stream: DataFrame, grpCol: String, hashCol: String,
                       sketchDir: String, k: Int = 256)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.groupBy(col(grpCol).as("grp"))
          .agg(graft.functions.KmvAgg.kmv_sketch(col(hashCol), k).as("mins"))
          .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
          .parquet(s"$sketchDir/batch_id=$batchId")
        ()
      }
      .start()

  /** A point-in-time view of a streamed Misra-Gries summary: candidate
    * keys with their (under-)counts, the exact total row count folded in,
    * and the key's type for re-joining against stored data. The candidate
    * guarantee carried over from batch ([[graft.ops.HeavyHitters]]): every
    * key with true frequency >= 1/budget of `total` is present — merging
    * per-batch summaries keeps the undercount <= total/(budget+1)
    * (Agarwal et al., PODS 2012), so a verify pass over candidates only
    * still returns the EXACT heavy hitters.
    */
  final case class MgSnapshot(counters: Seq[(Any, Long)], total: Long,
                              budget: Int,
                              keyType: org.apache.spark.sql.types.DataType) {
    /** Exact heavy hitters at `minFraction`, verified against `data`
      * (the at-rest table the stream fed — or any table to count over):
      * broadcast the bounded candidate set, count exactly, threshold.
      * Refuses a `minFraction` below the summary's guarantee (the
      * candidate set is only provably complete at >= 1/budget) — the
      * same strict bound the batch op enforces, checked here because the
      * threshold is chosen at snapshot time, not at maintenance time.
      */
    def exactHeavyHitters(data: DataFrame, key: String,
                          minFraction: Double): DataFrame = {
      graft.ops.HeavyHitters.requireBudget(minFraction, budget)
      val spark = data.sparkSession
      graft.ops.HeavyHitters.exactOverCandidates(spark,
        data.select(col(key)), counters.map(_._1).toArray, keyType,
        minFraction, total, key)
    }
  }

  /** Incrementally maintained heavy-hitter summary over a stream: each
    * micro-batch runs the per-partition Misra-Gries pass (bounded state,
    * no shuffle) and its summaries fold into ONE driver-held MG summary of
    * `budget` counters — the streaming twin of [[graft.ops.HeavyHitters]],
    * exploiting that MG summaries are mergeable with no loss of the
    * candidate guarantee. Driver state is `budget` counters + one long,
    * whatever the stream length; the stream itself is never retained.
    * Candidates at minFraction >= 1/budget are provably complete, so a
    * downstream exact verify ([[MgSnapshot.exactHeavyHitters]]) stays
    * gate-oracle-able against plain GROUP BY ... HAVING.
    */
  def maintainHeavyHitters(stream: DataFrame, key: String, budget: Int = 256)
      : (org.apache.spark.sql.streaming.StreamingQuery, () => MgSnapshot) = {
    val acc = new java.util.HashMap[Any, Long](budget * 2)
    var total = 0L
    val keyType = stream.schema(key).dataType
    val q = stream.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val summary = graft.ops.HeavyHitters.partitionSummaries(
          batch.select(col(key)), budget)
        // foreachBatch callbacks run sequentially; synchronize only against
        // concurrent snapshot() readers
        acc.synchronized {
          total += summary.iterator.filter(_.getBoolean(2)).map(_.getLong(1)).sum
          graft.ops.HeavyHitters.mgMergeInto(acc,
            summary.iterator.filterNot(_.getBoolean(2))
              .map(r => (r.get(0), r.getLong(1))), budget)
        }
        ()
      }
      .start()
    def snapshot(): MgSnapshot = acc.synchronized {
      import scala.jdk.CollectionConverters._
      MgSnapshot(acc.entrySet().asScala.map(e => (e.getKey, e.getValue)).toSeq,
        total, budget, keyType)
    }
    (q, () => snapshot())
  }

  /** Gap-based sessionization with custom state
    * (KeyValueGroupedDataset.flatMapGroupsWithState). Sessions close when
    * `gapMs` passes without an event for the user (emitted as soon as a
    * later event proves the gap) or on event-time timeout.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._

    def flush(uid: Long, st: SessionState): Session =
      Session(uid, new Timestamp(st.startMs), new Timestamp(st.lastMs), st.n, st.sumValue)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var st = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          for (e <- sorted) {
            val t = e.ts.getTime
            if (st == null) st = SessionState(t, t, 1, e.value)
            else if (t - st.lastMs > gapMs) {
              out += flush(uid, st)
              st = SessionState(t, t, 1, e.value)
            } else st = SessionState(st.startMs, math.max(st.lastMs, t), st.n + 1,
                                     st.sumValue + e.value)
          }
          if (st != null) state.update(st)
          out.iterator
      }
  }

  /** Sessionization with event-time timeout: like [[sessionize]], but open
    * sessions also FLUSH once the watermark passes lastEvent + gap — no
    * session waits forever for a next event that never comes. Input must
    * carry a watermark on `ts`.
    */
  def sessionizeWithTimeout(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._

    def flush(uid: Long, st: SessionState): Session =
      Session(uid, new Timestamp(st.startMs), new Timestamp(st.lastMs), st.n, st.sumValue)

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (batch.isEmpty && state.hasTimedOut) {
            // watermark passed lastEvent + gap: close the open session
            val out = state.getOption.map(flush(uid, _)).iterator
            state.remove()
            out
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var st = state.getOption.orNull
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            for (e <- sorted) {
              val t = e.ts.getTime
              if (st == null) st = SessionState(t, t, 1, e.value)
              else if (t - st.lastMs > gapMs) {
                out += flush(uid, st)
                st = SessionState(t, t, 1, e.value)
              } else st = SessionState(st.startMs, math.max(st.lastMs, t), st.n + 1,
                                       st.sumValue + e.value)
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.lastMs + gapMs)
            }
            out.iterator
          }
      }
  }

  /** Streaming file ingestion: readStream over a parquet directory with the
    * engine's windowed aggregation — the Trigger.AvailableNow shape the
    * reference's daily batch maps onto.
    */
  def fileStream(spark: SparkSession, path: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Streaming ANN index maintenance: each micro-batch of embeddings is
    * assigned to its IVF cell (a pure broadcast projection —
    * [[graft.sim.Ann.IvfModel.assign]] is a codegen'd argmax over the
    * fitted centroids, no shuffle) and published to a batch-dir,
    * CELL-PARTITIONED parquet index (`batch_id=N/cell=M/`), so probe-time
    * reads touch only the probed cells' directories. This closes the
    * fit-rarely / ingest-continuously / query-often loop: Lloyd runs once
    * offline ([[graft.sim.Ann.fitIvf]]), the stream keeps the index
    * current, [[graft.sim.Ann.ivfSearch]] serves against the growing
    * index (read `spark.read.parquet(path)` — the extra batch_id
    * partition column is inert to the search).
    *
    * Delivery is at-least-once, and the overwrite-by-batch-dir layout
    * (the near-dup index discipline) makes a foreachBatch REPLAY rewrite
    * identical content instead of appending duplicates — exactly-once
    * index bytes without driver state. A PRODUCER re-sending rows in a
    * genuinely new batch still duplicates (dedup upstream via
    * [[dedupStream]] or [[ingestToDocStore]]'s seen-key anti-join);
    * results stay correct either way because ivfSearch deduplicates
    * candidates before the exact re-rank. Replays also honor takedowns:
    * each batch anti-joins ids tombstoned at-or-after it
    * ([[removeFromIvfIndex]]), so a replayed pre-takedown batch can
    * never reinstate removed vectors. A `_META` sidecar pins the model
    * geometry + centroid content — resuming (or probing) with a
    * different model fails loudly instead of silently probing wrong
    * cells.
    */
  def ingestToIvfIndex(stream: DataFrame, model: graft.sim.Ann.IvfModel,
                       path: String, embCol: String = "embedding",
                       idCol: String = "vec_id")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    stream.writeStream
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
        if (!batch.isEmpty)
          ivfBatch(batch.toDF(), bid, path, model, idCol, embCol)
        ()
      }

  /** One IVF ingest batch: tombstone-filter, assign cells, publish as
    * `batch_id=N/cell=M/` with static overwrite (replay-idempotent).
    * Shared by the stream sink and [[syncIvfIndex]].
    */
  private[graft] def ivfBatch(batch: DataFrame, bid: Long, indexPath: String,
                                  model: graft.sim.Ann.IvfModel,
                                  idCol: String, embCol: String): Long = {
    val spark = batch.sparkSession
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    healIndexCompaction(fs, indexPath) // a crashed compaction heals first
    requireIvfGeometry(fs, indexPath, model, "ingestToIvfIndex")
    writeIvfMeta(fs, indexPath, model)
    val tombDir = s"$indexPath/$IvfTombstones"
    // the returned count rides the write job as an Observation (the
    // DocStore.insertMany pattern) — syncIvfIndex's seed formerly paid a
    // SECOND full snapshot pass just to count what it was about to
    // write. Attached BELOW the tombstone anti-join so the count keeps
    // the exact semantics the callers' former .count() had (input rows,
    // pre-tombstone).
    val obs = org.apache.spark.sql.Observation()
    val counted = batch.observe(obs, count(lit(1)).as("rows"))
    val live =
      if (fs.exists(new org.apache.hadoop.fs.Path(tombDir)))
        counted.join(
          broadcast(spark.read.parquet(tombDir)
            .filter(col("cutoff_bid") >= bid).select(col(idCol)).distinct()),
          Seq(idCol), "left_anti")
      else counted
    live.withColumn("cell", model.assign(col(embCol)))
      .repartition(col("cell"))
      .write.mode(SaveMode.Overwrite).partitionBy("cell")
      .option("partitionOverwriteMode", "static")
      .parquet(s"$indexPath/batch_id=$bid")
    obs.get("rows").asInstanceOf[Long]
  }

  // underscore-prefixed so `spark.read.parquet(indexPath)` partition
  // discovery never sees them as data dirs (direct root reads still work
  // — the hidden-file rule exempts explicit roots)
  private val IvfTombstones = "_tombstones"
  private val IvfMeta = "_META"

  /** Pin the index's model identity (`_META`: cell count + a content hash
    * of the centroid values) at first write; every later entry point
    * validates it. Cell ids are only comparable under the SAME fitted
    * centroids — a mismatched model would silently assign/probe wrong
    * cells (no error, just wrong recall), the same failure class the
    * near-dup `_META` guards against.
    */
  private def writeIvfMeta(fs: org.apache.hadoop.fs.FileSystem,
                           indexPath: String,
                           model: graft.sim.Ann.IvfModel): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexPath, IvfMeta)
    if (!fs.exists(p)) {
      fs.mkdirs(new org.apache.hadoop.fs.Path(indexPath))
      val tmp = new org.apache.hadoop.fs.Path(indexPath,
        s"$IvfMeta.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(
        (s"cells=${model.centroids.length}\n" +
          s"centroids=${model.centroids.hashCode()}\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, p)) fs.delete(tmp, false) // a racer wrote it first
    }
  }

  private def requireIvfGeometry(fs: org.apache.hadoop.fs.FileSystem,
                                 indexPath: String,
                                 model: graft.sim.Ann.IvfModel,
                                 what: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexPath, IvfMeta)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val txt = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      val stored = txt.split("\n").iterator.map(_.trim).filter(_.contains("="))
        .map { l => val Array(a, b) = l.split("=", 2); a -> b }.toMap
      stored.get("cells").foreach(s => require(s.toInt == model.centroids.length,
        s"$what: model has ${model.centroids.length} cells but the index " +
          s"at $indexPath was built with ${s.trim} — cell ids are not comparable"))
      stored.get("centroids").foreach(s =>
        require(s.toInt == model.centroids.hashCode(),
          s"$what: model centroids differ from the ones the index at " +
            s"$indexPath was built with — refit drift; rebuild the index " +
            "or serve with the persisted model (ModelStore)"))
    }
    // layout guard: an index written by the pre-batch-dir layout has
    // `cell=M` dirs at the ROOT. Appending `batch_id=N/cell=M` next to
    // them would put leaf files at different depths and brick every
    // later partition discovery ("Conflicting directory structures") —
    // refuse LOUDLY before the first write lands instead
    val root = new org.apache.hadoop.fs.Path(indexPath)
    if (fs.exists(root) &&
        fs.listStatus(root).exists(st =>
          st.isDirectory && st.getPath.getName.startsWith("cell=")))
      throw new IllegalStateException(
        s"$what: the index at $indexPath uses the legacy root-level " +
          "cell=M layout; the batch-dir layout (batch_id=N/cell=M) " +
          "cannot be mixed into it — rebuild the index from the corpus")
  }

  /** TAKEDOWN for an IVF index built by [[ingestToIvfIndex]] /
    * [[syncIvfIndex]]: purge `ids` so no future probe or replayed ingest
    * batch can serve them — the right-to-be-forgotten operation for an
    * embedding index, mirroring [[removeFromNearDupIndex]]. Returns how
    * many indexed vectors were removed.
    *
    * Cost: one column-pruned scan of (id, partition dirs) finds the
    * affected batch dirs — bounded driver collect of batch ids, never
    * ids — and only those dirs are rewritten (repartitioned by cell,
    * stage-then-swap with crash healing, exactly the near-dup takedown
    * protocol). Tombstones land FIRST, stamped with the max batch id
    * present now, so an at-least-once replay of any pre-takedown batch
    * rewrites itself WITHOUT the removed ids; a genuinely new batch (id
    * above the cutoff) can re-insert deliberately. `tombstone = false`
    * is for [[syncIvfIndex]], whose crashed-poll replay must re-ingest
    * the very ids it just removed at the SAME deterministic batch id.
    * Single-writer like the ingest: do not run while a batch is in
    * flight.
    */
  def removeFromIvfIndex(spark: SparkSession, indexPath: String,
                         ids: DataFrame, idCol: String = "vec_id",
                         tombstone: Boolean = true,
                         cellHints: Option[Seq[Long]] = None): Long = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(indexPath)),
      s"removeFromIvfIndex: no index at $indexPath")
    // complete a crashed compaction first (same reason as near-dup)
    healIndexCompaction(fs, indexPath)
    // crash recovery for our own swap protocol (same as near-dup): a
    // leftover staging dir whose batch dir is gone means a crash between
    // delete and rename — complete the swap
    fs.listStatus(new org.apache.hadoop.fs.Path(indexPath)).foreach { st =>
      val nm = st.getPath.getName
      if (st.isDirectory && nm.startsWith(".takedown-b")) {
        val b = nm.stripPrefix(".takedown-b").takeWhile(_ != '-')
        val target = new org.apache.hadoop.fs.Path(indexPath, s"batch_id=$b")
        if (!fs.exists(target)) {
          if (!fs.rename(st.getPath, target))
            throw new java.io.IOException(
              s"removeFromIvfIndex: cannot recover ${st.getPath} -> $target")
        } else fs.delete(st.getPath, true)
      }
    }
    val batchDirs = fs.listStatus(new org.apache.hadoop.fs.Path(indexPath))
      .toSeq.collect {
        case st if st.isDirectory && st.getPath.getName.startsWith("batch_id=") =>
          st.getPath.getName.stripPrefix("batch_id=").toLong
      }.sorted
    if (batchDirs.isEmpty) return 0L
    val idDf = ids.select(col(idCol)).distinct().cache()
    // TOMBSTONE FIRST (the removeFromNearDupIndex ordering argument): a
    // crash after this leaves the replay filter in place even if the
    // physical purge is incomplete; re-running finishes it
    if (tombstone)
      idDf.withColumn("cutoff_bid", lit(batchDirs.max))
        .write.mode(SaveMode.Append).parquet(s"$indexPath/$IvfTombstones")
    // the DISCOVERY scan finds which batch dirs hold the ids. `cellHints`
    // restricts it by partition pruning to the cells that may hold the
    // ids' vectors — at 100 TB the difference between scanning the whole
    // index's id column and O(hinted cells). The caller owns the hint's
    // COMPLETENESS (a missed cell = an incomplete takedown):
    // [[syncIvfIndex]] derives it from the change window's before-image
    // embeddings under the _META-pinned model, which is exactly where
    // every superseded vector was assigned. The per-batch REWRITE below
    // is unhinted either way — it anti-joins the whole dir it rewrites.
    val all0 = spark.read.parquet(indexPath)
    val all = cellHints.fold(all0)(cs => all0.filter(col("cell").isin(cs: _*)))
    // ONE discovery pass: removed-id count and affected batch set come
    // from a single aggregate collect (bounded: one long + one batch-id
    // set) — the former cache + count + collect shape paid two jobs and
    // a cache build over the same scan
    val disc = all.select(col(idCol), col("batch_id"))
      .join(idDf, Seq(idCol), "leftsemi")
      .agg(countDistinct(col(idCol)).as("__n"),
        collect_set(col("batch_id").cast("long")).as("__bs"))
      .head()
    val removed = disc.getLong(0)
    if (removed == 0L) { idDf.unpersist(); return 0L }
    val tainted = disc.getSeq[Long](1).sorted
    // per-batch rewrites target disjoint batch dirs — run them
    // concurrently (the near-dup takedown / ingest-publish argument),
    // sequentially under the SessionCatalog monitor (SQL TVF path)
    def rewrite(b: Long): Unit = {
      // no pre-write materialization needed: the rewrite writes into a
      // PRIVATE tmp dir while the source batch dir stays intact — the
      // destructive delete happens only after the write completed, so
      // the write job itself is the materialization
      val kept = spark.read.parquet(s"$indexPath/batch_id=$b")
        .join(idDf, Seq(idCol), "left_anti")
      val tmp = new org.apache.hadoop.fs.Path(indexPath,
        s".takedown-b$b-${java.util.UUID.randomUUID()}")
      kept.repartition(col("cell"))
        .write.mode(SaveMode.Overwrite).partitionBy("cell")
        .parquet(tmp.toString)
      val target = new org.apache.hadoop.fs.Path(indexPath, s"batch_id=$b")
      fs.delete(target, true)
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(
          s"removeFromIvfIndex: cannot swap $tmp -> $target")
    }
    if (Thread.holdsLock(spark.sessionState.catalog)) tainted.foreach(rewrite)
    else {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      tainted.map(b => Future(rewrite(b)))
        .foreach(Await.result(_, scala.concurrent.duration.Duration.Inf))
    }
    idDf.unpersist()
    removed
  }

  /** Keep an IVF ANN index FOLLOWING a DocStore corpus by cursor CDC —
    * the embedding twin of [[syncNearDupIndex]], closing the r10 gap
    * where a mutating corpus left its ANN index stale or holding removed
    * vectors: appended embeddings are assigned and join the index;
    * deleted documents' vectors are taken down (batch-dir rewrites);
    * an UPDATED embedding is re-indexed — but only when the vector
    * actually changed (a metadata-only document update touches nothing).
    * Returns how many vectors were upserted this poll.
    *
    * Exactly-once by the syncNearDupIndex protocol: a poll is
    * removeFromIvfIndex (idempotent) + one [[ivfBatch]] at the
    * deterministic `lastBid + 1` (overwrite-by-batch-dir), with the
    * consumed cursor committed to `_SYNC` (tmp-then-rename) only after
    * both — a crash anywhere replays byte-identically. The model must
    * stay FIXED across polls (`_META` pins its centroid content; fit
    * once, persist via ModelStore, serve forever — refitting would
    * scramble cell ids under the existing index). At 100 TB each poll
    * costs O(changed embeddings + their batch dirs), never an index or
    * corpus rescan.
    */
  def syncIvfIndex(spark: SparkSession, srcPath: String, indexPath: String,
                   model: graft.sim.Ann.IvfModel,
                   idCol: String = "vec_id", embCol: String = "embedding",
                   maxBatchDirs: Int = 0): Long = {
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    healIndexCompaction(fs, indexPath) // a crashed compaction heals first
    requireIvfGeometry(fs, indexPath, model, "syncIvfIndex")
    registerIndex(spark, srcPath, indexPath, "ivf") // maintainAll discovery
    // maxBatchDirs > 0: bound the batch-dir count as part of the poll
    // loop (see syncNearDupIndex) — fold committed dirs after the poll
    def maybeCompactIdx(): Unit =
      if (maxBatchDirs > 0) { compactIvfIndex(spark, indexPath, maxBatchDirs); () }
    def hasBatches: Boolean =
      fs.exists(new org.apache.hadoop.fs.Path(indexPath)) &&
        fs.listStatus(new org.apache.hadoop.fs.Path(indexPath))
          .exists(st => st.isDirectory && st.getPath.getName.startsWith("batch_id="))
    def seed(c: graft.sources.DocStore.DocCursor): Long = {
      // EXACTLY the cursor's snapshot (not a live find): the first
      // poll's delta is then disjoint from the seed by construction —
      // the near-dup seed discipline
      val snap = graft.sources.DocStore.snapshotAt(spark, srcPath, c)
        .select(col(idCol), col(embCol))
        .filter(col(embCol).isNotNull)
      // ONE full snapshot pass: isEmpty is a limit-1 probe and the count
      // rides the ivfBatch write's own job (the former snap.count()
      // paid a second corpus-sized scan at seed time)
      val n = if (snap.isEmpty) 0L
        else ivfBatch(snap, 1L, indexPath, model, idCol, embCol)
      writeNearDupSync(fs, indexPath, c, if (hasBatches) 1L else 0L)
      n
    }
    readNearDupSync(fs, indexPath) match {
      case None =>
        require(!hasBatches,
          s"syncIvfIndex: $indexPath already has ingested batches but no " +
            "_SYNC state — it was built by the stream ingest or another " +
            "maintainer; point CDC sync at a fresh index directory")
        val c = graft.sources.DocStore.cursor(spark, srcPath)
        fs.mkdirs(new org.apache.hadoop.fs.Path(indexPath))
        writeNearDupSync(fs, indexPath, c, -1L) // seed intent (crash-safe)
        seed(c)
      case Some((c0, -1L)) => // a crashed seed: redo it (idempotent)
        seed(c0)
      case Some((c0, lastBid)) =>
        val (changes, next) =
          graft.sources.DocStore.changesSince(spark, srcPath, c0, idCol)
        if (next == c0) { maybeCompactIdx(); return 0L }
        def sideEmb(side: String): org.apache.spark.sql.Column = {
          val st = changes.schema(side).dataType
            .asInstanceOf[org.apache.spark.sql.types.StructType]
          if (st.fieldNames.contains(embCol)) col(s"$side.$embCol")
          else lit(null)
        }
        // ONE per-id pass over the change window, and a SINGLE aggregate
        // — no window functions at all: `max_by`/`min_by` pick the
        // latest/earliest generation's side images directly (MaxBy skips
        // null ORDERINGS only, and `generation` is never null, so a
        // latest-is-delete id correctly yields a null `__emb`), where the
        // former shape paid two window sorts (desc + asc row_number)
        // before the same group-agg. `__tc` = the indexed vector must
        // change, `__old` = superseded content may exist in the index,
        // `__emb` = the latest after-image embedding (null when the net
        // effect is a delete)
        val perId = changes
          .groupBy(col(idCol))
          .agg(max(when(!(sideEmb("before") <=> sideEmb("after")), 1)
              .otherwise(0)).as("__tc"),
            max(when(col("change") =!= "inserted", 1).otherwise(0)).as("__old"),
            max_by(when(col("change") =!= "deleted", sideEmb("after")),
              col("generation")).as("__emb"),
            // the id's indexed vector as of the cursor == the before image
            // of its FIRST change in the window (the index follows the
            // corpus exactly, pinned by SyncIvfSpec) — its cell under the
            // _META-pinned model is where the takedown must look
            min_by(sideEmb("before"), col("generation")).as("__embBefore"))
          .filter(col("__tc") === 1)
          .localCheckpoint(true)
        if (perId.isEmpty) { // metadata-only window: cursor advance only
          writeNearDupSync(fs, indexPath, next, lastBid)
          maybeCompactIdx()
          return 0L
        }
        val toIngest = perId.filter(col("__emb").isNotNull)
          .select(col(idCol), col("__emb").as(embCol))
        // remove superseded vectors FIRST, then ingest the latest
        // embeddings as the next batch — both steps idempotent at this
        // cursor-determined batch id, so a crashed poll replays
        // byte-identically. tombstone = false: the replay must re-ingest
        // the very ids it just removed at the SAME id. PURE-INSERT FAST
        // PATH: a freshly inserted id cannot be in the index — the seed
        // read exactly its cursor's snapshot — so the takedown scan runs
        // only when the window carries an update or delete. Same
        // precondition as syncNearDupIndex's fast path: seed THROUGH
        // this function; a foreign index seeded from a live read can
        // hold "inserted" ids whose stale entries nothing reconciles.
        val toRemove = perId.filter(col("__old") === 1)
        if (hasBatches && !toRemove.isEmpty) {
          // bounded driver collect: DISTINCT CELLS of the superseded
          // vectors (<= nCells values, never ids). A null before-image
          // (the doc carried no embedding at the cursor) was never
          // indexed, so its absence from the hint is exact. Crash-replay
          // sound: a replayed poll's after-image copies live only in
          // batch `bid`, which the ivfBatch below overwrites whole.
          val hintCells = toRemove.filter(col("__embBefore").isNotNull)
            .select(model.assign(col("__embBefore")).cast("long").as("c"))
            .distinct().collect().map(_.getLong(0)).toSeq
          removeFromIvfIndex(spark, indexPath, toRemove.select(col(idCol)),
            idCol, tombstone = false, cellHints = Some(hintCells))
        }
        val bid = lastBid + 1
        // count rides the write (perId is checkpointed, so isEmpty is a
        // local probe and nothing upstream recomputes)
        val n = if (toIngest.isEmpty) 0L
          else ivfBatch(toIngest, bid, indexPath, model, idCol, embCol)
        writeNearDupSync(fs, indexPath, next, if (n > 0) bid else lastBid)
        maybeCompactIdx()
        n
    }
  }

  /** Streaming NEAR-DUP detection: the dedup twin of [[ingestToIvfIndex]]
    * — documents stream in, each micro-batch is checked for near-
    * duplicates against EVERYTHING ingested before it (and within
    * itself), matches are emitted incrementally, and the batch then joins
    * the index. This is the shape a continuously-fed training corpus
    * needs: reject/flag a near-dup at ARRIVAL time instead of re-running
    * the full O(corpus) MinHash job nightly.
    *
    * Index layout under `indexPath` (all plain parquet, no driver state —
    * a restarted driver resumes from the directories):
    *  - `keys/batch_id=N/slot=S/` — LSH band keys, slot =
    *    xxhash64(band, band_hash) mod 16: a probe reads ONLY the slots
    *    its batch touches (partition pruning), never the whole key set
    *  - `shingles/batch_id=N/id_slot=S/` — shingle sets for exact
    *    verification, id-sloted the same way, read only for candidate ids
    *  - `matches/batch_id=N/` — verified (id_a, id_b, jaccard) emitted by
    *    that batch
    * Every per-batch write is OVERWRITE-by-batch-dir, so an at-least-once
    * replay rewrites identical content instead of duplicating it (reads
    * filter `batch_id < current`, so a replayed batch also cannot match
    * against its own half-written previous attempt). Replays also honor
    * takedowns: each batch filters its input against the
    * `tombstones/` sidecar ([[removeFromNearDupIndex]]), so a replayed
    * pre-takedown batch can never reinstate removed documents.
    *
    * Per-batch cost is bounded by the batch, not the corpus: band keys
    * and shingles are batch-sized projections; the stored-key probe is a
    * slot-pruned read semi-joined to batch buckets; bucket caps
    * ([[graft.dedup.BucketDrops]], counted drops) bound pair fan-out with
    * bucket sizes evaluated as-of arrival (a bucket that later exceeds
    * the cap keeps its earlier, legitimately-emitted matches — arrival-
    * time semantics, the streaming analogue of m1's cap; drained-stream
    * == one-shot-batch pair equality on under-cap data is pinned in
    * StreamsSpec). Shingle reads for verification are id-slot-pruned to
    * the candidate set.
    */
  def ingestToNearDupIndex(stream: DataFrame, indexPath: String,
                           idCol: String = "doc_id", textCol: String = "text",
                           k: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                           threshold: Double = 0.7, maxBucket: Int = 1000)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val Slots = 16L
    stream.writeStream.foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], bid: Long) =>
      // guard against an empty trigger: the whole per-batch pipeline
      // (reads, joins, three writes) would run for nothing
      if (!batch.isEmpty) nearDupBatch(batch, bid, indexPath, idCol, textCol,
        k, bands, rowsPerBand, threshold, maxBucket, Slots)
      ()
    }
  }

  /** The index's LSH geometry, persisted as `indexPath/_META` by the
    * first ingest batch (write-if-absent, tmp-then-rename): band hashes
    * are only comparable when shingle size and banding match, so a probe
    * or a later ingest run with different parameters would silently
    * produce garbage candidates (usually: no matches at all — "the eval
    * set is clean" when it is not). Every entry point validates against
    * the stored geometry and fails loudly on a mismatch; an index built
    * before `_META` existed validates nothing (documented legacy gap).
    */
  private def writeNearDupMeta(fs: org.apache.hadoop.fs.FileSystem,
                               indexPath: String, k: Int, bands: Int,
                               rowsPerBand: Int): Unit = {
    val p = new org.apache.hadoop.fs.Path(indexPath, "_META")
    if (!fs.exists(p)) {
      // shingles_sorted=1: this index's shingles sidecar holds SORTED
      // duplicate-free arrays (the shingleSets kernel), so verify stages
      // may run the merge-walk intersect directly; readers of an index
      // WITHOUT the flag must defensively array_sort the stored side.
      // Claimed ONLY when no shingles dir predates this _META — a
      // pre-_META legacy index holds first-occurrence-ordered arrays,
      // and stamping the flag over those would silently undercount
      // every verify against its old batches.
      val sortedLine =
        if (fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/shingles")))
          "" else "shingles_sorted=1\n"
      val tmp = new org.apache.hadoop.fs.Path(indexPath,
        s"_META.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      try out.write(
        s"k=$k\nbands=$bands\nrowsPerBand=$rowsPerBand\n$sortedLine"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, p)) fs.delete(tmp, false) // a racer wrote it first
    }
  }

  private def readNearDupMeta(fs: org.apache.hadoop.fs.FileSystem,
                              indexPath: String): Map[String, String] = {
    val p = new org.apache.hadoop.fs.Path(indexPath, "_META")
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val txt = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      txt.split("\n").iterator.map(_.trim).filter(_.contains("="))
        .map { l => val Array(a, b) = l.split("=", 2); a -> b }.toMap
    }
  }

  /** True when the index's persisted shingle arrays are sorted (the
    * `shingles_sorted=1` `_META` flag). A legacy index (no flag, or no
    * `_META` at all) may hold first-occurrence-ordered arrays — its
    * stored side must be `array_sort`ed before the merge-walk verify,
    * which silently undercounts on unsorted input.
    */
  private def nearDupShinglesSorted(fs: org.apache.hadoop.fs.FileSystem,
                                    indexPath: String): Boolean =
    readNearDupMeta(fs, indexPath).get("shingles_sorted").exists(_.trim == "1")

  private def requireNearDupGeometry(fs: org.apache.hadoop.fs.FileSystem,
                                     indexPath: String, k: Int, bands: Int,
                                     rowsPerBand: Int, what: String): Unit = {
    val stored = readNearDupMeta(fs, indexPath)
    if (stored.nonEmpty) {
      def chk(nm: String, v: Int): Unit = stored.get(nm).foreach(s =>
        require(s.trim.toInt == v,
          s"$what: $nm=$v does not match the geometry this index was built " +
            s"with ($nm=${s.trim}, from $indexPath/_META) — band hashes are " +
            "only comparable under identical shingling and banding"))
      chk("k", k); chk("bands", bands); chk("rowsPerBand", rowsPerBand)
    }
  }

  /** READ-ONLY probe of a near-dup index built by
    * [[ingestToNearDupIndex]]: which of `docs` are near-duplicates of
    * the INDEXED corpus? The contamination check an eval set runs
    * against a training corpus — same slot-pruned key probe, bucket
    * caps, and exact-Jaccard verify as the ingest path, but nothing is
    * published (the index is untouched) and probe-vs-probe pairs are
    * NOT reported (only probe-vs-corpus contamination; self-dedup the
    * probe set separately if needed). Cap semantics: stored buckets over
    * `maxBucket` are dropped AND counted ([[graft.dedup.BucketDrops]]),
    * with `requirePair = false` — a probe reaches a bucket via its own
    * key, so a SINGLE stored member still pairs.
    *
    * Returns (probe id as `id_a`, indexed id as `id_b`, jaccard),
    * MATERIALIZED (`localCheckpoint`) — the result is bounded by verified
    * matches, and materializing it lets the probe-side caches be released
    * before returning instead of leaking them into the caller's session.
    */
  def probeNearDupIndex(docs: DataFrame, indexPath: String,
                        idCol: String = "doc_id", textCol: String = "text",
                        k: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                        threshold: Double = 0.7, maxBucket: Int = 1000)
      : DataFrame = {
    val Slots = 16L
    val spark = docs.sparkSession
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keysDir = s"$indexPath/keys"
    val shDir = s"$indexPath/shingles"
    require(fs.exists(new org.apache.hadoop.fs.Path(keysDir)) &&
        fs.exists(new org.apache.hadoop.fs.Path(shDir)),
      s"probeNearDupIndex: $indexPath has no keys/shingles dirs — build " +
        "the index with ingestToNearDupIndex first")
    // a crashed compaction must complete before any read: between its
    // intent and rename some batch dirs exist only in the staged union
    healIndexCompaction(fs, keysDir); healIndexCompaction(fs, shDir)
    requireNearDupGeometry(fs, indexPath, k, bands, rowsPerBand, "probeNearDupIndex")
    val sh = graft.dedup.MinHashDedup
      .shingleSets(docs, idCol, textCol, k).cache()
    val keys = graft.dedup.MinHashDedup
      .bandKeysFromShingles(sh, idCol, bands, rowsPerBand)
      .withColumn("slot", pmod(xxhash64(col("band"), col("band_hash")), lit(Slots)))
      .cache()
    def emptyResult = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        docs.schema(docs.schema.fieldIndex(idCol)).copy(name = "id_a"),
        docs.schema(docs.schema.fieldIndex(idCol)).copy(name = "id_b"),
        org.apache.spark.sql.types.StructField("jaccard",
          org.apache.spark.sql.types.DoubleType))))
    val slots = keys.select("slot").distinct().collect().map(_.getLong(0)).toSeq
    if (slots.isEmpty) { // empty probe set
      sh.unpersist(); keys.unpersist(); return emptyResult
    }
    val storedKeys = spark.read.parquet(keysDir)
      .filter(col("slot").isin(slots: _*))
      .select(col("band"), col("band_hash"), col(idCol))
    // stored bucket sizes for the cap (the probe side cannot blow up a
    // bucket it merely visits); requirePair=false per the BucketDrops
    // contract — a single stored member still pairs with a probe
    val counts = storedKeys.groupBy("band", "band_hash")
      .agg(count(lit(1)).as("__n"))
    val under = graft.dedup.BucketDrops
      .keepUnderCap(counts, "__n", maxBucket, "neardup-probe",
        requirePair = false)
      .select("band", "band_hash")
    val cands = keys.select(col("band"), col("band_hash"), col(idCol).as("id_a"))
      .join(storedKeys.select(col("band"), col("band_hash"), col(idCol).as("id_b")),
        Seq("band", "band_hash"))
      .join(under, Seq("band", "band_hash"), "leftsemi")
      .filter(col("id_a") =!= col("id_b")) // a doc probed against an index containing it
      .select("id_a", "id_b").distinct()
    val candSlots = cands
      .select(pmod(xxhash64(col("id_b")), lit(Slots)).as("s"))
      .distinct().collect().map(_.getLong(0)).toSeq
    if (candSlots.isEmpty) { sh.unpersist(); keys.unpersist(); return emptyResult }
    // legacy index (no shingles_sorted flag): stored arrays may be
    // first-occurrence-ordered — sort them or the merge-walk undercounts
    val shSorted = nearDupShinglesSorted(fs, indexPath)
    val storedSh = spark.read.parquet(shDir)
      .filter(col("id_slot").isin(candSlots: _*))
      .select(col(idCol),
        (if (shSorted) col("sh") else array_sort(col("sh"))).as("sh"))
    // SIDE-CORRECT verify: id_a resolves from the PROBE shingles, id_b
    // from the (slot-pruned) STORED shingles — a probe doc reusing an
    // indexed id with different text must be compared against the
    // INDEXED text on the b side, not its own. Both sides sorted and
    // duplicate-free => exact Jaccard as one merge walk per pair
    // (|A∪B| = |A|+|B|-|A∩B|), the verifiedPairsFromShingles kernel.
    val inter = graft.functions.functions
      .sorted_intersect_count(col("sh_a"), col("sh_b"))
    val out = cands
      .join(sh.select(col(idCol).as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(storedSh.select(col(idCol).as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard",
        inter.cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - inter))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
    // materialize BEFORE releasing the probe-side caches: the lazy frame
    // still references sh/keys, and unpersisting first would silently
    // recompute the whole candidate chain at the caller's first action
    val result = out.localCheckpoint()
    sh.unpersist(); keys.unpersist()
    result
  }

  /** TAKEDOWN for a near-dup index built by [[ingestToNearDupIndex]]:
    * purge `ids` from the index so no FUTURE ingest batch or
    * [[probeNearDupIndex]] call can ever match against them — the
    * right-to-be-forgotten operation a training-corpus index needs.
    * Returns how many indexed documents were actually removed (0 = the
    * ids were never indexed; loud no-op signal).
    *
    * Cost is bounded by the AFFECTED ingest batches, not the index: the
    * id-slot-pruned shingle read locates each id's batch, and only those
    * batches' keys/shingles dirs (plus the match dirs that mention the
    * ids — found by one scan of the pair-sized matches table) are
    * rewritten, with the same overwrite-by-batch-dir layout the ingest
    * writes. Each rewrite is STAGE-THEN-SWAP (materialized with
    * `localCheckpoint`, written to a dot-prefixed staging dir, then
    * swapped in): a crash can never lose the surviving docs' rows for a
    * batch — the old dir stays intact until the staged replacement is
    * complete, and the next takedown call heals the one remaining
    * delete->rename metadata gap from the staging dirs.
    *
    * Single-writer like the ingest itself: do not run while a batch is in
    * flight (a DRAINED stream between triggers is fine — empty triggers
    * write nothing).
    *
    * REPLAY-PROOF via tombstones: before any rewrite, the requested ids
    * are appended to `indexPath/tombstones/` stamped with the max batch
    * id existing at takedown time (`cutoff_bid`), and every ingest batch
    * anti-joins its input against tombstones whose cutoff covers its own
    * batch id — so an at-least-once replay of a pre-takedown batch
    * rewrites the batch WITHOUT the removed ids instead of reinstating
    * them, with no stream quiescing required. A genuinely NEW batch
    * (id above the cutoff) is untouched: re-inserting a removed document
    * later remains a deliberate producer choice. Batch ids are monotonic
    * within a checkpoint lineage — the same contract the
    * overwrite-by-batch-dir layout already requires of the ingest.
    * `tombstone = false` skips the sidecar — for callers whose replay
    * protocol is already deterministic ([[syncNearDupIndex]], where a
    * crashed poll must re-ingest the very ids it just removed at the
    * SAME batch id).
    */
  def removeFromNearDupIndex(spark: SparkSession, indexPath: String,
                             ids: DataFrame, idCol: String = "doc_id",
                             tombstone: Boolean = true): Long = {
    val Slots = 16L
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val keysDir = s"$indexPath/keys"
    val shDir = s"$indexPath/shingles"
    val matchesDir = s"$indexPath/matches"
    require(fs.exists(new org.apache.hadoop.fs.Path(keysDir)) &&
        fs.exists(new org.apache.hadoop.fs.Path(shDir)),
      s"removeFromNearDupIndex: $indexPath has no keys/shingles dirs")
    // complete a crashed compaction first — its mid-protocol state hides
    // batch dirs the discovery scan below must see
    healIndexCompaction(fs, keysDir); healIndexCompaction(fs, shDir)
    healIndexCompaction(fs, matchesDir)
    // crash recovery for OUR OWN swap protocol (below): a leftover
    // `.takedown-b<N>-*` staging dir whose `batch_id=N` sibling is gone
    // means the previous takedown crashed between its delete and rename —
    // complete the swap; with the sibling present the staging is stale
    def healSwaps(parent: String): Unit =
      if (fs.exists(new org.apache.hadoop.fs.Path(parent)))
        fs.listStatus(new org.apache.hadoop.fs.Path(parent)).foreach { st =>
          val nm = st.getPath.getName
          if (st.isDirectory && nm.startsWith(".takedown-b")) {
            val batch = nm.stripPrefix(".takedown-b").takeWhile(_ != '-')
            val target = new org.apache.hadoop.fs.Path(parent, s"batch_id=$batch")
            if (!fs.exists(target)) {
              if (!fs.rename(st.getPath, target))
                throw new java.io.IOException(
                  s"removeFromNearDupIndex: cannot recover ${st.getPath} -> $target")
            } else fs.delete(st.getPath, true)
          }
        }
    healSwaps(keysDir); healSwaps(shDir); healSwaps(matchesDir)
    // stage-then-swap: the in-place alternative (Overwrite on the live
    // dir) would, on a crash mid-rewrite, lose the SURVIVING docs' rows
    // for that batch with no replay that restores them sans the removed
    // ids. This narrows the loss window to the delete->rename metadata
    // gap, and healSwaps above closes even that.
    def swapIn(parent: String, b: Long)(write: String => Unit): Unit = {
      val tmp = new org.apache.hadoop.fs.Path(parent,
        s".takedown-b$b-${java.util.UUID.randomUUID()}")
      write(tmp.toString)
      val target = new org.apache.hadoop.fs.Path(parent, s"batch_id=$b")
      fs.delete(target, true)
      if (!fs.rename(tmp, target))
        throw new java.io.IOException(
          s"removeFromNearDupIndex: cannot swap $tmp -> $target")
    }
    val idDf = ids.select(col(idCol)).distinct().cache()
    // bounded collects throughout: slot values (<= Slots) and affected
    // batch ids (<= batches the removed docs were ingested in) — never ids
    val idSlots = idDf.select(pmod(xxhash64(col(idCol)), lit(Slots)).as("s"))
      .distinct().collect().map(_.getLong(0)).toSeq
    if (idSlots.isEmpty) { idDf.unpersist(); return 0L }
    // TOMBSTONE FIRST (before any rewrite): a crash after this point
    // leaves the replay filter in place even if the physical purge below
    // is incomplete — re-running the takedown finishes it; the reverse
    // order would reopen the replay-reinstatement window this closes.
    // Ids are stamped with the max batch id present NOW, over BOTH the
    // keys and shingles listings: the two index writes run as parallel
    // futures, so a batch that crashed after shingles landed but before
    // keys did exists in one dir only — a keys-only cutoff would leave
    // that batch's id above it, and its replay would escape the
    // tombstone filter and reinstate the removed content.
    if (tombstone) {
      def maxBidIn(dir: String): Long =
        if (!fs.exists(new org.apache.hadoop.fs.Path(dir))) -1L
        else fs.listStatus(new org.apache.hadoop.fs.Path(dir))
          .toSeq.collect {
            case st if st.isDirectory &&
                st.getPath.getName.startsWith("batch_id=") =>
              st.getPath.getName.stripPrefix("batch_id=").toLong
          }.foldLeft(-1L)(math.max)
      val maxBid = math.max(maxBidIn(keysDir), maxBidIn(shDir))
      if (maxBid >= 0L)
        idDf.withColumn("cutoff_bid", lit(maxBid))
          .write.mode(SaveMode.Append).parquet(s"$indexPath/tombstones")
    }
    // ONE discovery pass (the removeFromIvfIndex shape): removed-doc
    // count and affected batch set in a single bounded aggregate collect
    // — replaces the cache + count + collect pair over the same scan.
    // batch_id cast first: partition-dir values infer as int.
    val disc = spark.read.parquet(shDir)
      .filter(col("id_slot").isin(idSlots: _*))
      .join(idDf, Seq(idCol), "leftsemi")
      .agg(countDistinct(col(idCol)).as("__n"),
        collect_set(col("batch_id").cast("long")).as("__bs"))
      .head()
    val removedDocs = disc.getLong(0)
    if (removedDocs == 0L) { idDf.unpersist(); return 0L }
    val docBatches = disc.getSeq[Long](1).sorted
    // every affected (dir kind, batch) rewrite targets its OWN batch dir
    // — keys vs shingles vs matches are separate trees, and batch dirs
    // within one tree are disjoint — so the stage-then-swap rewrites run
    // CONCURRENTLY (the ingest's three-way publish argument): per-rewrite
    // cost at this granularity is committer and small-file fixed
    // overhead, and overlapping them cuts the takedown wall to the
    // slowest single rewrite. Same deadlock guard as the ingest: under
    // the SessionCatalog monitor (the SQL TVF path) run sequentially.
    def rewriteKeyed(parent: String, partCol: String, b: Long): Unit =
      // a crashed ingest's parallel writes can leave a batch with
      // shingles but no keys (or vice versa): purge whichever half
      // exists instead of failing the takedown on the missing one —
      // the tombstone above already covers the batch's replay
      if (fs.exists(new org.apache.hadoop.fs.Path(s"$parent/batch_id=$b"))) {
        // writes land in swapIn's private staging while the source dir
        // stays intact until after the write — no pre-materialization
        val kept = spark.read.parquet(s"$parent/batch_id=$b")
          .join(idDf, Seq(idCol), "left_anti")
        swapIn(parent, b) { tmp =>
          kept.repartition(col(partCol))
            .write.mode(SaveMode.Overwrite).partitionBy(partCol)
            .parquet(tmp)
        }
      }
    def rewriteMatches(b: Long): Unit = {
      val kept = spark.read.parquet(s"$matchesDir/batch_id=$b")
        .join(idDf.select(col(idCol).as("id_a")), Seq("id_a"), "left_anti")
        .join(idDf.select(col(idCol).as("id_b")), Seq("id_b"), "left_anti")
      swapIn(matchesDir, b) { tmp =>
        kept.write.mode(SaveMode.Overwrite).parquet(tmp)
      }
    }
    // matches carry removed ids on either side, in ANY batch (a later
    // batch's doc matching an earlier removed one); one scan of the
    // pair-sized table finds the dirs to rewrite
    val taintedMatches: Seq[Long] =
      if (fs.exists(new org.apache.hadoop.fs.Path(matchesDir))) {
        val m = spark.read.parquet(matchesDir)
        m.join(idDf.select(col(idCol).as("id_a")), Seq("id_a"), "leftsemi")
          .select(col("batch_id").cast("long"))
          .union(m.join(idDf.select(col(idCol).as("id_b")), Seq("id_b"), "leftsemi")
            .select(col("batch_id").cast("long")))
          .distinct().collect().map(_.getLong(0)).toSeq.sorted
      } else Seq.empty
    val rewrites: Seq[() => Unit] =
      docBatches.flatMap(b => Seq(() => rewriteKeyed(keysDir, "slot", b),
        () => rewriteKeyed(shDir, "id_slot", b))) ++
        taintedMatches.map(b => () => rewriteMatches(b))
    if (Thread.holdsLock(spark.sessionState.catalog)) rewrites.foreach(_())
    else {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      rewrites.map(f => Future(f()))
        .foreach(Await.result(_, scala.concurrent.duration.Duration.Inf))
    }
    idDf.unpersist()
    removedDocs
  }

  // ---- derived-index batch-dir compaction ---------------------------
  //
  // Every ingest batch / CDC poll adds one `batch_id=N` directory to a
  // derived index (keys/shingles/matches for near-dup, batch_id/cell for
  // IVF) and nothing else ever merges them: a corpus polled every 5
  // minutes for 3 months is ~26k batch dirs x slots/cells whose directory
  // listings, parquet footers, and per-probe file counts grow linearly
  // with POLL COUNT forever, even while the data volume is flat — the
  // exact small-file problem [[graft.sources.DocStore.maintain]] solves
  // for the store, reproduced index-side. [[compactNearDupIndex]] /
  // [[compactIvfIndex]] are the missing leg: fold every batch dir at or
  // below a safe cutoff into ONE consolidated dir (per slot / per cell —
  // the partition scheme, and therefore every pruned read, is unchanged),
  // tombstone-correct by construction (takedowns rewrite dirs physically,
  // so consolidation unions only post-takedown content and can never
  // resurrect a removed id), and crash-safe via an intent-file protocol
  // (stage -> intent -> delete olds -> rename -> clear intent; every
  // entry point heals a crashed run before reading).
  //
  // CUTOFF RULE: a `_SYNC`-maintained index consolidates everything at or
  // below the committed `lastBid` (a crashed poll's orphan `lastBid+1`
  // dir is left alone — its replay overwrites that dir whole); a
  // stream-built index (no `_SYNC`) keeps its MAX batch dir untouched,
  // because only the latest batch can be redelivered by an at-least-once
  // restart — consolidating it would double its content under the replay.
  // Single-maintainer like every other index write: do not run while a
  // poll or ingest batch is in flight.

  private val CompactIntentFile = "_COMPACT"
  private val CompactLockFile = "_COMPACT.lock"

  /** How long a swap lock is honored before it is presumed crashed and
    * breakable. The locked region is pure FS metadata work (delete a
    * bounded set of batch dirs + one rename), so minutes is generous
    * even on an object store; after a compactor crash, probes fail
    * loudly for at most this long before the next heal completes the
    * swap (an operator can always delete the lock by hand).
    */
  private def swapLockTtlMs: Long =
    java.lang.Long.getLong("graft.index.swapLockTtlMs", 15L * 60 * 1000)

  /** How long a heal waits for a LIVE swap owner to finish before
    * failing loudly. A healthy swap clears its intent in well under
    * this; hitting the deadline means the owner crashed inside the TTL
    * window (or is pathologically slow) — the caller must not read a
    * mid-swap layout silently.
    */
  private def healWaitMs: Long =
    java.lang.Long.getLong("graft.index.healWaitMs", 10L * 1000)

  /** Size-tier ratio for [[consolidateBatchDirs]]: a dir whose bytes
    * exceed this factor times the total of all smaller eligible dirs is
    * left in place rather than rewritten into every fold. 4 bounds each
    * byte's lifetime rewrites to ~log_4(index bytes / delta bytes)
    * while keeping the dir count within maxBatchDirs + O(log) tiers.
    */
  private def TierFactor: Long =
    java.lang.Long.getLong("graft.index.tierFactor", 4L)

  /** Take exclusive ownership of `parent`'s compaction swap, or None when
    * a live owner holds it. Exclusivity rides two ATOMIC primitives: the
    * lock itself is claimed with create-exclusive (`createNewFile` — only
    * one claimant wins), and a stale lock (older than [[swapLockTtlMs]])
    * is broken by RENAMING it aside first — two breakers racing on the
    * same stale lock resolve because only one rename can succeed. This is
    * what serializes the DESTRUCTIVE swap leg (delete folded dirs +
    * rename staging in) between a compactor and the heals that probes and
    * polls run at entry: the r12 protocol let a heal and a live compactor
    * run the same delete+rename concurrently, and the interleaving
    * "A renames staging -> batch_id=N; B, mid-delete-loop, deletes
    * batch_id=N; B's rename finds no staging" destroyed every folded
    * batch with no recovery path.
    */
  /** One JVM-level monitor per qualified index path: Hadoop's LOCAL
    * filesystem has no atomic create-exclusive (`createNewFile` is
    * exists-then-create), so two threads of one driver can both claim
    * the FS lock — the monitor makes in-process claimants strictly
    * serial, and the FS lock file covers cross-process claimants on
    * filesystems whose create IS atomic (HDFS). Bounded by the number
    * of distinct index paths a driver touches.
    */
  private val swapGuards =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def swapGuard(fs: org.apache.hadoop.fs.FileSystem,
                        parent: String): Object =
    swapGuards.computeIfAbsent(
      fs.makeQualified(new org.apache.hadoop.fs.Path(parent)).toString,
      _ => new Object)

  private def tryAcquireSwapLock(fs: org.apache.hadoop.fs.FileSystem,
                                 parent: String)
      : Option[(org.apache.hadoop.fs.Path, String)] = {
    val lock = new org.apache.hadoop.fs.Path(parent, CompactLockFile)
    if (fs.exists(lock)) {
      val age = System.currentTimeMillis() -
        (try fs.getFileStatus(lock).getModificationTime
         catch { case _: java.io.FileNotFoundException => return None })
      if (age < swapLockTtlMs) return None
      // stale: move it aside atomically — of N concurrent breakers
      // exactly one rename succeeds; the rest see a live claim elsewhere
      val aside = new org.apache.hadoop.fs.Path(parent,
        s".$CompactLockFile-stale-${java.util.UUID.randomUUID()}")
      if (!scala.util.Try(fs.rename(lock, aside)).getOrElse(false)) return None
      fs.delete(aside, false)
    }
    // FENCED claim: the lock file CARRIES the owner's token (written to a
    // claim file, renamed into place — rename refuses an existing target
    // on HDFS-like filesystems, and the JVM monitor covers the local FS
    // whose rename overwrites). The token is what lets the owner detect a
    // TTL break mid-swap ([[holdsSwapLock]]) instead of blindly deleting
    // dirs another actor now owns.
    val token = java.util.UUID.randomUUID().toString
    val claim = new org.apache.hadoop.fs.Path(parent,
      s".$CompactLockFile-claim-$token")
    val out = fs.create(claim, true)
    try out.write(token.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(lock) || !scala.util.Try(fs.rename(claim, lock)).getOrElse(false)) {
      fs.delete(claim, false)
      None
    } else Some((lock, token))
  }

  /** Does `lock` still carry `token`? False after a TTL break stole
    * ownership (or the lock vanished) — the holder must then ABORT its
    * destructive work: the committed intent lets the new owner complete
    * the swap with no loss.
    */
  private def holdsSwapLock(fs: org.apache.hadoop.fs.FileSystem,
                            lock: org.apache.hadoop.fs.Path,
                            token: String): Boolean =
    scala.util.Try {
      val in = fs.open(lock)
      val txt = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      txt == token
    }.getOrElse(false)

  /** Complete (or discard) a crashed consolidation under `parent`. With
    * an intent present: staging still there -> redo the delete+rename leg
    * UNDER THE SWAP LOCK (see [[tryAcquireSwapLock]] — never concurrently
    * with a live compactor or another heal); staging gone -> the rename
    * landed, just clear the intent. When a live owner holds the lock the
    * heal WAITS for the intent to clear (a healthy swap is metadata-fast)
    * and fails loudly at the deadline rather than read a mid-swap layout.
    * Stale dot-prefixed staging dirs WITHOUT an intent are debris from a
    * crash before the intent committed — the batch dirs are all still
    * live, so the staging is simply deleted (age-gated below). One
    * exists() when nothing crashed.
    */
  private def healIndexCompaction(fs: org.apache.hadoop.fs.FileSystem,
                                  parent: String): Unit = {
    val dir = new org.apache.hadoop.fs.Path(parent)
    if (!fs.exists(dir)) return
    val intent = new org.apache.hadoop.fs.Path(dir, CompactIntentFile)
    if (fs.exists(intent)) {
      val acquired = swapGuard(fs, parent).synchronized {
        tryAcquireSwapLock(fs, parent) match {
          case Some((lock, token)) =>
            try {
              // re-check under the lock: the owner may have completed
              // the swap between our intent probe and the acquisition
              if (fs.exists(intent))
                completeSwap(fs, dir, intent, swapFence(fs, lock, token))
            } finally {
              // only release a lock still carrying OUR token — after a
              // TTL break this file is the new owner's claim
              if (holdsSwapLock(fs, lock, token)) fs.delete(lock, false)
            }
            true
          case None => false
        }
      }
      if (!acquired) {
        // a live owner (another process's compactor or heal) is
        // mid-swap: wait for it — the locked region is metadata-only,
        // so a healthy owner clears the intent in well under the
        // deadline
        val deadline = System.currentTimeMillis() + healWaitMs
        while (fs.exists(intent) && System.currentTimeMillis() < deadline)
          Thread.sleep(50)
        if (fs.exists(intent))
          throw new java.io.IOException(
            s"index compaction: a swap on $parent is still in flight (or " +
              s"its owner crashed less than ${swapLockTtlMs / 1000}s ago) " +
              "— refusing to read a mid-swap layout; retry after it " +
              s"completes, or delete $parent/$CompactLockFile if the " +
              "owner is known dead")
      }
    }
    // debris: staging dirs whose intent never committed. AGE-GATED — a
    // fresh `.compact-*` dir may be a LIVE compaction's staging that has
    // not reached its intent commit yet, and reads/polls legitimately
    // run (and heal) concurrently with a compactor; deleting its staging
    // here would let the compactor go on to destroy the original batch
    // dirs and then fail its rename, losing every folded batch. 24h
    // spares any real consolidation; crash debris stops accumulating at
    // the next day's first heal. DELIBERATELY shorter than the store's
    // 7-day `.staging-*` reaper: a store rewrite stages the whole corpus
    // (legitimately multi-day at 100 TB), while an index fold stages a
    // bounded batch-dir union whose write is minutes, not days — and the
    // compactor's pre-delete staging-exists guard turns the residual bad
    // case (a >24h-old LIVE staging reaped here) into a loud abort with
    // every original batch dir intact, never a loss.
    val debrisCutoff = System.currentTimeMillis() - 24L * 3600 * 1000
    fs.listStatus(dir).foreach { st =>
      if (st.isDirectory && st.getPath.getName.startsWith(".compact-") &&
          st.getModificationTime < debrisCutoff)
        fs.delete(st.getPath, true)
    }
  }

  /** The intent-completion leg shared by the heal AND the compactor (one
    * copy of the destructive sequence — two byte-divergent copies were an
    * r13 review catch): delete every folded `batch_id=` dir at/below the
    * intent's target (ascending, so the target slot — the rename
    * destination — goes LAST), rename the staged union in, clear the
    * intent. MUST be called with the swap lock held; `fence` runs before
    * EVERY destructive operation — the holder's ownership re-check +
    * lock-mtime heartbeat, so a TTL break by another actor mid-sequence
    * is detected at the next op instead of blindly deleting dirs the new
    * owner just installed, and a LIVE holder's heartbeat keeps it from
    * ever looking stale in the first place. A failed final rename with
    * the target present and the staging gone is treated as an
    * already-completed swap rather than an error (the ADVICE-prescribed
    * tolerance — under the fence it should be unreachable, but external
    * interference must degrade to idempotence, not loss).
    * `expectStaging` = the compactor's last-line guard: it KNOWS it
    * staged, so a vanished staging aborts loudly with every original
    * batch dir intact (intent cleared first); a heal with no staging
    * infers the rename already landed and just clears the intent.
    */
  private[streaming] def completeSwap(fs: org.apache.hadoop.fs.FileSystem,
                                      dir: org.apache.hadoop.fs.Path,
                                      intent: org.apache.hadoop.fs.Path,
                                      fence: () => Unit = () => (),
                                      expectStaging: Boolean = false): Unit = {
    val in = fs.open(intent)
    val txt = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val kv = txt.split("\n").iterator.map(_.trim).filter(_.contains("="))
      .map { l => val Array(a, b) = l.split("=", 2); a -> b }.toMap
    val target = kv("target").toLong
    val staging = new org.apache.hadoop.fs.Path(dir, kv("staging"))
    // the intent's explicit fold set (tiered folds leave LARGER dirs in
    // place, possibly with ids below the target); an intent without one
    // (pre-tiering format) folds everything at/below the target
    val foldSet: Option[Set[Long]] = kv.get("ids")
      .map(_.split(",").iterator.map(_.trim).filter(_.nonEmpty)
        .map(_.toLong).toSet)
    if (fs.exists(staging)) {
      val folded = fs.listStatus(dir).toSeq.collect {
        case st if st.isDirectory && st.getPath.getName.startsWith("batch_id=") &&
          foldSet.fold(
            st.getPath.getName.stripPrefix("batch_id=").toLong <= target)(
            _.contains(st.getPath.getName.stripPrefix("batch_id=").toLong)) =>
          (st.getPath.getName.stripPrefix("batch_id=").toLong, st.getPath)
      }.sortBy(_._1)
      folded.foreach { case (_, p) => fence(); fs.delete(p, true) }
      fence()
      val dst = new org.apache.hadoop.fs.Path(dir, s"batch_id=$target")
      if (!fs.rename(staging, dst) &&
          !(fs.exists(dst) && !fs.exists(staging)))
        throw new java.io.IOException(
          s"index compaction: cannot recover $staging -> batch_id=$target")
    } else if (expectStaging) {
      fs.delete(intent, false)
      throw new java.io.IOException(
        s"index compaction: staged union $staging disappeared before the " +
          "swap — aborting with all original batch dirs intact")
    }
    fs.delete(intent, false)
  }

  /** The holder-side fence for [[completeSwap]]: abort LOUDLY when the
    * lock no longer carries this holder's token (a TTL break after a
    * stall — the new owner completes the swap from the committed intent,
    * so aborting loses nothing), and heartbeat the lock's mtime so a
    * live holder never crosses the TTL between two metadata ops.
    */
  private[streaming] def swapFence(fs: org.apache.hadoop.fs.FileSystem,
                                   lock: org.apache.hadoop.fs.Path,
                                   token: String): () => Unit = () => {
    if (!holdsSwapLock(fs, lock, token))
      throw new java.io.IOException(
        s"index compaction: lost swap-lock ownership at $lock mid-swap " +
          "(TTL break after a stall) — aborting; the committed intent " +
          "lets the new owner complete the swap with no loss")
    scala.util.Try(fs.setTimes(lock, System.currentTimeMillis(), -1))
    ()
  }

  /** Fold `parent`'s batch dirs with id <= `cutoff` into one consolidated
    * `batch_id=max(folded)` dir, preserving `partitionCol`'s partition
    * scheme (None = unpartitioned, the matches table). Returns how many
    * dirs were folded away (0 = one or zero dirs at/below the cutoff —
    * already consolidated). The stage->intent->delete->rename protocol
    * with [[healIndexCompaction]] makes a crash at ANY point recoverable
    * with no content loss: until the intent commits, every original dir
    * is still live; after it, the staged union carries all of them.
    */
  private def consolidateBatchDirs(spark: SparkSession,
                                   fs: org.apache.hadoop.fs.FileSystem,
                                   parent: String, cutoff: Long,
                                   partitionCol: Option[String],
                                   maxFileBytes: Long = 1L << 28): Long = {
    val dir = new org.apache.hadoop.fs.Path(parent)
    if (!fs.exists(dir)) return 0L
    healIndexCompaction(fs, parent)
    // a TAKEDOWN that crashed between its delete and rename left a
    // `.takedown-bN` staging whose batch dir is missing — complete it
    // BEFORE pinning ids, so the recovered batch joins this fold instead
    // of surviving as a straggler dir until the next takedown runs (the
    // restore itself is always safe — the consolidated target is an id
    // that was present, never N — but folding N now is the whole point
    // of being here). Same recovery the takedowns themselves run.
    fs.listStatus(dir).foreach { st =>
      val nm = st.getPath.getName
      if (st.isDirectory && nm.startsWith(".takedown-b")) {
        val b = nm.stripPrefix(".takedown-b").takeWhile(_ != '-')
        val target = new org.apache.hadoop.fs.Path(parent, s"batch_id=$b")
        if (!fs.exists(target)) {
          if (!fs.rename(st.getPath, target))
            throw new java.io.IOException(
              s"index compaction: cannot recover ${st.getPath} -> $target")
        } else fs.delete(st.getPath, true)
      }
    }
    val eligible = fs.listStatus(dir).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("batch_id=") =>
        st.getPath.getName.stripPrefix("batch_id=").toLong
    }.filter(_ <= cutoff).sorted
    if (eligible.size <= 1) return 0L
    // SIZE-TIERED fold (the LSM merge invariant): a dir already so large
    // that every smaller eligible dir together is under a quarter of it
    // is KEPT IN PLACE — rewriting it per fold would make compaction
    // O(index) instead of O(accumulated small dirs), i.e. a 100 TB
    // consolidated dir re-written every maxBatchDirs polls. Walking the
    // sizes descending and keeping each dir whose bytes exceed
    // TierFactor x the total below it bounds every byte's lifetime
    // rewrites to O(log_TierFactor(index/delta)). Correctness is
    // untouched: probes union ALL batch dirs regardless of grouping,
    // takedowns rewrite per-dir, and a folded id is at/below the cutoff,
    // which the monotonic-bid contract already promises is never
    // redelivered — so old content living in a higher-id consolidated
    // dir can never be clobbered by a replay.
    val sized = eligible.map { n =>
      n -> fs.getContentSummary(
        new org.apache.hadoop.fs.Path(dir, s"batch_id=$n")).getLength
    }
    val bySizeDesc = sized.sortBy { case (n, b) => (-b, n) }
    val suffix = bySizeDesc.map(_._2).scanRight(0L)(_ + _).tail
    val foldStart = bySizeDesc.indices
      .find(k => bySizeDesc(k)._2 <= TierFactor * suffix(k))
      .getOrElse(bySizeDesc.size)
    val ids = bySizeDesc.drop(foldStart).map(_._1).sorted
    if (ids.size <= 1) return 0L
    val target = ids.max
    // read EXACTLY the pinned ids (partition pruning on batch_id), union
    // them, restore the partition layout with one clustered shuffle —
    // this IS the small-file payoff. Output file count is BYTE-BUDGETED
    // (the ceil(bytes/maxFileBytes) pattern DocStore.maintain uses), not
    // a single task: at a 100 TB index the matches table is pair-scaled
    // and one coalesce(1) writer would be the whole job's critical path,
    // and a hot slot/cell past maxFileBytes splits across a salt so no
    // single file (or write task) grows with corpus size. Sizing comes
    // from the folded dirs' ON-DISK bytes (same compression in = out).
    val foldedBytes = sized.collect { case (n, b) if ids.contains(n) => b }.sum
    val nFiles = math.max(1L, (foldedBytes + maxFileBytes - 1) / maxFileBytes).toInt
    val all = spark.read.parquet(parent)
      .filter(col("batch_id").isin(ids: _*))
      .drop("batch_id")
    val staging = new org.apache.hadoop.fs.Path(dir,
      s".compact-${java.util.UUID.randomUUID()}")
    partitionCol match {
      case Some(pc) =>
        // per-value dirs: one file per value while the budget allows it;
        // above it, a deterministic row-hash salt splits each value's
        // write into ~splits files (skewed values can still exceed the
        // budget by their skew factor — bounded by splits, never by one)
        val slots = ids.iterator.flatMap { n =>
          fs.listStatus(new org.apache.hadoop.fs.Path(dir, s"batch_id=$n"))
            .iterator.filter(_.isDirectory).map(_.getPath.getName)
        }.toSet.size
        val splits = math.max(1L, (nFiles + slots - 1) / math.max(1, slots)).toInt
        if (splits <= 1)
          all.repartition(col(pc))
            .write.mode(SaveMode.Overwrite).partitionBy(pc)
            .parquet(staging.toString)
        else
          all.withColumn("__salt",
              pmod(xxhash64(all.columns.map(col): _*), lit(splits.toLong)))
            .repartition(col(pc), col("__salt")).drop("__salt")
            .write.mode(SaveMode.Overwrite).partitionBy(pc)
            .parquet(staging.toString)
      case None =>
        if (nFiles <= 1)
          all.coalesce(1).write.mode(SaveMode.Overwrite).parquet(staging.toString)
        else
          all.repartition(nFiles)
            .write.mode(SaveMode.Overwrite).parquet(staging.toString)
    }
    // SWAP LOCK: the destructive leg below and the heal's completion leg
    // are mutually exclusive ([[tryAcquireSwapLock]]) — without it, a
    // probe's heal racing this compactor could install the consolidated
    // dir and have this delete loop destroy it (the r12 loss window).
    // Acquired AFTER the staging write (the long part) so the lock's TTL
    // only has to cover metadata work.
    swapGuard(fs, parent).synchronized {
    val (lock, token) = tryAcquireSwapLock(fs, parent).getOrElse {
      fs.delete(staging, true)
      throw new java.io.IOException(
        s"index compaction: cannot take the swap lock on $parent — another " +
          "maintainer or heal is mid-swap (or crashed holding it less than " +
          s"${swapLockTtlMs / 1000}s ago); aborting with all original batch " +
          "dirs intact")
    }
    try {
      // INTENT commit (tmp-then-rename): from here the heal protocol owns
      // completion — a crash mid-delete can no longer lose content
      val tmp = new org.apache.hadoop.fs.Path(dir,
        s"$CompactIntentFile.tmp-${java.util.UUID.randomUUID()}")
      val out = fs.create(tmp, true)
      // `ids` pins the EXPLICIT fold set: a tiered fold keeps larger
      // dirs (possibly with ids below the target) in place, so the
      // swap's delete leg must never infer "everything at/below target"
      try out.write(
        s"target=$target\nstaging=${staging.getName}\nids=${ids.mkString(",")}\n"
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val intent = new org.apache.hadoop.fs.Path(dir, CompactIntentFile)
      fs.delete(intent, false)
      if (!fs.rename(tmp, intent))
        throw new java.io.IOException(s"index compaction: cannot commit $intent")
      // the destructive leg IS the heal's completion leg — one shared
      // sequence (staging guard, fenced ascending deletes, tolerant
      // rename, intent clear); expectStaging aborts loudly with every
      // original dir intact if the staging vanished underneath us
      completeSwap(fs, dir, intent, swapFence(fs, lock, token),
        expectStaging = true)
    } finally {
      // only release a lock still carrying OUR token — after a TTL
      // break this file is the new owner's claim
      if (holdsSwapLock(fs, lock, token)) fs.delete(lock, false)
    }
    }
    ids.size.toLong - 1L
  }

  /** Fold a takedown-tombstone sidecar (one parquet file PER takedown
    * call, forever) into a single file, dropping DEAD rows on the way: a
    * tombstone with `cutoff_bid <= cutoff` only protects replays of
    * batches the compaction just consolidated (committed, never
    * redelivered — replays target ids above the cutoff by the same
    * monotonic-bid contract the batch-dir layout already requires), and
    * per-id rows collapse to their max cutoff (the replay filter is
    * `cutoff_bid >= bid`, so only the max matters). Crash-safe WITHOUT
    * an intent: the merged file is appended FIRST and the old files
    * deleted after — any crash point leaves duplicates, which the
    * (distinct'd, idempotent) replay filter absorbs. Returns files
    * removed.
    */
  private def compactTombstones(spark: SparkSession,
                                fs: org.apache.hadoop.fs.FileSystem,
                                tombDir: String, cutoff: Long,
                                maxFileBytes: Long = 1L << 28): Long = {
    val dir = new org.apache.hadoop.fs.Path(tombDir)
    if (!fs.exists(dir)) return 0L
    val old = fs.listStatus(dir).toSeq.filter { st =>
      val nm = st.getPath.getName
      st.isFile && !nm.startsWith("_") && !nm.startsWith(".")
    }
    if (old.size <= 1) return 0L
    val t = spark.read.parquet(tombDir)
    val idCols = t.columns.filterNot(_ == "cutoff_bid").toSeq
    val kept = t.groupBy(idCols.map(col): _*)
      .agg(max(col("cutoff_bid")).as("cutoff_bid"))
      .filter(col("cutoff_bid") > cutoff)
    // byte-budgeted like the batch-dir fold — the sidecar is id-sized so
    // this is one file in practice, but the writer task count must never
    // be a hardcoded 1 at any scale
    val nFiles = math.max(1L,
      (old.iterator.map(_.getLen).sum + maxFileBytes - 1) / maxFileBytes).toInt
    (if (nFiles <= 1) kept.coalesce(1) else kept.repartition(nFiles))
      .write.mode(SaveMode.Append).parquet(tombDir)
    old.foreach(st => fs.delete(st.getPath, false))
    old.size.toLong
  }

  /** Visible tombstone files under `dir` (0 when the dir is missing) —
    * the standalone fold trigger for takedown-heavy indexes.
    */
  private def tombstoneFileCount(fs: org.apache.hadoop.fs.FileSystem,
                                 dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) 0
    else fs.listStatus(p).count { st =>
      val nm = st.getPath.getName
      st.isFile && !nm.startsWith("_") && !nm.startsWith(".")
    }
  }

  /** Batch ids present under `parent` (empty when the dir is missing). */
  private def batchIdsIn(fs: org.apache.hadoop.fs.FileSystem,
                         parent: String): Seq[Long] = {
    val dir = new org.apache.hadoop.fs.Path(parent)
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("batch_id=") =>
        st.getPath.getName.stripPrefix("batch_id=").toLong
    }.sorted
  }

  /** MAINTENANCE for a near-dup index: fold accumulated batch dirs of
    * keys/shingles/matches into one consolidated dir each, whenever any
    * of them exceeds `maxBatchDirs`. Probe/poll results are row-identical
    * before and after (the partition scheme and every id survive; only
    * the dir count changes — pinned by IndexCompactionSpec), takedowns
    * stay honored (consolidation reads post-takedown content), and a
    * crashed run heals at the next entry into any index operation.
    * Returns the number of batch dirs folded away across the three
    * parents. Single-maintainer: never run while a poll/ingest/takedown
    * is in flight — same contract as [[removeFromNearDupIndex]].
    */
  def compactNearDupIndex(spark: SparkSession, indexPath: String,
                          maxBatchDirs: Int = 1,
                          maxFileBytes: Long = 1L << 28): Long = {
    require(maxBatchDirs >= 1, s"maxBatchDirs must be >= 1, got $maxBatchDirs")
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parents = Seq(s"$indexPath/keys" -> Some("slot"),
      s"$indexPath/shingles" -> Some("id_slot"),
      s"$indexPath/matches" -> (None: Option[String]))
    // heal first — the dir count below must see a consistent layout
    parents.foreach { case (p, _) => healIndexCompaction(fs, p) }
    val cutoff = readNearDupSync(fs, indexPath) match {
      case Some((_, lastBid)) => lastBid // committed polls; orphan stays
      case None => // stream-built: the max dir may be redelivered — keep it
        val ids = batchIdsIn(fs, s"$indexPath/keys") ++
          batchIdsIn(fs, s"$indexPath/shingles")
        if (ids.isEmpty) return 0L else ids.max - 1L
    }
    val dirsOver =
      parents.map { case (p, _) => batchIdsIn(fs, p).size }.max > maxBatchDirs
    val folded =
      if (!dirsOver) 0L
      else parents.map { case (p, pc) =>
        consolidateBatchDirs(spark, fs, p, cutoff, pc, maxFileBytes) }.sum
    // the tombstone sidecar folds on its OWN trigger (visible file
    // count), not just the batch-dir one: a takedown-heavy/ingest-light
    // index grows one file per takedown forever while its batch dirs
    // stay under the threshold
    if (dirsOver ||
        tombstoneFileCount(fs, s"$indexPath/tombstones") > maxBatchDirs)
      compactTombstones(spark, fs, s"$indexPath/tombstones", cutoff, maxFileBytes)
    folded
  }

  /** [[compactNearDupIndex]]'s IVF twin: fold the `batch_id=N/cell=M`
    * dirs at/below the safe cutoff into one consolidated batch
    * (per-cell layout preserved, so cell-pruned probes and the takedown's
    * cell hints work unchanged). knn/sync results are row-identical
    * before and after; a crashed run heals at the next entry. Returns
    * folded dir count.
    */
  def compactIvfIndex(spark: SparkSession, indexPath: String,
                      maxBatchDirs: Int = 1,
                      maxFileBytes: Long = 1L << 28): Long = {
    require(maxBatchDirs >= 1, s"maxBatchDirs must be >= 1, got $maxBatchDirs")
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    healIndexCompaction(fs, indexPath)
    val ids = batchIdsIn(fs, indexPath)
    if (ids.isEmpty) return 0L
    val cutoff = readNearDupSync(fs, indexPath) match {
      case Some((_, lastBid)) => lastBid
      case None => ids.max - 1L
    }
    val dirsOver = ids.size > maxBatchDirs
    val folded =
      if (!dirsOver) 0L
      else consolidateBatchDirs(spark, fs, indexPath, cutoff, Some("cell"),
        maxFileBytes)
    // same standalone tombstone trigger as the near-dup fold
    if (dirsOver ||
        tombstoneFileCount(fs, s"$indexPath/$IvfTombstones") > maxBatchDirs)
      compactTombstones(spark, fs, s"$indexPath/$IvfTombstones", cutoff, maxFileBytes)
    folded
  }

  // ---- derived-index registry + one-call maintenance ----------------

  private val IndexRegistryFile = "_INDEXES"

  /** Indexes registered against the store at `storePath`, as (kind, path)
    * pairs — kind is "neardup" or "ivf". Backed by a tab-separated
    * sidecar at the store root (underscore-prefixed: invisible to data
    * reads and to the store's own listings).
    */
  private[streaming] def registeredIndexes(spark: SparkSession,
                                           storePath: String)
      : Seq[(String, String)] = {
    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(storePath, IndexRegistryFile)
    if (!fs.exists(p)) Nil
    else {
      val in = fs.open(p)
      val txt = try new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      txt.split("\n", -1).toSeq.map(_.trim).filter(_.nonEmpty).flatMap { ln =>
        ln.split("\t", 2) match {
          case Array(k, path) if path.nonEmpty => Some((k, path))
          case _ => None // an unparseable line registers nothing
        }
      }
    }
  }

  private def writeIndexRegistry(fs: org.apache.hadoop.fs.FileSystem,
                                 storePath: String,
                                 entries: Seq[(String, String)]): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(storePath,
      s"$IndexRegistryFile.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(entries.map { case (k, p) => s"$k\t$p" }.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(storePath, IndexRegistryFile)
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"cannot write index registry $dst")
  }

  /** One JVM monitor per store path: registry updates are
    * read-modify-write, and two concurrent registrations (first polls of
    * two indexes of the same store — legal, the single-maintainer
    * contract is per INDEX) would otherwise lose one entry or fail a
    * poll on the rename (an r13 review catch). Cross-process racers can
    * still interleave — the damage is bounded because EVERY poll
    * re-registers, so a lost entry self-heals at its index's next poll.
    */
  private val registryGuards =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def registryGuard(fs: org.apache.hadoop.fs.FileSystem,
                            storePath: String): Object =
    registryGuards.computeIfAbsent(
      fs.makeQualified(new org.apache.hadoop.fs.Path(storePath)).toString,
      _ => new Object)

  /** Record `indexPath` as a CDC-synced derived index of the store at
    * `storePath` — idempotent (a present entry rewrites nothing), written
    * tmp-then-rename so a torn write reads as the previous registry, and
    * serialized in-process by [[registryGuard]]. The sync entry points
    * self-register on every poll, so [[maintainAll]] discovers every live
    * index with no operator-maintained list.
    */
  private def registerIndex(spark: SparkSession, storePath: String,
                            indexPath: String, kind: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(storePath))) return
    registryGuard(fs, storePath).synchronized {
      val existing = registeredIndexes(spark, storePath)
      if (!existing.contains((kind, indexPath)))
        writeIndexRegistry(fs, storePath, existing :+ ((kind, indexPath)))
    }
  }

  /** One [[maintainAll]] pass's outcome: the store triad's report plus
    * the batch dirs folded per registered derived index.
    */
  final case class MaintainAllReport(
      store: graft.sources.DocStore.MaintenanceReport,
      indexesFolded: Map[String, Long])

  /** The WHOLE maintenance story — store AND derived indexes — as ONE
    * idempotent call: [[graft.sources.DocStore.maintain]]'s triad
    * (tail-merge / recluster / vacuum), then every index registered
    * against the store (see [[registerIndex]] — the sync entry points
    * self-register) folds its batch dirs via [[compactNearDupIndex]] /
    * [[compactIvfIndex]] under the same `maxBatchDirs` policy. Every leg
    * is threshold-gated: a healthy store and healthy indexes cost
    * metadata listings only and commit nothing, so the operator cron
    * collapses to this one line (`docstore_maintain_all` on the SQL
    * surface), run after every ingest window. Registry entries whose
    * index dir no longer exists (operator deleted the index) are pruned
    * from the registry rather than probed forever. Single-maintainer on
    * the index legs — never run concurrently with a poll/ingest/takedown
    * of the same index, the [[compactNearDupIndex]] contract.
    *
    * Registry entries are ABSOLUTE index paths: cloning a store directory
    * copies its `_INDEXES` verbatim, so the clone's registry still names
    * the original's indexes until a sync against the clone registers the
    * clone's own. An operator cloning a store should clear `_INDEXES` in
    * the copy — otherwise the clone's maintainAll folds the ORIGINAL's
    * indexes (content-preserving, but a second maintainer the swap lock
    * then has to arbitrate).
    */
  def maintainAll(spark: SparkSession, path: String,
                  keyCol: Option[String] = None,
                  maxDataFiles: Int = 64,
                  smallBytes: Long = 1L << 24,
                  maxOverlapping: Int = 0,
                  minLiveFraction: Double = 0.5,
                  retain: Int = 2,
                  maxFileBytes: Long = 1L << 28,
                  maxBatchDirs: Int = 8): MaintainAllReport = {
    val store = graft.sources.DocStore.maintain(spark, path, keyCol,
      maxDataFiles, smallBytes, maxOverlapping, minLiveFraction, retain,
      maxFileBytes)
    val entries = registeredIndexes(spark, path)
    val (live, dead) = entries.partition { case (_, idx) =>
      val fs = new org.apache.hadoop.fs.Path(idx)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.exists(new org.apache.hadoop.fs.Path(idx))
    }
    if (dead.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // prune under the registry monitor, against a FRESH read — the
      // stale `entries` list would clobber a registration a concurrent
      // sync poll just added (self-healing, but no reason to rely on it)
      registryGuard(fs, path).synchronized {
        val deadSet = dead.toSet
        writeIndexRegistry(fs, path,
          registeredIndexes(spark, path).filterNot(deadSet.contains))
      }
    }
    val folded = live.map {
      case ("neardup", idx) =>
        idx -> compactNearDupIndex(spark, idx, maxBatchDirs, maxFileBytes)
      case ("ivf", idx) =>
        idx -> compactIvfIndex(spark, idx, maxBatchDirs, maxFileBytes)
      case (kind, idx) =>
        // an unknown kind (registry written by a newer version) is left
        // alone — folding with the wrong layout assumptions could corrupt
        idx -> 0L
    }.toMap
    MaintainAllReport(store, folded)
  }

  // ---- CDC-driven index maintenance ---------------------------------

  private val NearDupSyncFile = "_SYNC"

  private def writeNearDupSync(fs: org.apache.hadoop.fs.FileSystem,
                               indexPath: String,
                               cur: graft.sources.DocStore.DocCursor,
                               lastBid: Long): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(indexPath,
      s"$NearDupSyncFile.tmp-${java.util.UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write((s"gen=${cur.generation}\nbid=$lastBid\n" +
        cur.files.toSeq.sorted.mkString("\n"))
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(indexPath, NearDupSyncFile)
    fs.delete(dst, false)
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(s"syncNearDupIndex: cannot commit $dst")
  }

  private def readNearDupSync(fs: org.apache.hadoop.fs.FileSystem,
                              indexPath: String)
      : Option[(graft.sources.DocStore.DocCursor, Long)] = {
    val p = new org.apache.hadoop.fs.Path(indexPath, NearDupSyncFile)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val txt = try new String(org.apache.commons.io.IOUtils.toByteArray(in),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    val lines = txt.split("\n", -1).toSeq.map(_.trim)
    val kv = lines.takeWhile(_.contains("=")).map { l =>
      val Array(a, b) = l.split("=", 2); a -> b }.toMap
    Some((graft.sources.DocStore.DocCursor(kv("gen").toInt,
      lines.drop(kv.size).filter(_.nonEmpty).toSet), kv("bid").toLong))
  }

  /** Keep a near-dup index FOLLOWING a DocStore corpus by cursor CDC —
    * the loop that makes the index a live property of the collection
    * rather than a nightly rebuild: appended documents are matched
    * against everything already indexed and join it (arrival-time
    * semantics, the [[ingestToNearDupIndex]] batch body); deleted
    * documents are taken down ([[removeFromNearDupIndex]]: keys,
    * shingles, AND the matches that referenced them — right-to-be-
    * forgotten follows the source delete with no separate workflow);
    * updated documents are re-indexed under their new text, but ONLY
    * when the text actually changed — a metadata-only update touches
    * nothing (pinned). Returns the poll's newly verified matches
    * (typed-empty when caught up).
    *
    * Exactly-once without a transaction, by IDEMPOTENCE at a
    * DETERMINISTIC batch id: a poll's work is removeFromNearDupIndex
    * (removing again is a no-op) followed by one nearDupBatch at
    * `lastBid + 1` (overwrite-by-batch-dir rewrites identical content),
    * so a crash ANYWHERE before the `_SYNC` state commit (cursor +
    * lastBid, tmp-then-rename) makes the retry replay byte-identically
    * — the property the spec pins by restoring `_SYNC` and re-polling.
    * Multi-generation poll windows collapse to the LATEST state per key
    * first (an insert->update->delete chain applies as its net effect),
    * and within one poll the old content is removed before the new is
    * ingested, so the new batch's self/stored matching never sees the
    * superseded text.
    *
    * Ownership: the index belongs to this maintainer (single-writer,
    * like the stream ingest) — a keys dir with no `_SYNC` state fails
    * loudly instead of silently mixing corpora. The first call seeds
    * from the full snapshot as batch 1 (cursor captured BEFORE the
    * read: a racing append double-ingested by the seed is self-healed
    * on the next poll, which removes-then-reingests exactly those
    * re-delivered keys). At 100 TB the steady state is the point:
    * every poll costs O(changed documents + their candidate buckets),
    * never a corpus rescan.
    */
  def syncNearDupIndex(spark: SparkSession, srcPath: String, indexPath: String,
                       idCol: String = "doc_id", textCol: String = "text",
                       k: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                       threshold: Double = 0.7, maxBucket: Int = 1000,
                       maxBatchDirs: Int = 0)
      : DataFrame = {
    val Slots = 16L
    val fs = new org.apache.hadoop.fs.Path(indexPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireNearDupGeometry(fs, indexPath, k, bands, rowsPerBand,
      "syncNearDupIndex")
    registerIndex(spark, srcPath, indexPath, "neardup") // maintainAll discovery
    // maxBatchDirs > 0 bounds the index's batch-dir count as part of the
    // poll loop itself (the operator wiring the verdict's maintenance
    // policy asks for): after the poll commits, fold dirs at/below the
    // committed cursor whenever the count exceeds the threshold. The
    // poll's OWN matches are materialized before folding, so the returned
    // frame always reflects exactly this poll.
    def maybeCompactIdx(): Unit =
      if (maxBatchDirs > 0) { compactNearDupIndex(spark, indexPath, maxBatchDirs); () }
    def matchesOf(bid: Long): DataFrame = {
      val d = s"$indexPath/matches/batch_id=$bid"
      if (fs.exists(new org.apache.hadoop.fs.Path(d))) spark.read.parquet(d)
      else emptyMatches(spark, idCol)
    }
    // seed, shared by the fresh path and the crashed-seed retry: ingest
    // EXACTLY the captured cursor's file set as batch 1 (idempotent
    // overwrite). Reading the cursor snapshot — not a live find() —
    // makes the first poll's delta DISJOINT from the seed by
    // construction, so pure-insert polls never need a takedown scan
    // (the fast path below)
    def seed(c: graft.sources.DocStore.DocCursor): DataFrame = {
      val snap = graft.sources.DocStore.snapshotAt(spark, srcPath, c)
        .select(col(idCol), col(textCol))
      if (!snap.isEmpty)
        nearDupBatch(snap, 1L, indexPath, idCol, textCol,
          k, bands, rowsPerBand, threshold, maxBucket, Slots)
      writeNearDupSync(fs, indexPath, c, if (fs.exists(
        new org.apache.hadoop.fs.Path(s"$indexPath/keys"))) 1L else 0L)
      matchesOf(1L)
    }
    readNearDupSync(fs, indexPath) match {
      case None =>
        require(!fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/keys")),
          s"syncNearDupIndex: $indexPath already has ingested batches but " +
            "no _SYNC state — it was built by the stream ingest or another " +
            "maintainer; point CDC sync at a fresh index directory")
        val c = graft.sources.DocStore.cursor(spark, srcPath)
        // seed INTENT (bid = -1) committed before any index write: a
        // seed that crashes mid-ingest is distinguishable on retry from
        // a foreign stream-built index (which the require above refuses)
        fs.mkdirs(new org.apache.hadoop.fs.Path(indexPath))
        writeNearDupSync(fs, indexPath, c, -1L)
        seed(c)
      case Some((c0, -1L)) => // a crashed seed: redo it (idempotent)
        seed(c0)
      case Some((c0, lastBid)) =>
        val (changes, next) =
          graft.sources.DocStore.changesSince(spark, srcPath, c0, idCol)
        if (next == c0) { maybeCompactIdx(); return emptyMatches(spark, idCol) }
        // absent text in a change window's structs == null text (the
        // schemaless convention): such rows index nothing and a
        // null -> null "change" is no change
        def sideText(side: String): org.apache.spark.sql.Column = {
          val st = changes.schema(side).dataType
            .asInstanceOf[org.apache.spark.sql.types.StructType]
          if (st.fieldNames.contains(textCol)) col(s"$side.$textCol")
          else lit(null)
        }
        // ONE per-id pass over the change window (group-sized,
        // checkpointed so the window's diff plan runs once), and a SINGLE
        // aggregate — `max_by` picks the latest generation's after image
        // directly (MaxBy skips null ORDERINGS only; `generation` is
        // never null, so a latest-is-delete id correctly yields a null
        // `__text`), where the former shape paid a window sort
        // (row_number desc) before the same group-agg. `__tc` = the
        // indexed content must change (text differs across the mutation —
        // covers inserts via the null before and deletes via the null
        // after); `__old` = any non-inserted change (only those ids can
        // have superseded content already in the index); `__text` = the
        // LATEST after-image text (null when the net effect is a delete).
        val perId = changes
          .groupBy(col(idCol))
          .agg(max(when(!(sideText("before") <=> sideText("after")), 1)
              .otherwise(0)).as("__tc"),
            max(when(col("change") =!= "inserted", 1).otherwise(0)).as("__old"),
            max_by(when(col("change") =!= "deleted", sideText("after")),
              col("generation")).as("__text"))
          .filter(col("__tc") === 1)
          .localCheckpoint(true)
        val touched = perId.select(col(idCol))
        if (perId.isEmpty) { // metadata-only window: cursor advance only
          writeNearDupSync(fs, indexPath, next, lastBid)
          maybeCompactIdx()
          return emptyMatches(spark, idCol)
        }
        val toIngest = perId.filter(col("__text").isNotNull)
          .select(col(idCol), col("__text").as(textCol))
        // remove the superseded content FIRST (old keys/shingles/matches
        // of every touched id), then ingest the latest text as the next
        // batch; both steps are idempotent at this (cursor-determined)
        // batch id, so a crashed poll replays byte-identically.
        // tombstone = false: this poll's replay protocol is already
        // deterministic — a crashed poll must re-ingest the very ids it
        // just removed at the SAME batch id, which a tombstone stamped
        // with that id would suppress.
        // PURE-INSERT FAST PATH (the steady-state ingest poll): a freshly
        // inserted id cannot be in the index — the seed read exactly its
        // cursor's snapshot and every poll is exactly-once — so the
        // takedown's slot-pruned scan runs only when the window carries
        // an update or delete. Deterministic given (_SYNC, source), so
        // crash replays stay byte-identical. PRECONDITION: this relies
        // on seed == cursor snapshot (DocStore.snapshotAt). An index
        // seeded OUTSIDE this function — by hand, or by a variant that
        // reads a live find() after capturing the cursor — can hold ids
        // the first poll reports as "inserted", and their seed-era
        // entries would never be reconciled; seed through this function
        // (or run removeFromNearDupIndex over the first window's ids
        // once) before attaching polls to a foreign index.
        val toRemove = perId.filter(col("__old") === 1).select(col(idCol))
        if (fs.exists(new org.apache.hadoop.fs.Path(s"$indexPath/keys")) &&
            !toRemove.isEmpty)
          removeFromNearDupIndex(spark, indexPath, toRemove, idCol,
            tombstone = false)
        val ingested = !toIngest.isEmpty
        val bid = lastBid + 1
        if (ingested)
          nearDupBatch(toIngest, bid, indexPath, idCol, textCol,
            k, bands, rowsPerBand, threshold, maxBucket, Slots)
        writeNearDupSync(fs, indexPath, next, if (ingested) bid else lastBid)
        if (maxBatchDirs > 0) {
          // pin this poll's matches BEFORE folding: compaction may merge
          // matches/batch_id=bid into the consolidated dir, after which a
          // lazy read of that dir would return ALL history, not this poll
          val result =
            if (ingested) matchesOf(bid).localCheckpoint(true)
            else emptyMatches(spark, idCol)
          maybeCompactIdx()
          result
        }
        else if (ingested) matchesOf(bid) else emptyMatches(spark, idCol)
    }
  }

  /** Typed-empty (id_a, id_b, jaccard) frame — the no-new-matches poll. */
  private def emptyMatches(spark: SparkSession, idCol: String): DataFrame = {
    import spark.implicits._
    Seq.empty[(Long, Long, Double)].toDF("id_a", "id_b", "jaccard")
  }

  private def nearDupBatch(batch: Dataset[org.apache.spark.sql.Row], bid: Long,
                           indexPath: String, idCol: String, textCol: String,
                           k: Int, bands: Int, rowsPerBand: Int,
                           threshold: Double, maxBucket: Int, Slots: Long): Unit = {
    {
      var tPrev = System.nanoTime()
      def mark(stage: String): Unit = {
        val now = System.nanoTime()
        if (sys.env.contains("GRAFT_NEARDUP_TIMING"))
          println(f"[neardup] b$bid $stage%-12s ${(now - tPrev) / 1e9}%6.2f s")
        tPrev = now
      }
      val spark = batch.sparkSession
      // ResolveWriteToStream force-disables AQE on the session for the
      // streaming query; the work in THIS sink is plain batch actions
      // (joins, aggregates, parquet writes) where AQE's broadcast
      // conversion and partition coalescing are exactly what we want —
      // without it every join in the candidate chain is a sort-merge at
      // the fixed partition count (~2x slower per batch, measured). The
      // prior value is RESTORED after the batch body (see the end of
      // this method) so the streaming engine's own planning never sees a
      // conf it decided to disable.
      val aqeBefore = spark.conf.get("spark.sql.adaptive.enabled")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      try {
      val fs = new org.apache.hadoop.fs.Path(indexPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      def existing(dir: String): Boolean =
        fs.exists(new org.apache.hadoop.fs.Path(dir))
      val keysDir = s"$indexPath/keys"
      val shDir = s"$indexPath/shingles"
      val matchesDir = s"$indexPath/matches"
      // complete a crashed compaction before reading stored keys/shingles
      healIndexCompaction(fs, keysDir); healIndexCompaction(fs, shDir)
      healIndexCompaction(fs, matchesDir)
      // geometry contract: resuming an index with different parameters
      // would write incomparable band hashes — fail loudly instead
      requireNearDupGeometry(fs, indexPath, k, bands, rowsPerBand,
        "ingestToNearDupIndex")
      writeNearDupMeta(fs, indexPath, k, bands, rowsPerBand)

      // TAKEDOWN REPLAY FILTER: drop ids tombstoned at-or-after this batch
      // id ([[removeFromNearDupIndex]]) — an at-least-once replay of a
      // pre-takedown batch then rewrites the batch WITHOUT the removed
      // docs (identical to what the takedown's own rewrite left) instead
      // of reinstating them. Broadcast anti-join over an id-sized table;
      // a fresh batch (id above every cutoff) passes through whole.
      val tombDir = s"$indexPath/tombstones"
      val live =
        if (existing(tombDir))
          batch.join(
            broadcast(spark.read.parquet(tombDir)
              .filter(col("cutoff_bid") >= bid).select(col(idCol)).distinct()),
            Seq(idCol), "left_anti")
        else batch

      val sh = graft.dedup.MinHashDedup
        .shingleSets(live, idCol, textCol, k).cache()
      val keys = graft.dedup.MinHashDedup
        .bandKeysFromShingles(sh, idCol, bands, rowsPerBand)
        .withColumn("slot", pmod(xxhash64(col("band"), col("band_hash")), lit(Slots)))
        .cache()
      // bounded driver collect: at most `Slots` ids
      val slots = keys.select("slot").distinct().collect().map(_.getLong(0)).toSeq
      mark("keys+slots")
      // stored keys pruned TWICE: partition pruning to the slots this
      // batch touches, then a broadcast semi-join to the batch's exact
      // (band, band_hash) bucket set — only buckets the batch can pair
      // with are read into the candidate machinery. At 100 TB this is
      // the difference between "stored keys in 16 slots" (corpus-sized)
      // and "stored members of batch-touched buckets" (delta-sized).
      // Cap semantics unchanged: bucket sizes still count ALL members of
      // a touched bucket; untouched buckets' pairs were old-old and
      // filtered out downstream anyway.
      val storedKeys =
        if (existing(keysDir) && slots.nonEmpty)
          spark.read.parquet(keysDir)
            .filter(col("batch_id") < bid && col("slot").isin(slots: _*))
            .join(broadcast(keys.select(col("band"), col("band_hash")).distinct()),
              Seq("band", "band_hash"), "leftsemi")
            .select(col("band"), col("band_hash"), col(idCol))
        else keys.select(col("band"), col("band_hash"), col(idCol)).limit(0)
      val combined = storedKeys
        .unionByName(keys.select(col("band"), col("band_hash"), col(idCol)))
      // cap evaluated over stored+batch bucket membership (as-of arrival);
      // candidatePairs counts drops via BucketDrops
      val cands = graft.dedup.MinHashDedup
        .candidatePairs(combined, idCol, maxBucket)
      // keep only pairs touching THIS batch (old-old pairs were already
      // reported when their second member arrived): two broadcast LEFT
      // joins adding presence flags, one filter — no shuffle and no
      // re-distinct (cands is already distinct), where a semi-join per
      // side plus a union-distinct would cost three more stages
      val newIds = live.select(col(idCol)).distinct()
      val candsNew = cands
        .join(broadcast(newIds.select(col(idCol).as("id_a"), lit(true).as("__a"))),
          Seq("id_a"), "left")
        .join(broadcast(newIds.select(col(idCol).as("id_b"), lit(true).as("__b"))),
          Seq("id_b"), "left")
        .filter(coalesce(col("__a"), lit(false)) || coalesce(col("__b"), lit(false)))
        .select("id_a", "id_b")
        .cache()
      // bounded driver collect again: candidate ids' slots, <= `Slots`

      val candSlots = candsNew
        .select(explode(array(col("id_a"), col("id_b"))).as("id"))
        .select(pmod(xxhash64(col("id")), lit(Slots)).as("s"))
        .distinct().collect().map(_.getLong(0)).toSeq
      mark("candidates")
      val storedSh =
        if (existing(shDir) && candSlots.nonEmpty)
          spark.read.parquet(shDir)
            .filter(col("batch_id") < bid && col("id_slot").isin(candSlots: _*))
            // legacy index (no shingles_sorted _META flag): stored arrays
            // may be unsorted — the merge-walk verify needs sorted input
            .select(col(idCol),
              (if (nearDupShinglesSorted(fs, indexPath)) col("sh")
               else array_sort(col("sh"))).as("sh"))
        else sh.select(col(idCol), col("sh")).limit(0)
      val shAll = storedSh.unionByName(sh.select(col(idCol), col("sh")))
      val verified = graft.dedup.MinHashDedup
        .verifiedPairsFromShingles(shAll, candsNew, idCol, threshold)

      // repartition BY the partition column before a partitionBy write:
      // otherwise every one of the N shuffle tasks opens a file in every
      // slot dir (N x Slots tiny files + that many committer renames);
      // clustered, each slot dir gets one file. ALL THREE writes
      // (matches, keys, shingles) are independent — different dirs;
      // matches correctness never depended on write order (readers
      // filter batch_id < bid) and a crash leaving any subset of the
      // three dirs replays byte-identically (overwrite-by-batch-dir,
      // with the takedown cutoff covering half-written batches) — so
      // they run CONCURRENTLY: per-write cost here is committer and
      // small-file fixed overhead, not bandwidth, and overlapping them
      // cuts the publish phase of every micro-batch to the slowest one.
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      def writeMatches(): Unit =
        verified.write.mode(SaveMode.Overwrite)
          .parquet(s"$matchesDir/batch_id=$bid")
      // static overwrite explicitly: replay idempotence needs the whole
      // batch dir REPLACED, whatever the session's partitionOverwriteMode
      def writeKeys(): Unit =
        keys.select(col(idCol), col("band"), col("band_hash"), col("slot"))
          .repartition(col("slot"))
          .write.mode(SaveMode.Overwrite).partitionBy("slot")
          .option("partitionOverwriteMode", "static")
          .parquet(s"$keysDir/batch_id=$bid")
      def writeSh(): Unit =
        sh.withColumn("id_slot", pmod(xxhash64(col(idCol)), lit(Slots)))
          .repartition(col("id_slot"))
          .write.mode(SaveMode.Overwrite).partitionBy("id_slot")
          .option("partitionOverwriteMode", "static")
          .parquet(s"$shDir/batch_id=$bid")
      // DEADLOCK GUARD: the SQL maintenance surface (`sync_neardup`)
      // reaches this code from inside the analyzer's function lookup,
      // where the calling thread HOLDS the SessionCatalog monitor — a
      // writer future analyzing its own plan on another thread then
      // blocks on that monitor forever (observed: Await below never
      // returns). Monitors are reentrant for the owning thread, so the
      // sequential path is always safe; parallelism is an overlap
      // optimization we keep only when no catalog lock is held.
      if (Thread.holdsLock(spark.sessionState.catalog)) {
        writeMatches(); writeKeys(); writeSh()
      } else {
        val fs3 = Seq(Future(writeMatches()), Future(writeKeys()), Future(writeSh()))
        fs3.foreach(Await.result(_, scala.concurrent.duration.Duration.Inf))
      }
      // one mark: verify + the three-way concurrent publish are a single
      // overlapped phase now (a separate "index-write" mark here would
      // always read ~0 and hide publish regressions from the profiler)
      mark("verify+write")
      candsNew.unpersist()
      keys.unpersist()
      sh.unpersist()
      ()
      } finally spark.conf.set("spark.sql.adaptive.enabled", aqeBefore)
    }
  }

  /** Per-user conversion-window state: first-signup anchor (Long.MaxValue
    * while unanchored), pending stage events (ms, stageCode 2/3/4), max
    * event time seen, and a post-emission tombstone (`done`) so a
    * re-signup after the window closed cannot re-anchor and emit a
    * second row for the user.
    */
  final case class FunnelBuf(t1: Long, buf: List[(Long, Int)], lastMs: Long,
                             done: Boolean = false)
  final case class FunnelResult(user_id: Long, stage: Int,
                                t1: Long, t2: Option[Long],
                                t3: Option[Long], t4: Option[Long])

  /** Streaming conversion-window funnel: signup -> view -> click ->
    * purchase, each stage STRICTLY after the previous and all within
    * `windowMs` of the user's FIRST signup. Emits exactly one row per
    * anchored user, when the watermark proves the window closed — at that
    * point no admissible event can change the answer, so the result is
    * EXACT for any micro-batch cut and any (watermark-admissible) event
    * order. This is the piece the min-per-stage batch funnel (fn1) cannot
    * give a stream: incremental evaluation with bounded state.
    *
    * Why buffering is necessary for exactness: the stage recurrence
    * t2 = min(view > t1) is NOT order-insensitive — a late-arriving
    * earlier signup lowers t1 and can admit a view that was already seen
    * and would have been discarded. So stage events are buffered until
    * the window provably closed. State stays bounded: the buffer only
    * holds events inside [min(watermark, t1), t1 + windowMs] — pruning
    * below min(wm, t1) is sound because the final anchor satisfies
    * t1_final >= min(t1_now, wm) (late signups below the watermark are
    * dropped by Spark before reaching the operator), and anything above
    * t1 + windowMs can never join the funnel. Per-user cost is one
    * window's worth of stage events, the same bound any conversion-window
    * system pays.
    *
    * Emission boundary (restated by the st10 oracle): a user emits iff
    * final_watermark > t1 + windowMs; younger anchors are withheld at
    * end-of-drain — st9's holdback semantics, deterministic for fixed
    * data because the watermark derives from event timestamps.
    */
  def funnelStream(events: Dataset[Event], windowMs: Long): Dataset[FunnelResult] = {
    import events.sparkSession.implicits._
    val stageOf = Map("view" -> 2, "click" -> 3, "purchase" -> 4)

    def finalize(uid: Long, st: FunnelBuf): FunnelResult = {
      val sorted = st.buf.filter(p => p._1 > st.t1 && p._1 <= st.t1 + windowMs).sorted
      var t2 = -1L; var t3 = -1L; var t4 = -1L
      sorted.foreach { case (t, c) =>
        c match {
          case 2 if t2 < 0 => t2 = t
          case 3 if t3 < 0 && t2 > 0 && t > t2 => t3 = t
          case 4 if t4 < 0 && t3 > 0 && t > t3 => t4 = t
          case _ => ()
        }
      }
      val stage = 1 + Seq(t2, t3, t4).takeWhile(_ > 0).size
      FunnelResult(uid, stage, st.t1,
        Option(t2).filter(_ > 0), Option(t3).filter(_ > 0), Option(t4).filter(_ > 0))
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelBuf, FunnelResult](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[FunnelBuf]) =>
          if (!it.hasNext && state.hasTimedOut) {
            val st = state.getOption
            st match {
              case Some(s) if s.t1 != Long.MaxValue && !s.done =>
                // emit once, then TOMBSTONE rather than remove: a later
                // re-signup must not re-anchor and emit a second row for
                // the user. One tombstone per emitted user is the price
                // of exactly-once keyed output (the dropDuplicates
                // state-shape); removing it is a retention policy choice
                // the caller can layer on.
                state.update(FunnelBuf(s.t1, Nil, s.lastMs, done = true))
                Iterator.single(finalize(uid, s))
              case Some(_) => state.remove(); Iterator.empty // unanchored GC
              case None => Iterator.empty
            }
          } else {
            val wm = state.getCurrentWatermarkMs()
            val prev = state.getOption.getOrElse(FunnelBuf(Long.MaxValue, Nil, 0L))
            if (prev.done) {
              it.foreach(_ => ()) // drain; post-emission events are irrelevant
              state.update(prev)  // keep the tombstone, set no timeout
              Iterator.empty
            } else {
              var t1 = prev.t1
              var last = prev.lastMs
              val add = List.newBuilder[(Long, Int)]
              it.foreach { e =>
                val t = e.ts.getTime
                if (t > last) last = t
                if (e.event_type == "signup") { if (t < t1) t1 = t }
                else stageOf.get(e.event_type).foreach(c => add += ((t, c)))
              }
              val lower = math.min(wm, t1) // t1 == MaxValue while unanchored -> wm
              val buf = (prev.buf ++ add.result()).filter(p =>
                p._1 >= lower && (t1 == Long.MaxValue || p._1 <= t1 + windowMs))
              if (t1 != Long.MaxValue && wm > t1 + windowMs) {
                // window already provably closed inside this batch
                state.update(FunnelBuf(t1, Nil, last, done = true))
                Iterator.single(finalize(uid, FunnelBuf(t1, buf, last)))
              } else {
                state.update(FunnelBuf(t1, buf, last))
                // Spark fires an event-time timeout when timeoutTs <
                // watermark (STRICT), so timeoutTs = t1 + windowMs fires
                // exactly when wm > t1 + windowMs — the same boundary the
                // inline check and the st10 oracle state. The clamp floor
                // is wm, NOT wm + 1: setTimeoutTimestamp accepts equality
                // with the current watermark (GroupStateImpl rejects only
                // timeoutTs < wm), so when this batch observes
                // wm == t1 + windowMs the timeout stays at t1 + windowMs
                // and still fires at the exact oracle boundary — a +1
                // floor would push it to t1 + windowMs + 1 and withhold a
                // user whose final watermark lands exactly on
                // t1 + windowMs + 1, which the oracle emits.
                state.setTimeoutTimestamp(math.max(wm,
                  if (t1 != Long.MaxValue) t1 + windowMs else last + windowMs))
                Iterator.empty
              }
            }
          }
      }
  }
}
