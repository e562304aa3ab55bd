package graft.streaming

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming surface of the engine — the incremental-ingest
  * complement of the batch operators (SURVEY.md §2.7: the reference is
  * request/response; streams are the batch-engine generalization the north
  * rule's ingest side needs). The transforms here are the SAME declarative
  * plans as their batch twins, run through the micro-batch engine, so batch
  * results are the exact oracle.
  */
object StreamOps {

  private val runSeq = new AtomicLong(0L)

  /** Event-time windowed aggregation over a file-source stream, run to
    * completion (`Trigger.AvailableNow`) and returned as the final result
    * table — the streaming path driven through the engine's DuckDB
    * correctness gate rather than spec-only equivalence.
    *
    * The aggregate carries a watermark (the state-eviction contract a
    * forever-running ingest needs) but emits in COMPLETE mode, so the
    * drained result is exactly the batch GROUP BY — deterministic
    * regardless of how the source splits micro-batches. Value sums are
    * quantized to integer milli-units per event BEFORE summing, so the
    * aggregate is an order-independent Long sum (micro-batch arrival order
    * cannot perturb a bit).
    *
    * Scale shape: the stateful aggregation is keyed by (window, event_type)
    * — bounded state per key, watermark-evicted in append deployments; the
    * file source reads each input split once. This is the same plan
    * Catalyst produces for the batch twin, plus StateStore exchange.
    *
    * @param path parquet path (file or directory) of the events table
    * @return (day, event_type, n, v_sum) — v_sum in milli-units
    */
  def windowedCounts(spark: SparkSession, path: String): DataFrame = {
    val name = s"graft_stream_wc_${runSeq.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt_").toString
    // the file source lists a DIRECTORY; a single-file table stages into a
    // temp dir as a symlink (an ingest deployment would already be a dir)
    val src = java.nio.file.Paths.get(path)
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) path
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_src_")
        java.nio.file.Files.createSymbolicLink(
          d.resolve(src.getFileName), src)
        d.toString
      }
    val schema = spark.read.parquet(streamDir).schema
    // parquet timestamps arrive NTZ; watermarks need an instant type. The
    // engine's sessions pin spark.sql.session.timeZone=UTC, so both casts
    // are identity on the underlying micros and the emitted `day` matches
    // the batch date_trunc('day') bucket bit-for-bit.
    val q = spark.readStream.schema(schema).parquet(streamDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).cast("long").as("n"),
        sum(floor(col("value") * lit(1000.0)).cast("long")).as("v_sum"))
      .select(col("w.start").cast("timestamp_ntz").as("day"),
        col("event_type"), col("n"), col("v_sum"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drain(spark, name)
  }

  /** Event-time SESSION-window aggregation over a file-source stream — the
    * merging-window state machine (Structured Streaming's session_window)
    * driven through the correctness gate. A session extends while the next
    * event starts strictly inside [last, last + gap); equivalently a gap
    * ≥ `gap` starts a new session, which is exactly the batch
    * gaps-and-islands rule the DuckDB oracle replays. Complete-mode drain
    * as in [[windowedCounts]]; sums quantized to integer cents pre-sum.
    *
    * Scale shape: session state is keyed by (user, merging window) — the
    * per-key bound of sessionization; in an append deployment the
    * watermark closes and evicts sessions.
    *
    * @return (user_id, start_us, end_us, n_events, sum_cents)
    */
  def sessionCounts(spark: SparkSession, path: String,
                    gap: String = "12 hours"): DataFrame = {
    val name = s"graft_stream_sess_${runSeq.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt_").toString
    val src = java.nio.file.Paths.get(path)
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) path
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_src_")
        java.nio.file.Files.createSymbolicLink(d.resolve(src.getFileName), src)
        d.toString
      }
    val schema = spark.read.parquet(streamDir).schema
    val q = spark.readStream.schema(schema).parquet(streamDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(round(col("value") * lit(100.0), 0).cast("long")).as("sum_cents"))
      .select(col("user_id"), unix_micros(col("w.start")).as("start_us"),
        unix_micros(col("w.end")).as("end_us"), col("n_events"),
        col("sum_cents"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drain(spark, name)
  }

  /** Watermarked STREAM-STREAM interval join drained through the gate:
    * purchases within 1 h after a view by the same user, both sides
    * streaming from the same file source. State is bounded by the 2 h
    * watermark + the time-range condition (Spark evicts view state once
    * the purchase-side watermark passes v_ts + 1 h). Append mode — every
    * matched pair emits exactly once, so the drained table equals the
    * batch interval join bit-for-bit.
    */
  def viewPurchaseJoin(spark: SparkSession, path: String): DataFrame = {
    val name = s"graft_stream_vp_${runSeq.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt_").toString
    val src = java.nio.file.Paths.get(path)
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) path
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_src_")
        java.nio.file.Files.createSymbolicLink(d.resolve(src.getFileName), src)
        d.toString
      }
    val schema = spark.read.parquet(streamDir).schema
    def side(tpe: String) = spark.readStream.schema(schema).parquet(streamDir)
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", "2 hours")
    val views = side("view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
    val purchases = side("purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
    val q = views.join(purchases,
        col("v_user") === col("p_user") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("view_id"), col("purchase_id"),
        unix_micros(col("v_ts")).as("v_us"), unix_micros(col("p_ts")).as("p_us"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drain(spark, name)
  }

  /** STREAMING DEDUPLICATION — the fourth stateful-streaming surface next
    * to the window agg, session windows and the interval join:
    * `dropDuplicates` over (user_id, event_type, day) keeps exactly the
    * first arrival of each key and emits every key once. Only the KEY
    * columns are emitted: which physical row "wins" inside a micro-batch is
    * order-dependent, the key set is not — emitting keys makes the
    * append-mode drain equal the batch `SELECT DISTINCT` bit-for-bit (the
    * DuckDB gate), the same determinism discipline as the other drains.
    *
    * State note (honest contract): exact global dedup keeps one state row
    * per distinct key forever — Spark only expires dedup state when the
    * event-time column itself is among the keys. The production TTL'd
    * variant is `dropDuplicatesWithinWatermark`, which bounds state by the
    * watermark delay at the cost of re-admitting a key whose duplicates
    * straddle the delay — that trade is data-dependent, so the GATE pins
    * the exact variant and the scaladoc records the knob.
    */
  def dedupKeys(spark: SparkSession, path: String): DataFrame = {
    val name = s"graft_stream_dd_${runSeq.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt_").toString
    val src = java.nio.file.Paths.get(path)
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) path
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_src_")
        java.nio.file.Files.createSymbolicLink(d.resolve(src.getFileName), src)
        d.toString
      }
    val schema = spark.read.parquet(streamDir).schema
    val q = spark.readStream.schema(schema).parquet(streamDir)
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("day"), col("ts"))
      .dropDuplicates("user_id", "event_type", "day")
      .select(col("user_id"), col("event_type"),
        col("day").cast("timestamp_ntz").as("day"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drain(spark, name)
  }

  /** STREAMING ELEVATION ENRICHMENT — the reference's live `/geojson`
    * endpoint (`src/server.ts:74-95`) in its truest Spark form: a
    * Structured Streaming job that enriches an unbounded coordinate stream
    * against the broadcast tile-pyramid index. The lookup is STATELESS
    * (tile_key + the codegen'd index-probe expression are per-row column
    * adds), so the stream needs no watermark, no state store, and the
    * append drain equals the batch [[graft.ops.Elevation.lookupBroadcast]]
    * bit-for-bit — the J1 join family's third physical path (broadcast
    * probe / cogroup shuffle / streaming enrichment), all three through
    * the same oracle.
    *
    * @param pointExprs selectExpr strings deriving (point_id, lng, lat)
    *                   from the streamed rows (the gate's fixture exprs)
    */
  def elevationEnrich(spark: SparkSession, path: String,
                      tiles: org.apache.spark.sql.Dataset[graft.core.TileRow],
                      pointExprs: Seq[String]): DataFrame = {
    val name = s"graft_stream_el_${runSeq.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt_").toString
    val src = java.nio.file.Paths.get(path)
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) path
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_src_")
        java.nio.file.Files.createSymbolicLink(d.resolve(src.getFileName), src)
        d.toString
      }
    val schema = spark.read.parquet(streamDir).schema
    val pts = spark.readStream.schema(schema).parquet(streamDir)
      .selectExpr(pointExprs: _*)
    val q = graft.ops.Elevation.lookupBroadcast(pts, tiles)
      .select(col("point_id"), col("tile_key"), col("elev"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drain(spark, name)
  }

  /** STREAMING HLL DISTINCT — the engine's distinct-count sketch
    * ([[graft.ops.Sketches.hllRegisters]]) maintained incrementally: the
    * stateful streaming aggregation IS the sketch (per-(group, bucket) MAX
    * rank — 32 Long registers per group, merged by max on every
    * micro-batch, order-insensitive by construction), so the drained
    * complete-mode register table is bit-identical to the batch sketch no
    * matter how the source splits micro-batches, and the finished estimate
    * reuses the exact same fold ([[graft.ops.Sketches.hllFinish]]) — one
    * oracle covers both engines.
    *
    * Scale shape: state is 32 registers × |groups| — the whole point of
    * sketching an unbounded stream; a forever-running deployment emits
    * per-window snapshots off the same state. No watermark: registers
    * never retire (distinct-so-far semantics).
    *
    * @return (groupCol, n_buckets, hll_q) — as the batch twin
    */
  def hllDistinct(spark: SparkSession, path: String, groupCol: String,
                  idCol: String): DataFrame = {
    val name = s"graft_stream_hll_${runSeq.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt_").toString
    val src = java.nio.file.Paths.get(path)
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) path
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_src_")
        java.nio.file.Files.createSymbolicLink(d.resolve(src.getFileName), src)
        d.toString
      }
    val schema = spark.read.parquet(streamDir).schema
    val q = graft.ops.Sketches.hllRegisters(
        spark.readStream.schema(schema).parquet(streamDir), groupCol, idCol)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    graft.ops.Sketches.hllFinish(drain(spark, name), groupCol)
  }

  /** STREAMING CDC SNAPSHOT — latest-wins upsert state maintained as a
    * stateful streaming aggregation: per key, `max_by(payload, seq)` over
    * the change stream IS the snapshot (one struct register per key,
    * merged by seq-max each micro-batch — order-insensitive under the
    * engine-wide unique-(key, seq) changelog contract, so the drained
    * complete-mode table equals the batch [[graft.ops.Cdc.applyChanges]]
    * fold no matter how the source splits micro-batches). Delete markers
    * ride the payload: the caller filters the drained snapshot on its op
    * column (a winning 'D' = key absent), keeping the state machine to ONE
    * declarative aggregate — no flatMapGroupsWithState, nothing custom to
    * checkpoint beyond Spark's own aggregation state.
    *
    * Scale shape: state is one payload struct × |live keys| — the
    * materialized table itself, the floor for ANY upsert view; a
    * forever-running deployment compacts by emitting the snapshot and
    * truncating the log (the streaming twin of the checkpoint store's
    * snapshot+changelog split).
    *
    * @param path    parquet changelog: keyCol + seqCol + payload columns
    * @param keyCol  upsert key
    * @param seqCol  total change order per key (unique per key)
    * @return one row per key: keyCol + payload of the key's LAST change
    */
  def cdcSnapshot(spark: SparkSession, path: String, keyCol: String,
                  seqCol: String): DataFrame = {
    val name = s"graft_stream_cdc_${runSeq.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt_").toString
    val schema = spark.read.parquet(path).schema
    val payload = schema.fieldNames.filterNot(n => n == keyCol || n == seqCol)
    val q = spark.readStream.schema(schema).parquet(path)
      .groupBy(col(keyCol))
      .agg(max_by(struct(payload.map(col).toIndexedSeq: _*), col(seqCol)).as("__latest"))
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    drain(spark, name).select(col(keyCol) +:
      payload.map(p => col(s"__latest.$p").as(p)).toIndexedSeq: _*)
  }

  /** Materialize a memory sink's table and release the temp-view name. */
  /** Arbitrary-state streaming rollup through `mapGroupsWithState` — the
    * custom-state API surface (GroupState) driven through the DuckDB gate:
    * per user a running (n, Σcents, min, max) updated per micro-batch.
    * Every field is an order-independent fold, so the FINAL state equals
    * the batch GROUP BY no matter how the file source splits batches; the
    * memory sink in update mode keeps every intermediate emission, and the
    * drain picks each key's last (max-n — n is strictly monotone per
    * update) row. NoTimeout: state lives for the run, bounded by one tuple
    * per key — the production deployment would add a timeout eviction.
    */
  def stateRollup(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
    import spark.implicits._
    val name = s"graft_stream_state_${runSeq.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_stream_ckpt_").toString
    val src = java.nio.file.Paths.get(path)
    val streamDir =
      if (java.nio.file.Files.isDirectory(src)) path
      else {
        val d = java.nio.file.Files.createTempDirectory("graft_stream_src_")
        java.nio.file.Files.createSymbolicLink(d.resolve(src.getFileName), src)
        d.toString
      }
    val schema = spark.read.parquet(streamDir).schema
    val q = spark.readStream.schema(schema).parquet(streamDir)
      .select(col("user_id").cast("long").as("u"),
        expr("CAST(round(value * 100) AS BIGINT)").as("c"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (u: Long, it: Iterator[(Long, Long)],
         st: GroupState[(Long, Long, Long, Long)]) =>
          var (n, s, mn, mx) = st.getOption
            .getOrElse((0L, 0L, Long.MaxValue, Long.MinValue))
          it.foreach { case (_, c) =>
            n += 1; s += c
            if (c < mn) mn = c
            if (c > mx) mx = c
          }
          st.update((n, s, mn, mx))
          (u, n, s, mn, mx)
      }
      .toDF("user_id", "n", "sum_cents", "min_cents", "max_cents")
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val all = drain(spark, name)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("n").desc)
    all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  private def drain(spark: SparkSession, name: String): DataFrame = {
    val out = spark.table(name).cache()
    out.count()
    spark.catalog.dropTempView(name)
    out
  }
}
