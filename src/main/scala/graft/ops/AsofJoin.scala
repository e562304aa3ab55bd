package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series AS-OF join: for every left row, the single most recent right
  * row with `right.ts <= left.ts` in the same key group (inclusive on ties).
  *
  * The reference engine has no time-series surface; this is part of the
  * training-data-pipeline widening (sensor/event enrichment — "attach the
  * last known reading to each observation"), the batch companion of the
  * streaming session operators in [[graft.streaming]].
  *
  * Spark-first shape — an as-of join WITHOUT a join: tag both sides, union,
  * and fill with `last(_, ignoreNulls)` over one ordered window
  * `(ts, side, seq)` per key group. One shuffle on the key columns, a
  * single linear window scan per group, no per-key driver work, no
  * range-condition explosion (a naive `left.ts >= right.ts` theta-join is
  * quadratic per key and unusable at 100 TB). Right rows order BEFORE left
  * rows at an equal timestamp (`side` 0 < 1), which makes the match
  * inclusive; ties among right rows resolve to the largest `seqCol`.
  *
  * Row count contract: exactly one output row per left row (left-outer —
  * unmatched left rows carry null `asof_*` columns). Null-timestamp LEFT
  * rows sort first in their group and therefore never match; null-timestamp
  * RIGHT rows are dropped before the union (they have no position on the
  * time axis — leaving them in would let `last(_, ignoreNulls)` leak their
  * payload into later rows while `asof_<tsCol>` stayed null, a half-matched
  * state).
  *
  * @param keys      equality key columns (both sides)
  * @param tsCol     event-time column (both sides; exact integer micros
  *                  recommended — double timestamps are not oracle-exact)
  * @param seqCol    unique-per-side tiebreaker column (both sides), makes
  *                  the window order total and the result deterministic
  * @param payload   right columns to carry onto matches, emitted as
  *                  `asof_<name>` next to `asof_<tsCol>`
  * @param tolerance optional max `left.ts - right.ts` (same unit as tsCol);
  *                  staler matches null out, the row is kept
  */
object AsofJoin {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               tsCol: String, seqCol: String, payload: Seq[String],
               tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    val sideCol = "_asof_side"
    val asofTs = s"asof_$tsCol"
    val outPayload = payload.map(p => s"asof_$p")
    val reserved = (outPayload :+ asofTs :+ sideCol).toSet
    require(left.columns.forall(!reserved.contains(_)),
      s"left side collides with emitted columns: ${reserved.mkString(", ")}")

    // right side: keys + order columns + payload under its output alias;
    // left-only columns ride as typed nulls so unionByName lines up
    val orderCols = keys ++ Seq(tsCol, seqCol)
    val leftExtra = left.columns.filterNot(orderCols.contains)
    val rightU = right.filter(col(tsCol).isNotNull).select(
      orderCols.map(col) ++
        payload.map(p => col(p).as(s"asof_$p")) ++
        Seq(col(tsCol).as(asofTs), lit(0).as(sideCol)) ++
        leftExtra.map(n => lit(null).cast(left.schema(n).dataType).as(n)): _*)
    val leftU = left.select(
      (left.columns.map(col) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(s"asof_$p")) ++
        Seq(lit(null).cast(right.schema(tsCol).dataType).as(asofTs),
          lit(1).as(sideCol))).toIndexedSeq: _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol), col(sideCol), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fillCols = outPayload :+ asofTs
    val filled = fillCols.foldLeft(rightU.unionByName(leftU)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }

    val matched = filled.filter(col(sideCol) === 1).drop(sideCol)
    val bounded = tolerance match {
      case None => matched
      case Some(tol) =>
        val ok = col(asofTs).isNotNull && (col(tsCol) - col(asofTs) <= lit(tol))
        fillCols.foldLeft(matched)((df, c) => df.withColumn(c, when(ok, col(c))))
    }
    bounded.select((left.columns ++ fillCols).map(col).toIndexedSeq: _*)
  }

  /** Regular-grid GAP FILLING — the normalization pass of time-series
    * analytics: emit one row per key per fixed bucket across the key's
    * observed span, forward-filling buckets with no data from the last
    * observed value (the `asof` semantics against an implicit spine). Any
    * rolling/window analytic downstream (the trailing-24h z-flag, rate
    * deltas) silently mis-windows on a sparse series — 24 ROWS is only
    * 24 hours if every hour has a row; filling makes ROWS frames honest.
    *
    * Exact shape: per key, the bucket spine is
    * `sequence(min_bucket, max_bucket, step)` (integer micros — engine-
    * replayable), left-joined to the observed per-bucket aggregates, then
    * ONE `last(_, ignoreNulls)` ordered window fills forward. Two
    * key-bounded shuffles (the bucket rollup; the spine join + window share
    * the key partitioning). The spine is data-bounded per key (its own
    * span), so a key observed once emits one row — no cross-key span
    * explosion.
    *
    * @param df       input rows
    * @param keyCol   series key column name
    * @param tsUs     event-time expression in micros
    * @param valueInt exact-integer value expression (summed per bucket)
    * @param stepUs   bucket width in micros
    * @return (keyCol, bucket_us, cents, filled) — `filled` marks spine
    *         rows that had no observation (value forward-filled; a gap
    *         BEFORE the first observation cannot exist by construction)
    */
  def gapFill(df: DataFrame, keyCol: String, tsUs: Column, valueInt: Column,
              stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive: $stepUs")
    val perBucket = df
      .select(col(keyCol), tsUs.cast("long").as("__ts"),
        valueInt.cast("long").as("__v"))
      .withColumn("bucket_us", expr(s"(__ts DIV ${stepUs}L) * ${stepUs}L"))
      .groupBy(col(keyCol), col("bucket_us"))
      .agg(sum("__v").as("obs_cents"))
    val spine = perBucket
      .groupBy(col(keyCol))
      .agg(min("bucket_us").as("lo"), max("bucket_us").as("hi"))
      .withColumn("bucket_us",
        explode(sequence(col("lo"), col("hi"), lit(stepUs))))
      .select(col(keyCol), col("bucket_us"))
    val w = Window.partitionBy(keyCol).orderBy("bucket_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perBucket, Seq(keyCol, "bucket_us"), "left")
      .withColumn("cents", last("obs_cents", ignoreNulls = true).over(w))
      .withColumn("filled", col("obs_cents").isNull)
      .select(col(keyCol), col("bucket_us"), col("cents"), col("filled"))
  }

  /** Nearest-neighbour as-of join: for every left row the single right row
    * minimizing |Δts| within the key group — the sensor-fusion variant of
    * [[asofJoin]] (backward is "last known reading"; nearest is "the
    * reading this observation should pair with"). Composed from the two
    * directional matches: the backward match IS the nearest-from-below and
    * the forward match (the same machinery on negated ts/seq) the
    * nearest-from-above, so one comparison picks the winner. Equal gaps
    * prefer the backward (earlier) row. Among right rows tied on ts, the
    * backward side resolves to the LARGEST seq and the forward side to the
    * SMALLEST (negation flips the tiebreak) — both deterministic.
    *
    * Plan shape: two window-scan as-of passes + one key-aligned join on
    * (keys, ts, seq) — still no theta-join, still one linear scan per
    * direction.
    *
    * @return left columns + `near_<p>`/`near_<tsCol>` + signed `near_gap`
    *         (near ts − left ts; ≤ 0 backward), nulls when the group has
    *         no right rows
    */
  def asofNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  tsCol: String, seqCol: String,
                  payload: Seq[String]): DataFrame = {
    val back = asofJoin(left, right, keys, tsCol, seqCol, payload)
    val negL = left.withColumn(tsCol, -col(tsCol))
      .withColumn(seqCol, -col(seqCol))
    val negR = right.withColumn(tsCol, -col(tsCol))
      .withColumn(seqCol, -col(seqCol))
    var fwd = asofJoin(negL, negR, keys, tsCol, seqCol, payload)
      .withColumn(tsCol, -col(tsCol))
      .withColumn(seqCol, -col(seqCol))
      .withColumn(s"asof_$tsCol", -col(s"asof_$tsCol"))
    if (payload.contains(seqCol))
      fwd = fwd.withColumn(s"asof_$seqCol", -col(s"asof_$seqCol"))
    val asofCols = (payload.map(p => s"asof_$p") :+ s"asof_$tsCol").distinct
    val joinKeys = keys :+ tsCol :+ seqCol
    val fwdR = fwd.select(joinKeys.map(col) ++
      asofCols.map(c => col(c).as("fwd_" + c.stripPrefix("asof_"))): _*)
    val j = back.join(fwdR, joinKeys)
    val bts = col(s"asof_$tsCol"); val fts = col(s"fwd_$tsCol")
    val useBack = bts.isNotNull &&
      (fts.isNull || (col(tsCol) - bts) <= (fts - col(tsCol)))
    val nearCols = payload.map(p =>
      when(useBack, col(s"asof_$p")).otherwise(col(s"fwd_$p"))
        .as(s"near_$p")) ++
      Seq(when(useBack, bts).otherwise(fts).as(s"near_$tsCol"),
        when(useBack, bts - col(tsCol)).otherwise(fts - col(tsCol))
          .as("near_gap"))
    j.select((left.columns.map(col) ++ nearCols).toIndexedSeq: _*)
  }
}
