package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Exact global ranking primitives without a single-partition sort.
  *
  * A bare `Window.orderBy(...)` (no partitionBy) moves the ENTIRE input to
  * one task — the classic scale-killer Spark itself warns about
  * ("No Partition Defined for Window operation"). These helpers compute the
  * same bit-exact results as the global window via the two-phase shape
  * (VERDICT r4 "Next round" #3; sibling of [[Curation.topKPerGroup]]):
  *
  *  1. `repartitionByRange` on the order keys — RangePartitioner assigns
  *     ascending key ranges to ascending partition ids, so partition id
  *     order IS global key order across partitions;
  *  2. rank/lag within each range partition (parallel, bounded by n/parts);
  *  3. stitch with per-partition aggregates (ONE tiny `parts`-row frame):
  *     cumulative row-count offsets for ranks, boundary carry rows for lag.
  *
  * The ranged intermediate is `localCheckpoint`ed: two plan branches (the
  * ranked rows and the tiny per-partition aggregate) must observe the SAME
  * sampled range boundaries; exchange reuse usually guarantees that, but
  * AQE can re-plan branches independently, and a silent boundary mismatch
  * would corrupt ranks. Cost at scale: the checkpoint materializes the
  * ranged input once (memory-and-disk, distributed) — the same cost class
  * as the range shuffle itself and strictly cheaper than the single-node
  * sort of the whole input that the global window it replaces would run.
  * `numParts` defaults to the session's shuffle parallelism
  * (`spark.sql.shuffle.partitions`) so the per-partition sorts scale with
  * the cluster; correctness is independent of the value.
  *
  * `orderCols` MUST be a total order (break ties with a unique id) — the
  * same contract the single-partition window needs for determinism anyway.
  */
object GlobalRank {

  private val PID = "_gr_pid"
  private val LRN = "_gr_lrn"

  /** Constant-zero partition key the optimizer CANNOT fold away: a literal
    * `partitionBy(lit(0))` is constant-folded and eliminated (and `h * 0`
    * is algebraically simplified to 0 first), reverting the window to an
    * unpartitioned spec — and its "No Partition Defined" warning — whereas
    * `pmod(hash(c), 1)` is column-dependent with no simplification rule,
    * yet always 0. Used to mark windows whose input is a PROVABLY BOUNDED
    * aggregate (per-day/per-dimension/post-limit frames), so the remaining
    * warnings in a run are real scale findings, not noise.
    */
  def boundedPartitionKey(c: Column): Column = pmod(hash(c), lit(1))

  private def ranged(df: DataFrame, orderCols: Seq[Column], numParts0: Int)
      : DataFrame = {
    // -1 (the public default) = the session's shuffle parallelism, so the
    // per-partition sorts scale with the cluster exactly like any other
    // shuffle — a FIXED default would mean n/32 rows per sort task at 100 TB
    val numParts =
      if (numParts0 == -1)
        df.sparkSession.sessionState.conf.numShufflePartitions
      else numParts0
    require(numParts > 0, s"numParts must be > 0, got $numParts")
    require(!df.columns.contains(PID) && !df.columns.contains(LRN),
      s"input must not carry the scratch columns $PID/$LRN")
    df.repartitionByRange(numParts, orderCols: _*)
      .withColumn(PID, spark_partition_id())
      .withColumn(LRN, row_number().over(
        Window.partitionBy(col(PID)).orderBy(orderCols: _*)))
      .localCheckpoint(false)
  }

  /** Running offsets over a tiny (≤ numParts rows) per-partition aggregate
    * via a θ-self-join instead of a window: numParts² comparisons is
    * nothing, and the plan carries no unpartitioned window at all.
    */
  private def runningOffsets(perPart: DataFrame, valCol: String): DataFrame =
    perPart.as("a")
      .join(perPart.as("b"), col(s"b.$PID") < col(s"a.$PID"), "left")
      .groupBy(col(s"a.$PID").as(PID))
      .agg(coalesce(sum(col(s"b.$valCol")), lit(0L)).as("_gr_off"))

  /** Global `row_number()` over `orderCols` as column `out`. */
  def withRowNumber(df: DataFrame, out: String, orderCols: Seq[Column],
                    numParts: Int = -1): DataFrame = {
    val r = ranged(df, orderCols, numParts)
    val counts = r.groupBy(col(PID)).agg(count(lit(1)).as("_gr_cnt"))
    val offsets = runningOffsets(counts, "_gr_cnt")
    r.join(broadcast(offsets), Seq(PID))
      .withColumn(out, col(LRN) + col("_gr_off"))
      .drop(PID, LRN, "_gr_off")
  }

  /** Global `lag(valueCol, 1)` over `orderCols` as column `out`: the first
    * row of each range partition takes the carry — the last value of the
    * nearest earlier non-empty partition (null for the global first row).
    */
  def withLag(df: DataFrame, valueCol: String, out: String,
              orderCols: Seq[Column], numParts: Int = -1): DataFrame =
    withLags(df, Seq(valueCol -> out), orderCols, numParts)

  /** [[withLag]] for several value columns over ONE shared order — a single
    * range shuffle and one boundary-carry join for all of them.
    */
  def withLags(df: DataFrame, valueToOut: Seq[(String, String)],
               orderCols: Seq[Column], numParts: Int = -1): DataFrame = {
    val r = ranged(df, orderCols, numParts)
    val lastPerPart = r.withColumn("_gr_maxrn",
        max(col(LRN)).over(Window.partitionBy(col(PID))))
      .filter(col(LRN) === col("_gr_maxrn"))
      .select(col(PID) +: valueToOut.map { case (v, _) =>
        col(v).as(s"_gr_last_$v") }: _*)
    // carry for partition p = last value of the nearest earlier NON-EMPTY
    // partition: a θ-self-join over the tiny (≤ numParts rows) frame finds
    // each partition's predecessor id, a second tiny join fetches its
    // values — no unpartitioned window anywhere in the plan
    val ids = lastPerPart.select(col(PID))
    val prevId = ids.as("a")
      .join(ids.as("b"), col(s"b.$PID") < col(s"a.$PID"), "left")
      .groupBy(col(s"a.$PID").as(PID))
      .agg(max(col(s"b.$PID")).as("_gr_prev"))
    val prevVals = lastPerPart.select(
      col(PID).as("_gr_prev") +: valueToOut.map { case (v, _) =>
        col(s"_gr_last_$v").as(s"_gr_carry_$v") }: _*)
    val carry = prevId.join(prevVals, Seq("_gr_prev"), "left")
      .select(col(PID) +: valueToOut.map { case (v, _) =>
        col(s"_gr_carry_$v") }: _*)
    val localW = Window.partitionBy(col(PID)).orderBy(orderCols: _*)
    valueToOut.foldLeft(r.join(broadcast(carry), Seq(PID))) {
        case (d, (v, out)) =>
          d.withColumn(out, when(col(LRN) === 1, col(s"_gr_carry_$v"))
            .otherwise(lag(v, 1).over(localW)))
      }
      .drop(PID +: LRN +: valueToOut.map { case (v, _) => s"_gr_carry_$v" }: _*)
  }

  /** Global running `sum(valueCol)` (unbounded-preceding → current row)
    * over `orderCols` as column `out`: per-partition running sums plus the
    * cumulative total of earlier range partitions.
    */
  def withCumSum(df: DataFrame, valueCol: String, out: String,
                 orderCols: Seq[Column], numParts: Int = -1): DataFrame = {
    val r = ranged(df, orderCols, numParts)
    val sums = r.groupBy(col(PID)).agg(sum(valueCol).as("_gr_psum"))
    val offsets = runningOffsets(sums, "_gr_psum")
    r.join(broadcast(offsets), Seq(PID))
      .withColumn(out, sum(valueCol).over(
          Window.partitionBy(col(PID)).orderBy(orderCols: _*)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        + col("_gr_off"))
      .drop(PID, LRN, "_gr_off")
  }

  /** Global `ntile(buckets)` over `orderCols` as column `out` (int),
    * bit-equal to the SQL-standard ntile: the first `n % buckets` buckets
    * get `n/buckets + 1` rows, the rest `n/buckets`.
    */
  def withNtile(df: DataFrame, out: String, buckets: Int,
                orderCols: Seq[Column], numParts: Int = -1): DataFrame = {
    require(buckets > 0, s"buckets must be > 0, got $buckets")
    val rn = "_gr_rn"
    val withRn = withRowNumber(df, rn, orderCols, numParts)
    val n = withRn.agg(count(lit(1))).head().getLong(0)
    val base = n / buckets
    val extra = n % buckets
    val thr = (base + 1) * extra
    // integral DIV, not Column./ (double division): exact at any n
    withRn.withColumn(out,
        when(lit(base) === 0L, col(rn)) // n < buckets: bucket = rank
          .when(col(rn) <= thr,
            expr(s"($rn - 1) DIV ${base + 1} + 1"))
          .otherwise(expr(s"$extra + ($rn - 1 - $thr) DIV $base + 1"))
        .cast("int"))
      .drop(rn)
  }
}
