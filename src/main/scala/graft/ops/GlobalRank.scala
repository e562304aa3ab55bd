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
  * would corrupt ranks.
  *
  * `orderCols` MUST be a total order (break ties with a unique id) — the
  * same contract the single-partition window needs for determinism anyway.
  */
object GlobalRank {

  private val PID = "_gr_pid"
  private val LRN = "_gr_lrn"

  private def ranged(df: DataFrame, orderCols: Seq[Column], numParts: Int)
      : DataFrame = {
    require(numParts > 0, s"numParts must be > 0, got $numParts")
    require(!df.columns.contains(PID) && !df.columns.contains(LRN),
      s"input must not carry the scratch columns $PID/$LRN")
    df.repartitionByRange(numParts, orderCols: _*)
      .withColumn(PID, spark_partition_id())
      .withColumn(LRN, row_number().over(
        Window.partitionBy(col(PID)).orderBy(orderCols: _*)))
      .localCheckpoint(false)
  }

  /** Global `row_number()` over `orderCols` as column `out`. */
  def withRowNumber(df: DataFrame, out: String, orderCols: Seq[Column],
                    numParts: Int = 32): DataFrame = {
    val r = ranged(df, orderCols, numParts)
    // per-partition counts: `numParts` rows — the only unpartitioned
    // window in the plan runs over that provably-bounded aggregate
    val offsets = r.groupBy(col(PID)).agg(count(lit(1)).as("_gr_cnt"))
      .withColumn("_gr_off", coalesce(sum("_gr_cnt").over(
        Window.orderBy(col(PID))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(PID), col("_gr_off"))
    r.join(broadcast(offsets), Seq(PID))
      .withColumn(out, col(LRN) + col("_gr_off"))
      .drop(PID, LRN, "_gr_off")
  }

  /** Global `lag(valueCol, 1)` over `orderCols` as column `out`: the first
    * row of each range partition takes the carry — the last value of the
    * nearest earlier non-empty partition (null for the global first row).
    */
  def withLag(df: DataFrame, valueCol: String, out: String,
              orderCols: Seq[Column], numParts: Int = 32): DataFrame =
    withLags(df, Seq(valueCol -> out), orderCols, numParts)

  /** [[withLag]] for several value columns over ONE shared order — a single
    * range shuffle and one boundary-carry join for all of them.
    */
  def withLags(df: DataFrame, valueToOut: Seq[(String, String)],
               orderCols: Seq[Column], numParts: Int = 32): DataFrame = {
    val r = ranged(df, orderCols, numParts)
    val lastPerPart = r.withColumn("_gr_maxrn",
        max(col(LRN)).over(Window.partitionBy(col(PID))))
      .filter(col(LRN) === col("_gr_maxrn"))
      .select(col(PID) +: valueToOut.map { case (v, _) =>
        col(v).as(s"_gr_last_$v") }: _*)
    // carry for partition p = last value of the previous non-empty
    // partition; empty partitions simply have no row here, so lag over
    // the tiny per-partition frame skips them naturally
    val tinyW = Window.orderBy(col(PID))
    val carry = valueToOut.foldLeft(lastPerPart) { case (d, (v, _)) =>
        d.withColumn(s"_gr_carry_$v", lag(s"_gr_last_$v", 1).over(tinyW))
      }.select(col(PID) +: valueToOut.map { case (v, _) =>
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
                 orderCols: Seq[Column], numParts: Int = 32): DataFrame = {
    val r = ranged(df, orderCols, numParts)
    val offsets = r.groupBy(col(PID)).agg(sum(valueCol).as("_gr_psum"))
      .withColumn("_gr_off", coalesce(sum("_gr_psum").over(
        Window.orderBy(col(PID))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col(PID), col("_gr_off"))
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
                orderCols: Seq[Column], numParts: Int = 32): DataFrame = {
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
