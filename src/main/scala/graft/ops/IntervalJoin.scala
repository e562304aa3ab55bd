package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-overlap join — "which left intervals overlap which right
  * intervals" without a cartesian plan, the temporal sibling of the
  * within-distance join (SpatialJoin.withinDistance): time plays the role
  * of space and fixed-width bins play the role of hex cells.
  *
  * Each interval explodes to the bins it covers (replication factor
  * `len/binWidth + 1` — pick binWidth near the median interval length),
  * candidates come from ONE equi-join on `bin`, and the exact overlap
  * predicate refines. A pair sharing several bins is emitted EXACTLY ONCE
  * without any distinct shuffle: only the first bin both intervals cover —
  * `bin == max(lbin_start, rbin_start)` — may emit it (the standard
  * dedup-by-first-bin trick from published range-join designs).
  *
  * 100 TB shape: the only shuffle keys on `bin` (time-bounded, naturally
  * ordered — parquet min/max on the start column prunes historic
  * partitions); a hot bin (burst of events) salts exactly like a hot
  * spatial cell. Long-tailed interval lengths bound replication at
  * `maxLen/binWidth`; split pathological intervals first if that is
  * unbounded.
  */
object IntervalJoin {

  /** Overlap join of `left` (l_id, l_s, l_e) against `right` (r_id, r_s,
    * r_e) — integer timestamps (e.g. epoch millis), CLOSED intervals with
    * s <= e, unique ids per side. Overlap: l_s <= r_e AND r_s <= l_e
    * (touching endpoints count, overlap 0).
    *
    * @return (l_id, r_id, overlap_ms = min(l_e, r_e) − max(l_s, r_s) ≥ 0)
    */
  def overlapJoin(left: DataFrame, right: DataFrame, binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val l = left.select(col("l_id").cast("long"), col("l_s").cast("long"),
        col("l_e").cast("long"))
      .withColumn("bin",
        explode(sequence(expr(s"l_s DIV $binWidth"), expr(s"l_e DIV $binWidth"))))
    val r = right.select(col("r_id").cast("long"), col("r_s").cast("long"),
        col("r_e").cast("long"))
      .withColumn("bin",
        explode(sequence(expr(s"r_s DIV $binWidth"), expr(s"r_e DIV $binWidth"))))
    l.join(r, Seq("bin"))
      .filter(col("l_s") <= col("r_e") && col("r_s") <= col("l_e"))
      .filter(col("bin") ===
        greatest(expr(s"l_s DIV $binWidth"), expr(s"r_s DIV $binWidth")))
      .select(col("l_id"), col("r_id"),
        (least(col("l_e"), col("r_e")) - greatest(col("l_s"), col("r_s")))
          .as("overlap_ms"))
  }

  /** Per-key interval UNION — total covered length with overlaps merged,
    * the uptime / SLA / "distinct busy time" aggregate that a plain
    * `sum(end − start)` double-counts: the classic line-sweep expressed
    * as ONE window pass. A row starts a new merged segment iff its start
    * exceeds the running max of all previous ends (ends may regress under
    * the start ordering, hence the running MAX, not lag); the cumulative
    * count of starts is the segment id; each merged segment contributes
    * `max(end) − min(start)`.
    *
    * 100 TB shape: one shuffle on `key` shared by both window passes and
    * the final agg (same partitioning, Catalyst reuses the exchange);
    * per-key state is the sort — no self-join, no explode, no
    * all-pairs. Exact integer arithmetic end to end.
    *
    * @param df  (key, s, e) integer interval bounds, e >= s
    * @return (key, n_iv, n_seg, covered, span) — n_iv raw intervals,
    *         n_seg merged segments, covered = Σ merged lengths,
    *         span = max(e) − min(s)
    */
  def intervalUnion(df: DataFrame, key: String, s: String, e: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(key).orderBy(col(s), col(e))
    val prevMax = max(col(e)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val seg = df
      .withColumn("__new",
        when(prevMax.isNull || col(s) > prevMax, lit(1L)).otherwise(lit(0L)))
      .withColumn("__seg", sum(col("__new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    seg.groupBy(col(key), col("__seg"))
      .agg(count(lit(1)).as("n_iv"), min(col(s)).as("ss"),
        max(col(e)).as("ee"))
      .groupBy(key)
      .agg(sum("n_iv").as("n_iv"), count(lit(1)).as("n_seg"),
        sum(col("ee") - col("ss")).as("covered"),
        (max("ee") - min("ss")).as("span"))
  }
}
