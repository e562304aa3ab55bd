package graft.ops

import graft.geo.Simplify
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Trajectory operators over per-line vertex streams (line_id, seq, lng,
  * lat) — the reference's polyline domain as batch analytics.
  */
object Trajectory {

  /** Douglas–Peucker simplification of every line (see [[Simplify]] for the
    * oracle-replicable split rule).
    *
    * Scale shape: one shuffle on `line_id` (lines are mutually independent);
    * each group holds ONE line's vertices in memory — the same per-feature
    * bound as GeoJSON reassembly (A4), fine for trails/routes, not for
    * continent-length lines (those need the split-apply-merge variant:
    * simplify fixed-size chunks, then simplify the chunk endpoints).
    */
  def simplify(lines: DataFrame, eps: Double): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .select(col("line_id").cast(LongType), col("seq").cast(LongType),
        col("lng").cast(DoubleType), col("lat").cast(DoubleType))
      .as[(Long, Long, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (lid, it) =>
        val pts = it.toArray.sortBy(_._2)
        val keep = Simplify.douglasPeucker(pts.map(_._3), pts.map(_._4), eps)
        pts.indices.iterator.filter(keep).map(i => (lid, pts(i)._2, pts(i)._3, pts(i)._4))
      }
      .toDF("line_id", "seq", "lng", "lat")
  }

  /** Split-apply Douglas–Peucker — the scale path [[simplify]]'s scaladoc
    * promises for continent-length lines: vertices chunk into runs of
    * `chunk` consecutive points in seq order, each boundary vertex SHARED
    * by both neighbouring chunks (so every chunk's DP anchors on its true
    * endpoints), exact DP runs per chunk with memory bounded by `chunk+1`
    * points regardless of line length, and the kept vertices union
    * (boundaries — always kept as chunk endpoints — dedup by distinct).
    *
    * Approximation contract (documented, deterministic): the result equals
    * exact DP applied to every chunk. Chords never span a chunk boundary,
    * so the ε tolerance holds globally, but up to one extra vertex per
    * boundary survives that whole-line DP might have dropped — the
    * standard split-apply trade.
    *
    * Scale shape: one window shuffle on `line_id` for the per-line rank,
    * one groupByKey shuffle on (line_id, chunk) — both key-bounded; no
    * group ever holds more than `chunk+1` vertices.
    */
  def simplifyChunked(lines: DataFrame, eps: Double, chunk: Int): DataFrame = {
    require(chunk >= 2, s"chunk must be >= 2, got $chunk")
    val spark = lines.sparkSession
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val w = Window.partitionBy("line_id").orderBy("seq")
    lines
      .select(col("line_id").cast(LongType), col("seq").cast(LongType),
        col("lng").cast(DoubleType), col("lat").cast(DoubleType))
      .withColumn("r", row_number().over(w) - 1)
      .withColumn("ck", explode(
        when(col("r") % chunk === 0 && col("r") > 0,
          array(expr(s"CAST(r DIV $chunk AS LONG) - 1"),
            expr(s"CAST(r DIV $chunk AS LONG)")))
          .otherwise(array(expr(s"CAST(r DIV $chunk AS LONG)")))))
      .select(col("line_id"), col("seq"), col("lng"), col("lat"), col("ck"))
      .as[(Long, Long, Double, Double, Long)]
      .groupByKey(t => (t._1, t._5))
      .flatMapGroups { (key: (Long, Long), it: Iterator[(Long, Long, Double, Double, Long)]) =>
        val lid = key._1
        val pts = it.toArray.sortBy(_._2)
        val keep = Simplify.douglasPeucker(pts.map(_._3), pts.map(_._4), eps)
        pts.indices.iterator.filter(keep)
          .map(i => (lid, pts(i)._2, pts(i)._3, pts(i)._4))
      }
      .toDF("line_id", "seq", "lng", "lat")
      .distinct()
  }

  /** Dwell (stay-point) detection: maximal runs of ≥ `minRun` CONSECUTIVE
    * samples of one trajectory inside one spatial cell — the stop-detection
    * primitive of trajectory mining (where did the device linger), with the
    * cell pre-assigned by the caller so the run semantics are pure
    * gaps-and-islands: `row_number() − row_number() within (traj, cell)` is
    * constant exactly along a consecutive same-cell run.
    *
    * Scale shape: two window passes keyed by the trajectory (state bounded
    * by one trajectory's history — the same per-key discipline as
    * sessionization) and one aggregation keyed by (traj, cell, run); no
    * joins, nothing quadratic.
    *
    * @param points (traj_id, ts, tie, cell) — `tie` breaks equal
    *               timestamps to a total order (pass a unique event id)
    * @return (traj_id, cell, n_events, ts_start, ts_end), runs ≥ minRun
    */
  def dwellRuns(points: DataFrame, minRun: Int): DataFrame = {
    require(minRun >= 2, s"minRun must be >= 2, got $minRun")
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val wAll = Window.partitionBy("traj_id").orderBy(col("ts"), col("tie"))
    val wCell = Window.partitionBy("traj_id", "cell")
      .orderBy(col("ts"), col("tie"))
    points
      .withColumn("rn", row_number().over(wAll))
      .withColumn("rc", row_number().over(wCell))
      .withColumn("grp", col("rn") - col("rc"))
      .groupBy("traj_id", "cell", "grp")
      .agg(count(lit(1)).cast("long").as("n_events"),
        min("ts").as("ts_start"), max("ts").as("ts_end"))
      .filter(col("n_events") >= minRun)
      .drop("grp")
  }

  /** Co-location (contact) join: pairs of trajectories observed in the SAME
    * spatial cell during the SAME time bucket, weighted by how many
    * distinct (cell, bucket) encounters they share — the contact-graph
    * primitive (proximity tracing, co-travel detection). Its output edge
    * list feeds [[Graph.pagerank]] / [[TextDedup.connectedComponentsStar]].
    *
    * Scale shape: the ONLY join is a self-equi-join keyed by
    * (cell, bucket) — the same bucketed discipline as the LSH band join;
    * never all-pairs. Within one bucket the k² pair fan-out IS the answer's
    * size; skewed mega-buckets (a stadium cell) should be capped upstream
    * by a per-bucket distinct-trajectory limit, exactly like LSH's maxDf.
    * The per-pair dedup (a pair counted once per encounter even with many
    * samples inside the bucket) happens BEFORE the pair join via distinct.
    *
    * @param points (traj_id, cell, tb) — cell + time bucket pre-assigned
    * @return (t1, t2, n_encounters) with t1 < t2
    */
  def colocation(points: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val obs = points.select(col("traj_id").cast("long"), col("cell"),
      col("tb")).distinct()
    obs.select(col("traj_id").as("t1"), col("cell"), col("tb"))
      .join(obs.select(col("traj_id").as("t2"), col("cell"), col("tb")),
        Seq("cell", "tb"))
      .filter(col("t1") < col("t2"))
      .groupBy("t1", "t2")
      .agg(count(lit(1)).cast("long").as("n_encounters"))
  }

  /** Origin–destination matrix: each trajectory contributes one flow from
    * the cell of its FIRST sample to the cell of its LAST (ordered by
    * (ts, tie) — total order, so the endpoints are unique), then flows
    * aggregate per (origin, destination) cell pair — the mobility-analytics
    * rollup (commute flows, tile-to-tile demand).
    *
    * Scale shape: ONE window shuffle keyed by the trajectory extracts both
    * endpoints in a single pass (first/last over the full frame — no
    * struct-typed min/max aggregate, which Spark's hash aggregate rejects
    * and would silently degrade to a SortAggregate), a per-trajectory
    * dedupe, and the (o, d) count. State per key is one row; nothing
    * quadratic, no joins.
    *
    * @param points (traj_id, ts, tie, cell)
    * @return (o_cell, d_cell, n_traj)
    */
  def odMatrix(points: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy("traj_id").orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    points
      .select(col("traj_id"),
        first("cell").over(w).as("o_cell"),
        last("cell").over(w).as("d_cell"))
      .distinct()
      .groupBy("o_cell", "d_cell")
      .agg(count(lit(1)).cast("long").as("n_traj"))
  }
}
