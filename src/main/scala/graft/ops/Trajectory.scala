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
}
