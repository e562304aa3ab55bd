package graft
package queries

import graft.core.{FeatureRow, GeoJson, TileRow}
import graft.functions.cells
import graft.functions.raster._
import graft.functions.spatial._
import graft.ops.Elevation
import graft.synth.TileGen
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}

import Fixtures._
import OracleCtes._
import OracleCtes2._

/** Geospatial gates: tiling, elevation sampling, spatial joins, terrain, cells
  * (43 entries) with the DuckDB oracle SQL beside each query.
  * Moved verbatim from SparkEntry (round-5 split, VERDICT r4 #5).
  */
object QGeo2 {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "geo_line_intersect" -> ((s, dir) => {
      val base = t(s, dir, "lineitem").filter(col("l_orderkey") % 50 <= 1)
        .selectExpr(
          "((l_orderkey*8 + l_linenumber)*2000 + l_partkey)*100 + l_suppkey AS seg_id",
          "l_orderkey % 50 AS grp",
          "-119.5 + ((l_partkey % 501))/1000.0D AS x1",
          "36.2 + (((l_suppkey*7) % 501))/1000.0D AS y1",
          "((l_suppkey % 41) - 20)/2000.0D AS dx",
          "(((l_orderkey*3) % 41) - 20)/2000.0D AS dy")
        .selectExpr("seg_id", "grp", "x1", "y1",
          "x1 + dx AS x2", "y1 + dy AS y2")
      val a = base.filter(col("grp") === 0).drop("grp")
      val b = base.filter(col("grp") === 1).drop("grp")
      ops.SpatialJoin.segmentIntersectJoin(a, b, cellSize = 0.02)
        .orderBy("a_id", "b_id")
    }),
    // Per-group convex hull (coverage footprint): 25 groups of ≤ 40 integer
    // points; the minimal vertex set is exact-Long geometry, so the oracle
    // re-derives it from the Carathéodory characterization. The custkey cap
    // keeps the oracle's O(n⁴) certificate tractable — the ENGINE side is
    // one group-keyed shuffle at any scale.,
    "geo_convex_hull" -> ((s, dir) => {
      val pts = t(s, dir, "customer").filter(col("c_custkey") <= 1000)
        .selectExpr("c_custkey % 25 AS gid",
          "(c_custkey * 7) % 1201 AS x", "(c_custkey * 13) % 1009 AS y")
      ops.SpatialJoin.convexHullPerGroup(pts).orderBy("gid", "x", "y")
    }),
    // Hull diameter per group: the farthest pair, computed on the HULL
    // vertices only (all max-distance pairs are hull vertices — distance
    // along a segment is strictly convex, so interior/edge points never
    // tie a vertex pair) — hull size ≪ point count is what makes the
    // all-pairs refine scale; the oracle brute-forces ALL distinct point
    // pairs, which must agree by that argument. Deterministic argmax by
    // (d2 desc, ax, ay, bx, by).,
    "geo_hull_diameter" -> ((s, dir) => {
      val pts = t(s, dir, "customer").filter(col("c_custkey") <= 1000)
        .selectExpr("c_custkey % 25 AS gid",
          "(c_custkey * 7) % 1201 AS x", "(c_custkey * 13) % 1009 AS y")
      val hull = ops.SpatialJoin.convexHullPerGroup(pts)
      val pairs = hull.select(col("gid"), col("x").as("ax"), col("y").as("ay"))
        .join(hull.select(col("gid"), col("x").as("bx"), col("y").as("by")),
          Seq("gid"))
        .filter(col("ax") < col("bx") ||
          (col("ax") === col("bx") && col("ay") < col("by")))
        .withColumn("d2", expr(
          "(ax - bx) * (ax - bx) + (ay - by) * (ay - by)"))
      val best = pairs.withColumn("rn", row_number().over(
          Window.partitionBy("gid").orderBy(col("d2").desc, col("ax"),
            col("ay"), col("bx"), col("by"))))
        .filter(col("rn") === 1).drop("rn")
      val n = pts.distinct().groupBy("gid").agg(count(lit(1)).as("n_pts"))
      best.join(n, Seq("gid"))
        .select("gid", "n_pts", "d2", "ax", "ay", "bx", "by")
        .orderBy("gid")
    }),
    // Distributed power iteration (3 rounds of integer-exact Xᵀ(Xv)) for
    // the corpus's top principal direction.,
    "geo_curvature" -> ((s, dir) => {
      val bc = ops.TileIndex.broadcastIndex(gateTiles(s))
      gatePoints(s, dir)
        .withColumn("lap",
          ops.ElevAt.elev_curvature(col("lng"), col("lat"), bc).cast("long"))
        .select("point_id", "lap")
        .orderBy("point_id")
    }),
    "geo_tri" -> ((s, dir) => {
      val bc = ops.TileIndex.broadcastIndex(gateTiles(s))
      gatePoints(s, dir)
        .withColumn("tri", ops.ElevAt.elev_tri(col("lng"), col("lat"), bc).cast("long"))
        .select("point_id", "tri")
        .orderBy("point_id")
    }),
    // Topographic position index (×24, exact integer): centre node vs its
    // 5×5 neighbourhood mean — positive = ridgetop, negative = valley
    // bottom, ~0 = planar slope; the landform classifier next to geo_tri's
    // unsigned ruggedness. Same broadcast-index codegen probe, zero shuffle.,
    "geo_tpi" -> ((s, dir) => {
      val bc = ops.TileIndex.broadcastIndex(gateTiles(s))
      gatePoints(s, dir)
        .withColumn("tpi24", ops.ElevAt.elev_tpi(col("lng"), col("lat"), bc).cast("long"))
        .select("point_id", "tpi24")
        .orderBy("point_id")
    }),
    // Map algebra: aspect octant — dominant compass direction of the
    // downslope vector from the central-difference gradient, quantized to
    // 8 sectors (+0 flat) so there is no atan2 ulp risk cross-engine.,
    "geo_aspect" -> ((s, dir) => {
      val bc = ops.TileIndex.broadcastIndex(gateTiles(s))
      gatePoints(s, dir)
        .withColumn("aspect", ops.ElevAt.elev_aspect(col("lng"), col("lat"), bc).cast("long"))
        .select("point_id", "aspect")
        .orderBy("point_id")
    }),
    // Vector analytics: shoelace area / perimeter / area-weighted centroid
    // per polygon ring, composed from built-in higher-order functions (an
    // in-order fold the oracle replicates term-for-term).,
    "geo_area" -> ((s, dir) => {
      trianglePolys(s, dir)
        .select(col("poly_id"),
          polygon_area(col("xs"), col("ys")).as("area"),
          polygon_perimeter(col("xs"), col("ys")).as("perimeter"),
          polygon_centroid_x(col("xs"), col("ys")).as("cxc"),
          polygon_centroid_y(col("xs"), col("ys")).as("cyc"))
        .orderBy("poly_id")
    }),

    // ---- checkpoint / lineage (north rule: partition-granular resume) ----
    // Writes orders through the resumable bucketed writer, killing the run
    // after 3 of 12 bucket commits, then resumes and reads the table back.
    // The oracle sees the same aggregate as a direct query — proving the
    // kill/resume produced exactly-once content.,
    "geo_ring_buffer" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pts = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          ((col("event_id") % 7) +
            when(col("event_id") % 101 === 0, 5000L).otherwise(0L)).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
      val ctr = s.createDataFrame(stIncidents)
        .toDF("center_id", "ix", "iy", "its").drop("its")
      pts.crossJoin(broadcast(ctr))
        .withColumn("d2", expr(
          "(px - ix) * (px - ix) + (py - iy) * (py - iy)"))
        .withColumn("ring", expr(
          "CASE WHEN d2 <= 2500 THEN 1 WHEN d2 <= 10000 THEN 2 " +
            "WHEN d2 <= 40000 THEN 3 WHEN d2 <= 160000 THEN 4 END"))
        .filter(col("ring").isNotNull)
        .groupBy("center_id", "ring")
        .agg(count(lit(1)).as("n_fixes"),
          countDistinct("user_id").as("n_traj"))
        .orderBy("center_id", "ring")
    }),
    // recall@5 of the trained+refined IVF-PQ vs the exact L2 baseline —
    // the acceptance gate for the training loop (VERDICT r3: within ~0.1
    // of the probe ceiling, vs the demo codebook's 0.024; measured 0.608
    // against the trained coarse ceiling 0.624 at sf0.01).,
    "geo_clark_evans" -> ((s, dir) => {
      val pts = t(s, dir, "customer").filter(col("c_custkey") <= 500)
        .selectExpr("c_custkey AS pid", "(c_custkey * 7) % 1201 AS x",
          "(c_custkey * 13) % 1009 AS y")
      val nn = pts.as("a").join(pts.as("b"),
          col("a.pid") =!= col("b.pid"))
        .select(col("a.pid").as("pid"),
          expr("(a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)")
            .as("d2"))
        .groupBy("pid").agg(min("d2").as("nn_d2"))
        .withColumn("nn_d_milli", expr(
          "CAST(floor(sqrt(CAST(nn_d2 AS DOUBLE)) * 1000.0) AS BIGINT)"))
      nn.agg(count(lit(1)).as("n"),
          sum("nn_d_milli").as("sum_nn_d_milli"),
          min("nn_d2").as("min_nn_d2"), max("nn_d2").as("max_nn_d2"))
        .crossJoin(pts.agg(
          (max("x") - min("x")).as("extent_x"),
          (max("y") - min("y")).as("extent_y")))
    }),
    // Histogram-matching LUT between epochs: quantized-level CDFs of the
    // curvy field (A) and the plane (B), mapped(l) = min m with
    // cdf_B(m) ≥ cdf_A(l) — the radiometric-normalization table a mosaic
    // build applies before compositing. Stats-only theta join (≤ 64×64
    // per image).,
    "geo_mann_kendall" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pts = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          ((col("event_id") % 7) +
            when(col("event_id") % 101 === 0, 5000L).otherwise(0L)).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
      val daily = pts.groupBy(expr("px DIV 200").as("cell_x"),
          expr("py DIV 50").as("cell_y"),
          date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("c"))
      val srt = daily.withColumn("i", row_number().over(
        Window.partitionBy("cell_x", "cell_y").orderBy("day")).cast("long"))
      val prs = srt.as("a").join(srt.as("b"),
          col("a.cell_x") === col("b.cell_x") &&
            col("a.cell_y") === col("b.cell_y") && col("a.i") < col("b.i"))
        .select(col("a.cell_x").as("cell_x"), col("a.cell_y").as("cell_y"),
          expr("CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 " +
            "ELSE 0 END").cast("long").as("sgn"))
      val sa = prs.groupBy("cell_x", "cell_y")
        .agg(sum("sgn").as("s_stat"), count(lit(1)).as("n_pairs"))
      val nd = srt.groupBy("cell_x", "cell_y")
        .agg(count(lit(1)).as("n_days"))
      val tt = srt.groupBy("cell_x", "cell_y", "c")
        .agg(count(lit(1)).as("t"))
        .groupBy("cell_x", "cell_y")
        .agg(sum(expr("t * (t - 1) * (2 * t + 5)")).as("tie_term"))
      nd.join(sa, Seq("cell_x", "cell_y"))
        .join(tt, Seq("cell_x", "cell_y"))
        .withColumn("trend", expr(
          "CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END"))
        .orderBy("cell_x", "cell_y")
    }),
    // Winsorized robust rollup per type: nearest-rank p5/p95 fences, the
    // clamped sum and both clamp counts — the outlier-resistant revenue
    // aggregate next to events_mad/events_iqr's detection reads. Two
    // windows + one broadcast-back join.,
    "geo_sector_cover" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pts = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          ((col("event_id") % 7) +
            when(col("event_id") % 101 === 0, 5000L).otherwise(0L)).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
        .selectExpr("user_id AS traj_id", "px", "py")
      val ants = s.createDataFrame(sectorAntennas)
        .toDF("antenna_id", "cx", "cy", "d1x", "d1y", "d2x", "d2y", "r2")
      pts.crossJoin(broadcast(ants))
        .withColumn("vx", col("px") - col("cx"))
        .withColumn("vy", col("py") - col("cy"))
        .withColumn("inside",
          expr("d1x * vy - d1y * vx >= 0 AND vx * d2y - vy * d2x >= 0 " +
            "AND vx * vx + vy * vy <= r2"))
        .groupBy("antenna_id")
        .agg(count(lit(1)).as("n_pts"),
          sum(when(col("inside"), 1L).otherwise(0L)).as("n_in"),
          countDistinct(when(col("inside"), col("traj_id"))).as("n_traj"))
        .orderBy("antenna_id")
    }),
    // Dominant periodicity pick (the beat/cadence read): per asset the
    // window-energy autocorrelation at lags 2..16, scored by the floored
    // per-term mean product so unequal overlap counts compare fairly;
    // argmax by (score desc, lag). One key-bounded band self-join.,
    "geo_st_join" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pts = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          ((col("event_id") % 7) +
            when(col("event_id") % 101 === 0, 5000L).otherwise(0L)).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
        .withColumn("tus", expr("unix_micros(CAST(ts AS TIMESTAMP))"))
      val inc = s.createDataFrame(stIncidents)
        .toDF("inc_id", "ix", "iy", "its")
        .withColumn("itus", expr("unix_micros(CAST(its AS TIMESTAMP))"))
      pts.crossJoin(broadcast(inc))
        .withColumn("d2", expr(
          "(px - ix) * (px - ix) + (py - iy) * (py - iy)"))
        .withColumn("near",
          col("d2") <= 2500L && abs(col("tus") - col("itus")) <= 43200000000L)
        .groupBy("inc_id")
        .agg(count(lit(1)).as("n_fixes"),
          sum(when(col("near"), 1L).otherwise(0L)).as("n_near"),
          countDistinct(when(col("near"), col("user_id"))).as("n_traj"),
          min(when(col("near"), col("d2"))).as("min_d2"))
        .orderBy("inc_id")
    }),
    // Partition-spec evolution pruning audit: half the files live under
    // the OLD range spec (identity min/max pruning), half under the NEW
    // hash spec (bucket pruning) — point queries prune both; RANGE
    // queries prune only the range spec (hash must scan all) — the exact
    // trade an Iceberg spec migration buys and loses, as one stats-only
    // broadcast join.,
    "geo_cover_redundancy" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pts = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          ((col("event_id") % 7) +
            when(col("event_id") % 101 === 0, 5000L).otherwise(0L)).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
        .withColumn("fix_id",
          expr("user_id * 1000000 + event_id"))
      val ants = s.createDataFrame(sectorAntennas)
        .toDF("antenna_id", "cx", "cy", "d1x", "d1y", "d2x", "d2y", "r2")
      pts.crossJoin(broadcast(ants))
        .withColumn("vx", col("px") - col("cx"))
        .withColumn("vy", col("py") - col("cy"))
        .withColumn("inside",
          expr("d1x * vy - d1y * vx >= 0 AND vx * d2y - vy * d2x >= 0 " +
            "AND vx * vx + vy * vy <= r2"))
        .groupBy("fix_id")
        .agg(sum(when(col("inside"), 1L).otherwise(0L)).as("n_covering"))
        .groupBy("n_covering").agg(count(lit(1)).as("n_fixes"))
        .orderBy("n_covering")
    }),
    // Two-NN ratio histogram (Facco et al. intrinsic-dimension input):
    // per vector the 1st/2nd neighbour squared-distance ratio ×1000
    // (floored), bucketed — flat near 1000 means high intrinsic
    // dimension; the manifold-dimension read over ann_dim_variance's
    // axis view.,
    "geo_winding_rule" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val (upSql, dnSql) = ringCrossingsSql(bowtieRing)
      val pts = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          ((col("event_id") % 7) +
            when(col("event_id") % 101 === 0, 5000L).otherwise(0L)).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
      pts.withColumn("up", expr(upSql)).withColumn("dn", expr(dnSql))
        .withColumn("evenodd", (col("up") + col("dn")) % 2 === 1)
        .withColumn("nonzero", (col("up") - col("dn")) =!= 0)
        .groupBy(col("user_id").as("traj_id"))
        .agg(count(lit(1)).as("n_pts"),
          sum(when(col("evenodd"), 1L).otherwise(0L)).as("n_evenodd"),
          sum(when(col("nonzero"), 1L).otherwise(0L)).as("n_nonzero"),
          sum(when(col("evenodd") =!= col("nonzero"), 1L).otherwise(0L))
            .as("n_disagree"))
        .orderBy("traj_id")
    }),
    // Component-size distribution (large-star/small-star CC + histogram):
    // the dedup-blast-radius read — how many merge groups of each size a
    // connected-components pass produces; O(log n) CC rounds, two
    // key-bounded rollups.,
    "geo_cell_turnover" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pts = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          ((col("event_id") % 7) +
            when(col("event_id") % 101 === 0, 5000L).otherwise(0L)).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
      val cells = pts.select(
          expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000")
            .as("eday"),
          expr("px DIV 200").as("cell_x"), expr("py DIV 50").as("cell_y"))
        .distinct()
      val sz = cells.groupBy("eday").agg(count(lit(1)).as("n_cells"))
      val common = cells.as("a").join(cells.as("b"),
          col("a.cell_x") === col("b.cell_x") &&
            col("a.cell_y") === col("b.cell_y") &&
            col("b.eday") === col("a.eday") + 1)
        .groupBy(col("b.eday").as("eday"))
        .agg(count(lit(1)).as("n_common"))
      sz.as("t").join(sz.as("p"), col("p.eday") === col("t.eday") - 1)
        .select(col("t.eday").as("eday"), col("t.n_cells").as("n_cells"),
          col("p.n_cells").as("n_prev"))
        .join(common, Seq("eday"), "left")
        .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
        .withColumn("jaccard_ppm", expr(
          "n_common * 1000000 DIV (n_cells + n_prev - n_common)"))
        .orderBy("eday")
    }),
    // Cycle-space dimension (cyclomatic number m − n + c): edges, nodes
    // and star-CC component count in one row — how far from a forest the
    // graph is, the redundancy read under graph_mst's spanning forest.,
    "geo_hypsometric" -> ((s, dir) => {
      val h = ops.ImageOps.levelHistogram(gateTiles(s, "png"))
      val wc = Window.partitionBy("image_id").orderBy("level")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = h.groupBy("image_id").agg(sum("n").as("n_px"))
      val cum = h.withColumn("cum", sum("n").over(wc))
        .join(tot, Seq("image_id"))
      val dec = s.createDataFrame((1 to 9).map(d => Tuple1(d.toLong)))
        .toDF("decile")
      cum.crossJoin(broadcast(dec))
        .filter(expr("cum * 10 >= n_px * decile"))
        .groupBy("image_id", "decile")
        .agg(min("level").as("level"))
        .withColumn("decile", col("decile").cast("int"))
        .orderBy("image_id", "decile")
    }),
    // Truncated absorbing-chain expected steps: transition shares in ppm
    // (floored), E' = 1 + P·E unrolled 6 rounds with 'purchase' absorbing
    // — "how many events until a purchase from each state", the
    // analytic layer over events_transition's raw matrix.,
    "geo_access_quantiles" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pts = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          ((col("event_id") % 7) +
            when(col("event_id") % 101 === 0, 5000L).otherwise(0L)).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
      val ctr = s.createDataFrame(stIncidents)
        .toDF("center_id", "ix", "iy", "its").drop("its")
      val md = pts.crossJoin(broadcast(ctr))
        .withColumn("d2", expr(
          "(px - ix) * (px - ix) + (py - iy) * (py - iy)"))
        .groupBy(col("user_id").as("traj_id"), col("event_id"))
        .agg(min("d2").as("min_d2"))
      val wv = Window.partitionBy("traj_id").orderBy("min_d2", "event_id")
      val wp = Window.partitionBy("traj_id")
      md.withColumn("rn", row_number().over(wv).cast("long"))
        .withColumn("n", count(lit(1)).over(wp))
        .groupBy("traj_id")
        .agg(max("n").as("n_fixes"),
          max(when(col("rn") === expr("(n - 1) * 50 DIV 100 + 1"),
            col("min_d2"))).as("p50_d2"),
          max(when(col("rn") === expr("(n - 1) * 95 DIV 100 + 1"),
            col("min_d2"))).as("p95_d2"))
        .orderBy("traj_id")
    }),
    // Week-over-week growth: per type the weekly counts (epoch-week,
    // engine-neutral) with lagged growth ppm — the BI trend table above
    // events_wau's snapshot.,
    "geo_sector_overlap" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pts = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          ((col("event_id") % 7) +
            when(col("event_id") % 101 === 0, 5000L).otherwise(0L)).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
        .withColumn("fix_id", expr("user_id * 1000000 + event_id"))
      val ants = s.createDataFrame(sectorAntennas)
        .toDF("antenna_id", "cx", "cy", "d1x", "d1y", "d2x", "d2y", "r2")
      val m = pts.crossJoin(broadcast(ants))
        .filter(expr("d1x * (py - cy) - d1y * (px - cx) >= 0 AND " +
          "(px - cx) * d2y - (py - cy) * d2x >= 0 AND " +
          "(px - cx) * (px - cx) + (py - cy) * (py - cy) <= r2"))
        .select(col("fix_id"), col("antenna_id"))
      m.as("x").join(m.as("y"),
          col("x.fix_id") === col("y.fix_id") &&
            col("x.antenna_id") < col("y.antenna_id"))
        .groupBy(col("x.antenna_id").as("ant_a"),
          col("y.antenna_id").as("ant_b"))
        .agg(count(lit(1)).as("n_common"))
        .orderBy("ant_a", "ant_b")
    }),
    // Per-trajectory speed quantiles: exact integer µunit/s Manhattan
    // speeds per segment, nearest-rank p50/p95 — the mobility profile
    // over traj_speed's binary flags.,
    "zxy_rollup" -> ((s, dir) => {
      val p = gatePoints(s, dir)
        .withColumn("x14", zxy_x(col("lng"), lit(14)))
        .withColumn("y14", zxy_y(col("lat"), lit(14)))
      p.select(lit(14).as("z"), col("x14").as("x"), col("y14").as("y"))
        .unionAll(p.select(lit(12).as("z"), shiftright(col("x14"), 2).as("x"),
          shiftright(col("y14"), 2).as("y")))
        .unionAll(p.select(lit(10).as("z"), shiftright(col("x14"), 4).as("x"),
          shiftright(col("y14"), 4).as("y")))
        .groupBy("z", "x", "y").agg(count(lit(1)).as("n"))
        .orderBy("z", "x", "y")
    }),
    // Semi/anti-join (dedup keep-set): documents whose text hash appears
    // more than once lose all but the lowest doc_id.,
    "geo_elev_diff" -> ((s, dir) => {
      import s.implicits._
      val corners = Seq((-120, 36), (-120, 37), (-119, 36), (-119, 37),
        (-118, 36), (-117, 37))
      val epochA = s.createDataset(TileGen.tiles(corners, 601, "hgt"))
      val epochB = s.createDataset(corners.map { case (lng, lat) =>
        TileGen.tileRow(lng, lat, 601, "hgt", TileGen.planeAt) })
      ops.ImageOps.changeStats(epochA, epochB, threshold = 600)
        .orderBy("image_id")
    }),
    // Blockwise joint moments of the two epochs (ops.ImageOps.nccBlocks):
    // the NCC/SSIM sufficient statistics (n, Σa, Σb, Σa², Σb², Σab) per
    // 100×100 window — change LOCALIZATION next to geo_elev_diff's
    // whole-tile verdict; exact integers, decode-once, pixels never
    // shuffle.,
    "zonal_crosstab" -> ((s, dir) => {
      import s.implicits._
      val corners = Seq((-120, 36), (-120, 37), (-119, 36), (-119, 37),
        (-118, 36), (-117, 37))
      val epochA = s.createDataset(TileGen.tiles(corners, 601, "hgt"))
      val epochB = s.createDataset(corners.map { case (lng, lat) =>
        TileGen.tileRow(lng, lat, 601, "hgt", TileGen.planeAt) })
      ops.ImageOps.crosstab(epochA, epochB, binWidth = 512)
        .orderBy("image_id", "zone_a", "zone_b")
    }),
    // Variance-of-Laplacian focus measure (ops.ImageOps.blurStats): the
    // standard blur filter of image curation, exact integer moments so the
    // sharpness ranking needs no float division. Decode-once, zero shuffle.,
    "zonal_cutfill" -> ((s, dir) => {
      import s.implicits._
      val corners = Seq((-120, 36), (-120, 37), (-119, 36), (-119, 37),
        (-118, 36), (-117, 37))
      val epochA = s.createDataset(TileGen.tiles(corners, 601, "hgt"))
      val epochB = s.createDataset(corners.map { case (lng, lat) =>
        TileGen.tileRow(lng, lat, 601, "hgt",
          (sw, sl, r, c) => (TileGen.planeAt(sw, sl, r, c) + 900).toShort) })
      ops.ImageOps.cutFill(epochA, epochB)
        .orderBy("image_id", "zr", "zc")
    }),
    // Center-surround SALIENCY census (difference-of-box-means, exact by
    // cross-multiplication: |s3/9 − s9/81| ≥ t ⇔ |9·s3 − s9| ≥ 81·t): the
    // attention/figure-ground screen; integer box sums on the stride-6
    // lattice, threshold 2000 in the cross-multiplied units.,
    "geo_intervisibility" -> ((s, dir) => {
      val prof = ops.ImageOps.rowProfile(gateTiles(s, "png"), row = 300)
        .filter(col("image_id") === "N36W120")
      val st = prof.filter(col("c") % 50 === 0 && col("c") > 0 &&
        col("c") <= 500)
      val pairs = st.select(col("c").as("ca"), col("v").as("va"))
        .join(st.select(col("c").as("cb"), col("v").as("vb")),
          col("ca") < col("cb"))
      pairs.join(prof.select(col("c"), col("v")),
          col("c") > col("ca") && col("c") < col("cb"))
        .withColumn("above",
          expr("v * (cb - ca) > va * (cb - c) + vb * (c - ca)"))
        .groupBy("ca", "cb", "va", "vb")
        .agg(count(lit(1)).as("n_between"),
          sum(when(col("above"), 1L).otherwise(0L)).as("n_above"))
        .withColumn("visible", col("n_above") === 0L)
        .orderBy("ca", "cb")
    }),
    // Keystone/skew audit (ops.ImageOps.keystone): row-centroid drift
    // slope numerators — the rectification QA next to img_deskew's
    // projection-profile angle.,
    "geo_centroid_drift" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pts = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          ((col("event_id") % 7) +
            when(col("event_id") % 101 === 0, 5000L).otherwise(0L)).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
      val daily = pts.groupBy(date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"), sum("px").as("sx"), sum("py").as("sy"))
        .withColumn("cx_milli", expr("sx * 1000 DIV n"))
        .withColumn("cy_milli", expr("sy * 1000 DIV n"))
      // global window input is the per-day aggregate: the frame is
      // bounded by the calendar span, not the row count
      val wd = Window.partitionBy(ops.GlobalRank.boundedPartitionKey(col("day"))).orderBy("day")
      daily.withColumn("pcx", lag("cx_milli", 1).over(wd))
        .withColumn("pcy", lag("cy_milli", 1).over(wd))
        .withColumn("drift_d2_milli", expr(
          "CASE WHEN pcx IS NULL THEN NULL ELSE " +
            "(cx_milli - pcx) * (cx_milli - pcx) + " +
            "(cy_milli - pcy) * (cy_milli - pcy) END"))
        .select("day", "n", "cx_milli", "cy_milli", "drift_d2_milli")
        .orderBy("day")
    }),
    // Degree-inequality Gini pieces: ranked-degree weighted sums — is
    // attention concentrated in hubs? The events_gini read on graph
    // structure; one rank window over |V| rows.,
    "geo_horizon_angle" -> ((s, dir) => {
      val prof = ops.ImageOps.rowProfile(gateTiles(s, "png"), row = 300)
        .filter(col("image_id") === "N36W120")
      val obs = prof.filter(col("c").isin(100L, 300L, 500L))
        .select(col("c").as("c0"), col("v").as("v0"))
      obs.join(prof.select(col("c"), col("v")), col("c") > col("c0"))
        .withColumn("angle_q", expr(
          "((v - v0 + 4000 * (c - c0)) * 1000000) DIV (c - c0) " +
            "- 4000000000"))
        .withColumn("rn", row_number().over(Window.partitionBy("c0")
          .orderBy(col("angle_q").desc, col("c"))))
        .filter(col("rn") === 1)
        .select(col("c0"), col("v0"), col("c").as("horizon_c"),
          col("v").as("horizon_v"), col("angle_q"))
        .orderBy("c0")
    }),
    // Per-user Fano dispersion of daily activity: variance/mean numerator
    // and denominator exact, milli-floored index — bursty users (>1000)
    // vs metronomes (<1000); users with ≥ 2 active days.,
    "geo_curve_locality" -> ((s, dir) => {
      val pts = quadrantPoints(s, dir)
        .withColumn("qx", expr("LEAST(255, GREATEST(0, " +
          "CAST(floor(((lng + 180.0D) / 360.0D) * 256.0D) AS BIGINT)))"))
        .withColumn("qy", expr("LEAST(255, GREATEST(0, " +
          "CAST(floor(((lat + 90.0D) / 180.0D) * 256.0D) AS BIGINT)))"))
        .withColumn("hkey", cells.hilbert_key(col("lng"), col("lat")))
        .withColumn("mkey", expr(mortonSql("qx", "qy", "DIV")))
      def jumps(keyCol: String, nm: String) = {
        // point-scaled rows: adjacent-in-curve-order deltas via the
        // range-partitioned two-phase lag with boundary carry
        // (ops.GlobalRank), one range shuffle for both lagged columns
        ops.GlobalRank.withLags(pts,
            Seq("qx" -> "pqx", "qy" -> "pqy"),
            Seq(col(keyCol), col("point_id")))
          .filter(col("pqx").isNotNull)
          .agg(sum(expr("abs(qx - pqx) + abs(qy - pqy)"))
              .as(s"${nm}_jump"),
            max(expr("abs(qx - pqx) + abs(qy - pqy)")).as(s"${nm}_max"))
      }
      pts.agg(count(lit(1)).as("n_pts"))
        .crossJoin(jumps("hkey", "hilbert"))
        .crossJoin(jumps("mkey", "morton"))
    }),
    // Weekday-profile distance matrix: per type the day-of-week share
    // vector in exact ppm, pairwise L1 — which behaviors share a weekly
    // rhythm; 7-dim stats joins only.,
    "geo_grid_crossings" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pts = t(s, dir, "events").filter(col("user_id") < 50)
        .select(col("user_id"), col("ts"), col("event_id"),
          ((col("event_id") % 7) +
            when(col("event_id") % 101 === 0, 5000L).otherwise(0L)).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
      val seg = pts
        .withColumn("ppx", lag("px", 1).over(w))
        .withColumn("ppy", lag("py", 1).over(w))
        .filter(col("ppx").isNotNull)
        .withColumn("cx", expr("abs(px DIV 64 - ppx DIV 64)"))
        .withColumn("cy", expr("abs(py DIV 16 - ppy DIV 16)"))
      seg.groupBy(col("user_id").as("traj_id"))
        .agg(count(lit(1)).as("n_seg"),
          sum("cx").as("cross_x"), sum("cy").as("cross_y"),
          max(expr("cx + cy")).as("max_seg_cross"))
        .orderBy("traj_id")
    }),
    // NFD compaction bin packing (ops.Curation.binPackNfd): per table
    // partition, manifest files sorted (size desc, id) fill 512-unit bins
    // greedily — the OPTIMIZE plan next to store_overlap_depth's trigger
    // metric; the oracle walks the identical recurrence as a recursive
    // CTE. Key-bounded mapGroups over metadata-scale rows.,
    "geo_contours" -> ((s, dir) => {
      ops.ImageOps.contourCensus(gateTiles(s), 1800).orderBy("image_id")
    }),
    // Geometric augmentation (flip_h/flip_v/rot90) pinned by
    // position-WEIGHTED moments (Σ v·r, Σ v·c): the engine permutes the
    // grid, re-encodes HGT, re-decodes and sums; the oracle derives the
    // transformed moments from the closed-form grid via the permutation
    // identities (e.g. flip_h: c_moment' = m·Σv − c_moment). The 'none'
    // lane anchors the base moments through the same decode path.,
    "geo_idw_loocv" -> ((s, dir) => {
      val st = t(s, dir, "supplier").selectExpr("s_suppkey AS st_id",
        "(s_suppkey * 37) % 500 AS x", "(s_suppkey * 53) % 500 AS y",
        "s_suppkey % 200 + 50 AS v")
      val nb = st.selectExpr("st_id", "x", "y", "v AS va")
        .join(broadcast(st.selectExpr("st_id AS nb_id", "x AS nx",
          "y AS ny", "v AS nv")), col("st_id") =!= col("nb_id"))
        .withColumn("d2", expr(
          "(x - nx) * (x - nx) + (y - ny) * (y - ny)"))
        .filter(col("d2") <= 14400L)
        .withColumn("w", expr("1000000000 DIV greatest(d2, 1)"))
      nb.groupBy("st_id")
        .agg(count(lit(1)).as("n_nb"), max("va").as("va"),
          sum(expr("w * nv")).as("wv"), sum("w").as("ws"))
        .withColumn("pred_milli", expr("wv * 1000 DIV ws"))
        .withColumn("actual_milli", expr("va * 1000"))
        .withColumn("abs_err_milli",
          expr("abs(pred_milli - actual_milli)"))
        .select("st_id", "n_nb", "pred_milli", "actual_milli",
          "abs_err_milli")
        .orderBy("st_id")
    }),
    // Value-based RANGE window frame surface: per type, for each distinct
    // cents level the event mass within ±500 cents — the sliding
    // value-band density q_window's ROWS frames can't express; frame
    // bounds are values, so the result is tie-independent.,
    "tile_pyramid" -> ((s, dir) => {
      import s.implicits._
      val subs = ops.TilePyramid.materialize(gateTiles(s), 2, 64)
      subs.map { st =>
        val (elevs, sz) = graft.raster.ImageCodec.decodeToElevations(st.png)
        var rs = 0L; var gs = 0L; var bs = 0L
        var i = 0
        while (i < elevs.length) {
          val (r, g, b) = graft.raster.Terrarium.encode(elevs(i))
          rs += r; gs += g; bs += b
          i += 1
        }
        (st.image_id, st.sx, st.sy, sz.toLong * sz, rs, gs, bs)
      }.toDF("image_id", "sx", "sy", "n_px", "r_sum", "g_sum", "b_sum")
        .orderBy("image_id", "sx", "sy")
    }),
    // Exact per-group quantiles by deterministic SELECTION (rank
    // floor((n-1)p)+1 under the total order (value, event_id)) — selection
    // of an existing element is engine-exact where interpolation arithmetic
    // is not; the scale shape is one shuffle on the group key and a
    // rank-filter, no global sort.,
    "geo_pit_census" -> ((s, dir) => {
      ops.ImageOps.pitCensus(gateTiles(s)).orderBy("image_id")
    }),
    // Inter-sample true peak (ops.MediaOps.truePeak): Catmull-Rom
    // half-sample oversampling in x16 integers — the BS.1770-style
    // compliance number a sample-peak meter underreads.,
    "geo_antimeridian_split" -> ((s, dir) => {
      t(s, dir, "supplier").selectExpr("s_suppkey AS seg_id",
          "177000000 + (s_suppkey % 30) * 100000 AS lng1",
          "30000000 + (s_suppkey % 50) * 200000 AS lat1",
          """CASE WHEN s_suppkey % 4 = 0 THEN 179800000
             ELSE -180000000 + ((s_suppkey * 3) % 25) * 100000 END AS lng2""",
          "30000000 + (s_suppkey % 50) * 200000 + (s_suppkey % 30) * 100000 AS lat2")
        .selectExpr("seg_id", "CASE WHEN lng2 < 0 THEN 1 ELSE 0 END AS crosses",
          """CASE WHEN lng2 < 0 THEN lat1 + (lat2 - lat1) * (180000000 - lng1)
               DIV ((180000000 - lng1) + (lng2 + 180000000))
             ELSE CAST(NULL AS BIGINT) END AS lat_cross_micro""",
          """CASE WHEN lng2 < 0
             THEN (180 - lng1 DIV 1000000) + ((lng2 + 180000000) DIV 1000000 + 1)
             ELSE greatest(lng1, lng2) DIV 1000000
                - least(lng1, lng2) DIV 1000000 + 1 END AS n_tiles""")
        .orderBy("seg_id")
    }),
    // SumBasic-style extractive pick: corpus word frequencies score each
    // 10-word chunk (quantized mean frequency, argmax per doc, ties to
    // the earliest chunk) — the classic frequency-summarization primitive
    // over the documents table.,
    "geo_fill_depressions" -> ((s, dir) => {
      ops.ImageOps.fillDepressions(gateTiles(s), off = 80, n = 40,
        rounds = 32).orderBy("image_id")
    }),
    // VoteRank spreader seeding (ops.Graph.voteRank): 4 elections with
    // milli-ability discounting — influence-set selection where each
    // elected hub suppresses its own neighbourhood.,
    "geo_emerging_hotspot" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val pts = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          (col("event_id") % 7).as("dx"),
          ((col("event_id") * 3) % 5).as("dy"))
        .withColumn("px", sum("dx").over(w))
        .withColumn("py", sum("dy").over(w))
        .selectExpr("(px DIV 6) * 1000000 + (py DIV 4) AS cell",
          "unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000 AS day")
      val d0 = pts.agg(min("day")).head().getLong(0)
      val binned = pts.selectExpr("cell", s"(day - ${d0}L) DIV 15 AS bin")
        .filter(col("bin") < 6)
        .groupBy("cell", "bin").agg(count(lit(1)).as("c"))
      val full = binned.select("cell").distinct()
        .crossJoin(s.range(0, 6).toDF("bin"))
        .join(binned, Seq("cell", "bin"), "left")
        .withColumn("c", coalesce(col("c"), lit(0L)))
      val mk = full.select(col("cell"), col("bin").as("bi"), col("c").as("ci"))
        .join(full.select(col("cell"), col("bin").as("bj"), col("c").as("cj")),
          Seq("cell"))
        .filter(col("bi") < col("bj"))
        .groupBy("cell")
        .agg(sum(expr(
          "CASE WHEN cj > ci THEN 1 WHEN cj < ci THEN -1 ELSE 0 END")).as("s_mk"))
      full.groupBy("cell")
        .agg(sum(when(col("bin") === 0, col("c"))).as("first_c"),
          sum(when(col("bin") === 5, col("c"))).as("last_c"),
          sum("c").as("total"))
        .join(mk, Seq("cell"))
        .withColumn("class", expr(
          """CASE WHEN s_mk >= 8 THEN 'intensifying'
             WHEN s_mk <= -8 THEN 'diminishing'
             WHEN first_c = 0 AND last_c > 0 THEN 'new'
             ELSE 'stable' END"""))
        .select("cell", "s_mk", "first_c", "last_c", "total", "class")
        .orderBy("cell")
    }),
    // Run-length texture pieces (ops.ImageOps.glrlm): Galloway GLRLM
    // short/long-run emphasis + gray-level non-uniformity, exact.,
    "geo_cost_corridor" -> ((s, dir) => {
      def gridEdges(rev: Boolean) = {
        val base = s.range(100L * 100L)
          .selectExpr("id AS src", "id DIV 100 AS i", "id % 100 AS j")
          .withColumn("k", explode(sequence(lit(0), lit(7))))
          .selectExpr("src", "i", "j",
            "i + element_at(array(1,1,0,-1,-1,-1,0,1), k+1) AS ni",
            "j + element_at(array(0,1,1,1,0,-1,-1,-1), k+1) AS nj")
          .filter("ni BETWEEN 0 AND 99 AND nj BETWEEN 0 AND 99")
          .selectExpr("src", "ni*100 + nj AS dst",
            """1 + greatest(0, ((ni*ni)%97 + (nj*nj)%89 + (ni*nj)%31) -
               ((i*i)%97 + (j*j)%89 + (i*j)%31)) AS w""")
        if (rev) base.selectExpr("dst AS src", "src AS dst", "w") else base
      }
      val dF = ops.Graph.sssp(gridEdges(rev = false), source = 5050L, rounds = 6)
      val dB = ops.Graph.sssp(gridEdges(rev = true), source = 5555L, rounds = 6)
      val best = dF.filter(col("node") === 5555L).head().getLong(1)
      dF.join(dB.withColumnRenamed("dist", "db"), Seq("node"))
        .withColumn("tot", col("dist") + col("db"))
        .filter(col("tot") <= lit(best + 50L))
        .agg(lit(best).as("best_cost"), count(lit(1)).as("n_corridor"),
          sum(when(col("tot") === best, 1L).otherwise(0L)).as("n_optimal"),
          sum(when(col("tot") <= best + 10L, 1L).otherwise(0L)).as("n_tight"))
    }),
    // Multiprobe LSH recall contrast: probing the 8 Hamming-1 signature
    // flips alongside the home bucket — recall gained per extra candidate
    // against the exact cos>=0.999 truth on the planted-dupe corpus (the
    // one-table multiprobe trick that replaces 9 hash tables at scale).,
    "geo_landform_class" -> ((s, dir) => {
      ops.ImageOps.landformClass(gateTiles(s))
        .orderBy("image_id", "class_s", "class_l")
    }),
    // Candidate-key discovery over orders: distinct-vs-total census for
    // four candidate column sets — the profiling step schema inference
    // and CDC key selection start from.,
    "geo_irradiance_sum" -> ((s, dir) => {
      ops.ImageOps.irradianceSum(gateTiles(s), sunVectors)
        .orderBy("image_id")
    }),
    // Parallel-trends (pre-period) check for the DiD pair: exact OLS
    // slope pieces per arm on the first 45 days and the cross-multiplied
    // slope difference — the identification test events_did assumes.,
    "geo_swath_profile" -> ((s, dir) => {
      ops.ImageOps.swathProfile(gateTiles(s)).orderBy("image_id", "bin")
    }),
    // CUPED variance-reduction pieces: per-user pre/post event counts
    // (45-day cut, arms by user parity) aggregated to the exact
    // covariance/variance integers and the pooled theta fraction — the
    // experiment-sensitivity machinery, no float ever formed.,
    "geo_normal_dispersion" -> ((s, dir) => {
      ops.ImageOps.normalDispersion(gateTiles(s)).orderBy("image_id")
    }),
    // Order-of-magnitude profile of the value column: digit-length
    // histogram of exact cents per type with ppm shares — the mixed-unit
    // (dollars-vs-cents, seconds-vs-millis) ingestion bug detector.,
    "geo_area_weighted_interp" -> ((s, dir) => {
      ops.ImageOps.arealInterp(gateTiles(s)).orderBy("image_id", "tr", "tc")
    }),
    // Home/work anchor detection: per user the modal activity cell in
    // night (0-6) vs office (9-17) hours (ties to the smaller cell) —
    // the anchor-inference step of every mobility pipeline.,
    "geo_join_selectivity" -> ((s, dir) => {
      val pts = gatePoints(s, dir)
        .selectExpr("point_id", "lng", "lat",
          "CAST(floor(lng * 10.0D) AS BIGINT) AS cx",
          "CAST(floor(lat * 10.0D) AS BIGINT) AS cy")
      val polys = trianglePolys(s, dir).selectExpr("poly_id",
          "array_min(xs) AS minx", "array_max(xs) AS maxx",
          "array_min(ys) AS miny", "array_max(ys) AS maxy")
      val pcells = polys.selectExpr("poly_id", "minx", "maxx", "miny", "maxy",
          """explode(sequence(CAST(floor(minx * 10.0D) AS BIGINT),
             CAST(floor(maxx * 10.0D) AS BIGINT))) AS cx""")
        .selectExpr("poly_id", "minx", "maxx", "miny", "maxy", "cx",
          """explode(sequence(CAST(floor(miny * 10.0D) AS BIGINT),
             CAST(floor(maxy * 10.0D) AS BIGINT))) AS cy""")
      val ph = pts.groupBy("cx", "cy").agg(count(lit(1)).as("np"))
      val gh = pcells.groupBy("cx", "cy").agg(count(lit(1)).as("ng"))
      val est = ph.join(gh, Seq("cx", "cy"))
        .agg(sum(expr("np * ng")).as("est_pairs"))
      val actual = pts.join(pcells, Seq("cx", "cy"))
        .filter(col("lng") >= col("minx") && col("lng") <= col("maxx") &&
          col("lat") >= col("miny") && col("lat") <= col("maxy"))
        .select("point_id", "poly_id").distinct()
        .agg(count(lit(1)).as("actual_pairs"))
      pts.agg(count(lit(1)).as("n_points"))
        .crossJoin(polys.agg(count(lit(1)).as("n_polys")))
        .crossJoin(est).crossJoin(actual)
        .withColumn("ratio_ppm", expr("1000000 * actual_pairs DIV est_pairs"))
    }),
    // IVF candidate accounting: per query the two probed lists and the
    // exact fraction of the corpus scanned (the latency-proxy number
    // that justifies IVF over brute force at scale).,
    "geo_terrain_rose" -> ((s, dir) => {
      ops.ImageOps.terrainRose(gateTiles(s))
        .orderBy("image_id", "octant", "band")
    }),
    // Metadata-vs-payload consistency: delivered samples against the
    // duration x 8 samples/ms contract, signed drift in ppm — the ingest
    // truncation/padding audit run before any media op trusts duration.
  )

  val sql: Map[String, String] = Map(
    "geo_line_intersect" ->
      """WITH base AS (SELECT
           ((l_orderkey*8 + l_linenumber)*2000 + l_partkey)*100 + l_suppkey AS seg_id,
           l_orderkey % 50 AS grp,
           -119.5 + ((l_partkey % 501))/1000.0 AS x1,
           36.2 + (((l_suppkey*7) % 501))/1000.0 AS y1,
           ((l_suppkey % 41) - 20)/2000.0 AS dx,
           (((l_orderkey*3) % 41) - 20)/2000.0 AS dy
           FROM lineitem WHERE l_orderkey % 50 <= 1),
         segs AS (SELECT seg_id, grp, x1, y1, x1 + dx AS x2, y1 + dy AS y2 FROM base),
         p AS (SELECT a.seg_id AS a_id, b.seg_id AS b_id,
             a.x1 AS ax1, a.y1 AS ay1, a.x2 AS ax2, a.y2 AS ay2,
             b.x1 AS bx1, b.y1 AS by1, b.x2 AS bx2, b.y2 AS by2
           FROM segs a, segs b WHERE a.grp = 0 AND b.grp = 1),
         o AS (SELECT *,
             (bx2-bx1)*(ay1-by1) - (by2-by1)*(ax1-bx1) AS d1,
             (bx2-bx1)*(ay2-by1) - (by2-by1)*(ax2-bx1) AS d2,
             (ax2-ax1)*(by1-ay1) - (ay2-ay1)*(bx1-ax1) AS d3,
             (ax2-ax1)*(by2-ay1) - (ay2-ay1)*(bx2-ax1) AS d4
           FROM p),
         hit AS (SELECT *, d1/(d1 - d2) AS t FROM o
           WHERE d1*d2 < 0.0 AND d3*d4 < 0.0)
         SELECT a_id, b_id, ax1 + t*(ax2-ax1) AS ix, ay1 + t*(ay2-ay1) AS iy
         FROM hit ORDER BY a_id, b_id""",
    "geo_convex_hull" -> convexHullOracleSql,
    // brute-force all DISTINCT point pairs per group — every max-distance
    // pair is a hull-vertex pair (strict convexity along segments), so the
    // engine's hull-only refine must agree, argmax ties included,
    "geo_hull_diameter" ->
      """WITH pts AS (SELECT DISTINCT c_custkey % 25 AS gid,
           (c_custkey * 7) % 1201 AS x, (c_custkey * 13) % 1009 AS y
           FROM customer WHERE c_custkey <= 1000),
         pr AS (SELECT a.gid, a.x AS ax, a.y AS ay, b.x AS bx, b.y AS by,
             (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
           FROM pts a JOIN pts b ON a.gid = b.gid
             AND (a.x < b.x OR (a.x = b.x AND a.y < b.y))),
         best AS (SELECT gid, d2, ax, ay, bx, by,
             row_number() OVER (PARTITION BY gid
               ORDER BY d2 DESC, ax, ay, bx, by) AS rn
           FROM pr),
         n AS (SELECT gid, CAST(count(*) AS BIGINT) AS n_pts
           FROM pts GROUP BY 1)
         SELECT best.gid, n.n_pts, d2, ax, ay, bx, by
         FROM best JOIN n ON n.gid = best.gid WHERE rn = 1
         ORDER BY best.gid""",
    // CAST(... AS TIMESTAMP): DuckDB date_trunc('day') returns DATE where
    // the engine emits a timestamp_ntz bucket — same instant, driver-hash-
    // sensitive type (the round-3 HUGEINT lesson applied to dates),
    "geo_curvature" -> curvatureOracleSql,
    "geo_tri" -> triOracleSql,
    "geo_tpi" -> tpiOracleSql,
    "geo_aspect" -> aspectOracleSql,
    "geo_area" ->
      """WITH p AS (SELECT s_suppkey AS poly_id,
           -120.0 + (s_suppkey % 40) * CAST(0.1 AS DOUBLE) AS cx,
           36.0 + ((s_suppkey * 3) % 20) * CAST(0.1 AS DOUBLE) AS cy,
           CAST(0.05 AS DOUBLE) + (s_suppkey % 7) * CAST(0.013 AS DOUBLE) AS w,
           CAST(0.04 AS DOUBLE) + (s_suppkey % 5) * CAST(0.017 AS DOUBLE) AS h
           FROM supplier),
         v AS (SELECT poly_id, cx AS x0, cx - w AS x1, cx + w AS x2,
           cy + h AS y0, cy - h AS y1, cy - h AS y2 FROM p),
         c AS (SELECT poly_id, x0, x1, x2, y0, y1, y2,
           x0*y1 - x1*y0 AS cr0, x1*y2 - x2*y1 AS cr1, x2*y0 - x0*y2 AS cr2,
           sqrt((x1-x0)*(x1-x0) + (y1-y0)*(y1-y0)) AS e0,
           sqrt((x2-x1)*(x2-x1) + (y2-y1)*(y2-y1)) AS e1,
           sqrt((x0-x2)*(x0-x2) + (y0-y2)*(y0-y2)) AS e2 FROM v)
         SELECT poly_id,
           (0.0 + cr0 + cr1 + cr2) * 0.5 AS area,
           0.0 + e0 + e1 + e2 AS perimeter,
           (0.0 + (x0+x1)*cr0 + (x1+x2)*cr1 + (x2+x0)*cr2) / (3.0 * (0.0 + cr0 + cr1 + cr2)) AS cxc,
           (0.0 + (y0+y1)*cr0 + (y1+y2)*cr1 + (y2+y0)*cr2) / (3.0 * (0.0 + cr0 + cr1 + cr2)) AS cyc
         FROM c ORDER BY poly_id""",
    // ocr garbage: same planted tokens, same regex ladder via
    // regexp_matches, same ppm floor division,
    "geo_ring_buffer" -> {
      val ctrRows = stIncidents.map { case (id, ix, iy, _) =>
        s"(CAST($id AS BIGINT), $ix, $iy)"
      }.mkString(", ")
      s"""WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           event_id % 7 + CASE WHEN event_id % 101 = 0 THEN 5000 ELSE 0 END AS dx,
           (event_id * 3) % 5 AS dy
           FROM events WHERE user_id < 50),
         c AS (SELECT user_id,
           CAST(sum(dx) OVER w AS BIGINT) AS px,
           CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         ctr(center_id, ix, iy) AS (VALUES $ctrRows),
         m AS (SELECT center_id, user_id,
             CASE WHEN d2 <= 2500 THEN 1 WHEN d2 <= 10000 THEN 2
                  WHEN d2 <= 40000 THEN 3 WHEN d2 <= 160000 THEN 4 END AS ring
           FROM (SELECT center_id, user_id,
               (px-ix)*(px-ix) + (py-iy)*(py-iy) AS d2 FROM c, ctr) q)
         SELECT center_id, ring, CAST(count(*) AS BIGINT) AS n_fixes,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_traj
         FROM m WHERE ring IS NOT NULL GROUP BY 1, 2
         ORDER BY center_id, ring"""
    },
    // the walk cumsum + incident VALUES, identical distance/time gates,
    "geo_clark_evans" ->
      """WITH pts AS (SELECT c_custkey AS pid, (c_custkey * 7) % 1201 AS x,
           (c_custkey * 13) % 1009 AS y
           FROM customer WHERE c_custkey <= 500),
         nn AS (SELECT a.pid,
             min((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
               AS nn_d2
           FROM pts a JOIN pts b ON b.pid <> a.pid GROUP BY 1),
         q AS (SELECT pid, nn_d2,
             CAST(floor(sqrt(CAST(nn_d2 AS DOUBLE)) * 1000.0) AS BIGINT)
               AS nn_d_milli FROM nn),
         agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(nn_d_milli) AS BIGINT) AS sum_nn_d_milli,
             CAST(min(nn_d2) AS BIGINT) AS min_nn_d2,
             CAST(max(nn_d2) AS BIGINT) AS max_nn_d2 FROM q),
         bb AS (SELECT CAST(max(x) - min(x) AS BIGINT) AS extent_x,
             CAST(max(y) - min(y) AS BIGINT) AS extent_y FROM pts)
         SELECT n, sum_nn_d_milli, min_nn_d2, max_nn_d2, extent_x,
           extent_y
         FROM agg, bb""",
    // closed-form level CDFs for both epochs, min-m mapping,
    "geo_mann_kendall" ->
      """WITH b AS (SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
           event_id % 7 + CASE WHEN event_id % 101 = 0 THEN 5000 ELSE 0 END AS dx,
           (event_id * 3) % 5 AS dy
           FROM events WHERE user_id < 50),
         c AS (SELECT ts, CAST(sum(dx) OVER w AS BIGINT) AS px,
           CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         d AS (SELECT px // 200 AS cell_x, py // 50 AS cell_y,
             date_trunc('day', ts) AS day, CAST(count(*) AS BIGINT) AS c
           FROM c GROUP BY 1, 2, 3),
         s AS (SELECT cell_x, cell_y, day, c, CAST(row_number() OVER (
             PARTITION BY cell_x, cell_y ORDER BY day) AS BIGINT) AS i
           FROM d),
         pr AS (SELECT a.cell_x, a.cell_y,
             CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END AS sgn
           FROM s a JOIN s b ON a.cell_x = b.cell_x AND a.cell_y = b.cell_y
             AND a.i < b.i),
         sa AS (SELECT cell_x, cell_y, CAST(sum(sgn) AS BIGINT) AS s_stat,
             CAST(count(*) AS BIGINT) AS n_pairs FROM pr GROUP BY 1, 2),
         nd AS (SELECT cell_x, cell_y, CAST(count(*) AS BIGINT) AS n_days
           FROM s GROUP BY 1, 2),
         tt AS (SELECT cell_x, cell_y,
             CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
           FROM (SELECT cell_x, cell_y, c, CAST(count(*) AS BIGINT) AS t
             FROM s GROUP BY 1, 2, 3) q GROUP BY 1, 2)
         SELECT nd.cell_x, nd.cell_y, n_days, n_pairs, s_stat, tie_term,
           CASE WHEN s_stat > 0 THEN 1 WHEN s_stat < 0 THEN -1 ELSE 0 END AS trend
         FROM nd JOIN sa ON sa.cell_x = nd.cell_x AND sa.cell_y = nd.cell_y
         JOIN tt ON tt.cell_x = nd.cell_x AND tt.cell_y = nd.cell_y
         ORDER BY nd.cell_x, nd.cell_y""",
    // nearest-rank fences, clamped sum, clamp counts,
    "geo_sector_cover" -> {
      val antRows = sectorAntennas.map {
        case (id, cx, cy, d1x, d1y, d2x, d2y, r2) =>
          s"(CAST($id AS BIGINT), $cx, $cy, $d1x, $d1y, $d2x, $d2y, $r2)"
      }.mkString(", ")
      s"""WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           event_id % 7 + CASE WHEN event_id % 101 = 0 THEN 5000 ELSE 0 END AS dx,
           (event_id * 3) % 5 AS dy
           FROM events WHERE user_id < 50),
         c AS (SELECT user_id AS traj_id,
           CAST(sum(dx) OVER w AS BIGINT) AS px,
           CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         ant(antenna_id, cx, cy, d1x, d1y, d2x, d2y, r2) AS (VALUES $antRows),
         m AS (SELECT antenna_id, traj_id,
             CASE WHEN d1x*(py-cy) - d1y*(px-cx) >= 0
               AND (px-cx)*d2y - (py-cy)*d2x >= 0
               AND (px-cx)*(px-cx) + (py-cy)*(py-cy) <= r2
               THEN 1 ELSE 0 END AS inside
           FROM c, ant)
         SELECT antenna_id, CAST(count(*) AS BIGINT) AS n_pts,
           CAST(sum(inside) AS BIGINT) AS n_in,
           CAST(count(DISTINCT CASE WHEN inside = 1 THEN traj_id END)
             AS BIGINT) AS n_traj
         FROM m GROUP BY 1 ORDER BY antenna_id"""
    },
    // same window energies, lag band self-join, floored per-term mean,
    "geo_st_join" -> {
      val incRows = stIncidents.map { case (id, ix, iy, ts) =>
        s"(CAST($id AS BIGINT), $ix, $iy, TIMESTAMP '$ts')"
      }.mkString(", ")
      s"""WITH b AS (SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
           event_id % 7 + CASE WHEN event_id % 101 = 0 THEN 5000 ELSE 0 END AS dx,
           (event_id * 3) % 5 AS dy
           FROM events WHERE user_id < 50),
         c AS (SELECT user_id, epoch_us(ts) AS tus,
           CAST(sum(dx) OVER w AS BIGINT) AS px,
           CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         inc(inc_id, ix, iy, its) AS (VALUES $incRows),
         m AS (SELECT inc_id, user_id,
             (px - ix) * (px - ix) + (py - iy) * (py - iy) AS d2,
             (px - ix) * (px - ix) + (py - iy) * (py - iy) <= 2500
               AND abs(tus - epoch_us(its)) <= 43200000000 AS near
           FROM c, inc)
         SELECT inc_id, CAST(count(*) AS BIGINT) AS n_fixes,
           CAST(sum(CASE WHEN near THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
           CAST(count(DISTINCT CASE WHEN near THEN user_id END) AS BIGINT) AS n_traj,
           CAST(min(CASE WHEN near THEN d2 END) AS BIGINT) AS min_d2
         FROM m GROUP BY 1 ORDER BY inc_id"""
    },
    // the same two spec stats + query VALUES, per-spec pruning predicate,
    "geo_cover_redundancy" -> {
      val antRows = sectorAntennas.map {
        case (id, cx, cy, d1x, d1y, d2x, d2y, r2) =>
          s"(CAST($id AS BIGINT), $cx, $cy, $d1x, $d1y, $d2x, $d2y, $r2)"
      }.mkString(", ")
      s"""WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           event_id % 7 + CASE WHEN event_id % 101 = 0 THEN 5000 ELSE 0 END AS dx,
           (event_id * 3) % 5 AS dy
           FROM events WHERE user_id < 50),
         c AS (SELECT user_id * 1000000 + event_id AS fix_id,
           CAST(sum(dx) OVER w AS BIGINT) AS px,
           CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         ant(antenna_id, cx, cy, d1x, d1y, d2x, d2y, r2) AS (VALUES $antRows),
         m AS (SELECT fix_id,
             CAST(sum(CASE WHEN d1x*(py-cy) - d1y*(px-cx) >= 0
               AND (px-cx)*d2y - (py-cy)*d2x >= 0
               AND (px-cx)*(px-cx) + (py-cy)*(py-cy) <= r2
               THEN 1 ELSE 0 END) AS BIGINT) AS n_covering
           FROM c, ant GROUP BY 1)
         SELECT n_covering, CAST(count(*) AS BIGINT) AS n_fixes
         FROM m GROUP BY 1 ORDER BY n_covering"""
    },
    // exact top-2 NN distances, floored ratio, capped buckets,
    "geo_winding_rule" -> {
      val (upSql, dnSql) = ringCrossingsSql(bowtieRing)
      s"""WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           event_id % 7 + CASE WHEN event_id % 101 = 0 THEN 5000 ELSE 0 END AS dx,
           (event_id * 3) % 5 AS dy
           FROM events WHERE user_id < 50),
         c AS (SELECT user_id,
           CAST(sum(dx) OVER w AS BIGINT) AS px,
           CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         m AS (SELECT user_id, ($upSql) AS up, ($dnSql) AS dn FROM c)
         SELECT user_id AS traj_id, CAST(count(*) AS BIGINT) AS n_pts,
           CAST(sum(CASE WHEN (up + dn) % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_evenodd,
           CAST(sum(CASE WHEN up - dn <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
           CAST(sum(CASE WHEN ((up + dn) % 2 = 1) <> (up - dn <> 0)
             THEN 1 ELSE 0 END) AS BIGINT) AS n_disagree
         FROM m GROUP BY 1 ORDER BY traj_id"""
    },
    // recursive min-label reach over the same sparse graph, then the
    // size histogram,
    "geo_cell_turnover" ->
      """WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           epoch_us(ts) // 86400000000 AS eday,
           event_id % 7 + CASE WHEN event_id % 101 = 0 THEN 5000 ELSE 0 END AS dx,
           (event_id * 3) % 5 AS dy
           FROM events WHERE user_id < 50),
         c AS (SELECT eday,
           CAST(sum(dx) OVER w AS BIGINT) AS px,
           CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         cells AS (SELECT DISTINCT eday, px // 200 AS cell_x,
             py // 50 AS cell_y FROM c),
         sz AS (SELECT eday, CAST(count(*) AS BIGINT) AS n_cells
           FROM cells GROUP BY 1),
         cm AS (SELECT b.eday, CAST(count(*) AS BIGINT) AS n_common
           FROM cells a JOIN cells b ON b.cell_x = a.cell_x
             AND b.cell_y = a.cell_y AND b.eday = a.eday + 1
           GROUP BY 1)
         SELECT t.eday, t.n_cells, p.n_cells AS n_prev,
           COALESCE(cm.n_common, 0) AS n_common,
           COALESCE(cm.n_common, 0) * 1000000
             // (t.n_cells + p.n_cells - COALESCE(cm.n_common, 0))
             AS jaccard_ppm
         FROM sz t JOIN sz p ON p.eday = t.eday - 1
         LEFT JOIN cm ON cm.eday = t.eday
         ORDER BY t.eday""",
    // min-label reach components + edge/node counts,
    "geo_hypsometric" -> {
      val v = gridV("c.range", "r.range")
      s"""WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         k AS (SELECT swlng, swlat,
             ((swlng+180)*7 + (swlat+90)*11) % 1000 AS a FROM corners),
         h AS (SELECT swlng, swlat,
             CAST(greatest(0, least(63, ($v) // 64)) AS INT) AS level,
             CAST(count(*) AS BIGINT) AS n
           FROM k, range(0,601) r, range(0,601) c GROUP BY 1, 2, 3),
         tot AS (SELECT swlng, swlat, CAST(sum(n) AS BIGINT) AS n_px
           FROM h GROUP BY 1, 2),
         cum AS (SELECT h.swlng, h.swlat, level, n_px,
             CAST(sum(n) OVER (PARTITION BY h.swlng, h.swlat
               ORDER BY level) AS BIGINT) AS cum
           FROM h JOIN tot ON tot.swlng = h.swlng AND tot.swlat = h.swlat),
         dec AS (SELECT CAST(d.range AS BIGINT) AS decile
           FROM range(1,10) d)
         SELECT (CASE WHEN swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(swlat) AS VARCHAR),2,'0') ||
             CASE WHEN swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(swlng) AS VARCHAR),3,'0')) AS image_id,
           CAST(decile AS INT) AS decile, CAST(min(level) AS INT) AS level
         FROM cum, dec WHERE cum * 10 >= n_px * decile
         GROUP BY 1, 2 ORDER BY image_id, decile"""
    },
    // transition ppm + 6 unrolled value-iteration rounds,
    "geo_access_quantiles" -> {
      val ctrRows = stIncidents.map { case (id, ix, iy, _) =>
        s"(CAST($id AS BIGINT), $ix, $iy)"
      }.mkString(", ")
      s"""WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           event_id % 7 + CASE WHEN event_id % 101 = 0 THEN 5000 ELSE 0 END AS dx,
           (event_id * 3) % 5 AS dy
           FROM events WHERE user_id < 50),
         c AS (SELECT user_id, event_id,
           CAST(sum(dx) OVER w AS BIGINT) AS px,
           CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         ctr(center_id, ix, iy) AS (VALUES $ctrRows),
         md AS (SELECT user_id AS traj_id, event_id,
             min((px-ix)*(px-ix) + (py-iy)*(py-iy)) AS min_d2
           FROM c, ctr GROUP BY 1, 2),
         r AS (SELECT traj_id, min_d2,
             CAST(row_number() OVER (PARTITION BY traj_id
               ORDER BY min_d2, event_id) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY traj_id) AS BIGINT) AS n
           FROM md)
         SELECT traj_id, max(n) AS n_fixes,
           max(CASE WHEN rn = (n - 1) * 50 // 100 + 1 THEN min_d2 END)
             AS p50_d2,
           max(CASE WHEN rn = (n - 1) * 95 // 100 + 1 THEN min_d2 END)
             AS p95_d2
         FROM r GROUP BY 1 ORDER BY traj_id"""
    },
    // epoch-week counts, lagged growth,
    "geo_sector_overlap" -> {
      val antRows = sectorAntennas.map {
        case (id, cx, cy, d1x, d1y, d2x, d2y, r2) =>
          s"(CAST($id AS BIGINT), $cx, $cy, $d1x, $d1y, $d2x, $d2y, $r2)"
      }.mkString(", ")
      s"""WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           event_id % 7 + CASE WHEN event_id % 101 = 0 THEN 5000 ELSE 0 END AS dx,
           (event_id * 3) % 5 AS dy
           FROM events WHERE user_id < 50),
         c AS (SELECT user_id * 1000000 + event_id AS fix_id,
           CAST(sum(dx) OVER w AS BIGINT) AS px,
           CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         ant(antenna_id, cx, cy, d1x, d1y, d2x, d2y, r2) AS (VALUES $antRows),
         m AS (SELECT fix_id, antenna_id
           FROM c, ant
           WHERE d1x*(py-cy) - d1y*(px-cx) >= 0
             AND (px-cx)*d2y - (py-cy)*d2x >= 0
             AND (px-cx)*(px-cx) + (py-cy)*(py-cy) <= r2)
         SELECT x.antenna_id AS ant_a, y.antenna_id AS ant_b,
           CAST(count(*) AS BIGINT) AS n_common
         FROM m x JOIN m y ON y.fix_id = x.fix_id
           AND x.antenna_id < y.antenna_id
         GROUP BY 1, 2 ORDER BY ant_a, ant_b"""
    },
    // Manhattan µspeed per segment, nearest-rank quantiles,
    "zxy_rollup" ->
      """WITH pts AS (SELECT
           -120 + (l_orderkey % 4) + ((l_partkey % 600) + 0.5)/600.0 AS lng,
           36 + (l_suppkey % 2) + (((l_suppkey*7 + l_linenumber*131) % 600) + 0.5)/600.0 AS lat
           FROM lineitem),
         c AS (SELECT lng, least(greatest(lat, -85.05112877980659), 85.05112877980659) AS latc FROM pts),
         xy AS (SELECT
           CAST(least(greatest(floor((lng + 180.0)/360.0 * 16384), 0), 16383) AS INT) AS x14,
           CAST(least(greatest(floor((1.0 - ln(tan(radians(latc)) + 1.0/cos(radians(latc)))/pi())/2.0 * 16384), 0), 16383) AS INT) AS y14
           FROM c),
         lv AS (SELECT 14 AS z, x14 AS x, y14 AS y FROM xy
           UNION ALL SELECT 12, x14 >> 2, y14 >> 2 FROM xy
           UNION ALL SELECT 10, x14 >> 4, y14 >> 4 FROM xy)
         SELECT CAST(z AS INT) AS z, CAST(x AS INT) AS x, CAST(y AS INT) AS y, count(*) AS n
         FROM lv GROUP BY 1, 2, 3 ORDER BY z, x, y""",
    "geo_elev_diff" ->
      """WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         g AS (SELECT swlng, swlat,
           c.range + r.range + ((c.range//8)*(r.range//8)) % 32 AS ad
           FROM corners, range(0,601) r, range(0,601) c)
         SELECT (CASE WHEN swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(swlat) AS VARCHAR),2,'0') ||
             CASE WHEN swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(swlng) AS VARCHAR),3,'0')) AS image_id,
           CAST(count(*) AS BIGINT) AS n_px,
           CAST(sum(CASE WHEN ad > 600 THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           CAST(sum(ad) AS BIGINT) AS abs_sum,
           CAST(max(ad) AS BIGINT) AS abs_max
         FROM g GROUP BY swlng, swlat ORDER BY image_id""",
    "zonal_crosstab" ->
      """WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         g AS (SELECT (CASE WHEN swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(swlat) AS VARCHAR),2,'0') ||
                 CASE WHEN swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(swlng) AS VARCHAR),3,'0')) AS image_id,
           ((swlng+180)*7 + (swlat+90)*11) % 1000 + 2*c.range + 3*r.range
             + ((c.range//8)*(r.range//8)) % 32 AS va,
           ((swlng+180)*7 + (swlat+90)*11) % 1000 + c.range + 2*r.range AS vb
           FROM corners, range(0,601) r, range(0,601) c)
         SELECT image_id, CAST(va // 512 AS INT) AS zone_a,
           CAST(vb // 512 AS INT) AS zone_b, CAST(count(*) AS BIGINT) AS n
         FROM g GROUP BY 1, 2, 3 ORDER BY image_id, zone_a, zone_b""",
    "zonal_cutfill" -> cutFillOracleSql,
    "geo_intervisibility" ->
      s"""WITH k AS (SELECT ((-120+180)*7 + (36+90)*11) % 1000 AS a),
         prof AS (SELECT CAST(c.range AS BIGINT) AS c,
             CAST(${gridV("c.range", "300")} AS BIGINT) AS v
           FROM k, range(0,601) c),
         st AS (SELECT c, v FROM prof
           WHERE c % 50 = 0 AND c > 0 AND c <= 500),
         pairs AS (SELECT a.c AS ca, a.v AS va, b.c AS cb, b.v AS vb
           FROM st a JOIN st b ON a.c < b.c),
         bet AS (SELECT ca, cb, va, vb,
             p.v * (cb - ca) > va * (cb - p.c) + vb * (p.c - ca) AS above
           FROM pairs JOIN prof p ON p.c > ca AND p.c < cb)
         SELECT ca, cb, va, vb, CAST(count(*) AS BIGINT) AS n_between,
           CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
           sum(CASE WHEN above THEN 1 ELSE 0 END) = 0 AS visible
         FROM bet GROUP BY 1, 2, 3, 4 ORDER BY ca, cb""",
    // per-row centroid from the closed form, regression pieces,
    "geo_centroid_drift" ->
      """WITH b AS (SELECT user_id, event_id, ts, epoch_us(ts) AS ts_us,
           event_id % 7 + CASE WHEN event_id % 101 = 0 THEN 5000 ELSE 0 END AS dx,
           (event_id * 3) % 5 AS dy
           FROM events WHERE user_id < 50),
         c AS (SELECT ts, CAST(sum(dx) OVER w AS BIGINT) AS px,
           CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         d AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(count(*) AS BIGINT) AS n, CAST(sum(px) AS BIGINT) AS sx,
             CAST(sum(py) AS BIGINT) AS sy
           FROM c GROUP BY 1),
         e AS (SELECT day, n, sx * 1000 // n AS cx_milli,
             sy * 1000 // n AS cy_milli FROM d),
         f AS (SELECT day, n, cx_milli, cy_milli,
             lag(cx_milli) OVER (ORDER BY day) AS pcx,
             lag(cy_milli) OVER (ORDER BY day) AS pcy FROM e)
         SELECT day, n, cx_milli, cy_milli,
           CASE WHEN pcx IS NULL THEN NULL
                ELSE (cx_milli - pcx) * (cx_milli - pcx)
                   + (cy_milli - pcy) * (cy_milli - pcy) END AS drift_d2_milli
         FROM f ORDER BY day""",
    // asc-ranked degrees, exact Gini pieces,
    "geo_horizon_angle" ->
      s"""WITH k AS (SELECT ((-120+180)*7 + (36+90)*11) % 1000 AS a),
         prof AS (SELECT CAST(c.range AS BIGINT) AS c,
             CAST(${gridV("c.range", "300")} AS BIGINT) AS v
           FROM k, range(0,601) c),
         obs AS (SELECT c AS c0, v AS v0 FROM prof
           WHERE c IN (100, 300, 500)),
         j AS (SELECT c0, v0, c, v,
             ((v - v0 + 4000 * (c - c0)) * 1000000) // (c - c0)
               - 4000000000 AS angle_q
           FROM obs JOIN prof ON c > c0),
         r AS (SELECT c0, v0, c AS horizon_c, v AS horizon_v, angle_q,
             row_number() OVER (PARTITION BY c0
               ORDER BY angle_q DESC, c) AS rn FROM j)
         SELECT c0, v0, horizon_c, horizon_v, angle_q
         FROM r WHERE rn = 1 ORDER BY c0""",
    // daily counts per user, exact dispersion pieces,
    "geo_curve_locality" ->
      s"""WITH pts AS (SELECT c_custkey AS point_id,
           -180 + (c_custkey % 360) + 0.5 AS lng,
           -90 + ((c_custkey * 7) % 180) + 0.25 AS lat FROM customer),
         h0 AS (SELECT point_id, CAST(0 AS BIGINT) AS d,
           LEAST(255, GREATEST(0, CAST(floor(((lng + 180.0) / 360.0) * 256.0) AS BIGINT))) AS x,
           LEAST(255, GREATEST(0, CAST(floor(((lat + 90.0) / 180.0) * 256.0) AS BIGINT))) AS y FROM pts),
         $hilbertStepCtes,
         kk AS (SELECT h8.point_id, CAST(h8.d AS BIGINT) AS hkey,
             h0.x AS qx, h0.y AS qy,
             ${mortonSql("h0.x", "h0.y", "//")} AS mkey
           FROM h8 JOIN h0 ON h0.point_id = h8.point_id),
         hj AS (SELECT CAST(sum(j) AS BIGINT) AS hilbert_jump,
             CAST(max(j) AS BIGINT) AS hilbert_max FROM (
             SELECT abs(qx - lag(qx) OVER w) + abs(qy - lag(qy) OVER w) AS j
             FROM kk WINDOW w AS (ORDER BY hkey, point_id)) t
           WHERE j IS NOT NULL),
         mj AS (SELECT CAST(sum(j) AS BIGINT) AS morton_jump,
             CAST(max(j) AS BIGINT) AS morton_max FROM (
             SELECT abs(qx - lag(qx) OVER w) + abs(qy - lag(qy) OVER w) AS j
             FROM kk WINDOW w AS (ORDER BY mkey, point_id)) t
           WHERE j IS NOT NULL),
         n AS (SELECT CAST(count(*) AS BIGINT) AS n_pts FROM kk)
         SELECT n_pts, hilbert_jump, hilbert_max, morton_jump, morton_max
         FROM n, hj, mj""",
    // epoch-day mod 7 shares in ppm, pairwise L1,
    "geo_grid_crossings" ->
      """WITH b AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
           event_id % 7 + CASE WHEN event_id % 101 = 0 THEN 5000 ELSE 0 END AS dx,
           (event_id * 3) % 5 AS dy
           FROM events WHERE user_id < 50),
         c AS (SELECT user_id, event_id, ts_us,
           CAST(sum(dx) OVER w AS BIGINT) AS px,
           CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         s AS (SELECT user_id,
             lag(px) OVER w2 AS ppx, lag(py) OVER w2 AS ppy, px, py
           FROM c WINDOW w2 AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
         g AS (SELECT user_id, abs(px // 64 - ppx // 64) AS cx,
             abs(py // 16 - ppy // 16) AS cy
           FROM s WHERE ppx IS NOT NULL)
         SELECT user_id AS traj_id, CAST(count(*) AS BIGINT) AS n_seg,
           CAST(sum(cx) AS BIGINT) AS cross_x,
           CAST(sum(cy) AS BIGINT) AS cross_y,
           CAST(max(cx + cy) AS BIGINT) AS max_seg_cross
         FROM g GROUP BY 1 ORDER BY traj_id""",
    "geo_contours" ->
      """WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         g AS (SELECT swlng, swlat,
             ((swlng+180)*7 + (swlat+90)*11) % 1000 + 2*c.range + 3*r.range + ((c.range//8)*(r.range//8)) % 32 AS v
           FROM corners, range(0,601) r, range(0,601) c),
         ab AS (SELECT swlng, swlat, count(*) FILTER (v >= 1800) AS n_above
           FROM g GROUP BY 1, 2),
         cellbase AS (SELECT swlng, swlat,
             ((swlng+180)*7 + (swlat+90)*11) % 1000 AS b, r.range AS r, c.range AS c
           FROM corners, range(0,600) r, range(0,600) c),
         cells AS (SELECT swlng, swlat,
             (CASE WHEN b + 2*c + 3*r + ((c//8)*(r//8)) % 32 >= 1800 THEN 1 ELSE 0 END)
           + (CASE WHEN b + 2*(c+1) + 3*r + (((c+1)//8)*(r//8)) % 32 >= 1800 THEN 2 ELSE 0 END)
           + (CASE WHEN b + 2*(c+1) + 3*(r+1) + (((c+1)//8)*((r+1)//8)) % 32 >= 1800 THEN 4 ELSE 0 END)
           + (CASE WHEN b + 2*c + 3*(r+1) + ((c//8)*((r+1)//8)) % 32 >= 1800 THEN 8 ELSE 0 END) AS idx
           FROM cellbase),
         cc AS (SELECT swlng, swlat,
             count(*) FILTER (idx NOT IN (0, 15)) AS n_cut,
             count(*) FILTER (idx IN (5, 10)) AS n_saddles,
             CAST(sum(CASE WHEN idx IN (0, 15) THEN 0 WHEN idx IN (5, 10) THEN 2 ELSE 1 END) AS BIGINT) AS n_segments
           FROM cells GROUP BY 1, 2)
         SELECT (CASE WHEN ab.swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(ab.swlat) AS VARCHAR),2,'0') ||
                 CASE WHEN ab.swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(ab.swlng) AS VARCHAR),3,'0')) AS image_id,
           CAST(1800 AS INT) AS threshold, ab.n_above, cc.n_cut, cc.n_saddles, cc.n_segments
         FROM ab JOIN cc ON ab.swlng = cc.swlng AND ab.swlat = cc.swlat
         ORDER BY image_id""",
    // position-weighted moments of the closed-form grid; augmented lanes
    // come from the permutation identities on a 601-grid (m = 600):
    // flip_h keeps Σv·r and mirrors Σv·c to m·Σv − Σv·c; flip_v mirrors
    // the row moment; rot90 (out(r,c) = in(m−c, r)) sends (rm, cm) to
    // (cm, m·Σv − rm). The engine earns its values through the real
    // permute → HGT encode → decode chain.,
    "geo_idw_loocv" ->
      """WITH st AS (SELECT s_suppkey AS st_id, (s_suppkey*37) % 500 AS x,
           (s_suppkey*53) % 500 AS y, s_suppkey % 200 + 50 AS v
           FROM supplier),
         nb AS (SELECT a.st_id, a.v AS va,
             1000000000 // greatest((a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y), 1) AS w,
             b.v AS nv
           FROM st a JOIN st b ON b.st_id <> a.st_id
             AND (a.x-b.x)*(a.x-b.x)+(a.y-b.y)*(a.y-b.y) <= 14400),
         g AS (SELECT st_id, CAST(count(*) AS BIGINT) AS n_nb,
             max(va) AS va, CAST(sum(w*nv) AS BIGINT) AS wv,
             CAST(sum(w) AS BIGINT) AS ws FROM nb GROUP BY 1)
         SELECT st_id, n_nb, wv * 1000 // ws AS pred_milli,
           va * 1000 AS actual_milli,
           abs(wv * 1000 // ws - va * 1000) AS abs_err_milli
         FROM g ORDER BY st_id""",
    // value-based RANGE frame over distinct cents levels,
    "tile_pyramid" ->
      """WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         px AS (SELECT swlng, swlat, sx.range AS sx, sy.range AS sy, r.range AS r, c.range AS c
           FROM corners, range(0,2) sx, range(0,2) sy, range(0,64) r, range(0,64) c),
         pos AS (SELECT swlng, swlat, sx, sy,
           (swlat + (sy*64 + r + 0.5)/128.0 - swlat) * 600 AS rowf,
           (swlng + (sx*64 + c + 0.5)/128.0 - swlng) * 600 AS colf FROM px),
         eg AS (SELECT *, CAST(floor(colf) AS BIGINT) AS c0, CAST(floor(rowf) AS BIGINT) AS r0,
           colf - floor(colf) AS cf, rowf - floor(rowf) AS rf,
           ((swlng+180)*7 + (swlat+90)*11) % 1000 AS a FROM pos),
         ev AS (SELECT *,
           a + 2*c0     + 3*r0     + ((c0//8)*(r0//8)) % 32         AS v00,
           a + 2*(c0+1) + 3*r0     + (((c0+1)//8)*(r0//8)) % 32     AS v10,
           a + 2*(c0+1) + 3*(r0+1) + (((c0+1)//8)*((r0+1)//8)) % 32 AS v11,
           a + 2*c0     + 3*(r0+1) + ((c0//8)*((r0+1)//8)) % 32     AS v01 FROM eg),
         e AS (SELECT swlng, swlat, sx, sy,
           ((v00 + (v10 - v00) * cf) +
            ((v01 + (v11 - v01) * cf) - (v00 + (v10 - v00) * cf)) * rf) + 32768.0 AS ee FROM ev),
         t AS (SELECT swlng, swlat, sx, sy,
           CAST(floor(ee / 256) AS BIGINT) AS tr,
           CAST(trunc(ee % 256) AS BIGINT) AS tg,
           CAST(floor((ee - floor(ee)) * 256) AS BIGINT) AS tb FROM e)
         SELECT (CASE WHEN swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(swlat) AS VARCHAR),2,'0') ||
                 CASE WHEN swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(swlng) AS VARCHAR),3,'0')) AS image_id,
           CAST(sx AS INT) AS sx, CAST(sy AS INT) AS sy,
           count(*) AS n_px, CAST(sum(tr) AS BIGINT) AS r_sum,
           CAST(sum(tg) AS BIGINT) AS g_sum, CAST(sum(tb) AS BIGINT) AS b_sum
         FROM t GROUP BY swlng, swlat, sx, sy ORDER BY image_id, sx, sy""",
    // trunc-div gaps in whole seconds; variance numerator in HUGEINT,
    // value int64 by construction,
    "geo_pit_census" -> {
      val ctr = gridV("c.range", "r.range")
      val nmin = "LEAST(" +
        (for { dr <- -1 to 1; dc <- -1 to 1; if dr != 0 || dc != 0 }
          yield gridV(s"c.range+($dc)", s"r.range+($dr)")).mkString(", ") + ")"
      s"""WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         k AS (SELECT swlng, swlat,
             ((swlng+180)*7 + (swlat+90)*11) % 1000 AS a FROM corners),
         px AS (SELECT swlng, swlat, ($nmin) - ($ctr) AS dgap
           FROM k, range(1,599) r, range(1,599) c)
         SELECT (CASE WHEN swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(swlat) AS VARCHAR),2,'0') ||
             CASE WHEN swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(swlng) AS VARCHAR),3,'0')) AS image_id,
           CAST(count(*) AS BIGINT) AS n_interior,
           CAST(sum(CASE WHEN dgap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pits,
           CAST(sum(CASE WHEN dgap > 0 THEN dgap ELSE 0 END) AS BIGINT) AS depth_sum
         FROM px GROUP BY 1 ORDER BY image_id"""
    },
    // closed-form byte replay, lag/lead Catmull-Rom half-samples,
    "geo_antimeridian_split" ->
      """WITH seg AS (SELECT s_suppkey AS seg_id,
           177000000 + (s_suppkey % 30) * 100000 AS lng1,
           30000000 + (s_suppkey % 50) * 200000 AS lat1,
           CASE WHEN s_suppkey % 4 = 0 THEN 179800000
             ELSE -180000000 + ((s_suppkey * 3) % 25) * 100000 END AS lng2,
           30000000 + (s_suppkey % 50) * 200000
             + (s_suppkey % 30) * 100000 AS lat2
           FROM supplier)
         SELECT seg_id,
           CASE WHEN lng2 < 0 THEN 1 ELSE 0 END AS crosses,
           CAST(CASE WHEN lng2 < 0 THEN lat1 + (lat2 - lat1) * (180000000 - lng1)
               // ((180000000 - lng1) + (lng2 + 180000000))
             ELSE NULL END AS BIGINT) AS lat_cross_micro,
           CAST(CASE WHEN lng2 < 0
             THEN (180 - lng1 // 1000000) + ((lng2 + 180000000) // 1000000 + 1)
             ELSE greatest(lng1, lng2) // 1000000
               - least(lng1, lng2) // 1000000 + 1 END AS BIGINT) AS n_tiles
         FROM seg ORDER BY seg_id""",
    // 1-based list positions shifted to 0-based, same quantized argmax,
    "geo_fill_depressions" -> {
      val gv = gridV("c.range + 80", "r.range + 80")
      val rounds = (1 to 32).map { k =>
        s"""f$k AS MATERIALIZED (SELECT cl.swlng, cl.swlat, cl.r, cl.c, cl.v,
            CASE WHEN cl.r = 0 OR cl.c = 0 OR cl.r = 39 OR cl.c = 39 THEN cl.v
              ELSE GREATEST(cl.v, MIN(p.fv)) END AS fv
          FROM cells cl JOIN f${k - 1} p ON p.swlng = cl.swlng
            AND p.swlat = cl.swlat AND p.r BETWEEN cl.r - 1 AND cl.r + 1
            AND p.c BETWEEN cl.c - 1 AND cl.c + 1
            AND NOT (p.r = cl.r AND p.c = cl.c)
          GROUP BY cl.swlng, cl.swlat, cl.r, cl.c, cl.v)"""
      }.mkString(",\n         ")
      s"""WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         k AS (SELECT swlng, swlat,
             ((swlng+180)*7 + (swlat+90)*11) % 1000 AS a FROM corners),
         cells AS MATERIALIZED (SELECT swlng, swlat, r.range AS r, c.range AS c,
             CAST($gv AS BIGINT) AS v
           FROM k, range(0,40) r, range(0,40) c),
         f0 AS MATERIALIZED (SELECT swlng, swlat, r, c, v,
             CASE WHEN r = 0 OR c = 0 OR r = 39 OR c = 39 THEN v
               ELSE 1000000000 END AS fv
           FROM cells),
         $rounds
         SELECT (CASE WHEN swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(swlat) AS VARCHAR),2,'0') ||
             CASE WHEN swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(swlng) AS VARCHAR),3,'0')) AS image_id,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(CASE WHEN fv > v THEN 1 ELSE 0 END) AS BIGINT) AS n_raised,
           CAST(sum(CASE WHEN fv > v THEN fv - v ELSE 0 END) AS BIGINT) AS fill_volume
         FROM f32 GROUP BY 1 ORDER BY image_id"""
    },
    // 4 unrolled elections with EXISTS-neighbour milli discounts,
    "geo_emerging_hotspot" ->
      """WITH pts AS (SELECT user_id, ts, event_id,
           event_id % 7 AS dx, (event_id * 3) % 5 AS dy FROM events),
         cw AS (SELECT user_id, ts, event_id,
             CAST(sum(dx) OVER w AS BIGINT) AS px,
             CAST(sum(dy) OVER w AS BIGINT) AS py
           FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         k AS (SELECT (px // 6) * 1000000 + (py // 4) AS cell,
             epoch_us(ts) // 86400000000 AS day FROM cw),
         d0 AS (SELECT min(day) AS d0 FROM k),
         b AS (SELECT cell, (day - d0) // 15 AS bin FROM k, d0
           WHERE (day - d0) // 15 < 6),
         cnt AS (SELECT cell, bin, CAST(count(*) AS BIGINT) AS c
           FROM b GROUP BY 1, 2),
         grid AS (SELECT cells.cell, CAST(g AS BIGINT) AS bin
           FROM (SELECT DISTINCT cell FROM cnt) cells,
             unnest(range(0, 6)) AS t(g)),
         f AS (SELECT grid.cell, grid.bin, COALESCE(cnt.c, 0) AS c
           FROM grid LEFT JOIN cnt ON cnt.cell = grid.cell
             AND cnt.bin = grid.bin),
         mk AS (SELECT x.cell, CAST(sum(CASE WHEN y.c > x.c THEN 1
             WHEN y.c < x.c THEN -1 ELSE 0 END) AS BIGINT) AS s_mk
           FROM f x JOIN f y ON y.cell = x.cell AND x.bin < y.bin
           GROUP BY 1),
         fl AS (SELECT cell,
             CAST(sum(CASE WHEN bin = 0 THEN c END) AS BIGINT) AS first_c,
             CAST(sum(CASE WHEN bin = 5 THEN c END) AS BIGINT) AS last_c,
             CAST(sum(c) AS BIGINT) AS total
           FROM f GROUP BY 1)
         SELECT fl.cell, s_mk, first_c, last_c, total,
           CASE WHEN s_mk >= 8 THEN 'intensifying'
             WHEN s_mk <= -8 THEN 'diminishing'
             WHEN first_c = 0 AND last_c > 0 THEN 'new'
             ELSE 'stable' END AS class
         FROM fl JOIN mk ON mk.cell = fl.cell ORDER BY fl.cell""",
    // gaps-and-islands runs over quantized levels, per-run floors,
    "geo_cost_corridor" -> {
      def relax(p: String, edge: String) = (1 to 6).map { r =>
        s"""$p$r AS (SELECT node, min(dist) AS dist FROM (
              SELECT node, dist FROM $p${r - 1}
              UNION ALL
              SELECT $edge.dst AS node, q.dist + $edge.w AS dist
              FROM $p${r - 1} q JOIN $edge ON $edge.src = q.node) GROUP BY node)"""
      }.mkString(",\n         ")
      s"""WITH g AS (SELECT range AS id, range // 100 AS i, range % 100 AS j
             FROM range(0, 10000)),
         nb(di, dj) AS (VALUES (1,0),(1,1),(0,1),(-1,1),(-1,0),(-1,-1),(0,-1),(1,-1)),
         e AS (SELECT i*100 + j AS src, (i+di)*100 + (j+dj) AS dst,
             1 + GREATEST(0,
               (((i+di)*(i+di))%97 + ((j+dj)*(j+dj))%89 + ((i+di)*(j+dj))%31)
               - ((i*i)%97 + (j*j)%89 + (i*j)%31)) AS w
           FROM g, nb
           WHERE i+di BETWEEN 0 AND 99 AND j+dj BETWEEN 0 AND 99),
         er AS (SELECT dst AS src, src AS dst, w FROM e),
         f0(node, dist) AS (SELECT 5050, 0),
         ${relax("f", "e")},
         b0(node, dist) AS (SELECT 5555, 0),
         ${relax("b", "er")},
         bc AS (SELECT dist AS best FROM f6 WHERE node = 5555),
         j AS (SELECT f6.node, f6.dist + b6.dist AS tot
           FROM f6 JOIN b6 USING (node))
         SELECT CAST(best AS BIGINT) AS best_cost,
           CAST(count(*) AS BIGINT) AS n_corridor,
           CAST(sum(CASE WHEN tot = best THEN 1 ELSE 0 END) AS BIGINT) AS n_optimal,
           CAST(sum(CASE WHEN tot <= best + 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_tight
         FROM j, bc WHERE tot <= best + 50 GROUP BY best"""
    },
    // same planes/bucket, 9-probe expansion, exact truth join,
    "geo_landform_class" -> {
      val gv = gridV("c.range + 100", "r.range + 100")
      s"""WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         k AS (SELECT swlng, swlat,
             ((swlng+180)*7 + (swlat+90)*11) % 1000 AS a FROM corners),
         cells AS MATERIALIZED (SELECT swlng, swlat, r.range AS r,
             c.range AS c, CAST($gv AS BIGINT) AS v
           FROM k, range(0,100) r, range(0,100) c),
         pxx AS (SELECT p.swlng, p.swlat, p.r, p.c, p.v,
             CAST(sum(CASE WHEN b.r BETWEEN p.r-2 AND p.r+2
               AND b.c BETWEEN p.c-2 AND p.c+2 THEN b.v END) AS BIGINT) AS ss,
             CAST(sum(b.v) AS BIGINT) AS sl
           FROM cells p JOIN cells b ON b.swlng = p.swlng
             AND b.swlat = p.swlat AND b.r BETWEEN p.r-6 AND p.r+6
             AND b.c BETWEEN p.c-6 AND p.c+6
           WHERE p.r BETWEEN 6 AND 93 AND p.c BETWEEN 6 AND 93
           GROUP BY 1, 2, 3, 4, 5),
         cl AS (SELECT swlng, swlat,
             CASE WHEN 25*v - ss > 0 THEN 1 WHEN 25*v - ss < 0 THEN -1
               ELSE 0 END AS class_s,
             CASE WHEN 169*v - sl > 0 THEN 1 WHEN 169*v - sl < 0 THEN -1
               ELSE 0 END AS class_l
           FROM pxx)
         SELECT (CASE WHEN swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(swlat) AS VARCHAR),2,'0') ||
             CASE WHEN swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(swlng) AS VARCHAR),3,'0')) AS image_id,
           CAST(class_s AS INT) AS class_s, CAST(class_l AS INT) AS class_l,
           CAST(count(*) AS BIGINT) AS n_pixels
         FROM cl GROUP BY 1, 2, 3 ORDER BY image_id, class_s, class_l"""
    },
    // four candidate sets, distinct-vs-total with ppm duplication,
    "geo_irradiance_sum" -> {
      val values = sunVectors.map { case (sx, sy, sz) => s"($sx, $sy, $sz)" }
        .mkString(",")
      val dzdx = s"(${gridV("c.range+1", "r.range")}) - (${gridV("c.range-1", "r.range")})"
      val dzdy = s"(${gridV("c.range", "r.range+1")}) - (${gridV("c.range", "r.range-1")})"
      s"""WITH suns(sx, sy, sz) AS (VALUES $values),
         corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         k AS (SELECT swlng, swlat,
             ((swlng+180)*7 + (swlat+90)*11) % 1000 AS a FROM corners),
         px AS (SELECT swlng, swlat, r.range AS r, c.range AS c,
             $dzdx AS dzdx, $dzdy AS dzdy
           FROM k, range(1,599) r, range(1,599) c
           WHERE r.range % 4 = 1 AND c.range % 4 = 1),
         d AS (SELECT swlng, swlat, r, c,
             CAST(sum(CASE WHEN -dzdx*sx - dzdy*sy + 2*sz > 0
               THEN -dzdx*sx - dzdy*sy + 2*sz ELSE 0 END) AS BIGINT) AS irr,
             max(CASE WHEN -dzdx*sx - dzdy*sy + 2*sz > 0 THEN 1 ELSE 0 END) AS lit
           FROM px, suns GROUP BY 1, 2, 3, 4)
         SELECT (CASE WHEN swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(swlat) AS VARCHAR),2,'0') ||
             CASE WHEN swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(swlng) AS VARCHAR),3,'0')) AS image_id,
           CAST(count(*) AS BIGINT) AS n_samples,
           CAST(sum(irr) AS BIGINT) AS irr_q_sum,
           CAST(sum(1 - lit) AS BIGINT) AS n_dark
         FROM d GROUP BY 1 ORDER BY image_id"""
    },
    // per-arm OLS pieces on the pre-period, cross-multiplied slope diff,
    "geo_swath_profile" -> {
      val gv = gridV("c.range", "r.range")
      s"""WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         k AS (SELECT swlng, swlat,
             ((swlng+180)*7 + (swlat+90)*11) % 1000 AS a FROM corners),
         px AS (SELECT swlng, swlat, CAST($gv AS BIGINT) AS v,
             (r.range - 100) * 400 + c.range * 599 AS tn,
             (r.range - 100) * 599 - c.range * 400 AS crs
           FROM k, range(0,600) r, range(0,600) c),
         sw AS (SELECT swlng, swlat,
             LEAST(49, tn * 50 // 518801) AS bin, v
           FROM px WHERE tn >= 0 AND tn <= 518801
             AND crs * crs <= 207520400)
         SELECT (CASE WHEN swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(swlat) AS VARCHAR),2,'0') ||
             CASE WHEN swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(swlng) AS VARCHAR),3,'0')) AS image_id,
           CAST(bin AS BIGINT) AS bin, CAST(count(*) AS BIGINT) AS n_cells,
           CAST(min(v) AS BIGINT) AS min_v, CAST(max(v) AS BIGINT) AS max_v,
           CAST(sum(v) AS BIGINT) AS sum_v
         FROM sw GROUP BY 1, 2 ORDER BY image_id, bin"""
    },
    // per-user 45-day pre/post counts, arm pieces + pooled theta fraction,
    "geo_normal_dispersion" -> {
      val dzdx = s"(${gridV("c.range+1", "r.range")}) - (${gridV("c.range-1", "r.range")})"
      val dzdy = s"(${gridV("c.range", "r.range+1")}) - (${gridV("c.range", "r.range-1")})"
      s"""WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         k AS (SELECT swlng, swlat,
             ((swlng+180)*7 + (swlat+90)*11) % 1000 AS a FROM corners),
         px AS (SELECT swlng, swlat, $dzdx AS dzdx, $dzdy AS dzdy
           FROM k, range(1,599) r, range(1,599) c
           WHERE r.range % 2 = 1 AND c.range % 2 = 1),
         agg AS (SELECT swlng, swlat, CAST(count(*) AS BIGINT) AS n_samples,
             CAST(sum(-dzdx) AS BIGINT) AS sx,
             CAST(sum(-dzdy) AS BIGINT) AS sy
           FROM px GROUP BY 1, 2)
         SELECT (CASE WHEN swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(swlat) AS VARCHAR),2,'0') ||
             CASE WHEN swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(swlng) AS VARCHAR),3,'0')) AS image_id,
           n_samples, sx, sy, 2 * n_samples AS sz,
           sx * sx + sy * sy + 4 * n_samples * n_samples AS r2
         FROM agg ORDER BY image_id"""
    },
    // digit-length histogram of exact cents, ppm shares,
    "geo_area_weighted_interp" -> {
      val gv = gridV("c.range", "r.range")
      s"""WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         k AS (SELECT swlng, swlat,
             ((swlng+180)*7 + (swlat+90)*11) % 1000 AS a FROM corners),
         px AS (SELECT swlng, swlat, r.range AS r, c.range AS c,
             CAST($gv AS BIGINT) AS v
           FROM k, range(0,600) r, range(0,600) c),
         src AS (SELECT swlng, swlat, r // 200 AS sr, c // 200 AS sc,
             CAST(sum(v) AS BIGINT) AS ssum FROM px GROUP BY 1, 2, 3, 4),
         tgt AS (SELECT swlng, swlat, r // 150 AS tr, c // 150 AS tc,
             CAST(sum(v) AS BIGINT) AS tsum FROM px GROUP BY 1, 2, 3, 4),
         est AS (SELECT t.swlng, t.swlat, t.tr, t.tc,
             CAST(sum(GREATEST(0, LEAST(s.sr*200+200, t.tr*150+150)
                 - GREATEST(s.sr*200, t.tr*150))
               * GREATEST(0, LEAST(s.sc*200+200, t.tc*150+150)
                 - GREATEST(s.sc*200, t.tc*150))
               * s.ssum) // 40000 AS BIGINT) AS est
           FROM (SELECT DISTINCT swlng, swlat, tr, tc FROM tgt) t
           JOIN src s ON s.swlng = t.swlng AND s.swlat = t.swlat
           GROUP BY 1, 2, 3, 4)
         SELECT (CASE WHEN est.swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(est.swlat) AS VARCHAR),2,'0') ||
             CASE WHEN est.swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(est.swlng) AS VARCHAR),3,'0')) AS image_id,
           CAST(est.tr AS INT) AS tr, CAST(est.tc AS INT) AS tc,
           est AS est_scaled, tsum AS true_sum,
           abs(est - tsum) AS abs_err
         FROM est JOIN tgt ON tgt.swlng = est.swlng
           AND tgt.swlat = est.swlat AND tgt.tr = est.tr AND tgt.tc = est.tc
         ORDER BY image_id, est.tr, est.tc"""
    },
    // modal night/day cells with (count desc, cell) ties, inner join,
    "geo_join_selectivity" ->
      """WITH pts AS (SELECT
           ((l_orderkey*8 + l_linenumber)*2000 + l_partkey)*100 + l_suppkey AS point_id,
           -120 + (l_orderkey % 4) + ((l_partkey % 600) + 0.5)/600.0 AS lng,
           36 + (l_suppkey % 2) + (((l_suppkey*7 + l_linenumber*131) % 600) + 0.5)/600.0 AS lat
           FROM lineitem),
         pk AS (SELECT point_id, lng, lat,
             CAST(floor(lng * 10.0) AS BIGINT) AS cx,
             CAST(floor(lat * 10.0) AS BIGINT) AS cy FROM pts),
         polys AS (SELECT s_suppkey AS poly_id,
             -120.0 + (s_suppkey % 40) * 0.1 AS cpx,
             36.0 + ((s_suppkey * 3) % 20) * 0.1 AS cpy,
             0.05 + (s_suppkey % 7) * 0.013 AS w,
             0.04 + (s_suppkey % 5) * 0.017 AS h
           FROM supplier),
         pb AS (SELECT poly_id, cpx - w AS minx, cpx + w AS maxx,
             cpy - h AS miny, cpy + h AS maxy FROM polys),
         pcells AS (SELECT poly_id, minx, maxx, miny, maxy,
             CAST(gx AS BIGINT) AS cx, CAST(gy AS BIGINT) AS cy
           FROM pb,
             unnest(range(CAST(floor(minx * 10.0) AS BIGINT),
               CAST(floor(maxx * 10.0) AS BIGINT) + 1)) AS tx(gx),
             unnest(range(CAST(floor(miny * 10.0) AS BIGINT),
               CAST(floor(maxy * 10.0) AS BIGINT) + 1)) AS ty(gy)),
         ph AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS np
           FROM pk GROUP BY 1, 2),
         gh AS (SELECT cx, cy, CAST(count(*) AS BIGINT) AS ng
           FROM pcells GROUP BY 1, 2),
         est AS (SELECT CAST(sum(np * ng) AS BIGINT) AS est_pairs
           FROM ph JOIN gh USING (cx, cy)),
         act AS (SELECT CAST(count(*) AS BIGINT) AS actual_pairs FROM (
           SELECT DISTINCT point_id, poly_id
           FROM pk JOIN pcells USING (cx, cy)
           WHERE lng >= minx AND lng <= maxx
             AND lat >= miny AND lat <= maxy) t)
         SELECT (SELECT CAST(count(*) AS BIGINT) FROM pk) AS n_points,
           (SELECT CAST(count(*) AS BIGINT) FROM pb) AS n_polys,
           est_pairs, actual_pairs,
           CAST(1000000 * actual_pairs // est_pairs AS BIGINT) AS ratio_ppm
         FROM est, act""",
    // two nearest lists per query, corpus-scan fraction in ppm,
    "geo_terrain_rose" -> {
      val gx = s"(${gridV("c.range+1", "r.range")}) - (${gridV("c.range-1", "r.range")})"
      val gy = s"(${gridV("c.range", "r.range+1")}) - (${gridV("c.range", "r.range-1")})"
      s"""WITH corners(swlng, swlat) AS (VALUES (-120,36),(-120,37),(-119,36),(-119,37),(-118,36),(-117,37)),
         k AS (SELECT swlng, swlat,
             ((swlng+180)*7 + (swlat+90)*11) % 1000 AS a FROM corners),
         g AS (SELECT swlng, swlat, $gx AS gx, $gy AS gy
           FROM k, range(1,599) r, range(1,599) c),
         cl AS (SELECT swlng, swlat,
             CASE WHEN gx = 0 AND gy = 0 THEN -1
               WHEN gx > 0 AND gy >= 0 THEN
                 CASE WHEN gx > gy THEN 0 ELSE 1 END
               WHEN gx <= 0 AND gy > 0 THEN
                 CASE WHEN gy > -gx THEN 2 ELSE 3 END
               WHEN gx < 0 AND gy <= 0 THEN
                 CASE WHEN -gx > -gy THEN 4 ELSE 5 END
               ELSE CASE WHEN -gy > gx THEN 6 ELSE 7 END END AS octant,
             CASE WHEN gx*gx + gy*gy <= 200 THEN 0
               WHEN gx*gx + gy*gy <= 800 THEN 1 ELSE 2 END AS band
           FROM g)
         SELECT (CASE WHEN swlat < 0 THEN 'S' ELSE 'N' END || lpad(CAST(abs(swlat) AS VARCHAR),2,'0') ||
             CASE WHEN swlng < 0 THEN 'W' ELSE 'E' END || lpad(CAST(abs(swlng) AS VARCHAR),3,'0')) AS image_id,
           CAST(octant AS INT) AS octant, CAST(band AS INT) AS band,
           CAST(count(*) AS BIGINT) AS n_cells
         FROM cl GROUP BY 1, 2, 3 ORDER BY image_id, octant, band"""
    },
    // duration x 8 samples/ms contract, signed truncating ppm drift
  )
}
