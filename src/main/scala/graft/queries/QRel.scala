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

/** Relational-core gates: aggregates, joins, windows, SQL surface
  * (23 entries) with the DuckDB oracle SQL beside each query.
  * Moved verbatim from SparkEntry (round-5 split, VERDICT r4 #5).
  */
object QRel {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (A1-analogs, joins, windows) ----
    "q1_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1999-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc"),
          avg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),
    "q3_topk" -> ((s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders").filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem").filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_orderdate", "revenue")
    }),
    "q5_multijoin" -> ((s, dir) => {
      t(s, dir, "region").filter(col("r_name") === "ASIA")
        .join(t(s, dir, "nation"), col("r_regionkey") === col("n_regionkey"))
        .join(t(s, dir, "customer"), col("n_nationkey") === col("c_nationkey"))
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"))
        .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
        .join(t(s, dir, "supplier"),
          col("l_suppkey") === col("s_suppkey") && col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("n_name"))
    }),
    "q_window" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("run_total",
          round(sum(col("o_totalprice")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "rn", "run_total")
        .orderBy("o_custkey", "rn")
    }),
    // PIVOT surface: month × order-status wide table (the reshape every
    // BI layer emits) — Spark's relational groupBy().pivot() with an
    // explicit value list (one pass, no per-status scan); absent cells
    // stay NULL on both engines.
    // GROUPING SETS surface — the BI reshape between q_pivot and
    // events_cube/rollup: four explicit sets over (month, status) in ONE
    // expand-and-aggregate pass (Spark's Expand node, never four scans);
    // the null pattern distinguishes the sets, exact integer cents.,
    "q_grouping_sets" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders_gs")
      s.sql(
        """SELECT mon, status, count(1) AS n, sum(cents) AS sum_cents
          |FROM (SELECT month(o_orderdate) AS mon, o_orderstatus AS status,
          |        CAST(FLOOR(o_totalprice * 100.0D + 0.5D) AS BIGINT) AS cents
          |      FROM orders_gs)
          |GROUP BY GROUPING SETS ((mon, status), (mon), (status), ())
          |ORDER BY mon, status""".stripMargin)
    }),
    "q_pivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("mon", month(col("o_orderdate")))
        .groupBy("mon").pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(round(sum("o_totalprice"), 2))
        .orderBy("mon")
    }),
    // UNPIVOT surface — q_pivot's inverse reshape (wide month×status grid
    // back to long triples): Spark's `stack` table generator fans the three
    // status columns into rows in ONE projection pass (no union of three
    // scans); NULL cells are excluded on both engines (DuckDB UNPIVOT's
    // default). Exact integer cents so the gate is bit-exact.,
    "q_unpivot" -> ((s, dir) => {
      t(s, dir, "orders")
        .withColumn("mon", month(col("o_orderdate")))
        .groupBy("mon").pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum(expr("CAST(FLOOR(o_totalprice * 100.0D + 0.5D) AS BIGINT)")))
        .selectExpr("mon", "stack(3, 'F', `F`, 'O', `O`, 'P', `P`) AS (status, cents)")
        .filter(col("cents").isNotNull)
        .orderBy("mon", "status")
    }),
    // SKYLINE / Pareto front (ops.Skyline.skyline2d): the orders nobody
    // beats on BOTH price and date (minimize both) — the classic
    // multi-criteria operator, answered by the sorted-scan window identity
    // (never the quadratic dominance self-join the oracle states
    // definitionally). Integer cents + epoch days; duplicates
    // pre-aggregated so the (x, y) order is total.,
    "q_skyline" -> ((s, dir) => {
      val pairs = t(s, dir, "orders")
        .filter(col("o_orderkey") % 5 === 0)
        .selectExpr(
          "CAST(FLOOR(o_totalprice * 100.0D + 0.5D) AS BIGINT) AS price_c",
          "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000 AS day")
        .groupBy("price_c", "day").agg(count(lit(1)).as("n"))
      ops.Skyline.skyline2d(pairs, "price_c", "day")
        .orderBy("price_c")
    }),
    // A1: Welford-equivalent single-pass stats + z>=2 outlier flagging
    // (reference src/s3Fetcher.ts:33-52), on exact-integer moments so the
    // oracle matches bit-for-bit.,
    "q_antijoin" -> ((s, dir) => {
      val recent = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      t(s, dir, "customer")
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n_customers"))
        .orderBy("c_mktsegment")
    }),
    // Semi-join: suppliers with shipped lineitems, per nation.,
    "q_semijoin" -> ((s, dir) => {
      t(s, dir, "supplier")
        .join(t(s, dir, "lineitem"), col("s_suppkey") === col("l_suppkey"), "left_semi")
        .groupBy("s_nationkey").agg(count(lit(1)).as("n_suppliers"))
        .orderBy("s_nationkey")
    }),
    // Spatial-occupancy skew audit: the z14 cell histogram's head — the
    // hotspot diagnostic that motivates the salted/adaptive PIP paths
    // (events_key_skew's spatial sibling). Per-cell count is map-side
    // combined; the global top-10 ranks the ALREADY-aggregated cell rows
    // (bounded by distinct cells, never points); share in exact ppm.,
    "sql_surface" -> ((s, dir) => {
      functions.spatial.register(s)
      functions.cells.register(s)
      quadrantPoints(s, dir).createOrReplaceTempView("pts")
      s.sql("""SELECT point_id, tile_key(lng, lat) AS tile_key,
                      s2_cell(lng, lat, 10) AS cell10,
                      hex_cell(lng, lat, 7) AS hex7
               FROM pts ORDER BY point_id""")
    }),

    // ---- training-data pipeline ops ----,
    "q_full_outer" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      def spend(pred: String, nm: String) = ev.filter(expr(pred))
        .groupBy("user_id")
        .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as(nm))
      spend("ts < timestamp'2024-01-16'", "pre_cents")
        .join(spend("ts >= timestamp'2024-01-16'", "post_cents"),
          Seq("user_id"), "full_outer")
        .withColumn("status", expr(
          "CASE WHEN pre_cents IS NULL THEN 'post_only' " +
            "WHEN post_cents IS NULL THEN 'pre_only' ELSE 'both' END"))
        .withColumn("delta_cents",
          expr("coalesce(post_cents, 0) - coalesce(pre_cents, 0)"))
        .orderBy("user_id")
    }),
    // Concentric ring-buffer census around the literal incident centers:
    // fixes per squared-radius ring per center — the facility-catchment
    // profile; centers broadcast, one rollup.,
    "q_org_paths" -> ((s, dir) => {
      val nodes = t(s, dir, "supplier")
        .selectExpr("s_suppkey % 40 AS n").distinct()
        .localCheckpoint(false)
      var frontier = nodes.filter(col("n") === 0)
        .select(col("n"), lit(0).as("depth"), lit("0").as("path"))
        .localCheckpoint(false)
      var out = frontier
      for (k <- 1 to 4) {
        frontier = nodes.filter(col("n") > 0)
          .withColumn("parent", expr("n DIV 3"))
          .join(frontier.select(col("n").as("parent"),
            col("path").as("ppath")), "parent")
          .select(col("n"), lit(k).as("depth"),
            concat(col("ppath"), lit("/"), col("n").cast("string"))
              .as("path"))
          .localCheckpoint(false)
        out = out.unionAll(frontier)
      }
      out.orderBy("n")
    }),
    // Degree-mixing statistics (ops.Graph.degreeMix): the assortativity
    // moments as ONE exact-integer row — num/den of Newman's r assembled,
    // the float division left to the consumer. One degree count + two
    // node-keyed joins + one global agg.,
    "q_listagg" -> ((s, dir) => {
      t(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("nation"))
        .agg(count(lit(1)).as("n_sup"),
          concat_ws(",", sort_array(collect_list(col("s_name"))))
            .as("names_csv"))
        .orderBy("nation")
    }),
    // Two-sample Kolmogorov–Smirnov test on per-user engagement (the
    // distribution-level A/B read events_ab_test's proportion z-test
    // can't see): per event_type, users split by id parity, D = sup
    // |F₁−F₂| over the pooled support as the EXACT integer
    // d_num = max|c1·n2 − c2·n1| (denominator n1·n2), d_ppm the floored
    // consumer view, and the α=0.05 decision by cross-multiplied squares
    // (c² = 1.358² scaled to ppm — no float anywhere). One user-keyed
    // agg + one value-ordered window per type.,
    "q_null_semantics" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val ev = t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CASE WHEN value >= 50 THEN NULL " +
            "ELSE CAST(round(value * 100) AS BIGINT) END").as("v"))
        .withColumn("pv", lag("v", 1).over(w))
      ev.agg(count(lit(1)).as("n_rows"), count(col("v")).as("n_nonnull"),
        countDistinct(col("v")).as("n_distinct"),
        sum(when(col("v") <=> col("pv"), 1L).otherwise(0L))
          .as("n_nullsafe_eq"),
        sum(when(col("v") === col("pv"), 1L).otherwise(0L))
          .as("n_plain_eq"))
    }),
    // Ranking AUC of exact Jaccard vs the planted duplicate truth: the
    // doubled-midrank U statistic over pair scores (label = same base id)
    // — threshold-free separability of the similarity signal, the ML-eval
    // read above dedup_minhash_precision's fixed threshold.,
    "q_interval_shift" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(expr("ts < timestamp'2024-01-03'"))
        .groupBy(expr("date_trunc('hour', ts + INTERVAL 90 MINUTE)")
          .as("shifted_hr"))
        .agg(count(lit(1)).as("n"))
        .orderBy("shifted_hr")
    }),
    // Per-source document-length quantiles: nearest-rank p50/p90 word
    // counts — the corpus-shape profile under text_lang_profile's means.,
    "q_decimal_money" -> ((s, dir) => {
      t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          expr("CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) " +
            "AS DECIMAL(18,2))").as("total_price"),
          expr("CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) " +
            "AS DECIMAL(18,2))").as("max_price"))
        .orderBy("o_orderstatus")
    }),
    // Targeted-attack resilience: largest component before vs after
    // removing the 5 highest-degree hubs (ties by node id) — the
    // robustness read scale-free graphs fail; two star-CC passes.,
    "q_bom_explode" -> ((s, dir) => {
      val edges = t(s, dir, "lineitem")
        .filter(col("l_orderkey") % 97 === 0)
        .selectExpr("least(l_partkey % 300, l_suppkey % 300) AS parent",
          "greatest(l_partkey % 300, l_suppkey % 300) AS child")
        .filter(col("parent") =!= col("child"))
        .withColumn("qty", expr("1 + (parent * 31 + child * 17) % 4"))
      ops.Graph.bomRollup(edges, maxDepth = 3).orderBy("root")
    }),
    // Per-row format fidelity (input_hint: decoded pixels allclose, PSNR
    // >= 40 dB for lossy): decode each payload (real javax.imageio for png),
    // compare against the closed-form grid it encodes. px_sum anchors the
    // decode arithmetic; sse (integer sum of squared pixel diffs vs the
    // closed form) anchors exactness (0 for the exact lanes is the decode
    // contract, stated by the oracle, computed by the engine from the real
    // decode); psnr_q = floor(psnr*100), sentinel 99999 = infinite. So the
    // PSNR FORMULA itself is exercised with a nonzero error on both sides,
    // a third "noisy" lane encodes the grid with +3 on every 97th sample:
    // its sse (9 per hit) and finite psnr_q (7993 = 79.93 dB, 0.05 from
    // the quantization boundary — safe against ulp-level log10 differences)
    // are recomputed by the oracle through the identical formula. (jpg's
    // finite PSNR >= 40 dB gate stays in CoreSpec — a lossy javax.imageio
    // decode is not SQL-recomputable.),
    "q_setops_all" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = ev.filter(expr("ts < timestamp'2024-01-16'"))
        .select((col("user_id") % 100).as("k"))
      val b = ev.filter(expr("ts >= timestamp'2024-01-16'"))
        .select((col("user_id") % 100).as("k"))
      a.exceptAll(b).agg(count(lit(1)).as("n_except_all"))
        .crossJoin(a.except(b).agg(count(lit(1)).as("n_except_distinct")))
        .crossJoin(a.intersectAll(b)
          .agg(count(lit(1)).as("n_intersect_all")))
    }),
    // Intervisibility matrix over the row-300 terrain profile: station
    // pairs see each other iff NO between-sample rises strictly above the
    // chord — the cross-multiplied integer line-of-sight test (the 1-D
    // core of viewshed networks / radio-link planning).,
    "q_range_frame" -> ((s, dir) => {
      val byCents = t(s, dir, "events")
        .groupBy(col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        .agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("event_type").orderBy("cents")
        .rangeBetween(-500L, 500L)
      byCents.withColumn("n_within", sum("n").over(w))
        .orderBy("event_type", "cents")
    }),
    // Mirror-symmetry census (ops.ImageOps.symmetryStats): Σ|v − mirror|
    // under horizontal and vertical flips over the even 600² prefix — the
    // flip-augmentation sanity read (a symmetric field makes flip
    // augmentation a no-op). Decode-once, one row per image.,
    "q_setops" -> ((s, dir) => {
      val ev = t(s, dir, "events")
      val a = ev.filter(expr("ts < timestamp'2024-01-16'"))
        .select("user_id").distinct()
      val b = ev.filter(expr("ts >= timestamp'2024-01-16'"))
        .select("user_id").distinct()
      a.intersect(b).agg(count(lit(1)).as("n_both"))
        .crossJoin(a.except(b).agg(count(lit(1)).as("n_only_pre")))
        .crossJoin(b.except(a).agg(count(lit(1)).as("n_only_post")))
    }),
    // Image near-dup CLUSTERING (ops.ImageOps.phashClusters): the phash
    // band pair graph contracted by star CC, keep = lexicographic-min
    // representative per visual-duplicate chain.,
    "q_any_all" -> ((s, dir) => {
      val sup = t(s, dir, "supplier")
        .withColumn("cents", expr("CAST(round(s_acctbal * 100) AS BIGINT)"))
      val reg = sup.join(t(s, dir, "nation"),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n_r"), sum("cents").as("sum_r"))
      val viol = sup.crossJoin(broadcast(reg))
        .filter(col("cents") * col("n_r") <= col("sum_r"))
        .select(col("s_suppkey")).distinct()
      sup.join(viol, Seq("s_suppkey"), "left_anti")
        .select("s_suppkey", "cents")
        .orderBy("s_suppkey")
    }),
    // Swath elevation profile (ops.ImageOps.swathProfile): 50 along-track
    // bins within cross-track 20 of the fixed chord.,
    "q_correlated_above_avg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .withColumn("cents", expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
      val cu = o.groupBy("o_custkey")
        .agg(count(lit(1)).as("n"), sum("cents").as("s"))
      o.join(cu, Seq("o_custkey"))
        .groupBy("o_custkey")
        .agg(max("n").as("n_orders"),
          sum(when(col("cents") * col("n") > col("s"), 1L).otherwise(0L))
            .as("n_above_own_avg"))
        .orderBy("o_custkey")
    }),
    // Semantic-balance contingency: IVF cluster x label counts with the
    // cross-multiplied independence deviation |n*G - R*C| per cell — is
    // each label spread across semantic clusters or concentrated (the
    // mixture-health check before cluster-stratified sampling)?
  )

  val sql: Map[String, String] = Map(
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc,
         avg(l_quantity) AS avg_qty, count(*) AS n
         FROM lineitem WHERE l_shipdate <= TIMESTAMP '1999-09-01'
         GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q3_topk" ->
      """SELECT o_orderkey, o_orderdate,
         round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM customer JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
           AND l_shipdate > TIMESTAMP '1998-01-01'
         GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10""",
    "q5_multijoin" ->
      """SELECT n_name, round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
         FROM region JOIN nation ON r_regionkey = n_regionkey
         JOIN customer ON n_nationkey = c_nationkey
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON o_orderkey = l_orderkey
         JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = n_nationkey
         WHERE r_name = 'ASIA' GROUP BY n_name ORDER BY n_name""",
    "q_window" ->
      """SELECT o_custkey, o_orderkey, rn, run_total FROM (
           SELECT o_custkey, o_orderkey,
             CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS INTEGER) AS rn,
             round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total
           FROM orders) WHERE rn <= 3 ORDER BY o_custkey, rn""",
    // pyramid: pixel centers are dyadic rationals ((k+0.5)/128 is exact in
    // binary), the bilinear runs in the engine's exact op order, and the
    // Terrarium triple of the sampled double is recomputed per pixel — the
    // engine's values additionally round-trip through real PNG bytes,
    "q_grouping_sets" ->
      """SELECT mon, status, CAST(count(1) AS BIGINT) AS n,
           CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM (SELECT CAST(month(o_orderdate) AS INT) AS mon,
                 o_orderstatus AS status,
                 CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
               FROM orders)
         GROUP BY GROUPING SETS ((mon, status), (mon), (status), ())
         ORDER BY mon, status""",
    "q_pivot" ->
      """SELECT CAST(month(o_orderdate) AS INT) AS mon,
           round(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2) AS "F",
           round(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS "O",
           round(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2) AS "P"
         FROM orders GROUP BY 1 ORDER BY mon""",
    // the wide grid rebuilt, then DuckDB's native UNPIVOT (NULL cells
    // excluded by default on both engines),
    "q_unpivot" ->
      """WITH w AS (SELECT CAST(month(o_orderdate) AS INT) AS mon,
           sum(CASE WHEN o_orderstatus = 'F' THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) END) AS "F",
           sum(CASE WHEN o_orderstatus = 'O' THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) END) AS "O",
           sum(CASE WHEN o_orderstatus = 'P' THEN CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) END) AS "P"
         FROM orders GROUP BY 1)
         SELECT mon, status, CAST(cents AS BIGINT) AS cents
         FROM w UNPIVOT (cents FOR status IN ("F", "O", "P"))
         ORDER BY mon, status""",
    // definitional dominance oracle: the engine answers via the sorted-scan
    // window identity, the oracle states NOT EXISTS dominance directly,
    "q_skyline" ->
      """WITH p AS (SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS price_c,
           epoch_us(o_orderdate) // 86400000000 AS day, count(*) AS n
           FROM orders WHERE o_orderkey % 5 = 0 GROUP BY 1, 2)
         SELECT r.price_c, r.day, r.n FROM p r
         WHERE NOT EXISTS (SELECT 1 FROM p s
           WHERE s.price_c <= r.price_c AND s.day <= r.day
             AND (s.price_c < r.price_c OR s.day < r.day))
         ORDER BY r.price_c""",
    // KM: curve rows (death time, deaths, at-risk) then the quantized
    // survival product replayed as a recursive CTE over ranked death times,
    "q_antijoin" ->
      """SELECT c_mktsegment, count(*) AS n_customers FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_orderdate >= TIMESTAMP '1997-01-01')
         GROUP BY 1 ORDER BY 1""",
    "q_semijoin" ->
      """SELECT s_nationkey, count(*) AS n_suppliers FROM supplier
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_suppkey = s_suppkey)
         GROUP BY 1 ORDER BY 1""",
    "sql_surface" -> {
      // compose: tile key formatting + S2 level 10 + hex res 7 over the same
      // quadrant points, each from its existing oracle building block
      val s2part = s2OracleSql(quadrantPtsCte, 10)
      val hexpart = hexOracleSql(quadrantPtsCte, 7)
      s"""WITH s2q AS ($s2part), hexq AS ($hexpart),
         pts AS ($quadrantPtsCte)
         SELECT p.point_id,
           (CASE WHEN floor(p.lat) < 0 THEN 'S' ELSE 'N' END ||
            lpad(CAST(CAST(abs(floor(p.lat)) AS BIGINT) AS VARCHAR), 2, '0') ||
            CASE WHEN floor(p.lng) < 0 THEN 'W' ELSE 'E' END ||
            lpad(CAST(CAST(abs(floor(p.lng)) AS BIGINT) AS VARCHAR), 3, '0')) AS tile_key,
           s2q.cell AS cell10, hexq.cell AS hex7
         FROM pts p JOIN s2q ON p.point_id = s2q.point_id
         JOIN hexq ON p.point_id = hexq.point_id
         ORDER BY p.point_id"""
    },
    "q_full_outer" ->
      """WITH pre AS (SELECT user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS pre_cents
           FROM events WHERE ts < TIMESTAMP '2024-01-16' GROUP BY 1),
         post AS (SELECT user_id,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS post_cents
           FROM events WHERE ts >= TIMESTAMP '2024-01-16' GROUP BY 1)
         SELECT COALESCE(pre.user_id, post.user_id) AS user_id, pre_cents,
           post_cents,
           CASE WHEN pre_cents IS NULL THEN 'post_only'
                WHEN post_cents IS NULL THEN 'pre_only'
                ELSE 'both' END AS status,
           COALESCE(post_cents, 0) - COALESCE(pre_cents, 0) AS delta_cents
         FROM pre FULL OUTER JOIN post ON post.user_id = pre.user_id
         ORDER BY user_id""",
    // the walk cumsum + center VALUES, squared-radius ring ladder,
    "q_org_paths" ->
      """WITH RECURSIVE nodes AS (SELECT DISTINCT s_suppkey % 40 AS n FROM supplier),
         r AS (SELECT n, 0 AS depth, '0' AS path FROM nodes WHERE n = 0
           UNION ALL
           SELECT c.n, r.depth + 1, r.path || '/' || CAST(c.n AS VARCHAR)
           FROM r JOIN nodes c ON c.n > 0 AND c.n // 3 = r.n)
         SELECT n, CAST(depth AS INT) AS depth, path FROM r ORDER BY n""",
    "q_listagg" ->
      """SELECT s_nationkey AS nation, CAST(count(*) AS BIGINT) AS n_sup,
         string_agg(s_name, ',' ORDER BY s_name) AS names_csv
         FROM supplier GROUP BY 1 ORDER BY nation""",
    // the walk cumsum cells, sign-of-pair-difference sums + tie term,
    "q_null_semantics" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
           CASE WHEN value >= 50 THEN NULL
                ELSE CAST(round(value * 100) AS BIGINT) END AS v
           FROM events),
         l AS (SELECT v, lag(v) OVER (PARTITION BY user_id
             ORDER BY tus, event_id) AS pv FROM e)
         SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(v) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN v IS NOT DISTINCT FROM pv THEN 1 ELSE 0 END)
             AS BIGINT) AS n_nullsafe_eq,
           CAST(sum(CASE WHEN v = pv THEN 1 ELSE 0 END) AS BIGINT)
             AS n_plain_eq
         FROM l""",
    // pair scores vs planted labels, doubled-midrank U, AUC,
    "q_interval_shift" ->
      """SELECT date_trunc('hour', ts + INTERVAL 90 MINUTE) AS shifted_hr,
         CAST(count(*) AS BIGINT) AS n
         FROM events WHERE ts < TIMESTAMP '2024-01-03'
         GROUP BY 1 ORDER BY shifted_hr""",
    // per-source token-count ranks, nearest-rank p50/p90,
    "q_decimal_money" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
           AS total_price,
         CAST(max(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(18,2))
           AS max_price
         FROM orders GROUP BY 1 ORDER BY o_orderstatus""",
    // two reach-CC passes, hub top-5 by (degree desc, node),
    "q_bom_explode" ->
      """WITH RECURSIVE e AS (
           SELECT DISTINCT LEAST(l_partkey % 300, l_suppkey % 300) AS parent,
             GREATEST(l_partkey % 300, l_suppkey % 300) AS child
           FROM lineitem WHERE l_orderkey % 97 = 0
             AND l_partkey % 300 <> l_suppkey % 300),
         eq AS (SELECT parent, child,
             1 + (parent * 31 + child * 17) % 4 AS qty FROM e),
         paths AS (
           SELECT parent AS root, child AS node, qty AS q, 1 AS depth FROM eq
           UNION ALL
           SELECT p.root, eq.child AS node, p.q * eq.qty AS q, p.depth + 1
           FROM paths p JOIN eq ON eq.parent = p.node WHERE p.depth < 3)
         SELECT CAST(root AS BIGINT) AS root,
           CAST(count(DISTINCT node) AS BIGINT) AS n_reach,
           CAST(sum(q) AS BIGINT) AS ext_qty,
           CAST(max(depth) AS BIGINT) AS max_depth
         FROM paths GROUP BY root ORDER BY root""",
    // same canonical-undirected graph recipe as kcore; degrees over the
    // doubled edge set, moments in exact BIGINTs,
    "q_setops_all" ->
      """WITH a AS (SELECT user_id % 100 AS k FROM events
           WHERE ts < TIMESTAMP '2024-01-16'),
         b AS (SELECT user_id % 100 AS k FROM events
           WHERE ts >= TIMESTAMP '2024-01-16'),
         ea AS (SELECT CAST(count(*) AS BIGINT) AS n_except_all FROM
           (SELECT * FROM a EXCEPT ALL SELECT * FROM b)),
         ed AS (SELECT CAST(count(*) AS BIGINT) AS n_except_distinct FROM
           (SELECT * FROM a EXCEPT SELECT * FROM b)),
         ia AS (SELECT CAST(count(*) AS BIGINT) AS n_intersect_all FROM
           (SELECT * FROM a INTERSECT ALL SELECT * FROM b))
         SELECT n_except_all, n_except_distinct, n_intersect_all
         FROM ea, ed, ia""",
    // row-300 closed-form profile, chord comparisons cross-multiplied,
    "q_range_frame" ->
      """WITH bc AS (SELECT event_type,
           CAST(round(value * 100) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2)
         SELECT event_type, cents, n,
           CAST(sum(n) OVER (PARTITION BY event_type ORDER BY cents
             RANGE BETWEEN 500 PRECEDING AND 500 FOLLOWING) AS BIGINT) AS n_within
         FROM bc ORDER BY event_type, cents""",
    // mirrored closed-form values over half-grids,
    "q_setops" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE ts < TIMESTAMP '2024-01-16'),
         b AS (SELECT DISTINCT user_id FROM events
           WHERE ts >= TIMESTAMP '2024-01-16'),
         i AS (SELECT CAST(count(*) AS BIGINT) AS n_both FROM
           (SELECT * FROM a INTERSECT SELECT * FROM b)),
         oa AS (SELECT CAST(count(*) AS BIGINT) AS n_only_pre FROM
           (SELECT * FROM a EXCEPT SELECT * FROM b)),
         ob AS (SELECT CAST(count(*) AS BIGINT) AS n_only_post FROM
           (SELECT * FROM b EXCEPT SELECT * FROM a))
         SELECT n_both, n_only_pre, n_only_post FROM i, oa, ob""",
    // 2×2 quadrant sums + milli-floored mean DiD,
    "q_any_all" ->
      """WITH sup AS (SELECT s_suppkey, s_nationkey,
           CAST(round(s_acctbal * 100) AS BIGINT) AS cents FROM supplier),
         reg AS (SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_r,
             CAST(sum(cents) AS BIGINT) AS sum_r
           FROM sup JOIN nation ON n_nationkey = s_nationkey GROUP BY 1)
         SELECT s_suppkey, cents FROM sup
         WHERE NOT EXISTS (SELECT 1 FROM reg
           WHERE sup.cents * reg.n_r <= reg.sum_r)
         ORDER BY s_suppkey""",
    // integer chord projection, 50 clamped bins, per-bin extrema/sums,
    "q_correlated_above_avg" ->
      """WITH o AS (SELECT o_custkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
         cu AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s FROM o GROUP BY 1)
         SELECT o.o_custkey, CAST(max(n) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN o.cents * n > s THEN 1 ELSE 0 END)
             AS BIGINT) AS n_above_own_avg
         FROM o JOIN cu USING (o_custkey)
         GROUP BY 1 ORDER BY o.o_custkey""",
    // same coarse assignment, contingency with |n*G - R*C| deviations
  )
}
