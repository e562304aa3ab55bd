package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequential drift / changepoint detection over keyed event streams —
  * the monitoring layer next to the Welford z-flags (reference analogue:
  * the online latency outlier flagging at `src/s3Fetcher.ts:33-52`,
  * generalized from a single global mean/stddev to a per-key SEQUENTIAL
  * statistic that reacts to sustained shifts rather than single outliers).
  */
object Drift {

  /** One-sided CUSUM per key: with per-event integer values `v_i` (exact
    * cents — never IEEE), allowance `drift` and alarm bound `threshold`,
    * fold the key's events in (orderCols) order through
    *
    * {{{
    *   s_i   = max(0, s_{i-1} + v_i − drift)     // s_0 = 0
    *   alarm = s_i ≥ threshold  ⇒  count it and RESET s_i to 0
    * }}}
    *
    * — Page's classic cumulative-sum test, restart variant. All state is
    * integer, the fold order is total (orderCols must be a per-key unique
    * sort key), so the emitted `(n_events, n_alarms, s_final, s_max)` are
    * bit-reproducible in any engine (the oracle replays the recurrence as
    * a recursive CTE).
    *
    * Plan shape: ONE key shuffle — `collect_list(struct(order, v))` with
    * map-side partial aggregation, `sort_array` for the total order, and
    * the recurrence as a codegen'd `aggregate` higher-order fold with a
    * 3-field struct accumulator; no UDF, no mapGroups, nothing on the
    * driver. Per-key state is the key's own event array — the same
    * bounded-by-key-cardinality contract as feature reassembly; 100 TB
    * deployments window the input (e.g. per day) to cap it, which
    * composes as a pre-`groupBy` projection without changing this plan.
    *
    * @param df        input rows
    * @param keyCol    grouping key
    * @param orderCols per-key unique total order (e.g. ts, event_id)
    * @param vCol      integer value column (cents — caller quantizes)
    * @param drift     per-event allowance subtracted before the clamp
    * @param threshold alarm bound (alarm resets the statistic)
    * @return (keyCol, n_events, n_alarms, s_final, s_max)
    */
  def cusum(df: DataFrame, keyCol: String, orderCols: Seq[String],
            vCol: String, drift: Long, threshold: Long): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val seqCols = (orderCols.map(col) :+ col(vCol).cast("long").as("v"))
    val step =
      s"""aggregate(ev,
            named_struct('s', 0L, 'alarms', 0L, 'smax', 0L),
            (acc, x) -> named_struct(
              's', CASE WHEN greatest(0L, acc.s + x.v - ${drift}L) >= ${threshold}L
                        THEN 0L ELSE greatest(0L, acc.s + x.v - ${drift}L) END,
              'alarms', acc.alarms +
                CASE WHEN greatest(0L, acc.s + x.v - ${drift}L) >= ${threshold}L
                     THEN 1L ELSE 0L END,
              'smax', greatest(acc.smax, greatest(0L, acc.s + x.v - ${drift}L))))"""
    df.groupBy(col(keyCol))
      .agg(collect_list(struct(seqCols: _*)).as("raw"))
      .withColumn("ev", sort_array(col("raw")))
      .withColumn("fin", expr(step))
      .select(col(keyCol), size(col("ev")).cast("long").as("n_events"),
        col("fin.alarms").as("n_alarms"), col("fin.s").as("s_final"),
        col("fin.smax").as("s_max"))
  }

  /** Holt double-exponential smoothing per key — the level+trend forecast
    * next to [[cusum]]'s alarm (CUSUM says "something shifted", Holt says
    * "where the series is heading"): with smoothing weights `alphaPpm`,
    * `betaPpm` in exact parts-per-million,
    *
    * {{{
    *   l_1 = x_1,  b_1 = 0
    *   l_i = ⌊(α·x_i + (10⁶−α)·(l_{i−1} + b_{i−1})) / 10⁶⌋
    *   b_i = ⌊(β·(l_i − l_{i−1}) + (10⁶−β)·b_{i−1}) / 10⁶⌋
    * }}}
    *
    * all in integer arithmetic with an explicit FLOOR division (computed
    * as `(x − ((x mod 10⁶ + 10⁶) mod 10⁶)) / 10⁶` so both engines agree on
    * negative trends — truncating `DIV` and flooring `//` coincide only on
    * the exact multiple this form produces). Emits the final level/trend,
    * the `horizon`-step linear forecast `l + h·b`, and the summed absolute
    * one-step-ahead forecast error — the backtest number that says whether
    * the smoothing weights fit the series.
    *
    * Same plan and state contract as [[cusum]]: one key shuffle, sorted
    * array, codegen'd HOF fold, per-key state bounded by that key's
    * events.
    *
    * @return (keyCol, n_events, level, trend, forecast, abs_err_sum)
    */
  def holt(df: DataFrame, keyCol: String, orderCols: Seq[String],
           vCol: String, alphaPpm: Long, betaPpm: Long,
           horizon: Long): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(alphaPpm >= 0 && alphaPpm <= 1000000L, s"alphaPpm: $alphaPpm")
    require(betaPpm >= 0 && betaPpm <= 1000000L, s"betaPpm: $betaPpm")
    def fd(x: String) = s"(($x) - ((($x) % 1000000L + 1000000L) % 1000000L)) DIV 1000000L"
    val a = alphaPpm; val b = betaPpm
    val lNew = fd(s"${a}L * x.v + ${1000000L - a}L * (acc.l + acc.b)")
    val step =
      s"""aggregate(ev,
            named_struct('i', 0L, 'l', 0L, 'b', 0L, 'e', 0L),
            (acc, x) -> CASE WHEN acc.i = 0L
              THEN named_struct('i', 1L, 'l', x.v, 'b', 0L, 'e', 0L)
              ELSE named_struct(
                'i', acc.i + 1L,
                'l', $lNew,
                'b', ${fd(s"${b}L * (($lNew) - acc.l) + ${1000000L - b}L * acc.b")},
                'e', acc.e + abs(x.v - (acc.l + acc.b))) END)"""
    df.groupBy(col(keyCol))
      .agg(collect_list(struct(
        orderCols.map(col) :+ col(vCol).cast("long").as("v"): _*)).as("raw"))
      .withColumn("ev", sort_array(col("raw")))
      .withColumn("fin", expr(step))
      .select(col(keyCol), size(col("ev")).cast("long").as("n_events"),
        col("fin.l").as("level"), col("fin.b").as("trend"),
        (col("fin.l") + lit(horizon) * col("fin.b")).as("forecast"),
        col("fin.e").as("abs_err_sum"))
  }

  /** Autocorrelation sufficient statistics per key at lags 1..`maxLag` —
    * the seasonality/persistence profile beside [[cusum]] (shift) and
    * [[holt]] (direction): a daily-periodic series shows ACF peaks at the
    * period, white noise shows none. Rather than emit a float correlation,
    * emits the EXACT integer moments of the lag-k pair set
    * {(x_i, x_{i+k})} — `(n_pairs, sx, sy, sxx, syy, sxy)` over the
    * caller's integer values — from which r_k is one float division away
    * (Pearson over the paired series, the standard "ACF with per-lag
    * means" estimator); bit-reproducible in any engine.
    *
    * Plan shape: ONE key shuffle — a single window pass computes all
    * `maxLag` lag columns over the same (orderCols) frame, a codegen'd
    * `stack` unpivots to (lag, x, y) pairs, and the moment aggregation is
    * map-side partial on (key, lag) — the window's hash-partitioning on
    * `key` already satisfies the (key, lag) clustering requirement (a
    * non-empty subset), so Catalyst plans NO second exchange. Per-key
    * state is the window buffer (maxLag rows), NOT the key's history.
    *
    * @param df        input rows
    * @param keyCol    grouping key (one series per key)
    * @param orderCols per-key unique total order (e.g. ts, event_id)
    * @param vCol      integer value column (cents — caller quantizes)
    * @param maxLag    largest lag (≥ 1); lags 1..maxLag all emitted
    * @return (keyCol, lag, n_pairs, sx, sy, sxx, syy, sxy), one row per
    *         (key, lag) with at least one pair
    */
  def acf(df: DataFrame, keyCol: String, orderCols: Seq[String],
          vCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val lagged = (1 to maxLag).foldLeft(
      df.select(col(keyCol) +: col(vCol).cast("long").as("y") +:
        orderCols.map(col): _*)) {
      (d, k) => d.withColumn(s"x$k", lag(col("y"), k).over(w))
    }
    val pairs = (1 to maxLag)
      .map(k => s"${k}L, x$k").mkString(", ")
    lagged
      .select(col(keyCol), expr(
        s"stack($maxLag, $pairs) AS (lag, x)"), col("y"))
      .filter(col("x").isNotNull)
      .groupBy(col(keyCol), col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
  }
}
