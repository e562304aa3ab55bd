package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (audio/video) columns as OPAQUE BINARY + typed metadata —
  * the driver-mandated pattern next to the real-codec image path
  * (ImageOps uses javax.imageio; no audio/video codec ships in this
  * container, so the codec itself is a deterministic STUB while every
  * Spark-side piece is real and tested):
  *
  *  - schema: `(media_id long, bytes binary, fmt string, duration_ms long,
  *    fps_milli long)` — the image+caption table shape (BASELINE.json
  *    input_hint) generalized to time-based media;
  *  - partitioning/batch shape: decode runs in `mapPartitions` with ONE
  *    decoder instance per partition (the seam where libav/ffmpeg would be
  *    constructed once and reused row-to-row — constructing per row is the
  *    classic 100 TB anti-pattern);
  *  - frame-sampling arithmetic (every-k-ms timestamps → integer frame
  *    numbers at the row's own frame rate) is exact integer math;
  *  - the stub "decode" reads REAL bytes from the binary column (a 16-byte
  *    window per frame / fixed windows for audio) and folds them with
  *    exact mod-p integer arithmetic, so a DuckDB oracle can replay the
  *    whole pipeline closed-form against the generator formula.
  */
object MediaOps {

  /** The media table row (bytes is the opaque payload). */
  case class MediaRow(media_id: Long, bytes: Array[Byte], fmt: String,
                      duration_ms: Long, fps_milli: Long)

  /** One sampled frame: deterministic digest + 16-byte luma mean. */
  case class FrameRow(media_id: Long, frame_no: Long, ts_ms: Long,
                      frame_digest: Long, luma16: Long)

  /** One audio analysis window: exact integer sum of squares. */
  case class WindowRow(media_id: Long, win_no: Long, n_samp: Long,
                       sq_sum: Long)

  val DigestP = 1000000007L

  /** Deterministic synthetic media table (closed-form bytes, so the oracle
    * can replay any byte without reading the column): byte k of media m is
    * `(m·31 + k·7) mod 256`.
    */
  def synth(meta: DataFrame): Dataset[MediaRow] = {
    val spark = meta.sparkSession
    import spark.implicits._
    meta.select(col("media_id").cast("long"), col("duration_ms").cast("long"),
        col("fps_milli").cast("long"), col("n_bytes").cast("int"))
      .as[(Long, Long, Long, Int)]
      .map { case (id, dur, fps, n) =>
        MediaRow(id,
          Array.tabulate(n)(k => ((id * 31 + k * 7) % 256).toByte),
          if (id % 2 == 0) "v8" else "pcm", dur, fps)
      }
  }

  /** Sample one frame every `everyMs` (timestamps 0, everyMs, … <
    * duration_ms): `frame_no = ts·fps_milli / 10⁶` (integer), then the
    * stub decode digests the 16-byte window at offset
    * `(frame_no·997) mod (len−16)`: `d ← (d·131 + byte) mod p` left fold
    * plus the integer mean of the same window. A real deployment swaps
    * the window fold for a codec frame decode; nothing else changes.
    */
  def frameSample(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    require(everyMs > 0, s"everyMs must be > 0, got $everyMs")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // one decoder instance per partition (stub: just the fold state)
      it.flatMap { m =>
        val span = math.max(1L, m.bytes.length.toLong - 16L)
        Iterator.range(0L, math.max(m.duration_ms, 0L), everyMs).map { t =>
          val frameNo = t * m.fps_milli / 1000000L
          val off = ((frameNo * 997L) % span).toInt
          var dig = 0L; var lum = 0L; var i = 0
          while (i < 16) {
            val b = m.bytes(off + i) & 0xff
            dig = (dig * 131L + b) % DigestP
            lum += b
            i += 1
          }
          FrameRow(m.media_id, frameNo, t, dig, lum / 16L)
        }
      }
    }.toDF()
  }

  /** Audio path: bytes as centered 8-bit samples (`b − 128`), fixed
    * windows of `winLen` samples (tail window dropped — exact contract),
    * exact integer sum of squares per window (the RMS numerator; the
    * division/sqrt stays with the caller so the gate compares integers).
    */
  /** Scene-cut detection over the sampled frame stream: a cut is a frame
    * whose 16-sample luminance mean jumps more than `threshold` levels from
    * the previous sampled frame — the standard shot-boundary heuristic on
    * the decode-side feature [[frameSample]] already extracts (a real
    * deployment swaps the stub digest for a codec decode + histogram
    * distance; the windowing algebra is unchanged). First frame of each
    * asset: delta 0, never a cut. Exact integers end-to-end; ONE media_id
    * window Exchange on the frame table (frames-per-asset rows, tiny next
    * to the binary payloads, which never shuffle).
    *
    * @return (media_id, ts_ms, luma16, d_lum, cut)
    */
  def sceneCuts(media: Dataset[MediaRow], everyMs: Long,
                threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("media_id").orderBy("ts_ms")
    frameSample(media, everyMs)
      .withColumn("d_lum",
        coalesce(abs(col("luma16") - lag("luma16", 1).over(w)), lit(0L)))
      .withColumn("cut",
        lag("luma16", 1).over(w).isNotNull && col("d_lum") > lit(threshold))
      .select("media_id", "ts_ms", "luma16", "d_lum", "cut")
  }

  def windowSquares(media: Dataset[MediaRow], winLen: Int): DataFrame = {
    require(winLen > 0, s"winLen must be > 0, got $winLen")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val nWin = m.bytes.length / winLen
        Iterator.range(0L, nWin.toLong).map { w =>
          var s = 0L; var i = 0
          val base = (w * winLen).toInt
          while (i < winLen) {
            val v = (m.bytes(base + i) & 0xff) - 128
            s += v.toLong * v
            i += 1
          }
          WindowRow(m.media_id, w, winLen.toLong, s)
        }
      }
    }.toDF()
  }

  /** Clipping / saturation audit — the capture-quality gate every audio
    * curation pass runs first (clipped recordings poison loudness and
    * embedding features): per media the count of samples at or beyond the
    * clip threshold, the number of MAXIMAL clipped runs, and the longest
    * run (sustained saturation vs isolated peaks — the number that
    * separates a hot mix from a broken gain stage).
    *
    * Samples are the stub codec's centered bytes (`(byte & 0xff) − 128`,
    * the same convention as [[windowSquares]]); a sample clips when
    * `|v| ≥ thr`. One sequential scan per media inside `mapPartitions` —
    * run-length state is 3 integers, no window materialization; at 100 TB
    * this is a map-only pass emitting 5 integers per media row.
    *
    * @return (media_id, n_samp, n_clipped, n_runs, max_run)
    */
  final case class ClipRow(media_id: Long, n_samp: Long, n_clipped: Long,
                           n_runs: Long, max_run: Long)

  def clippingAudit(media: Dataset[MediaRow], thr: Int): DataFrame = {
    require(thr > 0 && thr <= 128, s"thr must be in 1..128: $thr")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        var nc = 0L; var runs = 0L; var maxRun = 0L; var cur = 0L
        var i = 0
        while (i < m.bytes.length) {
          val v = (m.bytes(i) & 0xff) - 128
          if (v >= thr || v <= -thr) {
            nc += 1; cur += 1
            if (cur == 1L) runs += 1
            if (cur > maxRun) maxRun = cur
          } else cur = 0L
          i += 1
        }
        ClipRow(m.media_id, m.bytes.length.toLong, nc, runs, maxRun)
      }
    }.toDF()
  }

  final case class CrestRow(media_id: Long, n_samp: Long, peak_abs: Long,
                            sum_sq: Long, crest_ppm: Long)

  /** Crest factor (peak-to-RMS dynamic range) in exact integers:
    * `crest_ppm = ⌊10⁶ · n · peak² / Σv²⌋` — crest² scaled to ppm with the
    * division done once at the end, so engine and oracle replay the same
    * value bit-for-bit. The mastering/compression audit: heavily limited
    * (over-compressed) audio shows crest² → 1–2, natural speech ≫ that;
    * paired with [[clippingAudit]] it separates "loud" from "damaged".
    * One map-only pass per medium, ZERO shuffle, one row/media.
    */
  def crestFactor(media: Dataset[MediaRow]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        var peak = 0L; var ss = 0L
        var i = 0
        while (i < m.bytes.length) {
          val v = ((m.bytes(i) & 0xff) - 128).toLong
          val a = math.abs(v)
          if (a > peak) peak = a
          ss += v * v
          i += 1
        }
        val n = m.bytes.length.toLong
        val crest = if (ss > 0L) 1000000L * n * peak * peak / ss else 0L
        CrestRow(m.media_id, n, peak, ss, crest)
      }
    }.toDF()
  }

  /** Voice-activity-style segment merging: active windows whose indices
    * are within `gap` inactive windows of each other coalesce into ONE
    * segment — the VAD / silence-splitting primitive that turns a
    * per-window activity decision into utterance spans (and the
    * index-domain cousin of the time-gap sessionization in the events
    * family: here the key is the window ORDINAL, so the hangover rule is
    * exact integer arithmetic, no timestamps involved).
    *
    * Plan shape: inactive windows are FILTERED before any shuffle (the
    * dominant reduction — silence is most of real audio), then one
    * media-keyed window (lag + running sum of break flags) and one
    * (media, segment) groupBy. State per key is bounded by that medium's
    * window count; nothing global, no binary payloads move.
    *
    * @param windows (media_id, win_no, active) — active ∈ {0, 1}
    * @param gap     max inactive windows bridged inside one segment
    * @return (media_id, seg_no, start_win, end_win, n_active) — seg_no is
    *         1-based in start order per medium
    */
  def activeSegments(windows: DataFrame, gap: Int): DataFrame = {
    require(gap >= 0, s"gap must be >= 0: $gap")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("media_id").orderBy("win_no")
    windows.filter(col("active") === 1)
      .withColumn("brk",
        when(lag(col("win_no"), 1).over(w).isNull, 1L)
          .when(col("win_no") - lag(col("win_no"), 1).over(w) > gap + 1, 1L)
          .otherwise(lit(0L)))
      .withColumn("seg_no", sum(col("brk")).over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy("media_id", "seg_no")
      .agg(min("win_no").as("start_win"), max("win_no").as("end_win"),
        count(lit(1)).as("n_active"))
  }

  /** Stuck/duplicate-frame audit over the sampled frame stream — the
    * frozen-encoder / dropped-frame QA of video ingest: a run is a maximal
    * stretch of CONSECUTIVE sampled frames with equal digest (sampling
    * faster than the frame rate makes repeats structural, so the audit
    * also doubles as the oversampling detector). Per asset: frames, runs
    * of length ≥ 2, the longest run, and the duplicate-frame overhead
    * Σ(len−1) a dedup re-encode would reclaim.
    *
    * 100 TB shape: decode-side digests only (16-byte stub window per
    * frame — a real codec swap changes nothing downstream), ONE media_id
    * window Exchange, one row per asset.
    *
    * @return (media_id, n_frames, n_stuck_runs, max_run, n_dup_frames)
    */
  def stuckFrames(media: Dataset[MediaRow], everyMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("media_id").orderBy("ts_ms")
    frameSample(media, everyMs)
      .withColumn("strt", when(coalesce(
        lag("frame_digest", 1).over(w) =!= col("frame_digest"),
        lit(true)), 1L).otherwise(0L))
      .withColumn("run_id", sum("strt").over(w))
      .groupBy("media_id", "run_id")
      .agg(count(lit(1)).as("len"))
      .groupBy("media_id")
      .agg(sum("len").as("n_frames"),
        sum(when(col("len") >= 2, 1L).otherwise(0L)).as("n_stuck_runs"),
        max("len").as("max_run"),
        sum(col("len") - 1).as("n_dup_frames"))
  }

  /** Zero-crossing rate census — the classic spectral-content proxy next
    * to [[windowSquares]]'s energy (voiced/low-frequency content crosses
    * rarely, fricatives/noise cross constantly; VAD and audio-quality
    * screens read both). Per fixed `winLen`-sample window the count of
    * STRICT sign flips between adjacent samples (`s·s' < 0`; zeros never
    * cross — the exact, oracle-replicable convention), rolled up per
    * asset: total plus the max/min window so the spread is visible
    * without shipping per-window rows.
    *
    * 100 TB shape: decode-once mapPartitions over the opaque payload,
    * zero shuffle, ONE row per asset.
    *
    * @return (media_id, n_win, total_cross, max_cross, min_cross)
    */
  final case class ZcrRow(media_id: Long, n_win: Long, total_cross: Long,
                          max_cross: Long, min_cross: Long)

  def zeroCrossingRate(media: Dataset[MediaRow], winLen: Int): DataFrame = {
    require(winLen > 1, s"winLen must be > 1, got $winLen")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val nWin = m.bytes.length / winLen
        var tot = 0L; var mx = 0L; var mn = Long.MaxValue
        var w = 0
        while (w < nWin) {
          var cr = 0L
          val base = w * winLen
          var i = 0
          while (i < winLen - 1) {
            val a = (m.bytes(base + i) & 0xff) - 128
            val b = (m.bytes(base + i + 1) & 0xff) - 128
            if (a * b < 0) cr += 1
            i += 1
          }
          tot += cr; if (cr > mx) mx = cr; if (cr < mn) mn = cr
          w += 1
        }
        if (nWin == 0) mn = 0L
        ZcrRow(m.media_id, nWin.toLong, tot, mx, mn)
      }
    }.toDF()
  }

  final case class DcRow(media_id: Long, n_samp: Long, sum_v: Long,
                         min_v: Long, max_v: Long)

  /** DC-offset audit — the broken-ADC/bias screen: per asset the exact
    * signed sample sum (a healthy centered signal sums near 0; a stuck
    * bias shifts it by n·offset), plus the range. Decode-once, one row
    * per asset; mean = sum/n is the consumer's division.
    */
  def dcStats(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.product[DcRow]
    media.mapPartitions { it =>
      it.map { m =>
        var s = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
        var i = 0
        while (i < m.bytes.length) {
          val v = ((m.bytes(i) & 0xff) - 128).toLong
          s += v
          if (v < mn) mn = v
          if (v > mx) mx = v
          i += 1
        }
        if (m.bytes.length == 0) { mn = 0L; mx = 0L }
        DcRow(m.media_id, m.bytes.length.toLong, s, mn, mx)
      }
    }.toDF()
  }

  final case class TruePeakRow(media_id: Long, n_samp: Long, peak: Long,
                               true_peak_x16: Long, n_isp: Long)

  /** Inter-sample (true) peak estimate — the loudness-compliance check
    * (ITU-R BS.1770's oversampled peak, public) that catches clipping a
    * sample-peak meter misses: 2× oversample by Catmull–Rom half-sample
    * interpolation h(i) = −v(i−1) + 9v(i) + 9v(i+1) − v(i+2) (×16 scale,
    * pure integers — linear interp can never exceed the sample peak, a
    * 4-tap kernel can). Per media: sample peak, the ×16-scaled true peak
    * max(16·peak, max|h|), and the count of half-sample positions whose
    * magnitude exceeds the ×16 local sample peak. One sequential scan in
    * `mapPartitions`, 4 longs of state — map-only at 100 TB.
    */
  def truePeak(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.product[TruePeakRow]
    media.mapPartitions { it =>
      it.map { m =>
        val n = m.bytes.length
        def v(i: Int): Long = ((m.bytes(i) & 0xff) - 128).toLong
        var peak = 0L; var hmax = 0L; var isp = 0L
        var i = 0
        while (i < n) {
          val av = math.abs(v(i))
          if (av > peak) peak = av
          i += 1
        }
        i = 1
        while (i + 2 < n) {
          val h = math.abs(-v(i - 1) + 9 * v(i) + 9 * v(i + 1) - v(i + 2))
          if (h > hmax) hmax = h
          if (h > 16 * math.max(math.abs(v(i)), math.abs(v(i + 1)))) isp += 1
          i += 1
        }
        TruePeakRow(m.media_id, n.toLong, peak,
          math.max(16 * peak, hmax), isp)
      }
    }.toDF()
  }

  final case class DecimateRow(media_id: Long, n_samp: Long, sq_sum: Long,
                               dec_sq_sum: Long, hf_sum: Long)

  /** 2:1 decimation audit: energy of the original, energy after
    * mean-decimation (pair means with a shift-positive floor so both
    * engines round identically), and the odd–even difference energy —
    * the exact-integer read on how much high-frequency content a naive
    * downsample would alias (the audio twin of the image
    * downsample-bias pyramid audit). One sequential scan per media.
    */
  def decimateAudit(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.product[DecimateRow]
    media.mapPartitions { it =>
      it.map { m =>
        val n = m.bytes.length
        def v(i: Int): Long = ((m.bytes(i) & 0xff) - 128).toLong
        var sq = 0L; var dsq = 0L; var hf = 0L
        var i = 0
        while (i < n) { sq += v(i) * v(i); i += 1 }
        i = 0
        while (i + 1 < n) {
          val mean = (v(i) + v(i + 1) + 256L) / 2L - 128L
          dsq += mean * mean
          val d = v(i) - v(i + 1)
          hf += d * d
          i += 2
        }
        DecimateRow(m.media_id, n.toLong, sq, dsq, hf)
      }
    }.toDF()
  }

  final case class LevelUsageRow(media_id: Long, n_samp: Long,
                                 n_levels: Long, simpson_num: Long,
                                 util_ppm: Long)

  /** Quantization-level usage: distinct sample values, 256-level
    * utilization in ppm and the Simpson concentration numerator Σc² of
    * the level histogram — re-quantized, clipped or bit-crushed audio
    * shows a collapsed level set long before it is audible. One
    * 256-entry counting pass per media.
    */
  def levelUsage(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.product[LevelUsageRow]
    media.mapPartitions { it =>
      it.map { m =>
        val counts = new Array[Long](256)
        var i = 0
        while (i < m.bytes.length) {
          counts(m.bytes(i) & 0xff) += 1
          i += 1
        }
        var levels = 0L; var simpson = 0L
        var j = 0
        while (j < 256) {
          if (counts(j) > 0) { levels += 1; simpson += counts(j) * counts(j) }
          j += 1
        }
        LevelUsageRow(m.media_id, m.bytes.length.toLong, levels, simpson,
          1000000L * levels / 256L)
      }
    }.toDF()
  }

  final case class EchoRow(media_id: Long, ac0: Long, best_lag: Long,
                           ac_best: Long)

  /** Echo / comb-filter detection: exact integer autocorrelation
    * Σ v(k)·v(k+lag) over the candidate lag grid 20..95 step 5, argmax
    * with ties to the shorter lag — the slapback-echo lag finder (and
    * the loop-point candidate) on the stub codec's centered bytes. One
    * sequential scan per (media, lag) pair, all in one pass.
    */
  def echoLag(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.product[EchoRow]
    val lags = (20 to 95 by 5).toArray
    media.mapPartitions { it =>
      it.map { m =>
        val n = m.bytes.length
        def v(i: Int): Long = ((m.bytes(i) & 0xff) - 128).toLong
        var ac0 = 0L
        var i = 0
        while (i < n) { ac0 += v(i) * v(i); i += 1 }
        var bestLag = -1L; var bestAc = Long.MinValue
        lags.foreach { lag =>
          var ac = 0L
          var k = 0
          while (k + lag < n) { ac += v(k) * v(k + lag); k += 1 }
          if (ac > bestAc) { bestAc = ac; bestLag = lag.toLong }
        }
        EchoRow(m.media_id, ac0, bestLag, bestAc)
      }
    }.toDF()
  }

  final case class PyramidRow(media_id: Long, level: Int, bucket: Long,
                              v_min: Long, v_max: Long)

  /** Waveform min/max preview pyramid: per media the per-bucket sample
    * extrema at three zoom levels (256/1024/4096 samples per bucket) —
    * the precomputed envelope every waveform renderer scrubs instead of
    * raw samples; at 100 TB this is THE artifact that makes audio QA
    * interactive. One sequential scan per media, all levels emitted in
    * the same pass.
    */
  def minmaxPyramid(media: Dataset[MediaRow]): DataFrame = {
    implicit val enc = Encoders.product[PyramidRow]
    val widths = Array(256, 1024, 4096)
    media.mapPartitions { it =>
      it.flatMap { m =>
        val n = m.bytes.length
        def v(i: Int): Long = ((m.bytes(i) & 0xff) - 128).toLong
        widths.zipWithIndex.flatMap { case (w, lvl) =>
          val nb = (n + w - 1) / w
          (0 until nb).map { b =>
            var mn = Long.MaxValue; var mx = Long.MinValue
            var i = b * w
            val end = math.min(n, (b + 1) * w)
            while (i < end) {
              val x = v(i)
              if (x < mn) mn = x
              if (x > mx) mx = x
              i += 1
            }
            PyramidRow(m.media_id, lvl, b.toLong, mn, mx)
          }
        }
      }
    }.toDF()
  }
}
