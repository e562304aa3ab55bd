package graft.synth

import graft.core.{TileCaption, TileCodec, TileRow}
import graft.geo.{TileKey, WebMercator}
import graft.raster.{Fidelity, Hgt, ImageCodec}

/** Deterministic synthetic elevation tiles — zero external data.
  *
  * Two closed-form fields:
  *  - [[sampleAt]] "curvy": `A + 2c + 3r + ((c/8)*(r/8)) % 32` with
  *    `A = ((swLng+180)*7 + (swLat+90)*11) % 1000`. Pure integer arithmetic so
  *    an independent SQL oracle (DuckDB) can recompute the exact grid — used
  *    by the correctness-gate queries.
  *  - [[planeAt]] smooth plane — used for lossy-format PSNR invariants.
  */
object TileGen {

  /** Integer base offset per tile, SQL-replicable. */
  def baseA(swLng: Int, swLat: Int): Int = ((swLng + 180) * 7 + (swLat + 90) * 11) % 1000

  /** Curvy field (oracle-checkable): blocky curvature over a plane. */
  def sampleAt(swLng: Int, swLat: Int, r: Int, c: Int): Short =
    (baseA(swLng, swLat) + 2 * c + 3 * r + ((c / 8) * (r / 8)) % 32).toShort

  /** Smooth plane (for JPEG fidelity): `A + c + 2r`. */
  def planeAt(swLng: Int, swLat: Int, r: Int, c: Int): Short =
    (baseA(swLng, swLat) + c + 2 * r).toShort

  /** Gentle field for lossy-format rows: elevation range stays inside one
    * Terrarium R-block (e+32768 ∈ [33280, 33536)) so the JPEG error never
    * flips the ×256 channel. Terrarium-in-JPEG only satisfies the PSNR≥40dB
    * per-row invariant on such tiles; the generator emits `fmt=jpg` rows only
    * with this field (steeper tiles go to lossless png/hgt).
    */
  def gentleAt(swLng: Int, swLat: Int, r: Int, c: Int): Short =
    (520 + ((c + r) / 4) % 240).toShort

  def grid(swLng: Int, swLat: Int, size: Int,
           f: (Int, Int, Int, Int) => Short = sampleAt): Array[Short] = {
    val out = new Array[Short](size * size)
    var r = 0
    while (r < size) {
      var c = 0
      while (c < size) { out(r * size + c) = f(swLng, swLat, r, c); c += 1 }
      r += 1
    }
    out
  }

  def caption(swLng: Int, swLat: Int, size: Int): TileCaption = {
    val key = TileKey.ofDegrees(swLng, swLat)
    val z = 9
    val (x, y) = WebMercator.tile(swLng + 0.5, swLat + 0.5, z)
    val resolution = size match { case 3601 => 1; case 1201 => 3; case _ => 0 }
    TileCaption(key, z, x, y, swLng, swLat, resolution, size)
  }

  /** Build one tile-table row in the requested payload format. */
  def tileRow(swLng: Int, swLat: Int, size: Int, fmt: String = "hgt",
              f: (Int, Int, Int, Int) => Short = sampleAt): TileRow = {
    val g = grid(swLng, swLat, size, f)
    val bytes = fmt match {
      case "hgt" => Hgt.encode(g, size)
      case "png" => ImageCodec.encodePng(g, size)
      case "jpg" => ImageCodec.encodeJpg(g, size)
      case other => throw new IllegalArgumentException(s"fmt $other")
    }
    TileRow(TileKey.ofDegrees(swLng, swLat), bytes, size, size, fmt,
      TileCodec.captionJson(caption(swLng, swLat, size)), Fidelity.phash(g, size))
  }

  /** Tiles covering a set of SW corners. */
  def tiles(corners: Seq[(Int, Int)], size: Int, fmt: String = "hgt"): Seq[TileRow] =
    corners.map { case (lng, lat) => tileRow(lng, lat, size, fmt) }
}
