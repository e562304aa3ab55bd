package graft.ops

import graft.core.{TileCodec, TileRow}
import graft.raster.{Bilinear, ImageCodec}
import org.apache.spark.sql.{Dataset, Encoders}

/** Materializes the SERVING-side artifact of a terrain stack: a pyramid of
  * Terrarium-RGB PNG sub-tiles rendered from the 1° elevation store — the
  * producer counterpart of the reference's consumption path (its S3 bucket
  * of terrain tiles; decode semantics
  * reference src/elevation/getTerrariumDemElevation.ts:5-23 +
  * getElevation.ts:31-58). Each source tile splits into subdiv×subdiv PNGs
  * of outSize² pixels, each pixel bilinear-sampled at its center in the
  * tile's own plate-carrée frame. Deliberately NOT Web-Mercator rendering:
  * the mercator projection's transcendentals are not bit-reproducible
  * across engines, while plate-carrée pixel centers are dyadic rationals
  * whenever subdiv·outSize is a power of two — every sampled elevation and
  * every Terrarium byte is then oracle-exact (non-power-of-two divisions
  * stay deterministic, they just add one shared rounding).
  *
  * Scale shape: one mapPartitions over the tile table — each source tile
  * decodes ONCE and emits its subdiv² PNGs with NO shuffle; the pyramid
  * inherits the store's tile_key partitioning, so a 100 TB render is an
  * embarrassingly parallel scan whose output co-locates with its input.
  */
object TilePyramid {

  /** One rendered pyramid tile: `(sx, sy)` indexes the sub-grid west→east /
    * south→north inside source tile `image_id`.
    */
  final case class SubTile(image_id: String, sx: Int, sy: Int, size: Int,
                           png: Array[Byte])

  def materialize(tiles: Dataset[TileRow], subdiv: Int,
                  outSize: Int): Dataset[SubTile] = {
    implicit val enc = Encoders.product[SubTile]
    tiles.mapPartitions { it =>
      it.flatMap { t =>
        val d = TileCodec.decode(t)
        val denom = (subdiv * outSize).toDouble
        // Iterator, not a strict for/yield: emit one encoded sub-tile at a
        // time so a large subdiv never holds all subdiv² PNGs of a source
        // tile on the heap at once (the point of the mapPartitions shape)
        Iterator.range(0, subdiv).flatMap { sy =>
          Iterator.range(0, subdiv).map { sx =>
            renderSubTile(t, d, sx, sy, outSize, denom)
          }
        }
      }
    }
  }

  private def renderSubTile(t: TileRow, d: graft.core.DecodedTile, sx: Int, sy: Int,
                            outSize: Int, denom: Double): SubTile = {
    val elevs = new Array[Double](outSize * outSize)
    var r = 0
    while (r < outSize) {
      val lat = d.swLat + (sy * outSize + r + 0.5) / denom
      var c = 0
      while (c < outSize) {
        val lng = d.swLng + (sx * outSize + c + 0.5) / denom
        elevs(r * outSize + c) = Bilinear.sampleGrid(
          d.samples, d.size, d.swLng.toDouble, d.swLat.toDouble, lng, lat)
        c += 1
      }
      r += 1
    }
    SubTile(t.image_id, sx, sy, outSize,
      ImageCodec.encodeTerrariumPng(elevs, outSize))
  }

  /** The pyramid BUILD step — the upward complement of [[materialize]]:
    * assemble every 2°×2° block of source tiles into one mosaic and
    * box-downsample it 2:1 (each output sample = arithmetic mean of its 2×2
    * source block, exact integer `(a+b+c+d) >> 2`). Tiles share their edge
    * row/column with their neighbours (the SRTM overlap convention), so the
    * mosaic takes each tile's `size−1` interior rows/columns — the
    * assembled block is exactly 2·(size−1) square and the output
    * (size−1)². Missing tiles contribute 0, the engine's F8 no-data rule.
    *
    * Scale shape: ONE shuffle keyed by the 2° parent block (each group
    * holds ≤ 4 tiles — bounded state), decode inside the group, emit one
    * stats row; a planet-scale pyramid build is a single key-bounded
    * groupBy whose output is itself the next level's input.
    *
    * @return (plng, plat, n_px, v_sum, vr_sum, vc_sum) — position-weighted
    *         moments of the downsampled mosaic (the img_augment pinning
    *         trick: Σv, Σv·r, Σv·c identify the raster up to permutation)
    */
  def downsampleMosaic(tiles: Dataset[TileRow]) = {
    val spark = tiles.sparkSession
    import spark.implicits._
    tiles
      .groupByKey { t =>
        val (lng, lat) = graft.geo.TileKey.toDegrees(t.image_id)
        (Math.floorDiv(lng, 2) * 2, Math.floorDiv(lat, 2) * 2)
      }
      .mapGroups { (key: (Int, Int), it: Iterator[TileRow]) =>
        val (plng, plat) = key
        val grids = scala.collection.mutable.Map[(Int, Int), (Array[Short], Int)]()
        var inner = 600
        it.foreach { t =>
          val d = TileCodec.decode(t)
          inner = d.size - 1
          grids((d.swLng - plng, d.swLat - plat)) = (d.samples, d.size)
        }
        var vSum = 0L; var vrSum = 0L; var vcSum = 0L
        var r = 0
        while (r < inner) {
          var c = 0
          while (c < inner) {
            var s4 = 0L
            var dr = 0
            while (dr < 2) {
              var dc = 0
              while (dc < 2) {
                val rr = 2 * r + dr; val cc = 2 * c + dc
                grids.get((cc / inner, rr / inner)) match {
                  case Some((g, size)) => s4 += g((rr % inner) * size + (cc % inner))
                  case None => ()
                }
                dc += 1
              }
              dr += 1
            }
            val v = s4 >> 2
            vSum += v; vrSum += v * r; vcSum += v * c
            c += 1
          }
          r += 1
        }
        (plng, plat, inner.toLong * inner, vSum, vrSum, vcSum)
      }
      .toDF("plng", "plat", "n_px", "v_sum", "vr_sum", "vc_sum")
  }
}
