package graft.ops

import graft.core._
import graft.functions.spatial._
import graft.geo.TileKey
import graft.raster.Bilinear
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One sampled coordinate (J1/J4 output row). */
final case class ElevRow(feature_id: String, coord_idx: Long, lng: Double,
                         lat: Double, tile_key: String, elev: Double)

/** The reference's core query as Spark plans: per-coordinate terrain lookup =
  * point→tile **left-outer equi-join** on the floored-degree tile key, then
  * bilinear sampling, with missing tiles coalesced to sea level 0
  * (reference: src/elevation/getElevation.ts, fetchElevationTileData.ts).
  *
  * Two physical paths, chosen by tile-side size:
  *
  *  - [[lookupBroadcast]]: broadcast-hash-join the tile table (bounded tile
  *    sets — the common case: a query's bbox covers few tiles). The bilinear
  *    sample runs as a native codegen'd expression directly over the joined
  *    `bytes` column: no decode step at all for `fmt=hgt` (4 random int16
  *    reads per probe), zero shuffle.
  *
  *  - [[lookupCogroup]]: the 100 TB path. Both sides hash-partition on
  *    (tile_key, salt); each group decodes its tile **once** and streams its
  *    coordinates through in-memory sampling. Salting (`salt > 1`) splits the
  *    coordinate stream of hot tiles (urban-hotspot skew, north rule) across
  *    `salt` reducers by replicating only the tile row — never the coords.
  */
object Elevation {

  /** P4: explode features to coordinate rows in coordEach document order. */
  def coordRows(features: Dataset[FeatureRow]): Dataset[CoordRow] = {
    implicit val enc = org.apache.spark.sql.Encoders.product[CoordRow]
    features.flatMap(GeoJson.coordRows _)
  }

  /** Broadcast path: probe a broadcast [[TileIndex]] with a codegen'd
    * scalar expression — zero shuffle, zero join-row materialization of the
    * raster payloads (see TileIndex scaladoc for why a broadcast hash join
    * on the `bytes` column is a per-row multi-MB memcpy). `coords` needs
    * (lng, lat) columns; extra columns pass through. Adds `tile_key` and
    * `elev`.
    */
  def lookupBroadcast(coords: DataFrame, tiles: Dataset[TileRow]): DataFrame = {
    val bc = TileIndex.broadcastIndex(tiles)
    coords
      .withColumn("tile_key", tile_key(col("lng"), col("lat")))
      .withColumn("elev", ElevAt.elev_at(col("lng"), col("lat"), bc))
  }

  /** Elevation profile over ordered polyline vertices — the reference's
    * `/polyline` use case (src/server.ts:52-72) as an analytic query: per
    * vertex, the bilinear elevation plus the running planar distance and
    * total ascent along its line. The running totals are quantized to exact
    * integers (micro-degrees; 1/64 m) BEFORE the window sum: a windowed SUM
    * over doubles is association-order-dependent (Spark folds rows
    * sequentially, other engines may use segment trees), while integer
    * summands make the running totals engine-independent — the per-vertex
    * `elev` itself stays the exact IEEE double. One window per line; at
    * 10^12 vertices the only shuffle is the hash partition on line_id and
    * lines are independent.
    *
    * @param vertices (line_id, seq, lng, lat) — seq orders vertices within
    *                 a line; extra columns pass through
    */
  def profile(vertices: DataFrame, tiles: Dataset[TileRow]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("line_id").orderBy("seq")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lookupBroadcast(vertices, tiles)
      .withColumn("dx", col("lng") - lag("lng", 1).over(w))
      .withColumn("dy", col("lat") - lag("lat", 1).over(w))
      .withColumn("seg_q", coalesce(
        floor(sqrt(col("dx") * col("dx") + col("dy") * col("dy")) * lit(1000000.0))
          .cast("long"), lit(0L)))
      .withColumn("rise_q", coalesce(
        floor(greatest(col("elev") - lag("elev", 1).over(w), lit(0.0)) * lit(64.0))
          .cast("long"), lit(0L)))
      .withColumn("cum_dist_q", sum("seg_q").over(cum))
      .withColumn("ascent_q", sum("rise_q").over(cum))
      .drop("dx", "dy", "seg_q", "rise_q")
  }

  /** Line-of-sight visibility along each profile line (viewshed-on-a-line):
    * vertex i is visible from the line's FIRST vertex iff its elevation
    * angle exceeds every intermediate vertex's angle. The angle surrogate is
    * `(elev_i − elev_obs) / max(cum_dist_q_i, 1)` — exact double minus exact
    * double over an exact integer, ONE IEEE division per vertex, so an
    * independent engine reproduces every ratio bit-for-bit (no trig needed:
    * atan is monotone, so comparing tangents decides visibility).
    *
    * All four window functions share the profile's (line_id, seq) window —
    * still exactly ONE shuffle on line_id for the whole query; the running
    * `max` is order-independent (unlike a double sum) so no quantization is
    * needed.
    */
  def viewshed(vertices: DataFrame, tiles: Dataset[TileRow]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("line_id").orderBy("seq")
    val cumF = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevF = w.rowsBetween(Window.unboundedPreceding, -1)
    profile(vertices, tiles)
      .withColumn("rn", row_number().over(w))
      .withColumn("obs_elev", first("elev").over(cumF))
      .withColumn("ratio", when(col("rn") === 1, lit(null).cast("double"))
        .otherwise((col("elev") - col("obs_elev")) /
          greatest(col("cum_dist_q"), lit(1L)).cast("double")))
      .withColumn("prev_max", max("ratio").over(prevF))
      .withColumn("visible", col("rn") === 1 || col("prev_max").isNull ||
        col("ratio") > col("prev_max"))
  }

  /** The literal join formulation (J1 as a BroadcastHashJoin on tile_key +
    * bilinear over the joined `bytes`). Kept for plan-shape comparison and
    * for tile tables too wide to index; NOT the fast path — each probe row
    * materializes its tile payload.
    */
  def lookupBytesJoin(coords: DataFrame, tiles: Dataset[TileRow]): DataFrame = {
    val t = tiles.toDF().select(col("image_id"), col("bytes"), col("w"))
    coords
      .withColumn("tile_key", tile_key(col("lng"), col("lat")))
      .join(broadcast(t), col("tile_key") === col("image_id"), "left_outer")
      .withColumn("elev",
        coalesce(bilinear_hgt(col("bytes"), col("w"), col("lng"), col("lat")), lit(0.0)))
      .drop("image_id", "bytes", "w")
  }

  /** Shuffle/cogroup path with optional skew salting. Handles every `fmt`
    * (hgt/png/jpg) because each tile is decoded exactly once per group.
    */
  def lookupCogroup(coords: Dataset[CoordRow], tiles: Dataset[TileRow],
                    salt: Int = 1): Dataset[ElevRow] = {
    val spark = coords.sparkSession
    import spark.implicits._
    val s = math.max(1, salt)
    // Packed Long shuffle key `tileIntKey * salt + lane` instead of a
    // per-row `"$tileKey#$lane"` string: the string form allocates, hashes
    // and compares ~16 bytes per probe row — pure overhead on the path
    // where EVERY row crosses the shuffle. The int tile key is the same
    // bijection the broadcast index uses (TileIndex.key).
    val keyedCoords = coords.groupByKey { c =>
      val k = TileIndex.key(math.floor(c.lng).toInt, math.floor(c.lat).toInt).toLong
      // salt lane from a per-row hash: coord_idx alone degenerates to one
      // lane for point-style inputs where every row has coord_idx 0
      val lane = if (s == 1) 0
        else math.floorMod(c.feature_id.hashCode * 31 + c.coord_idx.toInt, s)
      k * s + lane
    }
    val keyedTiles = tiles.flatMap { t =>
      val (lngD, latD) = TileKey.toDegrees(t.image_id)
      val k = TileIndex.key(lngD, latD).toLong
      (0 until s).iterator.map(i => (k * s + i, t))
    }.groupByKey(_._1)
    keyedCoords.cogroup(keyedTiles) { (_, cs, ts) =>
      ts.toSeq.headOption match {
        case Some((_, tile)) =>
          val d = TileCodec.decode(tile)
          cs.map { c =>
            ElevRow(c.feature_id, c.coord_idx, c.lng, c.lat, tile.image_id,
              Bilinear.sampleGrid(d.samples, d.size, d.swLng.toDouble,
                d.swLat.toDouble, c.lng, c.lat))
          }
        case None => // missing tile ⇒ sea level (F8 no-data coalesce)
          cs.map(c => ElevRow(c.feature_id, c.coord_idx, c.lng, c.lat,
            TileKey.of(c.lng, c.lat), 0.0))
      }
    }
  }

  /** Full `/geojson` query (entry point 1): add elevations into the GeoJSON
    * features. A4 reassembly: group sampled coords per feature and rewrite
    * the nested coordinate arrays in document order.
    */
  def addElevation(features: Dataset[FeatureRow], tiles: Dataset[TileRow],
                   broadcastTiles: Boolean = true): Dataset[FeatureRow] = {
    val spark = features.sparkSession
    import spark.implicits._
    val coords = coordRows(features)
    val sampled: Dataset[ElevRow] =
      if (broadcastTiles)
        lookupBroadcast(coords.toDF(), tiles)
          .select($"feature_id", $"coord_idx", $"lng", $"lat", $"tile_key", $"elev")
          .as[ElevRow]
      else lookupCogroup(coords, tiles)
    val perFeature = sampled.groupByKey(_.feature_id)
      .mapGroups { (fid, rows) =>
        (fid, rows.map(r => r.coord_idx -> r.elev).toMap)
      }
    features.joinWith(perFeature, features("feature_id") === perFeature("_1"), "left_outer")
      .map { case (f, kv) =>
        if (kv == null) f else GeoJson.withElevations(f, kv._2)
      }
  }

  /** Entry point 2 (`/polyline`): decode polyline → sample → Terrarium byte
    * stream in coordinate order (F5 → J1 → F6).
    */
  def polylineToTerrarium(polylines: Dataset[(String, String)],
                          tiles: Dataset[TileRow]): Dataset[(String, Array[Byte])] = {
    val spark = polylines.sparkSession
    import spark.implicits._
    val coords = polylines.flatMap { case (id, pl) =>
      graft.geo.Polyline.decode(pl).iterator.zipWithIndex.map {
        case ((lng, lat), i) => CoordRow(id, i.toLong, lng, lat)
      }
    }
    val sampled = lookupBroadcast(coords.toDF(), tiles)
      .select($"feature_id", $"coord_idx", $"elev").as[(String, Long, Double)]
    sampled.groupByKey(_._1).mapGroups { (id, rows) =>
      val elevs = rows.toArray.sortBy(_._2).map(_._3)
      (id, graft.raster.Terrarium.encodeStream(elevs))
    }
  }
}
