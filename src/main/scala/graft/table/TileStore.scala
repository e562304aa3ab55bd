package graft.table

import graft.core.TileRow
import graft.geo.{S2, TileKey}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}

/** On-disk tile table with scan-level cell-range pruning (north star:
  * "Catalyst-pushable cell-range predicates").
  *
  * Schema decision, not an optimizer rule (SURVEY.md §4): the spatial keys —
  * `tile_key` and a coarse S2 cell `cell8` of the tile center — are stored
  * as **partition columns**, so a query's bbox → covering-key IN-list
  * becomes Catalyst `PartitionFilters` and prunes directories before any
  * byte of raster payload is read. Deriving keys at read time would defeat
  * this. At 10^12 rows the same layout holds: one directory tree per coarse
  * cell, Parquet row-group stats prune within.
  */
object TileStore {

  /** Write the tile table partitioned by (cell8, tile_key). */
  def write(tiles: Dataset[TileRow], dir: String): Unit = {
    tiles.toDF()
      .withColumn("tile_key", col("image_id"))
      .withColumn("cell8", cell8Of(col("image_id")))
      .write.mode("overwrite")
      .partitionBy("cell8", "tile_key")
      .parquet(dir)
  }

  /** Coarse S2 cell (level 8) of a tile's center — the directory-level
    * spatial partition key.
    */
  private def cell8Of = udf { (key: String) =>
    val (swLng, swLat) = TileKey.toDegrees(key)
    S2.latLngToCell(swLng + 0.5, swLat + 0.5, 8)
  }

  def read(spark: SparkSession, dir: String): DataFrame = spark.read.parquet(dir)

  /** Read back as the typed input-table row (drops partition duplicates). */
  def readTiles(spark: SparkSession, dir: String): Dataset[TileRow] =
    read(spark, dir)
      .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
      .as[TileRow](Encoders.product[TileRow])

  /** Ingest a directory of raw SRTM `.hgt` files — the reference's own data
    * layout (S3 objects named `{N|S}lat{E|W}lng.hgt`,
    * src/elevation/fetchElevationTileData.ts:11-21) — into the partitioned
    * image+caption table. Per file: parse the tile key from the name, apply
    * the P3 size predicate (square int16 grid; the reference accepts 3601²
    * and 1201², src/elevation/getResolutionAndSize.ts — synthetic test
    * scales use smaller squares with resolution=0), derive the caption and
    * the decoded-grid phash. This is the migration path for a reference
    * deployment: point the engine at the existing HGT archive.
    *
    * @param strict reference-parity P3 enforcement: ONLY the two canonical
    *               payload sizes (25,934,402 B = 3601² and 2,884,802 B =
    *               1201², src/elevation/getResolutionAndSize.ts:17-26) are
    *               accepted; anything else fails the job with
    *               `UNSUPPORTED_SIZE`, exactly like the reference throws.
    *               Default lenient mode additionally allows any square int16
    *               grid (synthetic test scales, resolution=0).
    */
  def ingestHgt(spark: SparkSession, hgtDir: String, storeDir: String,
                strict: Boolean = false): Long = {
    import graft.core.{TileCaption, TileCodec}
    implicit val enc = Encoders.product[TileRow]
    val tiles = spark.read.format("binaryFile").load(s"$hgtDir/*.hgt")
      .select("path", "content")
      .as[(String, Array[Byte])](Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .map { case (path, bytes) =>
        val key = path.substring(path.lastIndexOf('/') + 1).stripSuffix(".hgt")
        val size = math.sqrt(bytes.length / 2.0).toInt
        require(size.toLong * size * 2 == bytes.length,
          s"UNSUPPORTED_SIZE: ${bytes.length} bytes in $key (not a square int16 grid)")
        require(!strict || size == 3601 || size == 1201,
          s"UNSUPPORTED_SIZE: ${bytes.length} bytes in $key " +
            "(strict mode accepts only 3601x3601 or 1201x1201)")
        val (swLng, swLat) = TileKey.toDegrees(key)
        val resolution = size match { case 3601 => 1; case 1201 => 3; case _ => 0 }
        val z = 9
        val (x, y) = graft.geo.WebMercator.tile(swLng + 0.5, swLat + 0.5, z)
        val caption = TileCodec.captionJson(
          TileCaption(key, z, x, y, swLng, swLat, resolution, size))
        val grid = graft.raster.Hgt.decode(bytes, size)
        TileRow(key, bytes, size, size, "hgt", caption,
          graft.raster.Fidelity.phash(grid, size))
      }
    write(tiles, storeDir)
    read(spark, storeDir).count()
  }

  /** Scan only the tiles a bbox can touch: the IN-list over both partition
    * keys reaches the scan as PartitionFilters (verify with
    * `.explain("formatted")` — see TileStoreSpec).
    */
  def scanBBox(spark: SparkSession, dir: String,
               lngMin: Double, latMin: Double, lngMax: Double, latMax: Double): DataFrame = {
    val keys = for {
      lng <- math.floor(lngMin).toInt to math.floor(lngMax).toInt
      lat <- math.floor(latMin).toInt to math.floor(latMax).toInt
    } yield TileKey.ofDegrees(lng, lat)
    val cells = keys.map { k =>
      val (swLng, swLat) = TileKey.toDegrees(k)
      S2.latLngToCell(swLng + 0.5, swLat + 0.5, 8)
    }.distinct
    read(spark, dir)
      .where(col("cell8").isin(cells: _*) && col("tile_key").isin(keys: _*))
  }
}
