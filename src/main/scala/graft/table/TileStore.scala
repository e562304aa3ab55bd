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
