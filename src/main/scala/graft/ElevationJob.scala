package graft

import graft.core.TileRow
import graft.ops.Elevation
import graft.sources.GeoJsonSource
import graft.synth.TileGen
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** The reference's `/geojson` endpoint as a spark-submit batch job
  * (src/server.ts:74-95 → file-to-file): read GeoJSON documents, add
  * elevations from a tile store via the broadcast tile-pyramid index, write
  * GeoJSON-lines plus a run-summary JSON line.
  *
  * Usage:
  *   spark-submit --class graft.ElevationJob <jar> \
  *     <geojson-path> <tile-store-dir | SYNTH> <out-dir>
  *
  * `SYNTH` uses the deterministic synthetic 3″ pyramid over the JMT bbox
  * (no external data, same as the test fixtures). A real deployment first
  * runs [[graft.table.TileStore.ingestHgt]] over its HGT archive and passes
  * the store directory.
  */
object ElevationJob {
  def main(args: Array[String]): Unit = {
    val Array(geojsonPath, tileArg, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val features = GeoJsonSource.readDocuments(spark, geojsonPath)
    val tiles: Dataset[TileRow] =
      if (tileArg == "SYNTH")
        spark.createDataset(TileGen.tiles(
          Seq((-119, 36), (-120, 36), (-119, 37), (-120, 37)), 1201, "hgt"))(
          Encoders.product[TileRow])
      else table.TileStore.readTiles(spark, tileArg)

    val nTiles = tiles.count()
    val t0 = System.nanoTime()
    val out = Elevation.addElevation(features, tiles)
    // checkpointed output (north rule): enriched features commit per hash
    // bucket with lineage manifests; a killed job rerun with the same outDir
    // resumes at bucket granularity, then the GeoJSON-lines render reads the
    // committed snapshot
    table.Checkpoint.writeResumable(out.toDF(), Seq("feature_id"),
      nBuckets = 8, s"$outDir/table", runId = s"elevjob-${t0}")
    val committed = table.Checkpoint.read(spark, s"$outDir/table")
      .as[graft.core.FeatureRow](Encoders.product[graft.core.FeatureRow])
    GeoJsonSource.writeLines(committed, s"$outDir/features")
    // counts from the manifests (free) rather than re-parsing the output;
    // coalesce: an empty input commits zero manifests and sum() is NULL
    import org.apache.spark.sql.functions.{coalesce, lit, sum}
    val nFeatures = table.Checkpoint.manifests(spark, s"$outDir/table")
      .agg(coalesce(sum("row_count"), lit(0L))).collect()(0).getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"""{"job":"elevation","features":$nFeatures,"tiles":$nTiles,"sec":$secs%.3f,"buckets":8}""")
    spark.stop()
  }
}
