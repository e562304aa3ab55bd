package graft

import graft.synth.TileGen
import graft.table.TileStore
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Partition-pruned tile scans: the bbox cover reaches the file scan as
  * PartitionFilters (plan-level assertion, not just row counts).
  */
class TileStoreSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val dir = s"${System.getProperty("java.io.tmpdir")}/graft_tilestore_test"

  private def corners = for { lng <- -122 to -115; lat <- 34 to 39 } yield (lng, lat)

  test("scanBBox reads only covered tiles, via PartitionFilters") {
    graft.table.Checkpoint.clear(dir)
    val tiles = spark.createDataset(TileGen.tiles(corners.toSeq, 61, "hgt"))(
      Encoders.product[graft.core.TileRow])
    TileStore.write(tiles, dir)
    assert(TileStore.read(spark, dir).count() == corners.size)

    // JMT-style bbox → exactly 4 tiles
    val scan = TileStore.scanBBox(spark, dir, -119.56, 36.56, -118.24, 37.88)
    val got = scan.select("tile_key").collect().map(_.getString(0)).toSet
    assert(got == Set("N36W119", "N36W120", "N37W119", "N37W120"))

    // plan-level: the predicate prunes partitions (scan reads 4 of 48 dirs)
    val fileScan = scan.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec in plan"))
    assert(fileScan.partitionFilters.nonEmpty,
      s"expected partition filters, plan:\n${scan.queryExecution.executedPlan}")
    // the scan's own metric: files actually read after pruning
    scan.collect() // materialize so metrics populate
    val numFiles = fileScan.metrics("numFiles").value
    assert(numFiles == 4, s"expected 4 files read after pruning, got $numFiles")
  }

  test("full scan without predicate reads everything") {
    val n = TileStore.read(spark, dir).select("tile_key").distinct().count()
    assert(n == corners.size)
  }
}
