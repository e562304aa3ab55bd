package graft

import graft.sources.GeoJsonSource
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** GeoJSON file sources/sinks + SQL function registration via
  * SparkSessionExtensions.
  */
class SourcesSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = {
    // getOrCreate returns a prior suite's session and silently drops the
    // extensions — stop any active session so ours is really built with them
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .foreach(_.stop())
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
  }

  override def afterAll(): Unit = spark.stop()

  private def stage(): String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_sources_test"
    graft.table.Checkpoint.clear(dir)
    new java.io.File(dir).mkdirs()
    val in = getClass.getResourceAsStream("/JMT.json")
    val jmt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/jmt.geojson"), jmt)
    dir
  }

  test("whole-document source reads the JMT fixture as 54 features") {
    val dir = stage()
    val features = GeoJsonSource.readDocuments(spark, s"$dir/jmt.geojson")
    assert(features.count() == 54)
    // round trip through GeoJSON-lines
    GeoJsonSource.writeLines(features, s"$dir/lines")
    val back = GeoJsonSource.readLines(spark, s"$dir/lines")
    assert(back.count() == 54)
    // coordinate content identical (ids reassigned by line order)
    val a = features.collect().flatMap(graft.core.GeoJson.coordRows)
      .map(c => (c.lng, c.lat)).sorted.toSeq
    val b = back.collect().flatMap(graft.core.GeoJson.coordRows)
      .map(c => (c.lng, c.lat)).sorted.toSeq
    assert(a == b && a.size == 5998)
  }

  test("extension-injected SQL functions work in plain SQL") {
    val row = spark.sql(
      """SELECT tile_key(-118.29213D, 36.57859D) AS k,
                s2_token(s2_cell(0.0D, 0.0D, 30)) AS t,
                zxy_x(-118.29213D, 14) AS x""").collect()(0)
    assert(row.getString(0) == "N36W119")
    assert(row.getString(1) == "1000000000000001")
    assert(row.getInt(2) > 0)
  }
}
