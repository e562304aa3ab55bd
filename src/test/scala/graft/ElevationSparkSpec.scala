package graft

import graft.core._
import graft.geo.TileKey
import graft.ops.Elevation
import graft.raster.Bilinear
import graft.synth.TileGen
import org.apache.spark.sql.{Encoders, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end `/geojson` query on the reference's own golden fixture against
  * a pure-Scala scalar oracle (reference semantics re-implemented coordinate
  * by coordinate), plus physical-path equivalence (broadcast vs cogroup vs
  * salted cogroup vs png-format tiles).
  */
class ElevationSparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def jmt: String = {
    val in = getClass.getResourceAsStream("/JMT.json")
    try scala.io.Source.fromInputStream(in).mkString finally in.close()
  }

  private val corners = Seq((-119, 36), (-120, 36), (-119, 37), (-120, 37))
  private def tiles(fmt: String) = TileGen.tiles(corners, 601, fmt)

  /** Scalar oracle: the reference pipeline, one coordinate at a time. */
  private def oracleElev(rows: Seq[CoordRow], ts: Seq[TileRow]): Map[(String, Long), Double] = {
    val decoded = ts.map(t => t.image_id -> TileCodec.decode(t)).toMap
    rows.map { c =>
      val key = TileKey.of(c.lng, c.lat)
      val e = decoded.get(key) match {
        case Some(d) => Bilinear.sampleGrid(d.samples, d.size, d.swLng.toDouble, d.swLat.toDouble, c.lng, c.lat)
        case None    => 0.0 // NO_DATA ⇒ sea level (F8)
      }
      (c.feature_id, c.coord_idx) -> e
    }.toMap
  }

  test("JMT end-to-end: broadcast join equals scalar oracle exactly (5,998 coords)") {
    import spark.implicits._
    val features = spark.createDataset(GeoJson.featureRows(GeoJson.parse(jmt)))
    val coords = GeoJson.featureRows(GeoJson.parse(jmt)).flatMap(GeoJson.coordRows)
    assert(coords.length == 5998)
    val expect = oracleElev(coords, tiles("hgt"))
    val tds = spark.createDataset(tiles("hgt"))(Encoders.product[TileRow])
    val got = Elevation.lookupBroadcast(Elevation.coordRows(features).toDF(), tds)
      .select($"feature_id", $"coord_idx", $"elev").as[(String, Long, Double)]
      .collect()
    assert(got.length == 5998) // join row count == per-coordinate lookup count
    got.foreach { case (fid, idx, e) => assert(e == expect((fid, idx)), s"($fid,$idx)") }
    assert(got.map(_._3).count(_ > 0) == 5998) // all on-land coords gain elev > 0
  }

  test("ocean LineString near [0,0] ⇒ all elevations exactly 0 (missing tiles)") {
    import spark.implicits._
    val ocean = FeatureRow("ocean",
      """{"type":"Feature","id":"ocean","geometry":{"type":"LineString","coordinates":[[0,0],[0.25,0.25],[0.5,0.5],[0.75,0.75],[1,1]]},"properties":{}}""")
    val tds = spark.createDataset(tiles("hgt"))(Encoders.product[TileRow])
    val got = Elevation.lookupBroadcast(
      Elevation.coordRows(spark.createDataset(Seq(ocean))).toDF(), tds)
      .select($"elev").as[Double].collect()
    assert(got.length == 5 && got.forall(_ == 0.0))
  }

  test("cogroup path (salt 1 and 4) and png tiles agree with broadcast exactly") {
    import spark.implicits._
    val features = spark.createDataset(GeoJson.featureRows(GeoJson.parse(jmt)))
    val coords = Elevation.coordRows(features)
    val hgt = spark.createDataset(tiles("hgt"))(Encoders.product[TileRow])
    val png = spark.createDataset(tiles("png"))(Encoders.product[TileRow])
    val base = Elevation.lookupBroadcast(coords.toDF(), hgt)
      .select($"feature_id", $"coord_idx", $"elev").as[(String, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    for ((name, ds) <- Seq(
        "cogroup" -> Elevation.lookupCogroup(coords, hgt),
        "cogroup-salt4" -> Elevation.lookupCogroup(coords, hgt, salt = 4),
        "cogroup-png" -> Elevation.lookupCogroup(coords, png))) {
      val got = ds.collect()
      assert(got.length == base.size, name)
      got.foreach(r => assert(r.elev == base((r.feature_id, r.coord_idx)), s"$name (${r.feature_id},${r.coord_idx})"))
    }
  }

  test("addElevation writes elev into position index 2 of the GeoJSON (A4 reassembly)") {
    import spark.implicits._
    val features = spark.createDataset(GeoJson.featureRows(GeoJson.parse(jmt)))
    val tds = spark.createDataset(tiles("hgt"))(Encoders.product[TileRow])
    val out = Elevation.addElevation(features, tds).collect()
    assert(out.length == 54)
    val coords = out.flatMap { fr =>
      val n = GeoJson.parse(fr.feature_json)
      assert(n.get("properties") != null) // properties survive round-trip
      GeoJson.coordRows(fr)
    }
    assert(coords.length == 5998)
    // every position now has a third component > 0
    out.foreach { fr =>
      val node = GeoJson.parse(fr.feature_json)
      val geom = node.get("geometry")
      def walk(n: com.fasterxml.jackson.databind.JsonNode): Unit =
        if (n.isArray) {
          if (n.size() > 0 && n.get(0).isNumber) assert(n.size() >= 3 && n.get(2).asDouble() > 0.0)
          else (0 until n.size()).foreach(i => walk(n.get(i)))
        }
      walk(geom.get("coordinates"))
    }
  }

  test("polyline → terrarium byte stream (entry point 2)") {
    import spark.implicits._
    val pl = graft.geo.Polyline.encode(Seq((-118.8, 36.2), (-118.7, 36.3)))
    val tds = spark.createDataset(tiles("hgt"))(Encoders.product[TileRow])
    val out = Elevation.polylineToTerrarium(spark.createDataset(Seq(("p1", pl))), tds).collect()
    assert(out.length == 1)
    val (_, bytes) = out.head
    assert(bytes.length == 6) // 3 bytes per coordinate
    // oracle: scalar pipeline + reference Terrarium encode
    val coords = graft.geo.Polyline.decode(pl).zipWithIndex
      .map { case ((lng, lat), i) => CoordRow("p1", i.toLong, lng, lat) }
    val expectE = oracleElev(coords.toSeq, tiles("hgt"))
    val expected = graft.raster.Terrarium.encodeStream(
      coords.map(c => expectE((c.feature_id, c.coord_idx))))
    assert(bytes.sameElements(expected))
  }

  test("SparkEntry.entry smoke: rows > 0 and Whitney-area elevations positive") {
    val df = SparkEntry.entry(spark)
    assert(df.count() == 5998)
  }

  test("tile pyramid: PNG sub-tiles round-trip to bilinear pixel-center samples") {
    import graft.ops.TilePyramid
    val src = spark.createDataset(tiles("hgt"))(Encoders.product[TileRow])
    val subs = TilePyramid.materialize(src, 2, 64).collect()
    assert(subs.length == corners.length * 4)
    assert(subs.forall(_.size == 64))
    val byKey = subs.map(s => (s.image_id, s.sx, s.sy) -> s).toMap
    val grid = TileGen.grid(-119, 36, 601)
    for ((sx, sy) <- Seq((0, 0), (1, 0), (0, 1), (1, 1))) {
      val st = byKey(("N36W119", sx, sy))
      val (elevs, sz) = graft.raster.ImageCodec.decodeToElevations(st.png)
      assert(sz == 64)
      // every decoded pixel is the Terrarium quantization (floor to 1/256)
      // of the bilinear sample at its pixel center
      for ((r, c) <- Seq((0, 0), (13, 41), (63, 63))) {
        val lat = 36.0 + (sy * 64 + r + 0.5) / 128.0
        val lng = -119.0 + (sx * 64 + c + 0.5) / 128.0
        val want = Bilinear.sampleGrid(grid, 601, -119.0, 36.0, lng, lat)
        val got = elevs(r * 64 + c)
        assert(got <= want && want - got < 1.0 / 256.0,
          s"($sx,$sy) px($r,$c): got $got want $want")
      }
    }
  }
}
