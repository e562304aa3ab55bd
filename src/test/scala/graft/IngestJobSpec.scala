package graft

import graft.synth.TileGen
import graft.table.TileStore
import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** HGT-archive ingestion (the reference's S3 layout → the engine's
  * partitioned table) and the end-to-end elevation batch job.
  */
class IngestJobSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private val base = s"${System.getProperty("java.io.tmpdir")}/graft_ingest_test"

  test("ingestHgt: raw .hgt files become a partitioned caption table; join works") {
    graft.table.Checkpoint.clear(base)
    val hgtDir = new java.io.File(s"$base/hgt"); hgtDir.mkdirs()
    val corners = Seq((-119, 36), (-120, 36), (-119, 37), (-120, 37))
    for ((lng, lat) <- corners) {
      val key = graft.geo.TileKey.ofDegrees(lng, lat)
      val bytes = graft.raster.Hgt.encode(TileGen.grid(lng, lat, 121), 121)
      java.nio.file.Files.write(java.nio.file.Paths.get(s"$base/hgt/$key.hgt"), bytes)
    }
    val n = TileStore.ingestHgt(spark, s"$base/hgt", s"$base/store")
    assert(n == 4)
    val tiles = TileStore.readTiles(spark, s"$base/store")
    val rows = tiles.collect()
    assert(rows.map(_.image_id).toSet ==
      Set("N36W119", "N36W120", "N37W119", "N37W120"))
    // caption + phash integrity of ingested rows (input_hint invariants):
    // recomputed phash equals the stored column, caption georeferencing
    // equals the tile key's corner and the payload size
    val integ = graft.ops.ImageOps.integrity(tiles).collect()
    assert(integ.forall { r =>
      val (lng, lat) = graft.geo.TileKey.toDegrees(r.getAs[String]("image_id"))
      r.getAs[Long]("phash") == r.getAs[Long]("phash_stored") &&
        r.getAs[String]("cap_tile_key") == r.getAs[String]("image_id") &&
        r.getAs[Int]("cap_sw_lng") == lng &&
        r.getAs[Int]("cap_sw_lat") == lat &&
        r.getAs[Int]("cap_size") == 121
    })
    // elevation join over the ingested store matches the synthetic grid
    val pt = Seq((1L, -118.5, 36.5))
    import spark.implicits._
    val out = graft.ops.Elevation.lookupBroadcast(
      pt.toDF("point_id", "lng", "lat"), tiles).collect()(0)
    val expected = graft.raster.Bilinear.sampleGrid(
      TileGen.grid(-119, 36, 121), 121, -119.0, 36.0, -118.5, 36.5)
    assert(out.getAs[Double]("elev") == expected)
  }

  test("resample: 3:1 decimation keeps shared grid nodes, round-trips HGT") {
    import graft.core.TileCodec
    val tiles = spark.createDataset(TileGen.tiles(Seq((-119, 36)), 121, "hgt"))(
      org.apache.spark.sql.Encoders.product[graft.core.TileRow])
    val rs = graft.ops.ImageOps.resample(tiles, 3).collect()
    assert(rs.length == 1)
    val t = rs(0)
    assert(t.w == 41 && t.h == 41 && t.fmt == "hgt")
    val d = TileCodec.decode(t)
    for (r <- 0 until 41; c <- 0 until 41)
      assert(d.sample(r, c) == TileGen.sampleAt(-119, 36, 3 * r, 3 * c),
        s"node ($r,$c)")
    val cap = TileCodec.parseCaption(t.caption)
    assert(cap.size == 41 && cap.tile_key == "N36W119")
    assert(t.phash == graft.raster.Fidelity.phash(d.samples, 41))
  }

  test("augment permutes the grid exactly; moments follow the identities") {
    import graft.core.TileCodec
    val n = 121; val m = n - 1
    val tiles = spark.createDataset(TileGen.tiles(Seq((-119, 36)), n, "hgt"))(
      org.apache.spark.sql.Encoders.product[graft.core.TileRow])
    val ref: (Int, Int) => Int = (r, c) => TileGen.sampleAt(-119, 36, r, c)
    val expect: Map[String, (Int, Int) => Int] = Map(
      "flip_h" -> ((r, c) => ref(r, m - c)),
      "flip_v" -> ((r, c) => ref(m - r, c)),
      "rot90" -> ((r, c) => ref(m - c, r)))
    for ((mode, f) <- expect) {
      val t = graft.ops.ImageOps.augment(tiles, mode).collect()(0)
      assert(t.fmt == "hgt" && t.w == n && t.image_id == "N36W119")
      val d = TileCodec.decode(t)
      for (r <- 0 until n; c <- 0 until n)
        assert(d.sample(r, c) == f(r, c), s"$mode ($r,$c)")
      assert(t.phash == graft.raster.Fidelity.phash(d.samples, n))
      // moment identities vs the unaugmented sums
      var s0 = 0L; var rm0 = 0L; var cm0 = 0L
      for (r <- 0 until n; c <- 0 until n) {
        val v = ref(r, c).toLong; s0 += v; rm0 += v * r; cm0 += v * c
      }
      val mom = graft.ops.ImageOps.positionMoments(
        graft.ops.ImageOps.augment(tiles, mode)).collect()(0)
      val (er, ec) = mode match {
        case "flip_h" => (rm0, m * s0 - cm0)
        case "flip_v" => (m * s0 - rm0, cm0)
        case "rot90"  => (cm0, m * s0 - rm0)
      }
      assert(mom.px_sum == s0 && mom.r_moment == er && mom.c_moment == ec, mode)
    }
    intercept[IllegalArgumentException] {
      graft.ops.ImageOps.augment(tiles, "rot45")
    }
  }

  test("contourCensus: hand-computed saddle grid; thresholds outside range") {
    import org.apache.spark.sql.Encoders
    // 3x3 checker at t=5: all four 2x2 cells are saddles (cases 10/5/5/10)
    val g = Array[Short](1, 9, 1, 9, 1, 9, 1, 9, 1)
    val row = graft.core.TileRow("N36W119", graft.raster.Hgt.encode(g, 3),
      3, 3, "hgt", "{}", 0L)
    val ds = spark.createDataset(Seq(row))(Encoders.product[graft.core.TileRow])
    val got = graft.ops.ImageOps.contourCensus(ds, 5)
      .collect().map(r => (r.getAs[Long]("n_above"), r.getAs[Long]("n_cut"),
        r.getAs[Long]("n_saddles"), r.getAs[Long]("n_segments"))).head
    assert(got == ((4L, 4L, 4L, 8L)))
    val below = graft.ops.ImageOps.contourCensus(ds, 100).collect().head
    assert(below.getAs[Long]("n_cut") == 0 &&
      below.getAs[Long]("n_segments") == 0 && below.getAs[Long]("n_above") == 0)
    val above = graft.ops.ImageOps.contourCensus(ds, -10).collect().head
    assert(above.getAs[Long]("n_cut") == 0 && below.getAs[Long]("n_saddles") == 0 &&
      above.getAs[Long]("n_above") == 9)
  }

  test("fastCorners: isolated peak is a dark corner, step edge is not, flat is nothing") {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[graft.core.TileRow]
    def tile(id: String, f: (Int, Int) => Int) = {
      val g = Array.tabulate[Short](81)(i => f(i / 9, i % 9).toShort)
      graft.core.TileRow(id, graft.raster.Hgt.encode(g, 9), 9, 9, "hgt", "{}", 0L)
    }
    def census(t: graft.core.TileRow) =
      graft.ops.ImageOps.fastCorners(spark.createDataset(Seq(t)), t = 10)
        .collect().map(r => (r.getAs[Long]("n_tested"), r.getAs[Long]("n_bright"),
          r.getAs[Long]("n_dark"), r.getAs[Long]("n_corners"))).head
    // size 9, margin 3 -> 3x3 interior = 9 tested pixels everywhere
    // flat field: no corners of either polarity
    assert(census(tile("N36W119", (_, _) => 100)) == ((9L, 0L, 0L, 0L)))
    // single bright peak at (4,4): its whole circle is darker by 100 ->
    // exactly one dark-polarity corner; no other interior pixel's circle
    // even touches the peak (all 16 offsets exceed the 3x3 interior)
    assert(census(tile("N37W119", (r, c) => if (r == 4 && c == 4) 200 else 100))
      == ((9L, 0L, 1L, 1L)))
    // vertical step edge: at most 7 contiguous circle pixels cross the
    // step from any interior pixel -> FAST-12 rejects edges by design
    assert(census(tile("N36W120", (_, c) => if (c >= 4) 200 else 100))
      == ((9L, 0L, 0L, 0L)))
  }

  test("haar: hand-computed 4x4 subband sums; flat field has zero detail energy") {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[graft.core.TileRow]
    def tile(f: (Int, Int) => Int) = {
      val g = Array.tabulate[Short](16)(i => f(i / 4, i % 4).toShort)
      graft.core.TileRow("N36W119", graft.raster.Hgt.encode(g, 4), 4, 4, "hgt", "{}", 0L)
    }
    def row(t: graft.core.TileRow) =
      graft.ops.ImageOps.haar(spark.createDataset(Seq(t))).collect()
        .map(r => (r.getAs[Long]("n_blocks"), r.getAs[Long]("ll_sum"),
          r.getAs[Long]("lh_energy"), r.getAs[Long]("hl_energy"),
          r.getAs[Long]("hh_energy"))).head
    // f(r,c) = 4r + c + 1: per block lh = -2, hl = -8, hh = 0 exactly;
    // block NW corners a ∈ {1, 3, 9, 11}, ll_sum = Σ(4a + 10) = 136
    assert(row(tile((r, c) => 4 * r + c + 1)) == ((4L, 136L, 16L, 256L, 0L)))
    // flat field: all detail bands identically zero, LL carries the mass
    assert(row(tile((_, _) => 7)) == ((4L, 4L * 28L, 0L, 0L, 0L)))
  }

  test("lbp: flat field is all-255, a pure column gradient is one directional code") {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[graft.core.TileRow]
    def hist(f: (Int, Int) => Int) = {
      val g = Array.tabulate[Short](81)(i => f(i / 9, i % 9).toShort)
      val t = graft.core.TileRow("N36W119", graft.raster.Hgt.encode(g, 9),
        9, 9, "hgt", "{}", 0L)
      graft.ops.ImageOps.lbp(spark.createDataset(Seq(t))).collect()
        .map(r => r.getAs[Int]("code") -> r.getAs[Long]("n")).toMap
    }
    // flat: every neighbor >= center -> code 255 for all 49 interior pixels
    assert(hist((_, _) => 100) == Map(255 -> 49L))
    // strict column gradient: exactly the dc >= 0 bits (i1..i5) fire
    assert(hist((_, c) => c * 10) == Map(62 -> 49L))
  }

  test("orientHist: octant ladder on axis/diagonal gradients and the flat bucket") {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[graft.core.TileRow]
    def hist(f: (Int, Int) => Int) = {
      val g = Array.tabulate[Short](81)(i => f(i / 9, i % 9).toShort)
      val t = graft.core.TileRow("N36W119", graft.raster.Hgt.encode(g, 9),
        9, 9, "hgt", "{}", 0L)
      graft.ops.ImageOps.orientHist(spark.createDataset(Seq(t))).collect()
        .map(r => r.getAs[Int]("sector") ->
          ((r.getAs[Long]("n"), r.getAs[Long]("energy")))).toMap
    }
    // pure +x gradient: gx=20, gy=0 -> sector 0; energy 49 * 400
    assert(hist((_, c) => c * 10) == Map(0 -> ((49L, 19600L))))
    // pure +y gradient: gx=0, gy=20 -> sector 2 (pi/2 opens octant 2)
    assert(hist((r, _) => r * 10) == Map(2 -> ((49L, 19600L))))
    // exact diagonal gy=gx>0: angle pi/4 belongs to the HIGHER octant (1)
    assert(hist((r, c) => (r + c) * 10) == Map(1 -> ((49L, 39200L))))
    // flat: everything lands in the flat bucket with zero energy
    assert(hist((_, _) => 5) == Map(8 -> ((49L, 0L))))
  }

  test("ingestHgt rejects non-square payloads (P3 size predicate)") {
    graft.table.Checkpoint.clear(s"$base/bad")
    val d = new java.io.File(s"$base/bad/hgt"); d.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/bad/hgt/N00E000.hgt"), new Array[Byte](1001))
    val e = intercept[org.apache.spark.SparkException] {
      TileStore.ingestHgt(spark, s"$base/bad/hgt", s"$base/bad/store")
    }
    assert(e.getMessage.contains("UNSUPPORTED_SIZE") ||
      Option(e.getCause).exists(_.getMessage.contains("UNSUPPORTED_SIZE")))
  }

  test("strict mode rejects square-but-noncanonical sizes (reference P3 parity)") {
    graft.table.Checkpoint.clear(s"$base/strict")
    val d = new java.io.File(s"$base/strict/hgt"); d.mkdirs()
    // a 121x121 square grid: legal in lenient mode, UNSUPPORTED_SIZE in
    // strict mode (the reference accepts only 3601^2 / 1201^2,
    // src/elevation/getResolutionAndSize.ts:17-26)
    val bytes = graft.raster.Hgt.encode(TileGen.grid(-119, 36, 121), 121)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/strict/hgt/N36W119.hgt"), bytes)
    val e = intercept[org.apache.spark.SparkException] {
      TileStore.ingestHgt(spark, s"$base/strict/hgt", s"$base/strict/store",
        strict = true)
    }
    assert(e.getMessage.contains("UNSUPPORTED_SIZE") ||
      Option(e.getCause).exists(_.getMessage.contains("UNSUPPORTED_SIZE")))
    // same file ingests fine in lenient mode
    assert(TileStore.ingestHgt(spark, s"$base/strict/hgt", s"$base/strict/store2") == 1)
  }

  test("ElevationJob end to end: JMT file in, GeoJSON-lines out, elevations > 0") {
    graft.table.Checkpoint.clear(s"$base/job")
    new java.io.File(s"$base/job").mkdirs()
    val in = getClass.getResourceAsStream("/JMT.json")
    val jmt = try scala.io.Source.fromInputStream(in).mkString finally in.close()
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$base/job/jmt.geojson"), jmt)
    // the job owns (and stops) the active session — runs last in this suite;
    // assertions get a fresh session
    ElevationJob.main(Array(s"$base/job/jmt.geojson", "SYNTH", s"$base/job/out"))
    val s2 = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val back = graft.sources.GeoJsonSource.readLines(s2, s"$base/job/out/features")
    assert(back.count() == 54)
    // every coordinate gained a positive elevation (reference addElevation
    // post-condition for land tiles, tests/elevation/addElevation.test.js)
    val elevs = back.collect().flatMap(graft.core.GeoJson.elevations)
    assert(elevs.length == 5998 && elevs.forall(_ > 0.0))
  }
}
