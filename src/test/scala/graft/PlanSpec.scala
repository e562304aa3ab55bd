package graft

import graft.core.TileRow
import graft.ops.Elevation
import graft.synth.TileGen
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{FileSourceScanExec, WholeStageCodegenExec}
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the plans we designed for are the plans Catalyst
  * actually produces (".explain and iterate until it's the plan you'd want").
  */
class PlanSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("broadcast elevation lookup is shuffle-free and single-stage codegen") {
    import spark.implicits._
    // parquet-backed input: a purely local Seq would be constant-folded by
    // ConvertToLocalRelation and leave no codegen stage to assert on
    val ptsDir = s"${System.getProperty("java.io.tmpdir")}/graft_planspec_pts"
    graft.table.Checkpoint.clear(ptsDir)
    (1 to 1000).map(i => (i.toLong, -119.5 + i * 1e-4, 36.5 + i * 1e-4))
      .toDF("point_id", "lng", "lat").write.mode("overwrite").parquet(ptsDir)
    val pts = spark.read.parquet(ptsDir)
    val tiles = spark.createDataset(TileGen.tiles(Seq((-120, 36)), 61, "hgt"))(
      Encoders.product[TileRow])
    val out = Elevation.lookupBroadcast(pts, tiles)
    val plan = out.queryExecution.executedPlan
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, s"expected no shuffle, plan:\n$plan")
    val codegen = plan.collect { case w: WholeStageCodegenExec => w }
    assert(codegen.nonEmpty, "expected whole-stage codegen")
  }

  test("filters and projection push down to the parquet scan") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_pushdown_test"
    graft.table.Checkpoint.clear(dir)
    spark.range(0, 10000)
      .selectExpr("id", "id * 2 AS a", "id * 3 AS b", "cast(id as string) AS s")
      .write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).where(col("a") > 19000).select("id", "a")
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.getOrElse(fail("no file scan"))
    // data filter reaches the scan...
    assert(scan.dataFilters.nonEmpty, s"no pushed filters:\n$scan")
    // ...and the read schema is pruned to the 2 needed columns
    assert(scan.requiredSchema.fieldNames.toSet == Set("id", "a"),
      s"read schema not pruned: ${scan.requiredSchema}")
  }

  test("PIP candidate join broadcasts the (small) polygon-cover side") {
    import spark.implicits._
    val pts = (1 to 2000).map(i => (i.toLong, -119.5 + i * 1e-4, 36.5 + i * 1e-4))
      .toDF("point_id", "lng", "lat")
    val polys = Seq((1L, Array(-119.5, -119.4, -119.45), Array(36.5, 36.5, 36.6)))
      .toDF("poly_id", "xs", "ys")
    val out = graft.ops.SpatialJoin.pointInPolygon(pts, polys, Some(10))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected broadcast join:\n$plan")
  }
}
