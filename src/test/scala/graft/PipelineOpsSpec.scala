package graft

import graft.ops.{Embeddings, TextDedup}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Brute-force equality specs for the training-data pipeline operators added
  * beyond the oracle gates: connected-components clustering and IVF top-k
  * search.
  */
class PipelineOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("connectedComponents: chains, cliques, singletons, star") {
    import spark.implicits._
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20} (singleton),
    // {30,31,32,33} (star centered at 33 — max id center exercises label flow
    // against the edge direction)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (33L, 30L), (33L, 31L), (33L, 32L))
      .toDF("doc_a", "doc_b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 30L, 31L, 32L, 33L)
      .toDF("doc_id")
    val got = TextDedup.connectedComponents(edges, nodes)
      .as[(Long, Long)].collect().toMap
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L,
      30L -> 30L, 31L -> 30L, 32L -> 30L, 33L -> 30L)
    assert(got == want)
  }

  test("minhash LSH pair join is a bucketed equi-join, never a cartesian") {
    import spark.implicits._
    val corpus = (0 until 300).map(i =>
      (i.toLong, s"w${i % 40} x${i % 7} y${i % 13} z${i % 5} common words tail ${i % 3}"))
      .toDF("doc_id", "text")
    val pairs = ops.TextDedup.minhashPairs(corpus)
    pairs.collect()
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"LSH candidate generation must stay an equi-join on (band_id, band_key):\n$plan")
    assert(plan.contains("band_key"), s"band key missing from join plan:\n$plan")
  }

  test("connectedComponents equals union-find on random graphs (3 seeds)") {
    import spark.implicits._
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val n = 120
      val edges = (0 until 90).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val nodes = (0L until n.toLong).toDF("doc_id")
      val got = ops.TextDedup.connectedComponents(
        edges.toDF("doc_a", "doc_b"), nodes)
        .as[(Long, Long)].collect().toMap
      // union-find oracle with min-id roots
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) { val lo = math.min(ra, rb); parent(math.max(ra, rb)) = lo }
      }
      val want = (0 until n).map(i => i.toLong -> find(i).toLong).toMap
      assert(got == want, s"seed $seed")
    }
  }

  test("ivfSearch plan: centroid-list join, no cartesian") {
    import spark.implicits._
    def vec(i: Int): Array[Float] =
      Array.tabulate(64)(d => (((i * 13 + d * 3) % 11) - 5).toFloat)
    val vecs = (0 until 400).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val out = ops.Embeddings.ivfSearch(vecs, vecs.filter($"vec_id" < 2),
      kCentroids = 8, nProbe = 2, topK = 3)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian") && !plan.contains("BroadcastNestedLoop"),
      s"IVF candidate generation must be an equi-join on centroid:\n$plan")
  }

  test("ivfSearch equals per-query brute force over the probed lists") {
    import spark.implicits._
    // deterministic synthetic embeddings, dim 64
    def vec(i: Int): Array[Float] =
      Array.tabulate(64)(d => (((i * 31 + d * 7) % 17) - 8).toFloat)
    val vecs = (0 until 200).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val queries = (0 until 3).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val got = Embeddings.ivfSearch(vecs, queries, kCentroids = 8, nProbe = 2, topK = 4)
      .select("qid", "neighbor_id", "rank").as[(Long, Long, Int)]
      .collect().toSet

    // scala-side oracle
    def centroid(c: Int): Array[Double] =
      Array.tabulate(64)(d => ((c * 53 + d * 17) % 13 - 6).toDouble)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { val d = a(i) - b(i); s += d * d; i += 1 }; s
    }
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < 64) { s += a(i) * b(i); i += 1 }; s
    }
    val all = (0 until 200).map(i => i.toLong -> vec(i).map(_.toDouble)).toMap
    val assign = all.map { case (id, v) =>
      id -> (0 until 8).map(c => (d2(v, centroid(c)), c)).min._2
    }
    val want = (0 until 3).flatMap { qi =>
      val qv = all(qi.toLong)
      val probed = (0 until 8).map(c => (d2(qv, centroid(c)), c)).sorted.take(2)
        .map(_._2).toSet
      val cand = all.filter { case (id, _) =>
        id != qi.toLong && probed.contains(assign(id)) }
      val qn = math.sqrt(dot(qv, qv))
      cand.toSeq.map { case (id, v) =>
        (id, dot(v, qv) / (math.sqrt(dot(v, v)) * qn))
      }.sortBy { case (id, cos) => (-cos, id) }.take(4).zipWithIndex
        .map { case ((id, _), r) => (qi.toLong, id, r + 1) }
    }.toSet
    assert(got == want)
  }
}
