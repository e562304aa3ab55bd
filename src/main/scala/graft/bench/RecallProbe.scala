package graft.bench

import graft.ops.Embeddings
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.vectors.vec_dist2

/** Trained IVF-PQ scale diagnostic (VERDICT r4 "Next round" #7): at a given
  * SF, train the coarse/PQ quantizers exactly as the gate queries do
  * (k=8 / 8×16 codes, 3 Lloyd rounds), then report
  *
  *  - the PROBE CEILING: the fraction of exact top-5 neighbors whose
  *    assigned centroid falls inside the query's nProbe=2 probe set — the
  *    recall any re-ranking can reach through those lists;
  *  - refined recall@5 at several `shortlist` sizes — the parameter that
  *    must scale with corpus size (FAISS practice), separating quantizer
  *    quality from a fixed-parameter artifact.
  *
  * Usage: runMain graft.bench.RecallProbe <sfDir> [shortlists...]
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val shortlists =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(50, 200, 500)
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count()
    val (cents, _) = Embeddings.kmeansTrain(e, k = 8, rounds = 3)
    val (cbs, _) = Embeddings.pqTrain(e, nSub = 8, kCodes = 16, rounds = 3)
    val queries = e.filter(col("vec_id") < 25)

    // exact top-5 ground truth (25 queries × corpus — bounded diagnostic)
    val q = queries.select(col("vec_id").cast("long").as("qid"),
      col("embedding").cast("array<double>").as("qv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("dist2").asc, col("vec_id"))
    val exact = e
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>").as("v"))
      .crossJoin(broadcast(q)).filter(col("vec_id") =!= col("qid"))
      .withColumn("dist2", vec_dist2(col("v"), col("qv")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("qid"), col("vec_id").as("neighbor_id"))
      .localCheckpoint(false)

    // probe ceiling: neighbor's centroid ∈ query's nProbe-set?
    val (corpus, probeSide) =
      Embeddings.coarseProbeWith(e, queries, cents, nProbe = 2, 64L << 20)
    val assign = corpus.select(col("vec_id").as("neighbor_id"), col("centroid"))
    val hits = exact.join(assign, "neighbor_id")
      .join(probeSide.select(col("qid"), col("centroid")), Seq("qid", "centroid"),
        "left_semi").count()
    val total = exact.count()
    println(f"n=$n ceiling=${hits.toDouble / total}%.3f ($hits/$total)")

    for (sl <- shortlists) {
      val rec = Embeddings.ivfPqRecallTrained(e, queries, cents, cbs,
          nProbe = 2, shortlist = sl, topK = 5)
        .agg(avg("recall")).head().getDouble(0)
      println(f"shortlist=$sl recall@5=$rec%.3f")
    }
    spark.stop()
  }
}
