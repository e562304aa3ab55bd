package graft.ops

import graft.functions.vectors.{vec_dist2, vec_dot}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`array<float>` in the input
  * table, cast to doubles for arithmetic parity with the oracle).
  *
  * Two paths, per the scale plan:
  *  - brute-force cosine top-k (SparkEntry `ann_cosine_topk`) — the exact
  *    baseline, broadcast the smaller side;
  *  - random-hyperplane LSH bucketing here — the 100 TB path: each vector
  *    maps to one bucket (one shuffle on bucket), candidate pairs exist only
  *    within buckets, exact cosine refines. Deterministic integer
  *    hyperplanes keep the oracle bit-compatible.
  */
object Embeddings {

  /** Deterministic hyperplane weight: `((j*97 + d*31) mod 19) - 9`. */
  private def planeWeight(j: Int): Column =
    transform(sequence(lit(0), lit(63)),
      d => ((lit(j) * 97 + d * 31) % 19 - 9).cast("double"))

  /** Sequential-fold dot product — a codegen'd expression (VecDotExpr); the
    * lambda form `aggregate(zip_with(...))` is interpreted per element and
    * ~5x slower. Fold order identical (left fold from 0.0).
    */
  def dot(a: Column, b: Column): Column = vec_dot(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** `nPlanes`-bit random-hyperplane LSH bucket of a 64-dim vector. */
  def lshBucket(v: Column, nPlanes: Int): Column =
    (0 until nPlanes).map { j =>
      when(dot(v, planeWeight(j)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduceLeft(_ + _)

  /** Near-duplicate pairs: same LSH bucket AND exact cosine >= minCos.
    * Returns (id_a, id_b, cos_r) with cos rounded to 4 decimals.
    */
  def nearDupPairs(vecs: DataFrame, nPlanes: Int = 8,
                   minCos: Double = 0.999): DataFrame = {
    val v = vecs.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("bucket", lshBucket(col("v"), nPlanes))
      .withColumn("nrm", norm(col("v")))
    val a = v.select(col("bucket"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = v.select(col("bucket"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos_r"))
  }

  /** Deterministic centroid c (dim d = ((c*53 + d*17) mod 13) - 6). */
  private def centroid(c: Int): Column =
    transform(sequence(lit(0), lit(63)),
      d => ((lit(c) * 53 + d * 17) % 13 - 6).cast("double"))

  /** IVF-style coarse assignment: nearest of `k` deterministic centroids.
    * The coarse quantizer of an IVF index: at scale, probes search only
    * their centroid's list.
    */
  def ivfAssign(vecs: DataFrame, k: Int): DataFrame = {
    val v = vecs.select(col("vec_id").cast("long"),
      col("embedding").cast("array<double>").as("v"))
    val dists = (0 until k).map { c =>
      struct(vec_dist2(col("v"), centroid(c)).as("d2"), lit(c).as("c"))
    }
    v.withColumn("best", least(dists: _*))
      .select(col("vec_id"), col("best.c").as("centroid"),
        round(col("best.d2"), 4).as("d2_r"))
  }

  /** IVF top-k search — the scale path of ANN search: each query probes only
    * its `nProbe` nearest centroid LISTS instead of the whole corpus, then
    * exact cosine re-ranks the candidates. The corpus side carries its
    * centroid as the join key — at 100 TB the corpus is partitioned (and on
    * disk, partition-pruned) by centroid, queries shuffle to their probed
    * lists (here: broadcast, queries are few), and the only wide operation
    * is the per-query top-k window over candidates from nProbe lists.
    * Recall < 1 by design (a neighbor assigned to an unprobed list is
    * missed) — `ann_cosine_topk` is the exact baseline to measure recall
    * against; determinism is total, so the oracle replicates results
    * bit-for-bit.
    *
    * @return (qid, neighbor_id, centroid, rank, cos_r)
    */
  def ivfSearch(vecs: DataFrame, queries: DataFrame, kCentroids: Int,
                nProbe: Int, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dists = (0 until kCentroids).map { c =>
      struct(vec_dist2(col("v"), centroid(c)).as("d2"), lit(c).as("c"))
    }
    val corpus = vecs.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("centroid", least(dists: _*).getField("c"))
      .withColumn("nrm", norm(col("v")))
    val qdists = (0 until kCentroids).map { c =>
      struct(vec_dist2(col("qv"), centroid(c)).as("d2"), lit(c).as("c"))
    }
    // nProbe nearest centroids per query: lexicographic (d2, c) sort of the
    // centroid structs — same tie order as the assignment's least()
    val qprobe = queries.select(col("vec_id").cast("long").as("qid"),
        col("embedding").cast("array<double>").as("qv"))
      .withColumn("qnrm", norm(col("qv")))
      .withColumn("probe", explode(slice(array_sort(array(qdists: _*)), 1, nProbe)))
      .select(col("qid"), col("qv"), col("qnrm"),
        col("probe").getField("c").as("centroid"))
    val cand = corpus.join(broadcast(qprobe), Seq("centroid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", dot(col("v"), col("qv")) / (col("nrm") * col("qnrm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
    cand.withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select(col("qid"), col("vec_id").as("neighbor_id"), col("centroid"),
        col("rank"), round(col("cos"), 4).as("cos_r"))
  }
}
