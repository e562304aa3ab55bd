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

  /** IVF-style coarse assignment: nearest of `k` deterministic centroids
    * (centroid c dim d = ((c*53 + d*17) mod 13) - 6). The coarse quantizer
    * of an IVF index: at scale, probes search only their centroid's list.
    */
  def ivfAssign(vecs: DataFrame, k: Int): DataFrame = {
    val v = vecs.select(col("vec_id").cast("long"),
      col("embedding").cast("array<double>").as("v"))
    val dists = (0 until k).map { c =>
      val cent = transform(sequence(lit(0), lit(63)),
        d => ((lit(c) * 53 + d * 17) % 13 - 6).cast("double"))
      struct(vec_dist2(col("v"), cent).as("d2"), lit(c).as("c"))
    }
    v.withColumn("best", least(dists: _*))
      .select(col("vec_id"), col("best.c").as("centroid"),
        round(col("best.d2"), 4).as("d2_r"))
  }
}
