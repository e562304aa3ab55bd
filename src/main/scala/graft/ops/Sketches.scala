package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch aggregations — bounded-state answers where the exact form needs a
  * corpus-wide shuffle of raw keys.
  *
  * The flagship is HyperLogLog-style distinct counting: exact
  * `count(distinct)` at 100 TB shuffles every (group, key) pair; the sketch
  * shuffles m integer registers per group, mergeable by max. This
  * implementation is DETERMINISTIC end-to-end so a second engine reproduces
  * the estimate bit-for-bit (the correctness gate's requirement — a
  * randomized-seed sketch cannot be oracle-checked):
  *
  *  - the hash is an explicit multiplicative congruence (no engine-internal
  *    xxhash), valid for the gate's bounded ids;
  *  - the harmonic register sum Σ 2^(-Mj) is computed as an EXACT integer,
  *    `Σ 2^(40 - Mj)` over a common denominator 2^40 (ranks ≤ 27 < 40), so
  *    no float accumulation order can perturb it;
  *  - the only floating arithmetic is the final `α·m²·2^40 / sum` — a
  *    product of exact doubles and one division, identical IEEE ops in any
  *    engine — floor-quantized on emit.
  */
object Sketches {

  /** HLL distinct estimate per group over 31-bit nonnegative ids.
    *
    * m = 32 buckets (α = 0.697): raw estimate, no small/large-range
    * corrections — the deterministic textbook formula, σ ≈ 1.04/√m ≈ 18%.
    *
    * @return (groupCol, n_buckets, hll_q = floor(estimate))
    */
  def hllDistinct(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    // rank = (trailing zeros of the 26-bit rest) + 1; 27 when rest = 0.
    // lsb = rest & -rest is a power of two — an exact integer CASE beats a
    // log2 whose libm rounding an oracle need not share
    val lsbCase = (0 until 26).map(i => s"WHEN ${1L << i} THEN ${i + 1}")
      .mkString(" ")
    df.selectExpr(groupCol,
        s"($idCol * 1103515245 + 12345) % 2147483648 AS h")
      .selectExpr(groupCol, "CAST(h % 32 AS INT) AS bucket", "h div 32 AS rest")
      .selectExpr(groupCol, "bucket",
        s"CASE (rest & -rest) $lsbCase ELSE 27 END AS rank")
      .groupBy(col(groupCol), col("bucket"))
      .agg(max("rank").as("m"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_buckets"),
        sum(expr("shiftleft(CAST(1 AS BIGINT), 40 - m)")).as("sump"))
      // empty buckets contribute 2^0 = 1 each ⇒ 2^40 over the denominator
      .withColumn("sumint",
        col("sump") + (lit(32) - col("n_buckets")) * lit(1L << 40))
      .selectExpr(groupCol, "n_buckets",
        // α·m²·2^40 = 0.697 · 2^50; scaling by a power of two is exact, so
        // the whole estimate is one IEEE division of exact doubles
        "CAST(floor(0.697D * 1125899906842624.0D / CAST(sumint AS DOUBLE)) AS BIGINT) AS hll_q")
  }
}
