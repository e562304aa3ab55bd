package graft.table

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One committed bucket of a resumable write: the lineage + row-count metrics
  * row (north rule: "all stages checkpoint per-partition with lineage +
  * row-count metrics to Iceberg metadata tables"). The reference's analog is
  * the request-log flush (src/logRequest.ts:15-30) and periodic cache/S3
  * metrics (src/fetchTileData.ts:35-48, src/s3Fetcher.ts:12-18) — here
  * generalized to a durable commit log that makes the whole job resumable at
  * bucket granularity.
  */
final case class BucketManifest(run_id: String, bucket: Int, row_count: Long,
                                checksum: Long, wall_ms: Long, committed_at: Long)

/** Iceberg-style resumable table writes over plain Parquet (no Iceberg jar in
  * the zero-egress environment; the layout keeps Iceberg's two invariants —
  * an immutable data layout `data/bucket=N/` and a commit log `manifest/`
  * whose rows are written only after their data is durable).
  *
  * Protocol per bucket: (1) overwrite `data/bucket=N` (idempotent), (2) append
  * one manifest row. A crash between (1) and (2) leaves an uncommitted bucket
  * that resume simply rewrites — exactly-once content, at-least-once effort.
  * Resume = anti-join of all buckets against committed manifest rows
  * (SURVEY.md §2.5's "completed-partitions anti-join").
  *
  * Scale notes (100 TB): buckets are hash buckets over the key column, so
  * bucket count — not input size — bounds the commit-log size; each bucket is
  * one Spark job over a persisted bucketed intermediate (size buckets to
  * ~executor-sum memory, e.g. 1024 buckets for 100 TB ⇒ ~100 GB per commit
  * unit). `bucketsPerJob` batches several buckets into one job to trade
  * commit granularity against job-scheduling overhead.
  */
object Checkpoint {

  private val ManifestSchema = "run_id string, bucket int, row_count bigint, " +
    "checksum bigint, wall_ms bigint, committed_at bigint"

  def manifests(spark: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(s"$dir/manifest")
    if (!path.exists() || path.listFiles() == null ||
        !path.listFiles().exists(_.getName.endsWith(".parquet")))
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType.fromDDL(ManifestSchema))
    else spark.read.schema(ManifestSchema).parquet(s"$dir/manifest")
  }

  def committedBuckets(spark: SparkSession, dir: String): Set[Int] = {
    import spark.implicits._
    manifests(spark, dir).select("bucket").as[Int].collect().toSet
  }

  /** Deliberate mid-run crash for resume tests. */
  final class InjectedFailure(bucket: Int)
      extends RuntimeException(s"injected failure before bucket $bucket commit")

  /** Write `df` into `dir` bucketed by `xxhash64(keyCols) pmod nBuckets`,
    * committing a manifest row per bucket and skipping buckets already
    * committed by a previous (possibly killed) run.
    *
    * @param failBeforeBucket if >= 0, throw before committing the given
    *                         ordinal (test hook for kill/resume)
    * @return manifest rows committed by THIS run
    */
  def writeResumable(df: DataFrame, keyCols: Seq[String], nBuckets: Int,
                     dir: String, runId: String, bucketsPerJob: Int = 1,
                     failBeforeBucket: Int = -1): Seq[BucketManifest] = {
    val spark = df.sparkSession
    import spark.implicits._
    val done = committedBuckets(spark, dir)
    val pendingBuckets = (0 until nBuckets).filterNot(done)
    if (pendingBuckets.isEmpty) return Seq.empty

    val bucketed = df
      .withColumn("__bucket",
        pmod(xxhash64(keyCols.map(col): _*), lit(nBuckets)).cast("int"))
      .persist()
    try {
      val out = Seq.newBuilder[BucketManifest]
      var ordinal = 0
      pendingBuckets.grouped(math.max(1, bucketsPerJob)).foreach { group =>
        if (failBeforeBucket >= 0 && ordinal >= failBeforeBucket)
          throw new InjectedFailure(ordinal)
        val t0 = System.nanoTime()
        val slice = bucketed.filter(col("__bucket").isin(group: _*))
        // dynamic partition overwrite: only the touched bucket directories
        // are replaced — idempotent per bucket regardless of grouping
        slice.write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("__bucket")
          .parquet(s"$dir/data")
        // stats from the durably written files (validates what is on disk,
        // not what the upstream plan produced): row count + an
        // order-insensitive checksum (sum of masked xxhash64 — mask keeps the
        // ANSI-mode sum far from Long overflow)
        val written = spark.read.parquet(s"$dir/data")
          .where(col("__bucket").isin(group: _*))
        val dataCols = written.columns.filterNot(_ == "__bucket").sorted
        val stats = written.groupBy("__bucket")
          .agg(count(lit(1)).as("n"),
            coalesce(sum(xxhash64(struct(dataCols.map(col): _*))
              .bitwiseAND(lit(0xFFFFFFFFL))), lit(0L)).as("c"))
          .as[(Int, Long, Long)].collect()
          .map { case (b, n, c) => b -> ((n, c)) }.toMap
        val wallMs = (System.nanoTime() - t0) / 1000000
        val rows: Seq[BucketManifest] = group.map { b =>
          val (n, c) = stats.getOrElse(b, (0L, 0L))
          BucketManifest(runId, b, n, c, wallMs, System.currentTimeMillis())
        }
        // durable commit: manifest rows appended only after the data write
        spark.createDataset(rows)(org.apache.spark.sql.Encoders.product[BucketManifest])
          .toDF().coalesce(1)
          .write.mode("append").parquet(s"$dir/manifest")
        out ++= rows
        ordinal += group.size
      }
      out.result()
    } finally bucketed.unpersist()
  }

  /** Read the committed table back. Snapshot-consistent: only buckets with a
    * manifest row are visible (data written by a crashed run without its
    * manifest commit is invisible until resume rewrites it) — partition
    * pruning on `__bucket` keeps the filter scan-level.
    */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val committed = committedBuckets(spark, dir).toSeq
    // a run killed before ANY commit leaves no data/ at all — the snapshot
    // contract says "empty", not AnalysisException
    if (committed.isEmpty || !new java.io.File(s"$dir/data").exists())
      return spark.emptyDataFrame
    spark.read.parquet(s"$dir/data")
      .where(col("__bucket").isin(committed: _*))
      .drop("__bucket")
  }

  def clear(dir: String): Unit = {
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(): Unit
    }
    rm(new java.io.File(dir))
  }
}
