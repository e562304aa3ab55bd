package graft.sources

import graft.core.{FeatureRow, GeoJson}
import org.apache.spark.sql.{Dataset, Encoders, SparkSession}

/** File-based GeoJSON sources/sinks (the batch analog of the reference's
  * HTTP `/geojson` endpoint, src/server.ts:74-95).
  *
  * Two layouts:
  *  - whole-document: each file is one GeoJSON doc (FeatureCollection /
  *    Feature / bare Geometry) — `readDocuments` uses `wholetext` so a
  *    pretty-printed FeatureCollection stays one record;
  *  - GeoJSON-lines (ndjson): one Feature per line — `readLines` scales to
  *    arbitrarily many features because lines split across tasks.
  * Feature ids are assigned by document order (GeoJSON `id` is not unique —
  * see GeoJson.featureRows).
  */
object GeoJsonSource {

  private implicit val enc: org.apache.spark.sql.Encoder[FeatureRow] =
    Encoders.product[FeatureRow]

  /** One GeoJSON document per FILE (wholetext). */
  def readDocuments(spark: SparkSession, path: String): Dataset[FeatureRow] = {
    import spark.implicits._
    spark.read.option("wholetext", "true").text(path).as[String]
      .flatMap(doc => GeoJson.featureRows(GeoJson.parse(doc)))
  }

  /** One Feature per LINE (ndjson / GeoJSON-lines). Monotonic per-partition
    * ids keep feature identity stable without a global sort.
    */
  def readLines(spark: SparkSession, path: String): Dataset[FeatureRow] = {
    import spark.implicits._
    spark.read.text(path).as[String]
      .filter((l: String) => l.trim.nonEmpty)
      .rdd.zipWithIndex()
      .map { case (line, i) =>
        val rows = GeoJson.featureRows(GeoJson.parse(line))
        FeatureRow(i.toString, rows.head.feature_json)
      }
      .toDS()
  }

  /** Write features as GeoJSON-lines (one Feature JSON per line). */
  def writeLines(features: Dataset[FeatureRow], path: String): Unit = {
    import features.sparkSession.implicits._
    features.map(_.feature_json).write.mode("overwrite").text(path)
  }

  /** Collect into one FeatureCollection document (driver-side; for
    * request-sized outputs, matching the reference's response shape).
    */
  def toDocument(features: Dataset[FeatureRow]): String =
    GeoJson.featureCollection(features.collect().toSeq)
}
