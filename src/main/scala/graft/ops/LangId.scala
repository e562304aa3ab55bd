package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Language identification via Cavnar–Trenkle rank-order character-n-gram
  * profiles (public algorithm: "N-Gram-Based Text Categorization", 1994) —
  * replacing the round-3 stopword vote, whose own confusion gate proved it
  * collapsing to the majority class.
  *
  * Method: a LANGUAGE PROFILE is the top-N character n-grams (2- and
  * 3-grams of '_'-padded words) of a labeled training slice, rank-ordered
  * by frequency; a DOCUMENT PROFILE is the same for one document; the
  * distance is the out-of-place measure Σ |doc_rank − lang_rank| with
  * penalty N for n-grams absent from the language profile; predict argmin
  * (ties to the lexicographically first language).
  *
  * 100 TB shape: the trained profiles are tiny (langs × N rows) and
  * BROADCAST; the document side is one (doc_id, ngram) count aggregation +
  * one per-doc rank window (state bounded by the doc's distinct n-grams),
  * and the scoring join multiplies traffic only by the number of languages.
  * No driver-side per-doc work; all counts/ranks/distances are exact
  * integers with total tie orders, so an independent engine replays the
  * classification bit-for-bit (gates: text_langid / text_langid_confusion).
  */
object LangId {

  /** Character 2- and 3-grams of '_'-padded words, in document order.
    * Padding marks word boundaries (the signal Cavnar–Trenkle relies on);
    * the length guards keep degenerate short/empty words from emitting
    * descending sequences.
    */
  def charNgrams(text: Column): Column = {
    val padded = transform(split(text, " "), w => concat(lit("_"), w, lit("_")))
    flatten(transform(padded, w =>
      concat(
        when(length(w) >= 2,
          transform(sequence(lit(1), length(w) - 1), i => w.substr(i, lit(2))))
          .otherwise(array().cast("array<string>")),
        when(length(w) >= 3,
          transform(sequence(lit(1), length(w) - 2), i => w.substr(i, lit(3))))
          .otherwise(array().cast("array<string>")))))
  }

  /** Train per-language profiles from a labeled slice:
    * (lang, ng, rank 1..topN) ranked by (count DESC, ng ASC).
    */
  def trainProfiles(train: DataFrame, langCol: String, textCol: String,
                    topN: Int): DataFrame = {
    val w = Window.partitionBy(langCol).orderBy(col("cnt").desc, col("ng"))
    train.select(col(langCol), explode(charNgrams(col(textCol))).as("ng"))
      .groupBy(langCol, "ng").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topN)
      .select(col(langCol).as("lang"), col("ng"), col("rank"))
  }

  /** Classify each document against the (broadcast) profiles: emits one row
    * per (doc_id, lang) with the out-of-place distance, plus `pred_rn` = 1
    * on the predicted language ((dist ASC, lang ASC) — total order).
    */
  def classify(docs: DataFrame, profiles: DataFrame, topN: Int): DataFrame = {
    val wd = Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("ng"))
    val dprof = docs.select(col("doc_id"), explode(charNgrams(col("text"))).as("ng"))
      .groupBy("doc_id", "ng").agg(count(lit(1)).as("cnt"))
      .withColumn("drank", row_number().over(wd))
      .filter(col("drank") <= topN)
    val langs = profiles.select("lang").distinct()
    val wmin = Window.partitionBy("doc_id").orderBy(col("dist").asc, col("lang"))
    dprof.crossJoin(broadcast(langs))
      .join(broadcast(profiles), Seq("lang", "ng"), "left_outer")
      .groupBy("doc_id", "lang")
      .agg(sum(coalesce(abs(col("drank").cast("long") - col("rank").cast("long")),
        lit(topN.toLong))).as("dist"))
      .withColumn("pred_rn", row_number().over(wmin))
  }

  /** Deterministic multilingual GATE CORPUS: the driver-generated documents
    * table carries no language signal in its text (every label shares one
    * word distribution — the round-3 stopword gate honestly measured that),
    * so the langid gates synthesize text with genuinely distinct per-label
    * distributions: 30 words per doc, ~30% from a shared cross-language
    * vocabulary (so the classifier has to work) and the rest from the
    * label's word list, all indices exact integer arithmetic on doc_id so
    * the oracle regenerates the corpus verbatim.
    *
    * @return (doc_id, lang, text)
    */
  val LangNames: Seq[String] = Seq("en", "fr", "es", "de")
  val LangWords: Seq[Seq[String]] = Seq(
    Seq("the", "and", "for", "with", "that", "have", "this", "from",
      "they", "will", "what", "about", "which", "their", "would", "there"),
    Seq("le", "la", "les", "et", "des", "une", "dans", "pour",
      "que", "qui", "avec", "sur", "pas", "vous", "sont", "nous"),
    Seq("el", "los", "las", "una", "que", "por", "con", "para",
      "como", "pero", "mas", "este", "ser", "tiene", "hacer", "donde"),
    Seq("der", "die", "und", "den", "von", "mit", "das", "auf",
      "ist", "sich", "ein", "nicht", "auch", "nach", "wird", "haben"))
  val SharedWords: Seq[String] =
    Seq("data", "table", "query", "spark", "join", "scan", "row", "batch")

  def synthCorpus(docIds: DataFrame): DataFrame = {
    val langIdx = (col("doc_id") % 4).cast("int")
    val allWords = typedLit(LangWords)
    val shared = typedLit(SharedWords)
    docIds.select(col("doc_id"),
      element_at(typedLit(LangNames), langIdx + 1).as("lang"),
      array_join(transform(sequence(lit(0), lit(29)), i =>
        when((col("doc_id") * 13 + i * 11) % 10 < 3,
          element_at(shared, ((col("doc_id") * 7 + i * 3) % 8).cast("int") + 1))
          .otherwise(element_at(element_at(allWords, langIdx + 1),
            ((col("doc_id") * 31 + i * 7) % 16).cast("int") + 1))), " ").as("text"))
  }
}
