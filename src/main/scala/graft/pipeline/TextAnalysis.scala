package graft.pipeline

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.functions._

/** Text analysis for data-pipeline curation: token counting
  * (whitespace + BPE-ish regex), quality scoring (length/punctuation/
  * stopword ratios → logistic score), and n-gram-heuristic language
  * ID. Pure per-row Catalyst expressions — no shuffle at all, so the
  * stage is a map over the corpus at any scale.
  */
object TextAnalysis extends QueryModule {

  private val TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  /** Quality score — logistic over avg word length and stopword ratio
    * (the q58 formula, shared with the curation pipeline q138). Built
    * entirely from the passed Column, so derived or differently-named
    * text expressions score correctly. */
  def quality(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val w = split(text, " ")
    val awl = length(regexp_replace(text, " ", "")).cast("double") / size(w)
    val stops = filter(w, x => x.isInCollection(Seq("the", "a", "of", "and", "to")))
    val stopRatio = size(stops).cast("double") / size(w)
    round(lit(1.0) / (lit(1.0) + exp(-(lit(0.2) * awl + lit(2.0) * stopRatio - lit(1.0)))), 6)
  }

  /** Same score in DuckDB SQL over a relation exposing `text`. */
  val duckQuality: String =
    """round(1.0 / (1.0 + exp(-(
      |    0.2 * (length(replace(text, ' ', ''))::DOUBLE / len(string_split(text, ' ')))
      |    + 2.0 * (len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE
      |          / len(string_split(text, ' ')))
      |    - 1.0))), 6)""".stripMargin

  override def queries: Seq[QueryDef] = Seq(

    q("q58_text_stats",
      s"""WITH t AS (SELECT doc_id, text, n_chars,
         |    string_split(text, ' ') AS w FROM documents)
         |SELECT doc_id,
         |  CAST(len(w) AS INTEGER) AS n_words,
         |  CAST(len(regexp_extract_all(text, '$TOKEN_RE')) AS INTEGER) AS n_tokens,
         |  round(length(replace(text, ' ', ''))::DOUBLE / len(w), 6) AS avg_word_len,
         |  round(len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE
         |        / len(w), 6) AS stop_ratio,
         |  round(len(regexp_extract_all(text, '[^A-Za-z0-9 ]'))::DOUBLE
         |        / n_chars, 6) AS punct_ratio,
         |  round(len(regexp_extract_all(text, '[0-9]'))::DOUBLE / n_chars, 6) AS digit_ratio,
         |  round(1.0 / (1.0 + exp(-(
         |    0.2 * (length(replace(text, ' ', ''))::DOUBLE / len(w))
         |    + 2.0 * (len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to')))::DOUBLE / len(w))
         |    - 1.0))), 6) AS quality,
         |  CASE WHEN len(list_filter(w, x -> x IN ('the', 'a', 'of', 'and', 'to'))) > 0 THEN 'en'
         |       WHEN len(list_filter(w, x -> x IN ('der', 'und', 'die', 'das'))) > 0 THEN 'de'
         |       WHEN len(list_filter(w, x -> x IN ('le', 'et', 'la', 'les'))) > 0 THEN 'fr'
         |       ELSE 'unknown' END AS lang_guess
         |FROM t ORDER BY doc_id""") { (s, dir) =>
      val w = split(col("text"), " ")
      def stops(words: String*) =
        size(expr(s"filter(w, x -> x IN (${words.map("'" + _ + "'").mkString(", ")}))"))
      val en = stops("the", "a", "of", "and", "to")
      val awl = length(regexp_replace(col("text"), " ", "")).cast("double") / size(col("w"))
      val stopRatio = en.cast("double") / size(col("w"))
      Tables.t(s, dir, "documents")
        .withColumn("w", w)
        .select(col("doc_id"),
          size(col("w")).as("n_words"),
          expr(s"CAST(size(regexp_extract_all(text, '$TOKEN_RE', 0)) AS INT)").as("n_tokens"),
          round(awl, 6).as("avg_word_len"),
          round(stopRatio, 6).as("stop_ratio"),
          round(expr("size(regexp_extract_all(text, '[^A-Za-z0-9 ]', 0))").cast("double")
            / col("n_chars"), 6).as("punct_ratio"),
          round(expr("size(regexp_extract_all(text, '[0-9]', 0))").cast("double")
            / col("n_chars"), 6).as("digit_ratio"),
          round(lit(1.0) / (lit(1.0) + exp(-(lit(0.2) * awl + lit(2.0) * stopRatio - lit(1.0)))), 6)
            .as("quality"),
          when(en > 0, "en")
            .when(stops("der", "und", "die", "das") > 0, "de")
            .when(stops("le", "et", "la", "les") > 0, "fr")
            .otherwise("unknown").as("lang_guess"))
        .orderBy(col("doc_id"))
    },

    // ----- deterministic content-hash split assignment: every doc
    // lands in train/val/test by a hash of its CONTENT (80/10/10), so
    // the split is reproducible across runs, engines and cluster
    // sizes, and a re-ingested duplicate always lands in the same
    // split (no train/test leakage from dedup misses). Pure map —
    // no shuffle, no RNG state. -----
    q("q125_hash_split",
      """SELECT doc_id, CAST(h % 100 AS INTEGER) AS bucket,
        |  CASE WHEN h % 100 < 80 THEN 'train'
        |       WHEN h % 100 < 90 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  CAST(list_sum(list_transform(range(1,9),
        |    hx -> (strpos('0123456789abcdef', substr(md5(text), hx, 1))-1)
        |          * (2**(4*(8-hx))))) AS BIGINT) AS h
        |  FROM documents)
        |ORDER BY doc_id""") { (s, dir) =>
      val h = conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long")
      Tables.t(s, dir, "documents")
        .select(col("doc_id"), (h % 100).cast("int").as("bucket"))
        .withColumn("split",
          when(col("bucket") < 80, "train")
            .when(col("bucket") < 90, "val")
            .otherwise("test"))
        .orderBy(col("doc_id"))
    }
  )
}
