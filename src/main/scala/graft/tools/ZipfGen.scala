package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: generate a SEEDED ZIPF-DRAWN documents corpus (plus a
  * clustered embeddings table) for scale probes in regimes the
  * replica-suffix transform provably cannot produce (r12 verdict
  * item 1, PLANS.md r12 correction):
  *
  *  - replica suffixing freezes every hot term's document frequency
  *    while N grows, so df-FRACTION dials (BM25 maxDfFrac) prune
  *    nothing at any scale — on a Zipf draw the head terms keep a
  *    constant df fraction as N grows, the regime real corpora are in
  *    (and the regime where such dials CAN fire);
  *  - replica embeddings are exact copies (100 identical twins per
  *    base vector), making distance ties rampant; here vectors are
  *    drawn around k well-separated cluster centers with per-vector
  *    noise, so approximate-vs-exact agreement measures routing, not
  *    tie-breaking.
  *
  * Everything derives from xxhash64(seed, ids...) — no RNG state, so
  * any slice of any size regenerates bit-identically and the corpus
  * is embarrassingly parallel to produce.
  *
  * Word draw: u = uniform52(seed, doc, pos) in [0,1); rank =
  * ceil(V^u) gives p(rank = r) ~ 1/r (Zipf s=1) over a vocab of V
  * word types — the standard inverse-CDF trick, since the Zipf CDF is
  * ~ ln r / ln V. Doc length is 30 + (h mod 120) words, mean ~90,
  * in the band of the driver's testdata documents.
  *
  * QUALITY-HETEROGENEITY regime (r13 verdict item 2, `hetero=1`):
  * the plain draw is structurally homogeneous — every word renders
  * "w<rank>", so the Gopher gate's stopword rule rejects 100% of
  * docs and gate probes degenerate (replica corpora degenerate the
  * other way: word-suffixing breaks stopword matches, 0.35%
  * admission, adversarially favorable to preGate). With hetero on,
  * each doc draws a deterministic quality class:
  *   A (40%) organic-good — head Zipf ranks render as REAL stopwords
  *     ("the","of","and","a","to","in","is","be" — covering both the
  *     Gopher stopList and the teacher sigmoid's list), so most pass;
  *   B (18%) stopword-free — "x<rank>" rendering, fails stopHits;
  *   C (18%) boilerplate — one 6-word phrase repeated, fails the
  *     dup-fraction rule (stopwords present, mwl in range);
  *   D (14%) length outliers — 5-24 words, fails nWords >= 30;
  *   E (10%) long-token — "wxqrst<rank>" rendering, fails mwl <= 5.
  * Target admission 30-50% (class A x its organic pass rate), so
  * preGate wins, teacher agreement and curation builds measure a
  * REAL admission boundary instead of a degenerate one.
  *
  * Usage: ZipfGen <outDir> <nDocs> [vocab=50000] [dim=64] [seed=13]
  *                [hetero=0]
  * Writes documents.parquet + embeddings.parquet under outDir; copy
  * the remaining TPC-H tables from a real sf dir if a probe needs
  * them (the dedup/retrieval probes only read these two).
  */
object ZipfGen {
  def main(args: Array[String]): Unit = {
    val out = args(0)
    val nDocs = args(1).toLong
    val vocab = if (args.length > 2) args(2).toInt else 50000
    val dim = if (args.length > 3) args(3).toInt else 64
    val seed = if (args.length > 4) args(4).toLong else 13L
    val hetero = args.length > 5 && args(5) == "1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // uniform in [0,1) from the top 52 bits of xxhash64 (exact in a
    // double; the repo's h52 device with a cheaper hash — md5 at
    // 1e8+ tokens is the generator's own bottleneck)
    def u52(cols: org.apache.spark.sql.Column*) =
      (shiftrightunsigned(xxhash64(lit(seed) +: cols: _*), 12)
        .cast("double") / lit(4503599627370496.0))

    // per-doc quality class (hetero only): 0-39 A, 40-57 B, 58-75 C,
    // 76-89 D, 90-99 E — drawn from the same seeded hash family
    val cls =
      if (hetero) pmod(xxhash64(lit(seed), lit("cls"), col("id")), lit(100))
      else lit(0)
    val stopArr = array(Seq("the", "of", "and", "a", "to", "in", "is", "be")
      .map(lit): _*)
    val phraseArr = array(Seq("the", "data", "of", "pipeline", "and",
      "quality").map(lit): _*)
    def zipfRank(p: org.apache.spark.sql.Column) =
      ceil(pow(lit(vocab.toDouble), u52(lit("w"), col("doc_id"), p)))
        .cast("long")
    val docs = spark.range(0, nDocs, 1, 32)
      .select(col("id").as("doc_id"), cls.as("cls"),
        when(cls >= 76 && cls < 90, // D: length outliers, under the gate
          (lit(5) + pmod(xxhash64(lit(seed), lit("len"), col("id")),
            lit(20))).cast("int"))
          .otherwise((lit(30)
            + pmod(xxhash64(lit(seed), lit("len"), col("id")), lit(120)))
            .cast("int")).as("n_words"))
      .select(col("doc_id"),
        array_join(
          transform(sequence(lit(1), col("n_words")), p => {
            val r = zipfRank(p)
            when(col("cls") >= 58 && col("cls") < 76, // C: boilerplate
              element_at(phraseArr, (pmod(p, lit(6)) + 1).cast("int")))
              .when(col("cls") >= 40 && col("cls") < 58, // B: no stopwords
                concat(lit("x"), r))
              .when(col("cls") >= 90, // E: long tokens, mwl > 5
                concat(lit("wxqrst"), r))
              .otherwise( // A + D: organic rendering — real stopword
                // head under hetero; the plain draw stays bit-
                // identical to the r13 corpora ("w<rank>" always)
                if (hetero)
                  when(r <= 8, element_at(stopArr, r.cast("int")))
                    .otherwise(concat(lit("w"), r))
                else concat(lit("w"), r))
          }),
          " ").as("text"))
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        concat(lit("src"), pmod(col("doc_id"), lit(5))).as("source"),
        length(col("text")).as("n_chars"))
    docs.write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[zipfgen] documents: $nDocs docs, vocab $vocab, seed $seed")

    // clustered embeddings: 64 centers on a [-1,1]^dim lattice drawn
    // from the same hash, each vector = its center + N-ish noise of
    // ~0.15 amplitude (sum of two uniforms, cheap and deterministic) —
    // well-separated clusters, no twin vectors, labels = cluster id
    val nClusters = 64
    val emb = spark.range(0, nDocs, 1, 32)
      .select(col("id").as("vec_id"),
        pmod(xxhash64(lit(seed), lit("c"), col("id")), lit(nClusters))
          .cast("int").as("label"))
      .select(col("vec_id"), col("label"),
        transform(sequence(lit(0), lit(dim - 1)), d =>
          ((u52(lit("ctr"), col("label"), d) * 2.0 - 1.0)
            + (u52(lit("n1"), col("vec_id"), d)
              + u52(lit("n2"), col("vec_id"), d) - 1.0) * 0.3)
            .cast("float")).as("embedding"))
      .select(col("vec_id"), col("embedding"), col("label"))
    emb.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"[zipfgen] embeddings: $nDocs vecs, dim $dim, $nClusters clusters")
    spark.stop()
  }
}
