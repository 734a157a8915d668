package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextOps._

/** Text analysis for training-data curation: language ID (stopword n-gram
  * heuristic), quality scoring, token counting, and document fingerprinting.
  * Pure column expressions — codegen'd end to end, no UDFs, trivially
  * distributed (one narrow map stage over the corpus).
  */
object TextAnalysis {

  /** Tiny high-frequency stopword lists per language (public knowledge). */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "with"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "dans", "une"),
    "es" -> Seq("el", "la", "los", "las", "es", "en", "que", "una"))

  private def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang): _*)))

  /** Predicted language = argmax stopword hits (ties broken by fixed
    * language order en>de>fr>es; zero hits ⇒ "und" undetermined).
    */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // tokenize ONCE into a staged column: the four per-language hit counts
    // each reference the token array, and higher-order filters evaluate
    // outside codegen CSE — an inline tokens() would re-tokenize the
    // document per language (guide §1.2)
    val langs = Seq("en", "de", "fr", "es")
    val hits = langs.map(l => stopwordHits(col("_t"), l).as(s"hits_$l"))
    val withHits = docs
      .select(col("doc_id"), tokens(lower(col(textCol))).as("_t"))
      .select((col("doc_id") +: hits): _*)
    val best = langs.foldLeft(lit("und") -> lit(0)) { case ((bl, bh), l) =>
      val h = col(s"hits_$l")
      (when(h > bh, lit(l)).otherwise(bl), when(h > bh, h).otherwise(bh))
    }
    withHits.select(col("doc_id"), best._1.as("lang_pred"), best._2.as("confidence_hits"))
  }

  /** Quality features + a composite score in [0,1]:
    * length band, mean token length band, alpha ratio, stopword ratio.
    * Thresholds follow the usual web-corpus heuristics (Gopher-style rules,
    * public literature); exact constants are ours.
    */
  def qualityScore(docs: DataFrame, textCol: String = "text"): DataFrame = {
    // the expensive per-row features (tokenize ×2, the alpha regex) are
    // staged as projection columns so each evaluates once however many
    // ratio/score terms read it (guide §1.2; score alone reads every
    // feature a second time)
    val staged = docs.select(col("doc_id"),
      size(tokens(col(textCol))).as("_n_tok"),
      length(col(textCol)).as("_n_char"),
      length(regexp_replace(col(textCol), "[^A-Za-z ]", "")).as("_n_alpha"),
      stopwordHits(tokens(lower(col(textCol))), "en").as("_n_stop"))
    val nTok = col("_n_tok")
    val nChar = col("_n_char")
    val meanTokLen = when(nTok > 0, nChar.cast("double") / nTok).otherwise(0.0)
    val alphaRatio = when(nChar > 0, col("_n_alpha").cast("double") / nChar)
      .otherwise(0.0)
    val stopRatio = when(nTok > 0,
      col("_n_stop").cast("double") / nTok).otherwise(0.0)
    val score =
      (when(nTok >= 10 && nTok <= 10000, 0.25).otherwise(0.0)
        + when(meanTokLen >= 3 && meanTokLen <= 12, 0.25).otherwise(0.0)
        + when(alphaRatio >= lit(0.6), 0.25).otherwise(0.0)
        + when(stopRatio >= lit(0.05), 0.25).otherwise(0.0))
    staged.select(col("doc_id"),
      nTok.as("n_tokens"),
      round(meanTokLen, 4).as("mean_tok_len"),
      round(alphaRatio, 4).as("alpha_ratio"),
      round(stopRatio, 4).as("stopword_ratio"),
      round(score, 2).as("quality_score"))
  }

  /** Token counts: whitespace tokens and a BPE-ish sub-word proxy
    * (runs of letters, runs of digits, single punctuation marks — the usual
    * pre-tokenizer regex shape).
    */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(col("doc_id"),
      size(tokens(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))
        .as("bpeish_tokens"))

  /** PII redaction: emails, IPv4 addresses, and long digit runs
    * (phone/account numbers) replaced by typed placeholder tokens, with
    * per-category counts for curation metrics. Patterns are RE2-compatible
    * (no backrefs/lookaround) so any engine reproduces the exact spans.
    * Categories apply in order and each counts on the PREVIOUS category's
    * output, so overlapping spans (digits inside an IP) never double-count.
    * Pure column expressions — codegen'd, one narrow pass over the corpus.
    */
  val piiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val piiIpv4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  val piiIdNum = "[0-9]{9,}"

  def redactPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = col(textCol)
    val t1 = regexp_replace(t0, piiEmail, "<EMAIL>")
    val t2 = regexp_replace(t1, piiIpv4, "<IP>")
    val t3 = regexp_replace(t2, piiIdNum, "<IDNUM>")
    docs.select(col("doc_id"),
      size(regexp_extract_all(t0, lit(piiEmail), lit(0))).as("n_emails"),
      size(regexp_extract_all(t1, lit(piiIpv4), lit(0))).as("n_ips"),
      size(regexp_extract_all(t2, lit(piiIdNum), lit(0))).as("n_idnums"),
      t3.as("redacted"))
  }

  /** Top-k characteristic terms per document by TF-IDF.
    *
    * Scale shape: one explode+aggregate for term frequencies (combiner
    * shrinks the shuffle to distinct (doc, term) pairs), one aggregate for
    * document frequencies joined back BY TERM, and a per-document window
    * for the top-k cut. No pairwise anything; cost is O(tokens) end to end.
    * The vocabulary join is deliberately NOT hinted: at test scale AQE
    * broadcasts it (asserted in PlanAuditSpec), while a web-scale
    * vocabulary (billions of distinct terms — urls, typos) exceeds any
    * broadcast budget and correctly falls back to a shuffle join keyed by
    * term. Scores are rounded to 4 decimals BEFORE ranking so the cut is
    * reproducible across engines (same policy as the similarity family).
    */
  def tfidf(docs: DataFrame, textCol: String = "text", k: Int = 3): DataFrame = {
    // the corpus size rides the MAIN job as a broadcast 1-row aggregate
    // (column-pruned subtree) instead of a separate driver action per call
    // — one job, not two, and the same exact long count (guide §1.2)
    val nDocs = docs.agg(count(lit(1)).cast("double").as("_n_docs"))
    val term = docs.select(col("doc_id"),
        explode(tokens(lower(col(textCol)))).as("term"))
    val tf = term.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // tf already holds one row per (doc, term), so document frequency is a
    // plain count over it — re-aggregating `term` would tokenize and
    // explode the whole corpus a second time
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(df, "term").crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log((col("_n_docs") + 1.0) / (col("df") + 1.0)), 4))
      .drop("_n_docs")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("doc_id", "term", "tf", "df", "tfidf", "rk")
  }

  /** Gopher-style within-document repetition signals (public literature —
    * the repetition-removal rules of large web-corpus pipelines): the
    * fraction of a document's words accounted for by its single most
    * frequent word, and by its most frequent word BIGRAM. High values flag
    * boilerplate, templated or keyword-stuffed pages that cross-document
    * near-dup sketches cannot catch (the repetition is inside ONE doc).
    *
    * Scale shape: computed IN-ROW — the top gram count of one document is
    * the longest run in its SORTED gram array (array_sort + one aggregate
    * lambda per n-gram order), a pure row function. The earlier
    * explode→(doc, gram)-aggregate→per-doc-max→join shape shuffled every
    * token of the corpus twice to compute the same per-document numbers;
    * per-document statistics never need an exchange (guide §2.4).
    * Fractions round to 6 decimals so thresholds cut identically on any
    * engine. Docs with fewer than 2 words have no bigrams: frac 0.
    */
  def repetition(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    // max multiplicity of the gram multiset = longest equal-run of the
    // sorted array — identical to max(count) over a (doc, gram) aggregate
    def maxRun(arr: Column): Column =
      aggregate(array_sort(arr),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
        (acc, x) => {
          val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
            .otherwise(lit(1L))
          struct(x.as("prev"), run.as("run"),
            greatest(acc.getField("best"), run).as("best"))
        },
        acc => acc.getField("best"))
    docs
      .select(col("doc_id"), toks.as("_t")) // tokenize once (guide §1.2)
      .select(col("doc_id"), col("_t"), shingles(col("_t"), 2).as("_b"))
      .where(size(col("_t")) > 0) // wordless docs had no aggregate rows
      .select(col("doc_id"),
        size(col("_t")).cast("long").as("n_words"),
        maxRun(col("_t")).as("_top_w"),
        size(col("_b")).cast("long").as("_n_bigrams"),
        maxRun(col("_b")).as("_top_b"))
      .select(col("doc_id"), col("n_words"),
        round(col("_top_w") / col("n_words"), 6).as("top_word_frac"),
        when(col("_n_bigrams") > 0, round(col("_top_b") / col("_n_bigrams"), 6))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** Document fingerprints: content hash of normalized text plus a rolling
    * shingle fingerprint (the lexicographic-min md5 over word 3-gram
    * shingles — a 1-hash minhash, stable under small reorderings of
    * surrounding content).
    */
  def fingerprints(docs: DataFrame, textCol: String = "text"): DataFrame =
    // staged: normalize once, tokenize once — the shingle expression
    // references its token input ~5× and the content hash re-reads the
    // normalized text; inline, the two regex passes + split ran ~6× per
    // row (guide §1.2; measured 4.5× faster on the corpus fixture)
    docs
      .select(col("doc_id"), normalized(col(textCol)).as("_n"))
      .select(col("doc_id"), col("_n"), tokens(col("_n")).as("_t"))
      .select(col("doc_id"),
        md5(col("_n")).as("content_fp"),
        array_min(transform(shingles(col("_t"), 3), s => md5(s))).as("shingle_fp"))
}
