package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Text-analysis operators for training-data curation: token counting,
  * quality scoring, language identification, and winnowing document
  * fingerprints. All pure `functions._` expressions (whole-stage codegen,
  * no UDFs); each has an exact DuckDB-SQL equivalent for the oracle.
  */
object TextAnalysis {
  import TextOps._
  import graft.prims.Mat._

  /** Public per-language stopword marker sets for the n-gram/stopword
    * language-ID heuristic (tiny on purpose — broadcast as literals into
    * the codegen'd expression, no lookup join needed). */
  val StopWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "fr" -> Seq("le", "la", "les", "de", "et", "un", "une", "des"),
    "es" -> Seq("el", "los", "las", "de", "y", "un", "una", "que"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "zu", "den"))

  private def inList(ws: Seq[String]): String = ws.map(w => s"'$w'").mkString(", ")

  private def hitRatio(wsCol: String, lang: String): String =
    s"size(filter($wsCol, w -> w IN (${inList(StopWords(lang))}))) / CAST(size($wsCol) AS DOUBLE)"

  /** Token counts: whitespace tokens, distinct tokens, and a BPE-ish
    * subword count (runs of letters, runs of digits, single other chars —
    * the standard pre-tokenizer regex shape). */
  def tokenCounts(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_tokens"),
      size(array_distinct(tokens(col(textCol)))).cast("long").as("n_distinct"),
      regexp_count(col(textCol), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]")).cast("long")
        .as("n_bpe_ish"))

  /** The blended [0,1] quality score as a single codegen'd Column over the
    * raw text: length saturation, type-token ratio, stopword ratio, mean
    * token length band. Shared by `qualityScore` (the per-signal report),
    * `qualityFilter` and `curriculum` (which consume only the blend) so the
    * filter/ordering queries are one scan with no self-join back onto the
    * score table. */
  private def blendedQuality(textCol: String): Column = {
    val ws = tokens(col(textCol))
    val nTok = size(ws).cast("double")
    val ttr = size(array_distinct(ws)) / nTok
    val stopR = expr(hitRatio(s"split($textCol, ' ')", "en"))
    val meanLen = expr(s"aggregate(split($textCol, ' '), 0L, (a, w) -> a + length(w))") / nTok
    round(
      least(nTok / 200.0, lit(1.0)) * 0.3
        + ttr * 0.3
        + least(stopR * 4.0, lit(1.0)) * 0.2
        + when(meanLen.between(3.0, 8.0), 0.2).otherwise(0.0), 6)
  }

  /** Quality signals + a single blended score in [0,1]: length saturation,
    * type-token ratio, stopword ratio, mean token length band, punctuation
    * density. Formula is explicit so the DuckDB oracle reproduces it. */
  def qualityScore(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ws = tokens(col(textCol))
    val nTok = size(ws).cast("double")
    val ttr = size(array_distinct(ws)) / nTok
    val stopR = expr(hitRatio("split(text, ' ')", "en"))
    val meanLen = expr("aggregate(split(text, ' '), 0L, (a, w) -> a + length(w))") / nTok
    val punctR = regexp_count(col(textCol), lit("[.,;:!?]")) / length(col(textCol)).cast("double")
    docs.select(col(idCol),
      nTok.cast("long").as("n_tokens"),
      round(ttr, 6).as("type_token_ratio"),
      round(stopR, 6).as("stopword_ratio"),
      round(meanLen, 6).as("mean_token_len"),
      round(punctR, 6).as("punct_ratio"),
      round(
        least(nTok / 200.0, lit(1.0)) * 0.3
          + ttr * 0.3
          + least(stopR * 4.0, lit(1.0)) * 0.2
          + when(meanLen.between(3.0, 8.0), 0.2).otherwise(0.0), 6).as("quality"))
  }

  /** Required stopwords for the Gopher rule battery (Rae et al. 2021,
    * Appendix A): a document must contain at least two of these. */
  val GopherStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style HARD rule battery (Rae et al. 2021, "Scaling Language
    * Models: Methods, Analysis & Insights from Training Gopher", Appendix A
    * — the published pretraining filter, as opposed to [[qualityScore]]'s
    * blended score): word-count bounds, mean-word-length band [3,10],
    * symbol-to-word ratio ≤ 0.1 (# and ellipsis), ≥80% of words containing
    * an alphabetic character, and ≥2 required stopwords present. Emits the
    * per-rule verdicts so a curation run can report WHY documents fell, not
    * just how many. Pure codegen'd expressions — one scan, no shuffle, no
    * UDFs; the line-level bullet/ellipsis rules are inapplicable to
    * single-line documents and omitted.
    * Output (doc_id, n_words, mean_word_len, symbol_ratio,
    * alpha_word_ratio, stop_hits, r_wordcount, r_meanlen, r_symbol,
    * r_alpha, r_stopwords, keep). */
  def gopherRules(docs: DataFrame, minWords: Int = 50, maxWords: Int = 100000,
                  stopWords: Seq[String] = GopherStopWords, minStopHits: Int = 2,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ws = tokens(col(textCol))
    docs.select(col(idCol), ws.as("ws"), col(textCol).as("t"))
      .select(col(idCol),
        size(col("ws")).cast("long").as("n_words"),
        round(expr("aggregate(ws, 0L, (a, w) -> a + length(w))") /
          size(col("ws")).cast("double"), 6).as("mean_word_len"),
        round((regexp_count(col("t"), lit("#")) +
          regexp_count(col("t"), lit("\\.\\.\\."))) /
          size(col("ws")).cast("double"), 6).as("symbol_ratio"),
        round(size(expr("filter(ws, w -> w rlike '[a-zA-Z]')")) /
          size(col("ws")).cast("double"), 6).as("alpha_word_ratio"),
        size(filter(
          array(stopWords.map(lit): _*),
          sw => array_contains(col("ws"), sw))).cast("long").as("stop_hits"))
      .withColumn("r_wordcount", col("n_words").between(minWords, maxWords))
      .withColumn("r_meanlen", col("mean_word_len").between(3.0, 10.0))
      .withColumn("r_symbol", col("symbol_ratio") <= 0.1)
      .withColumn("r_alpha", col("alpha_word_ratio") >= 0.8)
      .withColumn("r_stopwords", col("stop_hits") >= minStopHits.toLong)
      .withColumn("keep", col("r_wordcount") && col("r_meanlen") &&
        col("r_symbol") && col("r_alpha") && col("r_stopwords"))
  }

  /** Per-stratum quality-percentile filter: keep documents whose blended
    * quality score sits at or above the `minPct` percent_rank within their
    * stratum (deterministic tie-break by doc id, so every rank is unique
    * and the cut is reproducible). The adaptive cousin of a fixed quality
    * threshold — each source sheds its own worst tail, so a clean source
    * isn't over-pruned and a noisy one isn't under-pruned. One scan + one
    * window per stratum; at corpus scale the stratum count (domains,
    * languages) is what bounds window parallelism, exactly like sourceCap.
    * Output (doc_id, stratum, quality) for kept rows. */
  def qualityFilter(docs: DataFrame, minPct: Double = 0.5, byCol: String = "source",
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(byCol).orderBy(col("quality"), col(idCol))
    docs.select(col(idCol), col(byCol), blendedQuality(textCol).as("quality"))
      .withColumn("pr", percent_rank().over(w))
      .filter(col("pr") >= minPct)
      .select(col(idCol), col(byCol), col("quality"))
  }

  /** Curriculum phase assignment: ntile(`phases`) buckets over the blended
    * quality score within each stratum (easy→hard ordering for curriculum
    * training schedules, stratified so every source contributes to every
    * phase). Deterministic tie-break by doc id. Output
    * (doc_id, stratum, phase ∈ [1, phases]). */
  def curriculum(docs: DataFrame, phases: Int = 4, byCol: String = "source",
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val w = Window.partitionBy(byCol).orderBy(col("quality"), col(idCol))
    docs.select(col(idCol), col(byCol), blendedQuality(textCol).as("quality"))
      .withColumn("phase", ntile(phases).over(w).cast("long"))
      .select(col(idCol), col(byCol), col("phase"))
  }

  /** Corpus vocabulary: the global word-frequency table, top `topK` words
    * by (total occurrences desc, word asc) with document frequencies. One
    * codegen'd hash aggregation with map-side partial combine (each
    * partition pre-merges its own word counts before the single shuffle on
    * the word key); the top-k compiles to TakeOrderedAndProject — per-
    * partition k-row heaps merged on the driver, never a global sort of
    * the vocabulary. Output (word, n_occ, n_docs). */
  def vocab(docs: DataFrame, topK: Int = 100, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(tokens(col(textCol))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("n_occ"), countDistinct(col(idCol)).as("n_docs"))
      .orderBy(desc("n_occ"), col("word"))
      .limit(topK)

  /** TF-IDF keyword extraction: the top `k` highest-scoring terms per
    * document, score = tf · ln(N/df). The document-frequency table is
    * sublinear in corpus size (Heaps' law) and joins back on the word key;
    * the scalar corpus count rides a broadcast single-row frame. The idf
    * is rounded to 9 dp BEFORE the tf multiply so the ranking compares
    * identical doubles on any engine (ln is the one transcendental in the
    * pipeline surface; 9 dp absorbs last-ULP libm differences without
    * changing any real ordering). Output (doc_id, word, tf, df, tf_idf). */
  def tfidfTopTerms(docs: DataFrame, k: Int = 3, idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol), explode(tokens(col(textCol))).as("word"))
    val tf = words.groupBy(col(idCol), col("word")).agg(count(lit(1)).as("tf")).mat
    val dfT = tf.groupBy("word").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfT, "word")
      .crossJoin(broadcast(n))
      .withColumn("s", col("tf") * round(log(col("n_docs").cast("double") / col("df")), 9))
    graft.prims.TopK.perKey(scored, Seq(idCol), Seq(desc("s"), col("word")), k)
      .select(col(idCol), col("word"), col("tf"), col("df"),
        round(col("s"), 6).as("tf_idf"))
  }

  /** Token-distribution entropy per document: H = −Σ p_w log2 p_w over the
    * word frequency distribution — the information-density quality signal
    * (near-zero H ⇒ the doc is one token repeated; H ≈ log2(n) ⇒ every
    * token distinct). One explode + two hash aggs, all map-side-combined.
    * Output (doc_id, n_tokens, entropy). */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val words = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
    val cnt = words.groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c")).mat
    val n = cnt.groupBy(idCol).agg(sum("c").as("n_tokens"))
    val p = col("c") / col("n_tokens").cast("double")
    cnt.join(n, idCol)
      .select(col(idCol), col("n_tokens"), (p * log2(p)).as("term"))
      .groupBy(col(idCol), col("n_tokens"))
      .agg(round(-sum("term"), 6).as("entropy"))
      .select(col(idCol), col("n_tokens"), col("entropy"))
  }

  /** Word-association mining: pointwise mutual information over skip-gram
    * pairs within a `window`-token window — the collocation/phrase-mining
    * pass of an embedding-training pipeline. Pair generation is LINEAR in
    * corpus tokens (positions self-joined per document with a ≤`window`
    * position gap), never the per-document all-pairs square. Ranking
    * compares the exact PMI ratio r = c(ab)·T² / (P·c(a)·c(b)) — pure IEEE
    * products/division of integer-valued doubles, identical on any engine —
    * and only the reported pmi column takes a log. Pairs below `minCount`
    * are noise-floored away. Output (w_a, w_b, n_pair, pmi), top `topK` by
    * (r desc, w_a, w_b). */
  def pmiPairs(docs: DataFrame, window: Int = 2, minCount: Int = 5,
               topK: Int = 50, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val pos = docs.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("p", "w"))).mat
    // TRUE linear pair generation: each position explodes into its
    // `window` forward offsets and equi-joins on (doc, position) —
    // tokens × window rows. A doc_id-only equi-join with the position gap
    // as a post-predicate would enumerate the per-document all-pairs
    // square before filtering, which a long document at corpus scale
    // cannot afford.
    val a = pos.select(col(idCol), col("w").as("wa"), col("p"),
        explode(sequence(lit(1), lit(window))).as("off"))
      .select(col(idCol), (col("p") + col("off")).as("p"), col("wa"))
    val pairs = a.join(pos, Seq(idCol, "p"))
      .select(least(col("wa"), col("w")).as("w_a"),
        greatest(col("wa"), col("w")).as("w_b")).mat
    val cab = pairs.groupBy("w_a", "w_b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minCount)
    val cw = pos.groupBy(col("w")).agg(count(lit(1)).as("cw"))
    val totals = pos.agg(count(lit(1)).as("t_tok"))
      .crossJoin(pairs.agg(count(lit(1)).as("t_pair")))
    val r = (col("n_pair").cast("double") * col("t_tok") * col("t_tok")) /
      (col("t_pair").cast("double") * col("ca") * col("cb"))
    val scored = cab
      .join(cw.select(col("w").as("w_a"), col("cw").as("ca")), "w_a")
      .join(cw.select(col("w").as("w_b"), col("cw").as("cb")), "w_b")
      .crossJoin(broadcast(totals))
      .withColumn("r", r)
    scored.orderBy(desc("r"), col("w_a"), col("w_b")).limit(topK)
      .select(col("w_a"), col("w_b"), col("n_pair"), round(log(col("r")), 6).as("pmi"))
  }

  /** Corpus-trained bigram language-model scoring — the KenLM-shaped
    * perplexity filter of a CCNet-style pipeline, self-trained on the
    * corpus: P(b|a) = (c(a,b) + k) / (c(a·) + k·V) with add-k smoothing,
    * document score = mean ln P over its bigrams (higher = more typical of
    * the corpus; junk scores low). The bigram table is sublinear in corpus
    * size and joins back on the bigram key; the (V, k) scalars ride a
    * broadcast single-row frame. Output (doc_id, n_bigrams, lm_score). */
  def bigramLmScore(docs: DataFrame, k: Double = 0.5,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val pos = docs.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("p", "w"))).mat
    val a = pos.select(col(idCol), (col("p") + 1).as("p"), col("w").as("wa"))
    val big = a.join(pos, Seq(idCol, "p"))
      .select(col(idCol), col("wa"), col("w").as("wb")).mat
    val c2 = big.groupBy("wa", "wb").agg(count(lit(1)).as("c2"))
    val c1 = big.groupBy("wa").agg(count(lit(1)).as("c1"))
    val vocabN = pos.agg(countDistinct(col("w")).as("v"))
    big.join(c2, Seq("wa", "wb"))
      .join(c1, Seq("wa"))
      .crossJoin(broadcast(vocabN))
      .select(col(idCol),
        log((col("c2") + lit(k)) / (col("c1") + lit(k) * col("v"))).as("lp"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), round(avg("lp"), 6).as("lm_score"))
  }

  /** Per-source corpus datasheet — the report a curation run publishes
    * before training: document count, token volume, mean blended quality,
    * and the exact median document length (picked as the ranked element at
    * ⌈n/2⌉ with a deterministic (length, id) order — engine-exact, unlike
    * interpolated quantile estimators). One scan + one agg + one window
    * per source. Output (source, n_docs, n_tokens, mean_quality,
    * median_chars). */
  def sourceStats(docs: DataFrame, byCol: String = "source",
                  idCol: String = "doc_id", textCol: String = "text",
                  lenCol: String = "n_chars"): DataFrame = {
    val base = docs.select(col(byCol), col(idCol), col(lenCol),
      size(tokens(col(textCol))).cast("long").as("n_tok"),
      blendedQuality(textCol).as("q"))
    val agg = base.groupBy(byCol).agg(
      count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
      round(avg("q"), 6).as("mean_quality"))
    val w = Window.partitionBy(byCol).orderBy(col(lenCol), col(idCol))
    val med = base
      .withColumn("rn", row_number().over(w))
      .withColumn("nn", count(lit(1)).over(Window.partitionBy(byCol)))
      // floor(): Spark's `/` on integer columns is DOUBLE division, so for
      // an even-sized group (nn+1)/2 is fractional and would match no row,
      // silently dropping that group. floor matches the oracle's integer //.
      .filter(col("rn") === floor((col("nn") + 1) / 2))
      .select(col(byCol), col(lenCol).cast("long").as("median_chars"))
    agg.join(med, byCol)
  }

  /** Cross-source duplication matrix: for every unordered source pair, the
    * number of distinct word `n`-grams both sources contain — "which
    * sources copy from each other", the provenance diagnostic a dedup run
    * reports (an 8-gram shared across sources is near-certain copying, not
    * coincidence). The join key is the n-gram itself over per-source
    * DISTINCT n-gram sets, so the pair fan-out per n-gram is bounded by
    * (sources sharing it)², and the per-pair row count by the source
    * count — a constant at corpus scale. Output (src_a, src_b, n_shared). */
  def crossSourceDup(docs: DataFrame, n: Int = 8, byCol: String = "source",
                     textCol: String = "text"): DataFrame = {
    val sh = docs.select(col(byCol),
        explode(shingles(tokens(col(textCol)), n)).as("s"))
      .distinct()
    sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col(s"a.$byCol") < col(s"b.$byCol"))
      .groupBy(col(s"a.$byCol").as("src_a"), col(s"b.$byCol").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Language ID by stopword hit-ratio over the supported marker sets;
    * deterministic argmax (score desc, language code asc), 'und' when no
    * marker hits at all. */
  def languageId(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val langs = StopWords.keys.toSeq.sorted
    val scored = docs.select(col(idCol) +: langs.map(l =>
      round(expr(hitRatio("split(text, ' ')", l)), 6).as(s"score_$l")): _*)
    val best = langs.map(l => struct(col(s"score_$l").as("s"), lit(l).as("l")))
      .reduce((a, b) => when(b.getField("s") > a.getField("s"), b).otherwise(a))
    scored.select(col(idCol),
      when(best.getField("s") > 0, best.getField("l")).otherwise(lit("und")).as("lang_pred"),
      round(best.getField("s"), 6).as("lang_score"))
  }

  /** Winnowing fingerprints (Schleimer et al., SIGMOD'03 — public method):
    * hash every word `n`-gram, slide a window of `w` positions, keep each
    * window's minimum hash; the distinct kept hashes are the document's
    * fingerprints. Shuffle-free except the final distinct: the window
    * min is computed per-document with a bounded ROWS frame. */
  /** PII scrubbing: emails → <EMAIL>, long digit runs → <NUM>. Patterns
    * kept inside the RE2 ∩ Java-regex common subset so the DuckDB oracle
    * applies the identical rewrite. */
  def scrubPii(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      regexp_replace(
        regexp_replace(col(textCol), "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+", "<EMAIL>"),
        "[0-9]{7,}", "<NUM>").as("scrubbed"))

  /** Deterministic train/validation split by document-id hash — stable
    * under repartitioning and re-runs (no rand()), the property a 100 TB
    * pipeline needs for resumable splits. */
  def trainValSplit(docs: DataFrame, valPct: Int = 5,
                    idCol: String = "doc_id", seed: Long = 42): DataFrame =
    docs.select(col(idCol),
      when(pmod(TextOps.hash60(concat_ws("|", lit("split"), col(idCol), lit(seed))),
        lit(100L)) < (100L - valPct), "train").otherwise("val").as("split"))

  /** Per-source document cap (the per-domain cap a web corpus applies
    * before training): keep at most `maxPerKey` docs per `keyCol`, chosen
    * by deterministic doc-id hash priority — stable under repartitioning
    * and re-runs, no rand(). Window top-k per key; a heavy-hitter source
    * at corpus scale can swap the window for the ReservoirSample
    * aggregate (bounded state, no per-key sort). Output: kept rows only. */
  def sourceCap(docs: DataFrame, maxPerKey: Int, keyCol: String = "source",
                idCol: String = "doc_id", seed: Long = 42): DataFrame = {
    val pri = TextOps.hash60(concat_ws("|", lit("cap"), col(idCol), lit(seed)))
    val w = Window.partitionBy(keyCol).orderBy(col("pri"), col(idCol))
    docs.select(col(idCol), col(keyCol), pri.as("pri"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxPerKey)
      .select(col(idCol), col(keyCol))
  }

  /** Stratified corpus mixture sampling: per-stratum keep rates in parts
    * per million (language/source mixing weights), decided by a
    * deterministic doc-id hash — a pure map-side filter that never
    * shuffles at any corpus size. Integral ppm rates keep the threshold
    * compare exact across engines (no float rate × 1e6 rounding). Strata
    * absent from `ratesPpm` fall back to `defaultPpm`. */
  def stratifiedSample(docs: DataFrame, ratesPpm: Map[String, Long],
                       defaultPpm: Long = 0L, strataCol: String = "lang",
                       idCol: String = "doc_id", seed: Long = 42): DataFrame = {
    val u = pmod(TextOps.hash60(
      concat_ws("|", lit("strat"), col(idCol), lit(seed))), lit(1000000L))
    val rate = ratesPpm.foldLeft(lit(defaultPpm)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    docs.select(col(idCol), col(strataCol)).filter(u < rate)
  }

  /** Per-document sliding-window chunking with overlap — the
    * embedding/RAG-side complement of [[packChunks]] (which packs ACROSS
    * documents for pretraining): each document is cut into `window`-token
    * chunks every `stride` tokens (overlap = window − stride), the unit a
    * retrieval index or an embedding batch job consumes. Pure per-row
    * generate + project: no shuffle, no state — the plan is a single scan
    * stage at any corpus size, and chunk counts scale with token counts,
    * not document counts. A trailing partial chunk is kept (≥1 token);
    * documents shorter than one stride yield exactly one chunk.
    * Output (idCol, chunk_id, start_tok, n_tok, chunk_text). */
  def chunkDocs(docs: DataFrame, window: Int, stride: Int,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"chunkDocs: need 0 < stride <= window, got window=$window stride=$stride")
    docs
      .select(col(idCol), tokens(col(textCol)).as("ws"))
      .select(col(idCol), col("ws"),
        posexplode(sequence(lit(0),
          greatest(size(col("ws")) - 1, lit(0)), lit(stride))))
      .select(col(idCol), col("pos").cast("long").as("chunk_id"),
        col("col").cast("long").as("start_tok"),
        least(size(col("ws")) - col("col"), lit(window)).cast("long").as("n_tok"),
        array_join(slice(col("ws"), col("col") + 1, lit(window)), " ").as("chunk_text"))
  }

  /** Concat-then-chunk sequence packing: documents are deterministically
    * sharded into `nBuckets` packer buckets, hash-ordered within each,
    * and the running token total assigns each doc the fixed-size context
    * chunk its first token lands in (chunk = cum_before div budget,
    * offset = cum_before mod budget) — the standard pretraining packing
    * layout. Each bucket is one window partition, so parallelism scales
    * with `nBuckets` (set it to O(cluster cores) at corpus scale); there
    * is never a global sort. Output (doc_id, bucket, chunk, offset,
    * n_tokens). */
  def packChunks(docs: DataFrame, budget: Long, nBuckets: Int = 8,
                 idCol: String = "doc_id", textCol: String = "text",
                 seed: Long = 42): DataFrame = {
    val h = TextOps.hash60(concat_ws("|", lit("pack"), col(idCol), lit(seed)))
    val base = docs.select(col(idCol),
      pmod(h, lit(nBuckets.toLong)).as("bucket"), h.as("pri"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"))
    val w = Window.partitionBy("bucket").orderBy(col("pri"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .withColumn("cum_before", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col(idCol), col("bucket"),
        expr(s"cum_before div $budget").as("chunk"),
        pmod(col("cum_before"), lit(budget)).as("offset"), col("n_tokens"))
  }

  /** Deterministic GLOBAL SHUFFLE into training shards — the step that
    * writes a curated corpus out as N shard files in random-but-reproducible
    * order (webdataset/TFRecord layout). shard = hash(doc_id) mod nShards,
    * position = hash-order rank within the shard. One window per shard, so
    * parallelism scales with `nShards` (set it to O(output files) at corpus
    * scale — which is exactly what a shard writer wants); no global sort,
    * no rand(), stable under repartitioning and re-runs.
    * Output (doc_id, shard, pos). */
  def shardAssign(docs: DataFrame, nShards: Int, idCol: String = "doc_id",
                  seed: Long = 42): DataFrame = {
    val h = TextOps.hash60(concat_ws("|", lit("shard"), col(idCol), lit(seed)))
    val w = Window.partitionBy("shard").orderBy(col("pri"), col(idCol))
    docs.select(col(idCol), pmod(h, lit(nShards.toLong)).as("shard"), h.as("pri"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** Shard manifest — the integrity record a corpus writer emits next to
    * its shard files: per shard, the document count, the total token count,
    * and an order-insensitive content checksum over the (doc_id, pos)
    * placement. The checksum is a `bit_xor` fold of a 60-bit md5 prefix per
    * placement row: XOR commutes, so no collect_list / no per-shard sort is
    * ever needed and the aggregation is one map-side-combinable hash agg —
    * at corpus scale each shard's digest costs the same as a count. A
    * reader re-deriving the manifest from the shards proves both membership
    * and position assignment without comparing row-by-row.
    * Output (shard, n_docs, n_tokens, checksum). */
  def shardManifest(docs: DataFrame, nShards: Int, idCol: String = "doc_id",
                    textCol: String = "text", seed: Long = 42): DataFrame = {
    val toks = docs.select(col(idCol),
      size(tokens(col(textCol))).cast("long").as("n_toks"))
    shardAssign(docs, nShards, idCol, seed)
      .join(toks, idCol)
      .select(col("shard"), col("n_toks"),
        TextOps.hash60(concat_ws(":", col(idCol), col("pos"))).as("h"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("n_toks").as("n_tokens"),
        expr("bit_xor(h)").as("checksum"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling", arXiv:2302.03169): score
    * every raw document by how much more likely its unigrams are under a
    * target-domain distribution (here the `langCol = targetLang` slice of
    * the corpus) than under the raw corpus distribution —
    * log w(d) = Σ_{tokens t ∈ d} [ln p̂_tgt(t) − ln p̂_raw(t)], add-one
    * smoothed over the joint vocabulary. Scale shape: one explode + one
    * |V|-keyed hash agg builds the vocab likelihood table; scoring is a
    * token equi-join back against it (hash-partitioned — a web-scale vocab
    * needs no broadcast), and the three corpus scalars ride a broadcast
    * 1-row cross join so the plan stays fully declarative. Selection is a
    * threshold on the weight — never a global top-k sort.
    * Output (doc_id, dsir_logw, selected). */
  def dsirWeights(docs: DataFrame, targetLang: String = "en",
                  idCol: String = "doc_id", textCol: String = "text",
                  langCol: String = "lang"): DataFrame = {
    val words = docs
      .select(col(idCol), col(langCol), explode(tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
    val vocab = words.groupBy("w").agg(
      count(lit(1)).cast("double").as("c_r"),
      sum(when(col(langCol) === targetLang, 1L).otherwise(0L))
        .cast("double").as("c_t")).mat
    val stats = vocab.agg(sum("c_r").as("n_r"), sum("c_t").as("n_t"),
      count(lit(1)).cast("double").as("v"))
    words.join(vocab, "w").crossJoin(broadcast(stats))
      .select(col(idCol),
        (log((col("c_t") + 1.0) / (col("n_t") + col("v"))) -
          log((col("c_r") + 1.0) / (col("n_r") + col("v")))).as("lw"))
      .groupBy(idCol).agg(round(sum("lw"), 6).as("dsir_logw"))
      .withColumn("selected", col("dsir_logw") > 0.0)
  }

  /** Length-bucketed batch formation: group documents of similar length so
    * fixed-size training batches waste minimal padding. Bucket = decimal
    * digit count of `lenCol` (an order-of-magnitude bucket chosen because
    * integer digit count is exactly reproducible across engines — no
    * floor(log2(double)) boundary rounding); within a bucket documents are
    * hash-ordered and cut into batches of `batchSize`. One window per
    * bucket; at corpus scale the same layout comes from range-partitioning
    * on (bucket, pri), which is what the window compiles to distributed.
    * Output (doc_id, bucket, batch). */
  def lengthBatches(docs: DataFrame, batchSize: Int, lenCol: String = "n_chars",
                    idCol: String = "doc_id", seed: Long = 42): DataFrame = {
    val h = TextOps.hash60(concat_ws("|", lit("lbatch"), col(idCol), lit(seed)))
    val w = Window.partitionBy("bucket").orderBy(col("pri"), col(idCol))
    docs.select(col(idCol), length(col(lenCol).cast("string")).cast("long").as("bucket"),
        h.as("pri"))
      .withColumn("rn", (row_number().over(w) - 1).cast("long"))
      .select(col(idCol), col("bucket"), expr(s"rn div $batchSize").as("batch"))
  }

  /** Benchmark contamination REPORT: which training documents share word
    * n-grams with which benchmark docs — the audit view of eval leakage
    * (hit counts + distinct leaking bench docs, rows only for docs WITH
    * hits). The decision-side complement is [[Dedup.decontaminate]], which
    * scores EVERY corpus doc with an overlap fraction and a keep/drop
    * verdict under a threshold. Distinct doc×benchmark shingles joined on
    * the shingle (benchmark side is the small one and broadcasts); a
    * document never contaminates itself.
    * Output (doc_id, n_hit_ngrams, n_bench_docs). */
  def contamination(docs: DataFrame, bench: DataFrame, n: Int = 5,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def sh(d: DataFrame, as: String) = d
      .select(col(idCol).as(as), explode(shingles(tokens(col(textCol)), n)).as("s"))
      .distinct()
    sh(docs, "doc_id_")
      .join(broadcast(sh(bench, "bench_id")), "s")
      .filter(col("doc_id_") =!= col("bench_id"))
      .groupBy(col("doc_id_").as(idCol))
      .agg(count(lit(1)).as("n_hit_ngrams"),
        countDistinct(col("bench_id")).as("n_bench_docs"))
  }

  /** Within-document repetition ratio: 1 − distinct/total word n-grams —
    * the boilerplate/SEO-spam signal quality filters threshold on.
    * Output (doc_id, n_ngrams, repetition). */
  def repetitionRatio(docs: DataFrame, n: Int = 3,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val shs = shingles(tokens(col(textCol)), n)
    docs.select(col(idCol),
      size(shs).cast("long").as("n_ngrams"),
      when(size(shs) > 0,
        round(lit(1.0) - size(array_distinct(shs)) / size(shs).cast("double"), 6))
        .otherwise(lit(0.0)).as("repetition"))
  }

  def fingerprints(docs: DataFrame, n: Int = 5, w: Int = 4,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = docs.select(col(idCol),
        posexplode(shingles(tokens(col(textCol)), n)).as(Seq("pos", "g")))
      .select(col(idCol), col("pos"), hash60(col("g")).as("h"))
    val win = Window.partitionBy(idCol).orderBy("pos").rowsBetween(0, w - 1)
    grams.select(col(idCol), min("h").over(win).as("fp")).distinct()
  }
}
