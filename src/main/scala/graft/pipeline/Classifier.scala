package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Trainable document classifier for curation pipelines — the
  * fastText-style "train a lightweight filter on a labeled subset, score
  * the corpus" step every large-scale data pipeline runs (quality
  * classifiers, language-ID refinement, domain routing). Multinomial
  * Naive Bayes over whitespace tokens with Laplace smoothing: the model
  * is closed-form from exact integer counts, so training is two hash
  * aggregations (no SGD, no iteration), scoring is one join + one
  * aggregation, and the whole pipeline has an exact DuckDB mirror for the
  * correctness gate.
  *
  * Scale shape: the model is (labels × vocab) rows — labels are small by
  * construction, vocab is bounded by `maxVocab` (top tokens by corpus
  * frequency, deterministic (count, token) tie-break). Scoring joins the
  * corpus token table to the model on the token key (equi-join, never a
  * cross product) and aggregates per (doc, label). Out-of-vocabulary
  * tokens contribute the per-label smoothed default, accumulated from ONE
  * anti-join — all candidate-bounded, 100 TB-shaped.
  */
object Classifier {
  import TextOps._

  /** Train: returns (tokenLik, labelStats).
    * tokenLik:   (label, w, log_lik) for every (label, vocab token) pair —
    *             DENSE over the vocab so scoring sees every label for every
    *             in-vocab token; log_lik = ln((c+α)/(tot_label+α·V)).
    * labelStats: (label, log_prior, log_default) with
    *             log_prior = ln(n_docs_label / n_docs),
    *             log_default = ln(α/(tot_label+α·V)) — the smoothed mass an
    *             out-of-vocabulary token contributes under that label. */
  def nbTrain(train: DataFrame, labelCol: String = "lang",
              textCol: String = "text", alpha: Double = 1.0,
              maxVocab: Int = 65536): (DataFrame, DataFrame) = {
    val tok = train.select(col(labelCol).as("label"),
      explode(tokens(col(textCol))).as("w"))
    // vocab: top-maxVocab tokens by total count, deterministic tie-break
    val vocab = tok.groupBy("w").agg(count(lit(1)).as("cv"))
      .orderBy(desc("cv"), col("w")).limit(maxVocab).select("w")
    val counts = tok.join(vocab, "w")
      .groupBy("label", "w").agg(count(lit(1)).as("c"))
    val vSize = vocab.count().toDouble
    val totals = counts.groupBy("label").agg(sum("c").as("tot"))
    // dense (label × vocab) log-likelihoods: unseen-in-label vocab tokens
    // get the smoothed zero-count value
    val dense = totals.crossJoin(vocab) // labels × vocab — model-sized
      .join(counts, Seq("label", "w"), "left")
      .select(col("label"), col("w"),
        log((coalesce(col("c"), lit(0L)) + lit(alpha)) /
          (col("tot") + lit(alpha * vSize))).as("log_lik"))
    val nDocs = train.count().toDouble
    val stats = train.groupBy(col(labelCol).as("label"))
      .agg(count(lit(1)).as("nd"))
      .join(totals, "label")
      .select(col("label"),
        log(col("nd") / lit(nDocs)).as("log_prior"),
        log(lit(alpha) / (col("tot") + lit(alpha * vSize))).as("log_default"))
    (dense, stats)
  }

  /** Score every document against the model and keep the argmax label.
    * Deterministic argmax: max score rounded to 9 dp, then min label —
    * the rounding is what lets the DuckDB mirror agree bit-for-bit when
    * two labels are structurally tied and float association could
    * otherwise pick different winners.
    * Output (idCol, pred_label, score) with score rounded to 6 dp. */
  def nbClassify(docs: DataFrame, tokenLik: DataFrame, labelStats: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val dt = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .groupBy(idCol, "w").agg(count(lit(1)).as("cw"))
    // in-vocab contributions: every label's row for each vocab token
    val seen = dt.join(tokenLik, "w")
      .groupBy(col(idCol), col("label"))
      .agg(sum(col("cw") * col("log_lik")).as("s_seen"))
    // OOV mass per doc: one anti-join against the vocab (token column of
    // the dense model, distinct)
    val oov = dt.join(tokenLik.select("w").distinct(), Seq("w"), "left_anti")
      .groupBy(idCol).agg(sum("cw").as("n_oov"))
    // docs × labels base so all-OOV documents still score every label
    val base = docs.select(col(idCol)).crossJoin(broadcast(labelStats))
    val scored = base
      .join(seen, Seq(idCol, "label"), "left")
      .join(oov, Seq(idCol), "left")
      .select(col(idCol), col("label"),
        (col("log_prior") + coalesce(col("s_seen"), lit(0.0)) +
          coalesce(col("n_oov"), lit(0L)) * col("log_default")).as("score"))
    scored.groupBy(idCol)
      .agg(min_by(struct(col("label"), col("score")),
        struct(-round(col("score"), 9), col("label"))).as("b"))
      .select(col(idCol), col("b.label").as("pred_label"),
        round(col("b.score"), 6).as("score"))
  }

  /** One-call form for the gate query: train on `trainFilter` docs, score
    * the full corpus. */
  def nbTrainScore(docs: DataFrame, trainFilter: Column,
                   labelCol: String = "lang", idCol: String = "doc_id",
                   textCol: String = "text", alpha: Double = 1.0,
                   maxVocab: Int = 65536): DataFrame = {
    val (lik, stats) = nbTrain(docs.filter(trainFilter), labelCol, textCol,
      alpha, maxVocab)
    nbClassify(docs, lik, stats, idCol, textCol)
  }
}
