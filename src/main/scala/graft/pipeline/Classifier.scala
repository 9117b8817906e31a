package graft.pipeline

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import graft.prims.Mat._

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

  /** Logistic-regression probe over an embedding column, trained with
    * fixed-iteration FULL-BATCH gradient descent — the "fit a linear probe
    * on a labeled slice, score the whole corpus" step of embedding-based
    * curation (quality filters, domain routers) where the NB classifier
    * above covers the token side. `target` is any boolean/numeric column
    * expression over the input frame (cast to 0/1); a bias feature is
    * appended internally.
    *
    * Scale shape: one iteration = ONE shuffle of the posexploded train
    * slice (n·(dim+1) rows reduced to dim+1 gradient sums by a map-side-
    * combined hash agg) and a (dim+1)-scalar collect for the driver-side
    * weight update — the same bounded-collect discipline as the spectral
    * Gram matrix (`Spectral.scala`). Scoring is a pure map over the corpus
    * with the weight vector inlined as an array literal: no join, no
    * shuffle, fully codegen'd through [[graft.functions.VecDot]]. At 100 TB
    * the train slice is whatever labeled sample fits the label budget; the
    * corpus-sized pass is scoring, which is scan-shaped.
    *
    * Determinism: weights drift only by float-sum association (~1e-13
    * after `iters` rounds — measured, see BASELINE round 7), absorbed by
    * rounding `prob` to 6 dp; `pred` compares the ROUNDED prob to 0.5 so
    * both engines decide on the same value.
    * Output (idCol, prob, pred). */
  def lrTrainScore(emb: DataFrame, trainFilter: Column, target: Column,
                   iters: Int = 8, lr: Double = 8.0,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   boundaryGuard: Double = 0.0): DataFrame = {
    def prep(df: DataFrame): DataFrame = df.select(col(idCol),
      concat(col(vecCol).cast("array<double>"), array(lit(1.0))).as("xf"),
      target.cast("double").as("y"))
    val all = prep(emb).mat
    val train = prep(emb.filter(trainFilter)).mat
    val n = train.count().toDouble
    require(n > 0, "lrTrainScore: empty training slice")
    val dim = all.select(size(col("xf"))).first().getInt(0)
    val w = Array.fill(dim)(0.0)
    for (_ <- 0 until iters) {
      val z = dot(col("xf"), typedlit(w.toSeq))
      val sig = lit(1.0) / (lit(1.0) + exp(-z))
      val grad = train
        .select((sig - col("y")).as("r"), posexplode(col("xf")))
        .groupBy(col("pos")).agg(sum(col("r") * col("col")).as("g"))
        .collect()
      grad.foreach(r => w(r.getInt(0)) -= lr * r.getDouble(1) / n)
    }
    val rawProb = lit(1.0) / (lit(1.0) + exp(-dot(col("xf"), typedlit(w.toSeq))))
    if (boundaryGuard > 0) {
      // cross-engine parity guard (ADVICE r7): the 6-dp rounding absorbs
      // ~1e-13 float-association weight drift ONLY while no prob sits on a
      // rounding boundary — a prob within the drift of x.xxxxxx5 could
      // round (and flip pred) differently between Spark and the oracle.
      // Fail loudly instead of flaking silently.
      val mRow = all.select(rawProb.as("_p"))
        .agg(min(abs(col("_p") * 1e6 - floor(col("_p") * 1e6) - lit(0.5)) * 1e-6))
        .first().getDouble(0)
      require(mRow > boundaryGuard,
        f"lrTrainScore: a prob lies $mRow%.3g from a 6-dp rounding boundary " +
          f"(guard $boundaryGuard%.0e) — oracle comparison could flip")
    }
    val prob = round(rawProb, 6)
    all.select(col(idCol), prob.as("prob"),
      (prob >= 0.5).cast("long").as("pred"))
  }
}
