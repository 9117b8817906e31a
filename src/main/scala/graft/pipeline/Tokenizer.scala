package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING on the corpus (Sennrich, Haddow,
  * Birch — "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016 — the public method every modern LLM tokenizer derives from).
  *
  * Distributed shape: the corpus collapses once to a (distinct word,
  * frequency) table — sublinear in corpus size, the standard BPE-training
  * reduction — and each merge round is one pair-count aggregation over
  * that table (map-side combined) plus a 1-row argmax. Only the winning
  * pair crosses to the driver per round (a convergence-check-sized
  * collect, same budget class as PageRank's dangling scalar).
  *
  * Merge semantics: symbols are kept as a '/'-separated string and a merge
  * round applies ONE left-to-right non-overlapping `replace` scan of
  * `/l/r/` → `/lr/`. This equals canonical BPE everywhere except inside an
  * odd-length run of a self-pair (e.g. `a a a a a` with pair (a,a)), where
  * the consumed boundary separator shifts one merge right; the scan is
  * deterministic and IDENTICAL in Spark and DuckDB (both scan the input
  * once, resuming after each match), which is what makes the whole
  * training loop exactly gateable. Words containing the separator are
  * dropped up front (both sides identically).
  */
object Tokenizer {
  import TextOps._

  /** Learn `nMerges` BPE merges from the corpus. Returns the merge table
    * (rank, left, right, n_occ) — rank 1 is the first-learned merge. */
  def bpeTrain(docs: DataFrame, nMerges: Int = 5, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // (distinct word, corpus frequency) — the only corpus-sized pass
    var words = docs
      .select(explode(tokens(col(textCol))).as("w"))
      .filter(!col("w").contains("/") && length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(concat(lit("/"), array_join(split(col("w"), ""), "/"), lit("/"))
        .as("seq"), col("n"))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (r <- 1 to nMerges) {
      val toks = filter(split(col("seq"), "/"), x => x =!= "")
      // sequence(1, 0) DESCENDS in Spark — single-symbol words must yield
      // an empty pair list explicitly
      val pairList = when(size(toks) > 1,
        transform(sequence(lit(1), size(toks) - 1),
          i => struct(element_at(toks, i).as("l"), element_at(toks, i + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))
      val best = words
        .select(col("n"), explode(pairList).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("n").as("freq"))
        .orderBy(desc("freq"), col("l"), col("r"))
        .limit(1).collect()
      if (best.nonEmpty) {
        val (l, rr, f) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r.toLong, l, rr, f))
        words = words
          .withColumn("seq", regexp_replace(col("seq"),
            lit(java.util.regex.Pattern.quote(s"/$l/$rr/")), lit(s"/$l$rr/")))
          .localCheckpoint()
      }
    }
    merges.toSeq.toDF("rank", "left", "right", "n_occ")
  }

  /** Apply a learned merge table to tokenize text: each word's character
    * sequence replays the merges in rank order. Output
    * (doc_id, n_subwords) — the post-BPE token count per document. */
  def bpeTokenCount(docs: DataFrame, mergeTable: DataFrame,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val merges = mergeTable.orderBy("rank")
      .collect().map(row => (row.getString(1), row.getString(2)))
    val base = docs.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .filter(!col("w").contains("/") && length(col("w")) > 0)
      .withColumn("seq",
        concat(lit("/"), array_join(split(col("w"), ""), "/"), lit("/")))
    val applied = merges.foldLeft(base) { case (df, (l, r)) =>
      df.withColumn("seq", regexp_replace(col("seq"),
        lit(java.util.regex.Pattern.quote(s"/$l/$r/")), lit(s"/$l$r/")))
    }
    applied
      .select(col(idCol),
        size(filter(split(col("seq"), "/"), x => x =!= "")).cast("long").as("k"))
      .groupBy(idCol).agg(sum("k").as("n_subwords"))
  }

  /** Tokenizer fertility per language: subword tokens emitted per word —
    * the standard multi-lingual tokenizer health metric (a language whose
    * fertility is 2× another's pays 2× the context budget per sentence).
    * Joins the per-document post-BPE subword counts against the identically
    * filtered word counts and aggregates per language: two corpus-keyed
    * hash aggs plus one broadcastable doc-keyed join — nothing beyond the
    * tokenize pass itself at scale.
    * Output (lang, n_docs, n_words, n_subwords, fertility). */
  def fertility(docs: DataFrame, mergeTable: DataFrame,
                idCol: String = "doc_id", textCol: String = "text",
                langCol: String = "lang"): DataFrame = {
    val sub = bpeTokenCount(docs, mergeTable, idCol, textCol)
    val wc = docs
      .select(col(idCol), col(langCol), explode(tokens(col(textCol))).as("w"))
      .filter(!col("w").contains("/") && length(col("w")) > 0)
      .groupBy(col(idCol), col(langCol)).agg(count(lit(1)).as("n_words"))
    wc.join(sub, idCol)
      .groupBy(langCol)
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
        sum("n_subwords").as("n_subwords"),
        round(sum("n_subwords") / sum("n_words").cast("double"), 6).as("fertility"))
  }
}
