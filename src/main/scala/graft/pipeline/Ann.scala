package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.prims.{TopK, Mat}
import Mat._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: exact brute-force cosine top-k — a broadcast of the (small)
  * query set against the (huge) corpus, so the corpus is scanned once with
  * no shuffle of the vectors themselves; per-query top-k via the canonical
  * window row_number pattern (skew-safe: one partition per query id).
  *
  * Scale path: IVF — vectors are assigned to the nearest of `nlist` coarse
  * centroids (k-means over a sample, iterated as DataFrame joins); a query
  * probes only its `nprobe` nearest centroid buckets. The bucket assignment
  * is an equi-join on centroid id, so the 100 TB corpus is range-pruned to
  * nprobe/nlist of itself before any exact distance is computed.
  */
object Ann {
  import TextOps._

  private def withNorm(emb: DataFrame, idCol: String, vecCol: String): DataFrame =
    emb.select(col(idCol), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", norm(col("v")))

  /** Exact cosine top-k for each query vector. `queries` has the same
    * schema as `emb`; self-matches are excluded. Output:
    * (query_id, neighbor_id, cosine, rank). */
  def bruteForceTopK(emb: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val corpus = withNorm(emb, idCol, vecCol)
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val scored = corpus.join(broadcast(q), col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosine(col("v"), col("qv"), col("nrm"), col("qn")), 6).as("cosine"))
    TopK.perKey(scored, Seq("query_id"), Seq(desc("cosine"), col("neighbor_id")), k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
  }

  /** K-means coarse quantizer trained with deterministic seeding (first
    * `nlist` vectors by id) — returns (centroid_id, centroid vector). */
  def kmeansCentroids(emb: DataFrame, nlist: Int, iters: Int = 5,
                      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = withNorm(emb, idCol, vecCol).select(col(idCol), col("v")).mat
    // dimension from the data, not an assumed width (ANSI element_at
    // throws past the array end)
    val dim = e.select(size(col("v"))).first().getInt(0)
    // dense 0-based centroid ids via the distributed zipWithIndex helper —
    // the frame is limit(nlist) small, but a global-window row_number here
    // would still funnel it through a single partition
    var cents = graft.core.Renumber.assignIds(e.orderBy(idCol).limit(nlist))
      .select(col(graft.core.Gr.INT_ID).as("cid"), col("v").as("cv")).mat
    for (_ <- 0 until iters) {
      cents = assignFused(e, cents, idCol, Seq("v"))
        .select(col("cid"), col("v"))
        .groupBy("cid")
        .agg(array((0 until dim).map(i => avg(element_at(col("v"), i + 1))): _*).as("cv"))
        .mat
    }
    cents
  }

  /** Nearest-centroid assignment FUSED onto the corpus scan: the tiny
    * centroid table is broadcast, every (vector, centroid) dot is scored
    * map-side, and the arg-max centroid (ties → lowest cid) is taken with a
    * map-side-combined hash agg that carries the listed vector columns
    * through. ONE corpus-sized shuffle — never a corpus-sized broadcast or a
    * join back onto the corpus. */
  private def assignFused(e: DataFrame, cents: DataFrame, idCol: String,
                          carry: Seq[String]): DataFrame = {
    val scored = e.join(broadcast(cents))
      .select((col(idCol) +: carry.map(col)) :+ col("cid") :+
        dot(col("v"), col("cv")).as("d"): _*)
    scored.groupBy(col(idCol))
      .agg(min_by(col("cid"), struct((col("d") * -1).as("nd"), col("cid"))).as("cid"),
        carry.map(c => first(col(c)).as(c)): _*)
  }

  /** IVF top-k: probe the `nprobe` nearest centroid buckets per query and
    * rank exactly within them. Approximate (recall < 1) but the corpus-side
    * work is an equi-join on centroid id instead of a full scan per query. */
  def ivfTopK(emb: DataFrame, queries: DataFrame, k: Int, nlist: Int = 16, nprobe: Int = 4,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val e = withNorm(emb, idCol, vecCol).mat
    val cents = kmeansCentroids(emb, nlist, iters = 3, idCol, vecCol).mat
    val bucketed = assignFused(e, cents, idCol, Seq("v", "nrm"))
    val q = withNorm(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val qProbes = TopK.perKey(
      q.join(broadcast(cents))
        .select(col("query_id"), col("qv"), col("qn"), col("cid"),
          dot(col("qv"), col("cv")).as("d")),
      Seq("query_id"), Seq(desc("d"), col("cid")), nprobe)
      .select(col("query_id"), col("qv"), col("qn"), col("cid"))
    val scored = bucketed.join(broadcast(qProbes),
        bucketed("cid") === qProbes("cid") && col(idCol) =!= col("query_id"))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        round(cosine(col("v"), col("qv"), col("nrm"), col("qn")), 6).as("cosine"))
    TopK.perKey(scored, Seq("query_id"), Seq(desc("cosine"), col("neighbor_id")), k)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy(desc("cosine"), col("neighbor_id"))))
  }
}
