package graft.sampling

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.Gr._
import graft.prims.Mat._
import graft.pipeline.TextOps.hash60

/** Random walks (reference: `sampling/uniform_random_walks.py:15`,
  * `biased_random_walks.py:15`, `node2vec_random_walks.py:34`;
  * C++ `cpp/src/sampling/random_walks_impl.cuh`).
  *
  * Randomness contract: all draws come from the deterministic 60-bit
  * md5-derived hash of (walk id, step, candidate) — a seeded counter-mode
  * PRNG in expression form. That keeps every sampler (a) reproducible
  * across runs and cluster layouts (no rand(), no partition-dependence),
  * and (b) exactly reproducible by the DuckDB oracle. Swapping in true
  * randomness is a one-line change of the key expression.
  *
  * Scale shape: each step is one equi-join frontier⋈edges partitioned by
  * the current vertex plus a per-walker argmin (min_by aggregation — no
  * sort), so a k-step walk over any corpus is k bounded shuffles.
  */
object Walks {

  /** One uniform step: pick the neighbor minimizing the hash race. */
  private def pickUniform(cur: DataFrame, edges: DataFrame, step: Int, seed: Long): DataFrame =
    cur.join(edges, cur("vertex") === edges(SRC))
      .groupBy("walk_id")
      .agg(min_by(col(DST),
        hash60(concat_ws("|", col("walk_id"), lit(step), col(DST), lit(seed)))).as("vertex"))

  /** Uniform random walks: one row per (walk_id, step, vertex); walks stop
    * early at sinks. `starts`: (walk_id, vertex). */
  def uniform(edges: DataFrame, starts: DataFrame, maxDepth: Int, seed: Long = 42): DataFrame = {
    val e = edges.select(SRC, DST).mat
    var cur = starts.select(col("walk_id"), col("vertex")).mat
    var out = cur.withColumn("step", lit(0))
    for (t <- 1 to maxDepth) {
      cur = pickUniform(cur, e, t, seed).mat
      out = out.union(cur.withColumn("step", lit(t)))
    }
    out.select(col("walk_id"), col("step").cast("long").as("step"), col("vertex"))
  }

  /** Padded walk output (reference `random_walks` use_padding=True shape,
    * `sampling/random_walks.py`): one row per walk with a fixed-length
    * vertex array — early-terminated walks pad with -1 so every array has
    * maxDepth+1 slots, the layout GNN batch loaders consume. Wraps any
    * (walk_id, step, vertex) row output. */
  def padded(walkRows: DataFrame, maxDepth: Int): DataFrame = {
    val byWalk = walkRows.groupBy("walk_id")
      .agg(map_from_arrays(collect_list(col("step")), collect_list(col("vertex"))).as("m"))
    byWalk.select(col("walk_id"),
      array((0 to maxDepth).map(t =>
        coalesce(element_at(col("m"), lit(t.toLong)), lit(-1L))): _*).as("path"))
  }

  /** Biased (weight-proportional) walks via the A-ES exponential race:
    * key = U^(1/w) maximized, U = hash/2^60 ∈ (0,1). */
  def biased(edges: DataFrame, starts: DataFrame, maxDepth: Int, seed: Long = 42): DataFrame = {
    val e = edges.select(col(SRC), col(DST), col(WEIGHT)).mat
    var cur = starts.select(col("walk_id"), col("vertex")).mat
    var out = cur.withColumn("step", lit(0))
    for (t <- 1 to maxDepth) {
      val u = hash60(concat_ws("|", col("walk_id"), lit(t), col(DST), lit(seed)))
        .cast("double") / lit(math.pow(2, 60))
      cur = cur.join(e, cur("vertex") === e(SRC))
        .groupBy("walk_id")
        .agg(max_by(col(DST), pow(u, lit(1.0) / col(WEIGHT))).as("vertex"))
        .mat
      out = out.union(cur.withColumn("step", lit(t)))
    }
    out.select(col("walk_id"), col("step").cast("long").as("step"), col("vertex"))
  }

  /** node2vec second-order walks (p = return, q = in-out): the candidate
    * weight is w/p when the candidate is the previous vertex, w when the
    * candidate neighbors the previous vertex (adjacency membership test),
    * w/q otherwise; the draw is the same A-ES race as `biased`.
    *
    * Scale shape of the membership test, by seed-batch size. For LARGE
    * walker sets (the scale-20 probe fixture: 65k walkers ≈ 2.2M
    * candidates/step) the shuffled outer join IS the right plan — the
    * exchange of the edge table is throughput-bound and fully parallel,
    * while the alternative (broadcasting the multi-million-row candidate
    * set twice per step) serializes on single-threaded driver broadcast
    * builds: an r10 A/B measured the broadcast variant strictly slower
    * at that size, and walk loops are latency-bound (a thread dump showed
    * 32 executor threads idle around one final-agg task). For SMALL seed
    * batches (≤ 8192 starts — the typical GNN sampling batch), the
    * candidate set is counted with one scan (no shuffle: the frontier
    * join is a broadcast over the cached edge frame) and, when it fits
    * comfortably (≤ 500k rows even with hub fanout), the outer join is
    * split into matched/unmatched halves around a candidate broadcast —
    * one map-side inner join against the cached adjacency, no edge
    * exchange at all. Both regimes take their measured-better plan. */
  def node2vec(edges: DataFrame, starts: DataFrame, maxDepth: Int,
               p: Double = 1.0, q: Double = 2.0, seed: Long = 42): DataFrame = {
    val e = edges.select(col(SRC), col(DST), col(WEIGHT)).mat
    val adj = edges.select(col(SRC).as("a_src"), col(DST).as("a_dst")).mat
    // state: (walk_id, prev, vertex); first step is uniform-biased with prev = -1
    var cur = starts.select(col("walk_id"), lit(-1L).as("prev"), col("vertex")).mat
    val smallSeedSet = cur.count() <= 8192
    var out = cur.select(col("walk_id"), lit(0).as("step"), col("vertex"))
    for (t <- 1 to maxDepth) {
      val cand0 = cur.join(e, cur("vertex") === e(SRC))
        .select(col("walk_id"), cur("vertex").as("from_v"),
          col(DST), col("prev"), col(WEIGHT))
      // cand0 is cheap to recompute (a broadcast-frontier scan of the
      // cached edge frame), so the small-regime count costs one scan job
      // and no checkpoint
      val nCand = if (smallSeedSet) cand0.count() else Long.MaxValue
      val withMembership =
        if (nCand <= 500000L) {
          val c0 = cand0.mat
          // the matched-key set is deduped to (walk_id, dst) before the
          // re-attach: on a multigraph both the adjacency and the candidate
          // stream carry duplicate rows, and an un-deduped matched set
          // would multiply candidates quadratically in the duplicate-edge
          // count (ADVICE r10 — picks were identical since duplicates share
          // race keys, but the per-step row volume inflated). distinct() on
          // ≤500k broadcast-bound rows is one cheap hash-agg.
          val matched = adj.join(
              broadcast(c0.select(col("walk_id"), col("prev"), col(DST))),
              col("a_src") === col("prev") && col("a_dst") === col(DST))
            .select(col("walk_id"), col(DST), lit(true).as("in_adj"))
            .distinct()
          c0.join(broadcast(matched), Seq("walk_id", DST), "left")
            .select(col("walk_id"), col("from_v"), col(DST), col("prev"), col(WEIGHT),
              col("in_adj"))
        } else
          cand0.join(adj, col("prev") === col("a_src") && col(DST) === col("a_dst"), "left")
            .select(col("walk_id"), col("from_v"), col(DST), col("prev"), col(WEIGHT),
              col("a_dst").isNotNull.as("in_adj"))
      val cand = withMembership
        .select(col("walk_id"), col("from_v"), col(DST), col("prev"),
          (col(WEIGHT) * when(col(DST) === col("prev"), lit(1.0 / p))
            .when(coalesce(col("in_adj"), lit(false)), lit(1.0))
            .otherwise(lit(1.0 / q))).as("w2"))
      val u = hash60(concat_ws("|", col("walk_id"), lit(t), col(DST), lit(seed)))
        .cast("double") / lit(math.pow(2, 60))
      cur = cand.groupBy("walk_id")
        .agg(max_by(struct(col("from_v"), col(DST)), pow(u, lit(1.0) / col("w2"))).as("pick"))
        .select(col("walk_id"), col("pick.from_v").as("prev"), col(s"pick.$DST").as("vertex"))
        .mat
      out = out.union(cur.select(col("walk_id"), lit(t).as("step"), col("vertex")))
    }
    out.select(col("walk_id"), col("step").cast("long").as("step"), col("vertex"))
  }
}
