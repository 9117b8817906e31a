package graft.sampling

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Gr._
import graft.prims.Mat._
import graft.pipeline.TextOps.hash60

/** GNN mini-batch neighbor sampling (reference:
  * `sampling/homogeneous_neighbor_sample.py:44`,
  * `heterogeneous_neighbor_sample.py:44`, temporal variants
  * `sampling_functions.hpp:505-872`, negative sampling `:1417`;
  * C++ `cpp/src/sampling/neighbor_sampling_impl.cuh`).
  *
  * Per hop h with fanout f[h]: frontier ⋈ edges (equi-join on src), then
  * keep f[h] edges per source via the canonical window row_number pattern
  * ordered by the deterministic hash race — THE top-k-per-key Spark shape.
  * Deterministic hash randomness (see Walks) makes every sampler exactly
  * oracle-checkable; `prior_sources_behavior`/dedup options are the
  * distinct/anti-join steps noted inline.
  */
object NeighborSampling {

  private def sampleHop(frontier: DataFrame, edges: DataFrame, hop: Int, fanout: Int,
                        seed: Long, partitionExtra: Seq[String] = Nil): DataFrame = {
    val joined = frontier.join(edges, frontier("vertex") === edges(SRC))
    val w = Window
      .partitionBy((Seq("batch_id", SRC) ++ partitionExtra).map(col): _*)
      .orderBy(hash60(concat_ws("|", col("batch_id"), lit(hop), col(SRC), col(DST), lit(seed))))
    joined.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= fanout)
      .select(col("batch_id"), lit(hop).as("hop"), col(SRC), col(DST))
  }

  /** Homogeneous uniform neighbor sampling. `seeds`: (batch_id, vertex);
    * output: (batch_id, hop, src, dst). deduplicate_sources = the distinct
    * on the next frontier (reference's `deduplicate_sources=True`);
    * `priorSourcesBehavior="exclude"` anti-joins vertices already used as
    * sources out of later frontiers (reference's `prior_sources_behavior`;
    * the default "carryover" keeps them). */
  def homogeneous(edges: DataFrame, seeds: DataFrame, fanouts: Seq[Int],
                  seed: Long = 42, priorSourcesBehavior: String = "carryover"): DataFrame = {
    val e = edges.select(SRC, DST).mat
    var frontier = seeds.select(col("batch_id"), col("vertex")).mat
    var prior = frontier
    var out: DataFrame = null
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val sampled = sampleHop(frontier, e, h, f, seed).mat
      out = if (out == null) sampled else out.union(sampled)
      val next0 = sampled.select(col("batch_id"), col(DST).as("vertex")).distinct()
      if (priorSourcesBehavior == "exclude") {
        frontier = next0.join(prior, Seq("batch_id", "vertex"), "left_anti").mat
        prior = prior.union(frontier).mat
      } else frontier = next0.mat
    }
    out.select(col("batch_id"), col("hop").cast("long").as("hop"), col(SRC), col(DST))
  }

  /** Weight-biased homogeneous sampling (reference `with_biases` /
    * biased_neighbor_sample): per hop, the f neighbors of each source are
    * drawn WITHOUT replacement with probability ∝ edge weight via the A-ES
    * exponential race — top-f by u^(1/w) descending (deterministic, same
    * machinery as Walks.biased). `edges` must carry `weight`. */
  def homogeneousBiased(edges: DataFrame, seeds: DataFrame, fanouts: Seq[Int],
                        seed: Long = 42): DataFrame = {
    val e = edges.select(col(SRC), col(DST), col(WEIGHT)).mat
    var frontier = seeds.select(col("batch_id"), col("vertex")).mat
    var out: DataFrame = null
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val joined = frontier.join(e, frontier("vertex") === e(SRC))
      val u = hash60(concat_ws("|", col("batch_id"), lit(h), col(SRC), col(DST), lit(seed)))
        .cast("double") / lit(math.pow(2, 60))
      val w = Window.partitionBy(col("batch_id"), col(SRC))
        .orderBy(pow(u, lit(1.0) / col(WEIGHT)).desc, col(DST))
      val sampled = joined.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= f)
        .select(col("batch_id"), lit(h).as("hop"), col(SRC), col(DST))
        .mat
      out = if (out == null) sampled else out.union(sampled)
      frontier = sampled.select(col("batch_id"), col(DST).as("vertex")).distinct().mat
    }
    out.select(col("batch_id"), col("hop").cast("long").as("hop"), col(SRC), col(DST))
  }

  /** With-replacement fanout sampling: slot s of vertex v draws neighbor
    * arg-min over the hash keyed by (batch, hop, src, slot, dst) — f
    * independent draws per source, duplicates allowed (reference
    * `with_replacement=True`). */
  def homogeneousWithReplacement(edges: DataFrame, seeds: DataFrame, fanouts: Seq[Int],
                                 seed: Long = 42): DataFrame = {
    val e = edges.select(SRC, DST).mat
    var frontier = seeds.select(col("batch_id"), col("vertex")).mat
    var out: DataFrame = null
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val slots = frontier.select(col("batch_id"), col("vertex"),
        explode(sequence(lit(0), lit(f - 1))).as("slot"))
      val sampled = slots.join(e, slots("vertex") === e(SRC))
        .groupBy(col("batch_id"), col(SRC), col("slot"))
        .agg(min_by(col(DST),
          hash60(concat_ws("|", col("batch_id"), lit(h), col(SRC), col("slot"), col(DST), lit(seed)))).as(DST))
        .select(col("batch_id"), lit(h).as("hop"), col(SRC), col("slot"), col(DST))
        .mat
      out = if (out == null) sampled else out.union(sampled)
      frontier = sampled.select(col("batch_id"), col(DST).as("vertex")).distinct().mat
    }
    out.select(col("batch_id"), col("hop").cast("long").as("hop"),
      col(SRC), col("slot").cast("long").as("slot"), col(DST))
  }

  /** Heterogeneous sampling: per-edge-type fanouts — the window partition
    * gains the edge-type key, everything else is the same pipeline.
    * `fanouts`: edgeType -> per-hop fanout list (all same length). */
  def heterogeneous(edges: DataFrame, seeds: DataFrame, fanouts: Map[Int, Seq[Int]],
                    seed: Long = 42): DataFrame = {
    val e = edges.select(col(SRC), col(DST), col("edge_type")).mat
    val nHops = fanouts.values.head.size
    var frontier = seeds.select(col("batch_id"), col("vertex")).mat
    var out: DataFrame = null
    for (h <- 0 until nHops) {
      val joined = frontier.join(e, frontier("vertex") === e(SRC))
      val fanoutCol = fanouts.foldLeft(lit(0)) { case (acc, (t, fs)) =>
        when(col("edge_type") === t, lit(fs(h))).otherwise(acc)
      }
      val w = Window.partitionBy(col("batch_id"), col(SRC), col("edge_type"))
        .orderBy(hash60(concat_ws("|", col("batch_id"), lit(h), col(SRC), col(DST), lit(seed))))
      val sampled = joined.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= fanoutCol)
        .select(col("batch_id"), lit(h).as("hop"), col(SRC), col(DST), col("edge_type"))
        .mat
      out = if (out == null) sampled else out.union(sampled)
      frontier = sampled.select(col("batch_id"), col(DST).as("vertex")).distinct().mat
    }
    out.select(col("batch_id"), col("hop").cast("long").as("hop"),
      col(SRC), col(DST), col("edge_type"))
  }

  /** Temporal sampling: each sampled edge must be strictly newer than the
    * edge that reached its source (time-respecting paths). Seeds carry
    * time 0. `edges` must have a `t` column. */
  def temporal(edges: DataFrame, seeds: DataFrame, fanouts: Seq[Int],
               seed: Long = 42): DataFrame = {
    val e = edges.select(col(SRC), col(DST), col("t")).mat
    var frontier = seeds.select(col("batch_id"), col("vertex"), lit(-1L).as("t_in")).mat
    var out: DataFrame = null
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val joined = frontier.join(e,
        frontier("vertex") === e(SRC) && col("t") > col("t_in"))
      val w = Window.partitionBy(col("batch_id"), col(SRC), col("t_in"))
        .orderBy(hash60(concat_ws("|", col("batch_id"), lit(h), col(SRC), col(DST), lit(seed))))
      val sampled = joined.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= f)
        .select(col("batch_id"), lit(h).as("hop"), col(SRC), col(DST), col("t"))
        .mat
      out = if (out == null) sampled else out.union(sampled)
      frontier = sampled
        .groupBy(col("batch_id"), col(DST).as("vertex")).agg(min("t").as("t_in")).mat
    }
    out.select(col("batch_id"), col("hop").cast("long").as("hop"),
      col(SRC), col(DST), col("t"))
  }

  /** Windowed temporal sampling (reference `sampling_functions.hpp:421-469`
    * seed-window options: `starting_vertex_start_times` /
    * `starting_vertex_end_times` + the decreasing-time walk direction):
    * each seed may carry optional `start_time` / `end_time` columns (NULL =
    * unbounded on that side) that bound EVERY sampled edge time to the
    * closed window [start, end] for the whole walk. `decreasing = true`
    * walks backwards in time — the hop-0 frontier originates at the
    * window's upper bound and each hop's edge is strictly OLDER than the
    * edge that reached its source (the reference's
    * STRICTLY_DECREASING direction); increasing walks originate at the
    * lower bound with strictly newer edges, exactly [[temporal]]'s rule.
    *
    * Scale shape: the per-seed window table is per-batch metadata — tiny
    * next to the edge table — so it re-attaches to each hop's frontier
    * with a broadcast join; the per-hop work stays the one frontier ⋈
    * edges equi-join + per-source top-f window of the base sampler. */
  def temporalWindowed(edges: DataFrame, seeds: DataFrame, fanouts: Seq[Int],
                       seed: Long = 42, decreasing: Boolean = false): DataFrame = {
    val e = edges.select(col(SRC), col(DST), col("t")).mat
    // out-of-band sentinels for NULL (unbounded) window sides: keeps the
    // join predicate a plain range test, no null-logic in the hot path
    val LO = -4611686018427387904L
    val HI = 4611686018427387904L
    val win = seeds.select(col("batch_id"),
      coalesce(col("start_time"), lit(LO)).as("t_lo"),
      coalesce(col("end_time"), lit(HI)).as("t_hi")).distinct().mat
    val t0 = if (decreasing) HI else LO
    var frontier = seeds.select(col("batch_id"), col("vertex"), lit(t0).as("t_in"))
      .join(broadcast(win), "batch_id").mat
    var out: DataFrame = null
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val mono = if (decreasing) col("t") < col("t_in") else col("t") > col("t_in")
      val joined = frontier.join(e,
        frontier("vertex") === e(SRC) && mono &&
          col("t") >= col("t_lo") && col("t") <= col("t_hi"))
      val w = Window.partitionBy(col("batch_id"), col(SRC), col("t_in"))
        .orderBy(hash60(concat_ws("|", col("batch_id"), lit(h), col(SRC), col(DST), lit(seed))))
      val sampled = joined.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= f)
        .select(col("batch_id"), lit(h).as("hop"), col(SRC), col(DST), col("t"))
        .mat
      out = if (out == null) sampled else out.union(sampled)
      // per-(batch, vertex) frontier time: the most PERMISSIVE arrival —
      // min for increasing (t > t_in), max for decreasing (t < t_in) —
      // mirroring [[temporal]]'s min(t) convention
      val nextT = if (decreasing) max("t") else min("t")
      frontier = sampled
        .groupBy(col("batch_id"), col(DST).as("vertex")).agg(nextT.as("t_in"))
        .join(broadcast(win), "batch_id").mat
    }
    out.select(col("batch_id"), col("hop").cast("long").as("hop"),
      col(SRC), col(DST), col("t"))
  }

  /** Biased temporal sampling (reference `sampling_functions.hpp:624`):
    * the time-respecting constraint of [[temporal]], with neighbor
    * selection weight-biased via the A-ES race — top-f per source by
    * u^(1/w) descending (the same exponential race as Walks.biased, so
    * the draw is deterministic and oracle-reproducible). `edges` must
    * carry `t` and `weight`. */
  def temporalBiased(edges: DataFrame, seeds: DataFrame, fanouts: Seq[Int],
                     seed: Long = 42): DataFrame = {
    val e = edges.select(col(SRC), col(DST), col("t"), col(WEIGHT)).mat
    var frontier = seeds.select(col("batch_id"), col("vertex"), lit(-1L).as("t_in")).mat
    var out: DataFrame = null
    fanouts.zipWithIndex.foreach { case (f, h) =>
      val joined = frontier.join(e,
        frontier("vertex") === e(SRC) && col("t") > col("t_in"))
      val u = hash60(concat_ws("|", col("batch_id"), lit(h), col(SRC), col(DST), lit(seed)))
        .cast("double") / lit(math.pow(2, 60))
      val key = pow(u, lit(1.0) / col(WEIGHT))
      val w = Window.partitionBy(col("batch_id"), col(SRC), col("t_in"))
        .orderBy(key.desc, col(DST))
      val sampled = joined.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= f)
        .select(col("batch_id"), lit(h).as("hop"), col(SRC), col(DST), col("t"))
        .mat
      out = if (out == null) sampled else out.union(sampled)
      frontier = sampled
        .groupBy(col("batch_id"), col(DST).as("vertex")).agg(min("t").as("t_in")).mat
    }
    out.select(col("batch_id"), col("hop").cast("long").as("hop"),
      col(SRC), col(DST), col("t"))
  }

  /** Heterogeneous temporal sampling (reference `sampling_functions.hpp:746`
    * family): per-edge-type fanouts under the time-respecting constraint —
    * the window partition gains the edge-type key. */
  def temporalHeterogeneous(edges: DataFrame, seeds: DataFrame,
                            fanouts: Map[Int, Seq[Int]], seed: Long = 42): DataFrame = {
    val e = edges.select(col(SRC), col(DST), col("t"), col("edge_type")).mat
    val nHops = fanouts.values.head.size
    var frontier = seeds.select(col("batch_id"), col("vertex"), lit(-1L).as("t_in")).mat
    var out: DataFrame = null
    for (h <- 0 until nHops) {
      val joined = frontier.join(e,
        frontier("vertex") === e(SRC) && col("t") > col("t_in"))
      val fanoutCol = fanouts.foldLeft(lit(0)) { case (acc, (t, fs)) =>
        when(col("edge_type") === t, lit(fs(h))).otherwise(acc)
      }
      val w = Window.partitionBy(col("batch_id"), col(SRC), col("t_in"), col("edge_type"))
        .orderBy(hash60(concat_ws("|", col("batch_id"), lit(h), col(SRC), col(DST), lit(seed))))
      val sampled = joined.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= fanoutCol)
        .select(col("batch_id"), lit(h).as("hop"), col(SRC), col(DST), col("t"), col("edge_type"))
        .mat
      out = if (out == null) sampled else out.union(sampled)
      frontier = sampled
        .groupBy(col("batch_id"), col(DST).as("vertex")).agg(min("t").as("t_in")).mat
    }
    out.select(col("batch_id"), col("hop").cast("long").as("hop"),
      col(SRC), col(DST), col("t"), col("edge_type"))
  }

  /** Heterogeneous BIASED temporal sampling (reference
    * `sampling_functions.hpp:872`, the fourth temporal entry point):
    * per-edge-type fanouts under the time-respecting constraint with
    * neighbor selection weight-biased via the A-ES race key u^(1/w)
    * descending — the composition of [[temporalHeterogeneous]]'s typed
    * partition and [[temporalBiased]]'s ordering. `edges` must carry
    * `t`, `weight` and `edge_type`. */
  def temporalHeterogeneousBiased(edges: DataFrame, seeds: DataFrame,
                                  fanouts: Map[Int, Seq[Int]],
                                  seed: Long = 42): DataFrame = {
    val e = edges.select(col(SRC), col(DST), col("t"), col(WEIGHT), col("edge_type")).mat
    val nHops = fanouts.values.head.size
    var frontier = seeds.select(col("batch_id"), col("vertex"), lit(-1L).as("t_in")).mat
    var out: DataFrame = null
    for (h <- 0 until nHops) {
      val joined = frontier.join(e,
        frontier("vertex") === e(SRC) && col("t") > col("t_in"))
      val fanoutCol = fanouts.foldLeft(lit(0)) { case (acc, (t, fs)) =>
        when(col("edge_type") === t, lit(fs(h))).otherwise(acc)
      }
      val u = hash60(concat_ws("|", col("batch_id"), lit(h), col(SRC), col(DST), lit(seed)))
        .cast("double") / lit(math.pow(2, 60))
      val key = pow(u, lit(1.0) / col(WEIGHT))
      val w = Window.partitionBy(col("batch_id"), col(SRC), col("t_in"), col("edge_type"))
        .orderBy(key.desc, col(DST))
      val sampled = joined.withColumn("_rn", row_number().over(w))
        .filter(col("_rn") <= fanoutCol)
        .select(col("batch_id"), lit(h).as("hop"), col(SRC), col(DST), col("t"), col("edge_type"))
        .mat
      out = if (out == null) sampled else out.union(sampled)
      frontier = sampled
        .groupBy(col("batch_id"), col(DST).as("vertex")).agg(min("t").as("t_in")).mat
    }
    out.select(col("batch_id"), col("hop").cast("long").as("hop"),
      col(SRC), col(DST), col("t"), col("edge_type"))
  }

  /** Negative sampling: `n` deterministic pseudo-random candidate pairs
    * drawn from the vertex list (dense index = rank in sorted id order,
    * picked by the hash), minus existing edges (anti-join) and self-loops.
    * Output: (sample_id, src, dst). The index is assigned with
    * zipWithIndex over the SORTED vertex set (range-partitioned sort →
    * global sorted rank) — same mapping as a global-window row_number but
    * distributed instead of funneling all vertices through one partition. */
  def negative(edges: DataFrame, vertices: DataFrame, n: Int, seed: Long = 42): DataFrame = {
    val idx = graft.core.Renumber.assignIds(vertices.select(col(ID)).orderBy(ID))
      .withColumnRenamed(INT_ID, "i").mat
    val nV = idx.count()
    val spark = edges.sparkSession
    val cand = spark.range(n).select(col("id").as("sample_id"))
      .withColumn("si", pmod(hash60(concat_ws("|", lit("ns"), col("sample_id"), lit(0), lit(seed))), lit(nV)))
      .withColumn("di", pmod(hash60(concat_ws("|", lit("ns"), col("sample_id"), lit(1), lit(seed))), lit(nV)))
      .join(idx.select(col("i").as("si"), col(ID).as(SRC)), "si")
      .join(idx.select(col("i").as("di"), col(ID).as(DST)), "di")
      .filter(col(SRC) =!= col(DST))
      .select(col("sample_id"), col(SRC), col(DST))
    cand.join(edges.select(SRC, DST), Seq(SRC, DST), "left_anti")
      .select(col("sample_id"), col(SRC), col(DST))
  }

  /** Sampled-output post-processing (reference `sampling_functions.hpp:992`
    * renumber_and_compress_sampled_edgelist; py `sampling_utilities.py:8`):
    * per-batch dense renumbering of the sampled edge list — each batch's
    * distinct vertices get ids [0, n_batch) in sorted order via a
    * per-batch dense_rank, and the edges are rewritten onto them. */
  def renumberSampled(sampled: DataFrame): DataFrame = {
    val verts = sampled.select(col("batch_id"), col(SRC).as("v"))
      .union(sampled.select(col("batch_id"), col(DST).as("v")))
      .distinct()
    val ranked = verts.withColumn("r",
      dense_rank().over(Window.partitionBy("batch_id").orderBy("v")) - 1)
    sampled
      .join(ranked.select(col("batch_id"), col("v").as(SRC), col("r").as("src_r")),
        Seq("batch_id", SRC))
      .join(ranked.select(col("batch_id"), col("v").as(DST), col("r").as("dst_r")),
        Seq("batch_id", DST))
      .select(col("batch_id"), col("hop"), col(SRC), col(DST),
        col("src_r").cast("long").as("src_r"), col("dst_r").cast("long").as("dst_r"))
  }

  /** CSR compression of a renumbered sampled edge list (reference
    * `renumber_and_compress_sampled_edgelist`,
    * `sampling_functions.hpp:992`, `compression=CSR`): per batch, edges
    * sorted by (hop, src_r, dst_r) receive their dense CSR position; the
    * per-source offset array is the running count, recoverable as
    * min(pos) per (batch, hop, src_r). Output: (batch_id, hop, src_r,
    * dst_r, pos). */
  def compressSampled(renumbered: DataFrame): DataFrame =
    renumbered
      .withColumn("pos",
        row_number().over(Window.partitionBy("batch_id")
          .orderBy(col("hop"), col("src_r"), col("dst_r"))) - 1)
      .select(col("batch_id"), col("hop"), col("src_r"), col("dst_r"),
        col("pos").cast("long").as("pos"))

  /** Offset-array view of the compressed sampled output — the reference's
    * remaining compression formats (`sampling_functions.hpp:919-983`:
    * `src_is_major` picks CSR/DCSR vs CSC/DCSC, `doubly_compress` picks
    * dense-offsets vs majors-with-neighbors-only). Relational encoding:
    * one row per offset-array slot, per batch —
    * `doubly=true` (DCSR/DCSC): only majors with ≥1 sampled edge, with
    * their running offset and degree; `doubly=false` (CSR/CSC): major ids
    * densified to [0, max major] per batch, zero-degree majors carrying
    * the running offset (the offsets array is non-decreasing and directly
    * reconstructable). Offsets follow major_r order — consistent with
    * [[compressSampled]]'s pos for the per-batch (vertex-sorted) renumber
    * convention of [[renumberSampled]].
    * Output: (batch_id, major_r, offset_start, degree). */
  def compressSampledOffsets(renumbered: DataFrame, srcIsMajor: Boolean = true,
                             doublyCompress: Boolean = true): DataFrame = {
    val major = if (srcIsMajor) col("src_r") else col("dst_r")
    val deg = renumbered.groupBy(col("batch_id"), major.as("major_r"))
      .agg(count(lit(1)).cast("long").as("degree"))
    val w = Window.partitionBy("batch_id").orderBy("major_r")
      .rowsBetween(Window.unboundedPreceding, -1)
    val slots =
      if (doublyCompress) deg
      else {
        // densify to every major id in [0, max major] per batch: the CSR/
        // CSC offset array has one slot per vertex id, holes included.
        // Per-batch fan-out is bounded by the batch's sample size — scale
        // lives in the number of batches, not the per-batch array.
        val dense = renumbered.groupBy("batch_id").agg(max(major).as("mx"))
          .select(col("batch_id"),
            explode(sequence(lit(0L), col("mx"))).as("major_r"))
        dense.join(deg, Seq("batch_id", "major_r"), "left")
          .select(col("batch_id"), col("major_r"),
            coalesce(col("degree"), lit(0L)).as("degree"))
      }
    slots.withColumn("offset_start",
        coalesce(sum("degree").over(w), lit(0L)).cast("long"))
      .select(col("batch_id"), col("major_r").cast("long").as("major_r"),
        col("offset_start"), col("degree"))
  }

  /** Per-batch renumber MAP with the reference's `retain_seeds` semantics
    * (`homogeneous_neighbor_sample.py:44-120`): every seed of the batch is
    * kept in the map even if it sampled no edges, and seeds occupy the
    * FIRST dense ids (sorted), followed by the remaining sampled vertices
    * (sorted) — the vertex order GNN dataloaders rely on.
    * `seeds`: (batch_id, vertex). Output: (batch_id, v, r, is_seed). */
  def renumberMapRetainSeeds(sampled: DataFrame, seeds: DataFrame): DataFrame = {
    val sampledVerts = sampled.select(col("batch_id"), col(SRC).as("v"))
      .union(sampled.select(col("batch_id"), col(DST).as("v")))
      .distinct()
    val seedVerts = seeds.select(col("batch_id"), col("vertex").as("v"))
    val tagged = seedVerts.withColumn("is_seed", lit(true))
      .union(sampledVerts.join(seedVerts, Seq("batch_id", "v"), "left_anti")
        .withColumn("is_seed", lit(false)))
    tagged.withColumn("r",
        (dense_rank().over(Window.partitionBy("batch_id")
          .orderBy(col("is_seed").desc, col("v"))) - 1).cast("long"))
      .select(col("batch_id"), col("v"), col("r"), col("is_seed"))
  }

  /** Degree-biased negative sampling (reference `sampling_functions.hpp:1417`
    * src_bias/dst_bias): drawing a uniform random EDGE index and keeping its
    * endpoint is exactly endpoint-degree-proportional sampling — so both
    * draws reuse the distributed zipWithIndex edge index instead of a
    * vertex-weight prefix-sum + range join. src ∝ out-degree via a source
    * draw, dst ∝ in-degree via an independent destination draw; existing
    * edges and self-loops are rejected. Output: (sample_id, src, dst). */
  def negativeBiased(edges: DataFrame, n: Int, seed: Long = 42): DataFrame = {
    val eIdx = graft.core.Renumber.assignIds(
        edges.select(SRC, DST).distinct().orderBy(SRC, DST))
      .withColumnRenamed(INT_ID, "i").mat
    val nE = eIdx.count()
    val spark = edges.sparkSession
    val cand = spark.range(n).select(col("id").as("sample_id"))
      .withColumn("si", pmod(hash60(concat_ws("|", lit("nb"), col("sample_id"), lit(0), lit(seed))), lit(nE)))
      .withColumn("di", pmod(hash60(concat_ws("|", lit("nb"), col("sample_id"), lit(1), lit(seed))), lit(nE)))
    cand
      .join(eIdx.select(col("i").as("si"), col(SRC)), "si")
      .join(eIdx.select(col("i").as("di"), col(DST).as("_d")), "di")
      .select(col("sample_id"), col(SRC), col("_d").as(DST))
      .filter(col(SRC) =!= col(DST))
      .join(edges.select(SRC, DST).distinct(), Seq(SRC, DST), "left_anti")
      .select(col("sample_id"), col(SRC), col(DST))
  }

  /** Uniform vertex sample without replacement (reference
    * `select_random_vertices`): the k vertices minimizing the seeded hash.
    * orderBy+limit plans as TakeOrderedAndProject — per-partition top-k then
    * a k-row driver merge, never a single-partition global sort/window. */
  def selectRandomVertices(vertices: DataFrame, k: Int, seed: Long = 42): DataFrame =
    vertices.select(col(ID))
      .orderBy(hash60(concat_ws("|", lit("srv"), col(ID), lit(seed))), col(ID))
      .limit(k)
      .select(ID)
}
