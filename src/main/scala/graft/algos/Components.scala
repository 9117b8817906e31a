package graft.algos

import graft.prims.Mat._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{PropertyGraph, Structure, Gr}
import graft.prims.Iterate

/** Connected components, core decomposition, and related fixpoint programs.
  *
  * Reference: `components/weakly_connected_components_impl.cuh` (WCC),
  * `cores/core_number_impl.cuh` (peeling), `cores/k_core_impl.cuh`.
  */
object Components {
  import Gr._

  /** Weakly connected components — min-label propagation to fixpoint.
    * Reference `components/connectivity.py:86`. Label = smallest vertex id
    * in the component. Each round: one aggregate-messages shuffle; rounds ≤
    * graph diameter. For power-law graphs diameter is small; for
    * pathological chains the large-star/small-star variant would bound
    * rounds at O(log V) — diameter loops suffice for our workloads and the
    * loop is lineage-checkpointed either way.
    * @return DataFrame(id, component). */
  def wcc(g: PropertyGraph, maxIter: Int = 50): DataFrame = wccWithRounds(g, maxIter)._1

  /** WCC returning (labels, roundsUntilFixpoint). The round count lets oracle
    * queries ASSERT the Spark side converged within the oracle's unrolled
    * budget instead of silently relying on a low-diameter fixture.
    *
    * Label propagation costs one shuffle per round but needs O(diameter)
    * rounds — ideal for the power-law graphs this engine mostly sees. If
    * the diameter exceeds `starSwitch`, the loop abandons propagation and
    * restarts with [[wccStar]], whose round count is O(log² V) regardless
    * of diameter (pathological chains, lattices). */
  /** `assumeSymmetric`: the caller guarantees both directions of every
    * edge are present — the symmetrize shuffle (a full distinct of the
    * edge set) and its materialized copy are skipped; the edge frame is
    * materialized as-is for the round loop. */
  def wccWithRounds(g: PropertyGraph, maxIter: Int = 50,
                    starSwitch: Int = 12,
                    assumeSymmetric: Boolean = false): (DataFrame, Int) = {
    val und = (if (assumeSymmetric) g.edges.select(SRC, DST)
               else Structure.symmetrize(g.edges.select(SRC, DST))).mat
    val init = g.vertices.select(col(ID), col(ID).as("component"))
    val nV = g.vertices.count()
    var changed = 1L
    var labels = init.mat
    var it = 0
    // AQE off under the broadcast gate — both per-round joins are
    // Hint.state-hinted (prims.Aqe scaladoc)
    def loops[T](body: => T): T =
      if (nV <= 5000000L) graft.prims.Aqe.off(und.sparkSession, nV)(body) else body
    loops {
    while (changed > 0 && it < math.min(maxIter, starSwitch)) {
      it += 1
      val nbrMin = und.join(graft.prims.Hint.state(labels.withColumnRenamed(ID, SRC), nV), SRC)
        .groupBy(col(DST).as(ID)).agg(min("component").as("nbr_min"))
      // the convergence count rides the materialization job (observe
      // metric) — one job per round, no separate count scan.
      // labels ⋈ nbrMin is V-row × V-row (r11-opt): un-hinted — a
      // broadcast of nbrMin bought no scan-in-place of a bigger side and
      // cost one build job per round; the plain join rides the
      // materialize job at the scoped width.
      val (joined, ch) = graft.prims.Iterate.materializeCount(
        labels.join(nbrMin, Seq(ID), "left")
          .select(col(ID), col("component").as("old"),
            least(col("component"), coalesce(col("nbr_min"), col("component"))).as("component")),
        sum(when(col("component") < col("old"), 1L).otherwise(0L)),
        _.filter(col("component") < col("old")).count())
      changed = ch
      // old labels fed the materialization above — free their blocks now
      // instead of holding rounds × V rows (prims.Release scaladoc)
      graft.prims.Release.free(labels)
      labels = joined.select(col(ID), col("component"))
    }
    }
    if (changed > 0) {
      // still moving after `starSwitch` sweeps — the diameter is large;
      // switch to the star-contraction algorithm (it re-reads g.edges, not
      // this frame, so the propagation state and edge copy are dead)
      graft.prims.Release.free(labels, und)
      val (starLabels, starRounds) = wccStar(g, maxIter)
      return (starLabels, it + starRounds)
    }
    // the symmetrized edge copy is dead (the returned labels are
    // materialized); `it` counts rounds incl. the no-change confirmation
    graft.prims.Release.free(und)
    (labels, it)
  }

  /** Large-star/small-star WCC (Kiveris, Lattanzi, Mirrokni, Rastogi,
    * Vassilvitskii — "Connected Components in MapReduce and Beyond",
    * SoCC'14): alternately hang every large neighbor of a vertex under its
    * minimum neighbor (large-star) and fold the small side into it
    * (small-star) until the edge set is a star forest — O(log² V) rounds
    * on ANY topology, each round two groupBy+join shuffles over the pair
    * set, which shrinks monotonically toward one edge per non-root vertex.
    * @return (DataFrame(id, component), rounds). */
  def wccStar(g: PropertyGraph, maxIter: Int = 50): (DataFrame, Int) = {
    var pairs = Structure.canonicalize(
      Structure.symmetrize(g.edges.select(SRC, DST))).select(SRC, DST).mat
    var nPairs = pairs.count()
    var it = 0
    var done = nPairs == 0
    // AQE off for the star rounds when the initial pair set clears the
    // broadcast gate (pairs never grow under star contraction, so the
    // per-round st() gate below stays satisfiable): every join inside is
    // then explicitly broadcast-hinted and AQE's per-exchange stage jobs
    // are pure scheduler floor — see prims.Aqe.
    def loops[T](body: => T): T =
      if (nPairs <= 2500000L) graft.prims.Aqe.off(pairs.sparkSession, nPairs)(body) else body
    loops {
    while (!done && it < maxIter) {
      it += 1
      // large-star: per vertex u, m = min(u, N(u)); every neighbor v > u
      // re-hangs onto m. No dedup here — the min-aggregations downstream
      // are duplicate-insensitive and the round's final distinct restores
      // set semantics; an intermediate distinct was a whole extra shuffle
      // per round on the round-dominated cost profile.
      // per-vertex min maps are the SAME magnitude as the pair set they
      // join (≤ 2× current pairs) — un-hinted plain joins at the scoped
      // width (r11-opt): a broadcast of a same-sized side bought no
      // scan-in-place and cost two build jobs per star round; both joins
      // now ride the materialize job.
      val adj = pairs.select(SRC, DST)
        .union(pairs.select(col(DST).as(SRC), col(SRC).as(DST)))
      val mMap = adj.groupBy(SRC).agg(min(DST).as("mn"))
        .select(col(SRC), least(col("mn"), col(SRC)).as("m"))
      val ls = adj.filter(col(DST) > col(SRC)).join(mMap, SRC)
        .filter(col(DST) =!= col("m"))
        .select(least(col(DST), col("m")).as(SRC), greatest(col(DST), col("m")).as(DST))
      // small-star: per vertex hi over its smaller neighbors, everything
      // (including hi) folds onto the minimum
      val hiAdj = ls.select(col(DST).as("hi"), col(SRC).as("lo"))
      val sMin = hiAdj.groupBy("hi").agg(min("lo").as("m"))
      val (ss, nNew) = graft.prims.Iterate.materializeCount(
        hiAdj.join(sMin, "hi")
          .select(col("lo").as(SRC), col("m").as(DST))
          .filter(col(SRC) =!= col(DST))
          .select(least(col(SRC), col(DST)).as(SRC), greatest(col(SRC), col(DST)).as(DST))
          .union(sMin.select(col("m").as(SRC), col("hi").as(DST)))
          .distinct(),
        count(lit(1)), _.count())
      // fixpoint: the pair set reproduces itself (star forest); the
      // exceptAll job only runs once counts stop changing
      done = nNew == nPairs && ss.exceptAll(pairs).isEmpty
      // the fixpoint check above was the old pair set's last read
      graft.prims.Release.free(pairs)
      pairs = ss
      nPairs = nNew
    }
    }
    // star forest: each edge is (root, v) with root = component minimum
    val comp = pairs.select(col(DST).as(ID), col(SRC).as("component"))
      .union(pairs.select(col(SRC).as(ID), col(SRC).as("component")))
      .groupBy(ID).agg(min("component").as("component"))
    val labels = g.vertices.select(ID).join(comp, Seq(ID), "left")
      .select(col(ID), coalesce(col("component"), col(ID)).as("component"))
    (labels, it)
  }

  /** Core number per vertex — iterative peeling (reference
    * `cores/core_number.py:10`, impl `core_number_impl.cuh`). Works on the
    * symmetrized graph (degree_type=BIDIRECTIONAL default). k-bucketed
    * peeling: repeatedly remove all vertices with degree < k, incrementing k
    * when the graph is k-stable. Each round is a degree agg + semi-join.
    * @return DataFrame(id, core_number). */
  def coreNumber(g: PropertyGraph, maxK: Int = Int.MaxValue,
                 degreeType: String = "bidirectional"): DataFrame =
    coreNumberWithStats(g, maxK, degreeType)._1

  /** Core numbers plus peel statistics: (labels, max core value assigned,
    * max cascade delete-rounds within any stage). The stats let oracle
    * queries ASSERT the DuckDB unroll (per-k cascade) covered the real
    * peel instead of silently relying on fixture shape.
    *
    * `degreeType` follows the reference (`core_number.py:10`):
    * "bidirectional" peels the symmetrized simple graph by undirected
    * degree; "incoming"/"outgoing" peel the DIRECTED simple graph by
    * in-/out-degree (a deleted vertex still takes all its incident edges
    * with it, both directions). */
  def coreNumberWithStats(g: PropertyGraph, maxK: Int = Int.MaxValue,
                          degreeType: String = "bidirectional"): (DataFrame, Int, Int) = {
    val spark = g.spark
    import spark.implicits._
    def degOf(e: DataFrame): DataFrame = degreeType match {
      case "bidirectional" => undirDegrees(e)
      case "incoming" => e.groupBy(col(DST).as(ID)).agg(count(lit(1)).as("degree"))
      case "outgoing" => e.groupBy(col(SRC).as(ID)).agg(count(lit(1)).as("degree"))
      case other => throw new IllegalArgumentException(s"unknown degree_type $other")
    }
    var remaining = (degreeType match {
      case "bidirectional" => Structure.canonicalize(
        Structure.symmetrize(g.edges.select(SRC, DST)))
      case _ => g.edges.select(SRC, DST).filter(col(SRC) =!= col(DST)).distinct()
    }).select(SRC, DST).mat
    // track remaining vertices explicitly: a vertex that loses its last edge
    // mid-peel must still receive a core number at the CURRENT stage.
    var verts = g.vertices.select(ID).mat
    // peeled vertices accumulate LAZILY (each part is built from a cached
    // degree frame): unioned once at the end instead of one checkpoint per
    // cascade round — the peel's job count is stages + deletion rounds,
    // and every extra materialization of tiny state was pure scheduler
    // overhead on the round count
    val resultParts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var k = 1
    var maxCore = 0
    var maxCascade = 0
    var nVerts = verts.count()
    while (nVerts > 0 && k <= maxK) {
      // Bucket-jump peeling: if every remaining vertex has degree ≥ k,
      // no stage between k and the current minimum degree deletes anything —
      // jump straight to minDeg+1 (one job instead of minDeg−k empty
      // rounds; on dense graphs this is the difference between O(#distinct
      // core values) and O(max degree) Spark jobs). Values are unchanged:
      // a vertex of minimum degree d peels at stage d with core number d.
      val deg0 = verts.join(degOf(remaining), Seq(ID), "left")
        .select(col(ID), coalesce(col("degree"), lit(0L)).as("degree")).mat
      val minDeg = deg0.agg(min("degree")).first().getLong(0).toInt
      k = math.max(k, minDeg + 1)
      if (k <= maxK) {
        // cascade at stage k: repeatedly delete vertices with degree < k;
        // vertices deleted at stage k have core number k-1. One cached
        // degree frame per round; `weak` derives from it three times
        // without its own checkpoint.
        var stable = false
        var first = true
        var cascade = 0
        while (!stable) {
          // round 1 is always productive (k = minDeg+1, so the min-degree
          // vertices peel) — its weak-set check is skipped; later rounds
          // read the weak count off the degree materialization job itself
          val (deg, nWeak) = if (first) (deg0, -1L)
            else graft.prims.Iterate.materializeCount(
              verts.join(degOf(remaining), Seq(ID), "left")
                .select(col(ID), coalesce(col("degree"), lit(0L)).as("degree")),
              sum(when(col("degree") < k, 1L).otherwise(0L)),
              _.filter(col("degree") < k).count())
          first = false
          val weak = deg.filter(col("degree") < k).select(ID)
          if (nWeak == 0) stable = true
          else {
            cascade += 1
            maxCore = math.max(maxCore, k - 1)
            resultParts += weak.withColumn("core_number", lit(k - 1))
            verts = verts.join(weak, Seq(ID), "left_anti").mat
            remaining = remaining
              .join(weak.withColumnRenamed(ID, SRC), Seq(SRC), "left_anti")
              .join(weak.withColumnRenamed(ID, DST), Seq(DST), "left_anti")
              .mat
          }
        }
        maxCascade = math.max(maxCascade, cascade)
        nVerts = verts.count()
      }
      k += 1
    }
    val result = resultParts.foldLeft(
      spark.emptyDataset[(Long, Int)].toDF(ID, "core_number"))(_ union _)
    (result, maxCore, maxCascade)
  }

  /** Core number via the iterated H-operator fixpoint (Lü, Zhou, Zhang,
    * Stanley, "The H-index of a network node and its relation to degree and
    * coreness", Nature Communications 2016): start from h(v) = degree and
    * repeatedly set h(v) to the H-index of its neighbors' h values (the
    * largest k such that ≥ k neighbors have h ≥ k). The sequence is
    * pointwise non-increasing and converges exactly to the core number;
    * the same proof carries to the directed in-/out-degree variants with
    * in-/out-neighbor message sets (reference semantics
    * `cores/core_number.py:10`, `degree_type`).
    *
    * Same result as [[coreNumberWithStats]] (cross-checked in AlgoSpec on
    * the gated RMAT fixture for all three degree types) but a different
    * cost shape: one aggregate-messages shuffle per sweep and typically
    * O(10) sweeps, versus one Spark job cascade PER peel round — on graphs
    * with deep cores the peel's job count is O(Σ cascade rounds) while this
    * is O(sweeps). The per-vertex `collect_list` is bounded by degree — the
    * same O(d_max) row bound a CSR adjacency row has; hub rows are handled
    * by Spark's spillable aggregation buffers.
    *
    * Sweeps run in LAZY batches of `checkEvery`: within a batch no job is
    * submitted, so Catalyst chains the K aggregate-messages shuffles into
    * one job — driver sync (materialize + convergence check) happens once
    * per batch, not once per sweep. The check itself exploits monotonicity:
    * h is pointwise non-increasing, so Σh unchanged across a batch ⟺ the
    * batch's first sweep was already a fixpoint — one scalar agg on the
    * cached frame, no old-vs-new join. Callers at very large scale where a
    * single wasted sweep is a full-graph shuffle can set checkEvery=1.
    * @return (DataFrame(id, core_number: long), sweeps incl. ≤ checkEvery−1
    *         post-convergence no-ops). */
  def coreNumberHIndex(g: PropertyGraph, degreeType: String = "bidirectional",
                       maxIter: Int = 200, checkEvery: Int = 4): (DataFrame, Int) = {
    // adjacency rows (id, nbr): nbr's h value is counted in id's H-set.
    // Simple graph per the reference: self-loops and multi-edges dropped.
    val adj = (degreeType match {
      case "bidirectional" =>
        val c = Structure.canonicalize(Structure.symmetrize(g.edges.select(SRC, DST)))
        c.select(col(SRC).as(ID), col(DST).as("nbr"))
          .union(c.select(col(DST).as(ID), col(SRC).as("nbr")))
      case "incoming" =>
        g.edges.select(SRC, DST).filter(col(SRC) =!= col(DST)).distinct()
          .select(col(DST).as(ID), col(SRC).as("nbr"))
      case "outgoing" =>
        g.edges.select(SRC, DST).filter(col(SRC) =!= col(DST)).distinct()
          .select(col(SRC).as(ID), col(DST).as("nbr"))
      case other => throw new IllegalArgumentException(s"unknown degree_type $other")
    }).mat
    // Loop state covers exactly the vertices with ≥ 1 adjacency row (the
    // groupBy(ID) key set of adj), so each sweep is a closed map over it —
    // no old-vs-new left join. Isolated vertices are h = 0 from the first
    // H-operator application onward and are appended once at the end.
    var h = adj.groupBy(ID).agg(count(lit(1)).as("h")).mat
    def hSum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(coalesce(sum("h"), lit(0L))).first().getLong(0)
    // H-index of the multiset: sort descending, count positions i (0-based)
    // with value ≥ i+1. Evaluates inside the aggregation projection — no
    // second shuffle per sweep.
    val hIdx = size(filter(sort_array(col("hs"), asc = false),
      (x, i) => x >= (i + lit(1)).cast("long"))).cast("long")
    var prevSum = hSum(h)
    var it = 0
    var converged = prevSum == 0L
    while (!converged && it < maxIter) {
      val sweeps = math.min(checkEvery, maxIter - it)
      var next = h
      for (_ <- 0 until sweeps) {
        // plain shuffle join (not a forced broadcast): a broadcast would
        // collect `next` to the driver NOW, serializing the batch into
        // per-sweep jobs; AQE still picks broadcast at runtime when small
        next = adj.join(next.select(col(ID).as("nbr"), col("h").as("nh")), "nbr")
          .groupBy(ID).agg(collect_list(col("nh")).as("hs"))
          .select(col(ID), hIdx.as("h"))
      }
      h = next.mat
      it += sweeps
      val s = hSum(h)
      converged = s == prevSum
      prevSum = s
    }
    val isolated = g.vertices.select(ID)
      .join(h, Seq(ID), "left_anti").select(col(ID), lit(0L).as("h"))
    (h.union(isolated).select(col(ID), col("h").as("core_number")), it)
  }

  /** Strongly connected components — trim + forward/backward min-label
    * coloring (reference legacy SCC `algorithms.hpp:1767`,
    * `components/strongly_connected_components_impl.cuh`, which likewise
    * interleaves trim with FW-BW rounds).
    *
    * Each outer round over the remaining subgraph:
    *  1. TRIM — iteratively extract vertices with zero remaining in- or
    *     out-degree as singleton SCCs (nothing with no inbound/outbound
    *     edge can sit on a cycle; removing whole SCCs preserves the SCCs
    *     of the remainder). This peels the DAG-like tail that would
    *     otherwise cost one label-prop ROUND each.
    *  2. Propagate min vertex id along edge direction (fwd) and against it
    *     (bwd), both CAPPED at a sweep budget. Extraction of
    *     fwd(v) == bwd(v) = c vertices is only sound on CONVERGED labels
    *     (a hop-bounded run can agree on part of a long cycle and rip a
    *     partial SCC out), so if either direction hits the cap without
    *     converging, nothing is extracted and the budget doubles for the
    *     next round — total sweeps stay O(diameter) without any unbounded
    *     inner fixpoint. On converged labels the smallest remaining vertex
    *     is always extracted, so every converged round makes progress.
    * Label = min vertex id of the SCC.
    * @return DataFrame(id, component). */
  def scc(g: PropertyGraph, maxRounds: Int = 50, propCap: Int = 20,
          trimCap: Int = 20): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    var edges = g.edges.select(SRC, DST).distinct().mat
    var verts = g.vertices.select(ID).mat
    var result = spark.emptyDataset[(Long, Long)].toDF(ID, "component")
    // extracted SCCs accumulate as a LAZY union chain, compacted every 8
    // appends (r11-opt, the Traversal.CompactEvery pattern): re-
    // checkpointing the whole growing result on every trim iteration was
    // one full result-sized write per peel for frames that are only read
    // at the end.
    var resultChain = 0
    def appendResult(df: DataFrame): Unit = {
      result = result.union(df)
      resultChain += 1
      if (resultChain >= 8) { result = result.mat; resultChain = 0 }
    }
    var round = 0
    var cap = propCap
    var n = verts.count()
    while (n > 0 && round < maxRounds) {
      round += 1
      // 1. trim: zero-in/out vertices are singleton SCCs (component = own id)
      var trimmed = 1L
      var t = 0
      while (trimmed > 0 && t < trimCap) {
        t += 1
        val hasOut = edges.select(col(SRC).as(ID)).distinct()
        val hasIn = edges.select(col(DST).as(ID)).distinct()
        val (dead, nDead) = graft.prims.Iterate.materializeCount(
          verts.join(hasOut, Seq(ID), "left_anti")
            .union(verts.join(hasIn, Seq(ID), "left_anti")).distinct(),
          count(lit(1)), _.count())
        trimmed = nDead
        if (trimmed > 0) {
          appendResult(dead.select(col(ID), col(ID).as("component")))
          verts = verts.join(dead, Seq(ID), "left_anti").mat
          edges = edges
            .join(dead.withColumnRenamed(ID, SRC), Seq(SRC), "left_anti")
            .join(dead.withColumnRenamed(ID, DST), Seq(DST), "left_anti")
            .mat
        }
      }
      n = verts.count()
      if (n > 0) {
        // 2. capped fwd/bwd coloring over the trimmed remainder
        val (fwd, fConv) = minLabelProp(verts, edges, forward = true, cap, n)
        val (bwd, bConv) = minLabelProp(verts, edges, forward = false, cap, n)
        if (fConv && bConv) {
          val done = fwd.join(bwd.withColumnRenamed("ml", "ml_b"), ID)
            .filter(col("ml") === col("ml_b"))
            .select(col(ID), col("ml").as("component"))
            .mat
          appendResult(done)
          val doneIds = done.select(ID)
          verts = verts.join(doneIds, Seq(ID), "left_anti").mat
          edges = edges
            .join(doneIds.withColumnRenamed(ID, SRC), Seq(SRC), "left_anti")
            .join(doneIds.withColumnRenamed(ID, DST), Seq(DST), "left_anti")
            .mat
          n = verts.count()
        } else {
          cap *= 2 // unconverged labels are unsafe to extract from; retry bigger
        }
      }
    }
    result
  }

  /** Min-label propagation along (or against) edge direction, capped at
    * `maxSweeps` sweeps; returns (labels, converged). One cached frame per
    * sweep carries old + new labels, so convergence detection is a scan,
    * not a second join. */
  /** `stateRows`: tracked label-table size — engages the size-gated
    * broadcast of the labels into the edge join and the scoped AQE-off for
    * the sweeps (r11-opt: the unhinted sweeps paid AQE query-stage jobs
    * per exchange on a loop whose joins are all state-sized or hinted). */
  private def minLabelProp(verts: DataFrame, edges: DataFrame, forward: Boolean,
                           maxSweeps: Int, stateRows: Long = -1L): (DataFrame, Boolean) = {
    val e = if (forward) edges else edges.select(col(DST).as(SRC), col(SRC).as(DST))
    var labels = verts.select(col(ID), col(ID).as("ml")).mat
    var changed = 1L
    var sweep = 0
    def loops[T](body: => T): T =
      if (stateRows >= 0 && stateRows <= 5000000L)
        graft.prims.Aqe.off(verts.sparkSession, stateRows)(body) else body
    loops {
    while (changed > 0 && sweep < maxSweeps) {
      sweep += 1
      val nbrMin = e.join(graft.prims.Hint.state(
          labels.withColumnRenamed(ID, SRC), stateRows), SRC)
        .groupBy(col(DST).as(ID)).agg(min("ml").as("nm"))
      val (joined, ch) = graft.prims.Iterate.materializeCount(
        labels.join(nbrMin, Seq(ID), "left")
          .select(col(ID), col("ml").as("old"),
            least(col("ml"), coalesce(col("nm"), col("ml"))).as("ml")),
        sum(when(col("ml") < col("old"), 1L).otherwise(0L)),
        _.filter(col("ml") < col("old")).count())
      changed = ch
      labels = joined.select(col(ID), col("ml"))
    }
    }
    (labels, changed == 0)
  }

  /** Degrees over a canonical (src<dst, deduped) undirected edge list. */
  private def undirDegrees(canonEdges: DataFrame): DataFrame =
    canonEdges.select(col(SRC).as(ID)).union(canonEdges.select(col(DST).as(ID)))
      .groupBy(ID).agg(count(lit(1)).as("degree"))

  /** k-core subgraph (reference `cores/k_core.py:28`). Without precomputed
    * core numbers, peel DIRECTLY at level k — repeatedly delete vertices of
    * degree < k until stable (a handful of cascade rounds) instead of
    * computing every core value first. */
  def kCore(g: PropertyGraph, k: Int, coreNumbers: Option[DataFrame] = None): DataFrame =
    kCoreWithRounds(g, k, coreNumbers)._1

  /** k-core also returning the cascade round count (for oracle budgets). */
  def kCoreWithRounds(g: PropertyGraph, k: Int,
                      coreNumbers: Option[DataFrame] = None): (DataFrame, Int) = {
    val canon = Structure.canonicalize(Structure.symmetrize(g.edges.select(SRC, DST)))
    coreNumbers match {
      case Some(cores) =>
        val keep = cores.filter(col("core_number") >= k).select(ID)
        (Structure.inducedSubgraph(canon, keep), 0)
      case None =>
        var e = canon.mat
        var changed = 1L
        var rounds = 0
        while (changed > 0) {
          rounds += 1
          val (weak, nWeak) = graft.prims.Iterate.materializeCount(
            undirDegrees(e).filter(col("degree") < k).select(ID),
            count(lit(1)), _.count())
          changed = nWeak
          if (changed > 0) {
            e = e.join(weak.withColumnRenamed(ID, SRC), Seq(SRC), "left_anti")
              .join(weak.withColumnRenamed(ID, DST), Seq(DST), "left_anti")
              .mat
          }
        }
        (e, rounds)
    }
  }
}
