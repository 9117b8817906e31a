package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{PropertyGraph, Structure, Gr}
import graft.prims.Mat._
import graft.pipeline.TextOps.hash60

/** Luby-style randomized-rounds algorithms (MIS / coloring / matching),
  * driver-side LAP, and the ForceAtlas2-shaped layout.
  *
  * Reference: MIS `cpp/src/components/mis_impl.cuh` (`algorithms.hpp:2332`),
  * vertex coloring `components/vertex_coloring_impl.cuh` (`:2360`),
  * approximate weighted matching `community/approx_weighted_matching_impl.cuh`
  * (`:2388`), Hungarian `linear_assignment/legacy/hungarian.cu`
  * (`algorithms.hpp:463`), ForceAtlas2 `layout/legacy/barnes_hut.cuh`
  * (`:234`).
  *
  * Randomness = the deterministic hash60 race (see sampling.Walks), so MIS
  * and matching have EXACT DuckDB oracles; rounds are level-synchronous
  * joins + aggregations — Luby's O(log n) round bound keeps the job count
  * logarithmic at any scale.
  */
object Misc {
  import Gr._

  private def priority(c: org.apache.spark.sql.Column, seed: Long) =
    hash60(concat_ws("|", lit("mis"), c, lit(seed)))

  /** Maximal independent set, Luby's algorithm: a vertex enters the MIS when
    * its (hash, id) priority beats every remaining neighbor; winners'
    * neighborhoods leave the arena. Returns (mis DataFrame(id), rounds). */
  def misWithRounds(g: PropertyGraph, seed: Long = 42, maxRounds: Int = 50): (DataFrame, Int) = {
    val und = Structure.removeSelfLoops(Structure.symmetrize(g.edges.select(SRC, DST))).mat
    // seed from the VERTEX set (isolated vertices belong in every MIS;
    // edge-derived vertex lists would also NPE on edgeless subgraphs)
    var rem = g.vertices.select(col(ID), priority(col(ID), seed).as("p")).mat
    var mis: DataFrame = rem.select(ID).limit(0)
    var rounds = 0
    var nRem = rem.count()
    while (nRem > 0 && rounds < maxRounds) {
      rounds += 1
      // smallest neighbor priority among remaining vertices, per vertex
      val nbrBest = und
        .join(rem.select(col(ID).as(SRC)), SRC)
        .join(rem.select(col(ID).as(DST), col("p").as("np")), DST)
        .groupBy(col(SRC).as(ID))
        .agg(min(struct(col("np"), col(DST))).as("nb"))
      val winners = rem.join(nbrBest, Seq(ID), "left")
        .filter(col("nb").isNull ||
          struct(col("p"), col(ID)) < col("nb"))
        .select(ID).mat
      mis = mis.union(winners) // lazy union of checkpointed round frames
      // drop winners and their neighbors from the arena; the remaining
      // count rides the materialization job
      val killed = winners.union(
        und.join(winners.withColumnRenamed(ID, SRC), SRC).select(col(DST).as(ID)))
        .distinct()
      val (rem2, nR) = graft.prims.Iterate.materializeCount(
        rem.join(killed, Seq(ID), "left_anti"), count(lit(1)), _.count())
      rem = rem2
      nRem = nR
    }
    (mis.select(ID), rounds)
  }

  def mis(g: PropertyGraph, seed: Long = 42): DataFrame = misWithRounds(g, seed)._1

  /** Greedy distributed coloring by repeated MIS: the r-th MIS over the
    * still-uncolored subgraph gets color r (reference
    * `vertex_coloring_impl.cuh` does exactly this). Returns (id, color). */
  def vertexColoring(g: PropertyGraph, seed: Long = 42, maxColors: Int = 100): DataFrame =
    vertexColoringWithStats(g, seed, maxColors)._1

  /** Coloring also returning (colors used, max MIS rounds) so oracle
    * queries can assert the unrolled color×round budget was sufficient. */
  def vertexColoringWithStats(g: PropertyGraph, seed: Long = 42,
                              maxColors: Int = 100): (DataFrame, Int, Int) = {
    val und = Structure.removeSelfLoops(Structure.symmetrize(g.edges.select(SRC, DST))).mat
    // seed from the VERTEX set, like misWithRounds above: isolated vertices
    // must be colored too (they trivially join the color-0 MIS)
    var remV = g.vertices.select(ID).mat
    var colored: DataFrame = null
    var color = 0
    var maxRounds = 0
    var nRem = remV.count()
    while (nRem > 0 && color < maxColors) {
      val subE = und
        .join(remV.withColumnRenamed(ID, SRC), SRC)
        .join(remV.withColumnRenamed(ID, DST), DST)
        .select(SRC, DST)
      val sub = PropertyGraph(remV, subE, g.props.copy(directed = false))
      val (m0, rounds) = misWithRounds(sub, seed + color)
      maxRounds = math.max(maxRounds, rounds)
      val m = m0.withColumn("color", lit(color.toLong))
      colored = if (colored == null) m else colored.union(m)
      val (remV2, nR) = graft.prims.Iterate.materializeCount(
        remV.join(m.select(ID), Seq(ID), "left_anti"), count(lit(1)), _.count())
      remV = remV2
      color += 1
      nRem = nR
    }
    (colored, color, maxRounds)
  }

  /** Speculative coloring: hash-mod-k initial colors + iterative conflict
    * repair — the scale-viable alternative the repeated-MIS loop's ledger
    * row names. The reference ships only the MIS loop
    * (`vertex_coloring_impl.cuh`), whose wall is colors × MIS(remainder)
    * Spark rounds (2342.8s at scale 20).
    *
    * Per round: monochromatic edges are found (one scan of the cached edge
    * frame — the color table rides in on two TRACKED broadcast joins, so
    * the 2E rows are probed map-side, never exchanged), the LOWER-priority
    * endpoint of each must recolor, and every loser picks a
    * HASH-JITTERED color among those absent from its neighborhood
    * (candidates 0..#distinct-neighbor-colors, so one is always free —
    * colors stay ≤ maxdeg+1). The jitter is the convergence engine: the
    * first shipped version first-fit the SMALLEST free color, and the
    * scale-20 probe measured simultaneous adjacent losers re-picking the
    * same smallest value round after round — 100 repair rounds without
    * convergence (1928.1s, barely under the MIS loop it exists to beat).
    * With the pick spread hash-uniformly over each loser's free set,
    * adjacent losers collide with probability ~1/|free|, so the conflict
    * set decays geometrically instead of waiting on priority chains.
    * The candidate range is 0..2·#distinct-neighbor-colors+1, NOT the
    * first-fit-style 0..n: the scale-20 probe caught the narrow range
    * stalling too — in the dense hub core neighbor colors pack 0..n−1
    * densely, the free set collapses to the single value {n}, and
    * adjacent losers re-collide deterministically no matter the jitter.
    * Doubling the range guarantees ≥ n+2 free values per loser (collision
    * ≤ 1/(n+2)) at the price of a somewhat larger palette — exactly the
    * colors-for-rounds trade this strategy exists to make.
    * Deterministic given (seed, initColors) — the jitter is hash60 of
    * (id, round) — hence exactly DuckDB-unrollable
    * (MiscSql.fastColoringTree). Work per round is bounded by the conflict
    * set and its incident edges, not the whole graph.
    *
    * Throws if the conflict set is nonempty after `maxRounds` — a silent
    * improper coloring is worse than a loud failure.
    * @return (DataFrame(id, color), colors used, repair rounds run). */
  def fastColoringWithStats(g: PropertyGraph, seed: Long = 42, initColors: Int = 4,
                            maxRounds: Int = 50): (DataFrame, Long, Int) = {
    val und = Structure.removeSelfLoops(Structure.symmetrize(g.edges.select(SRC, DST))).mat
    val nV = g.vertices.count()
    def hinted(df: DataFrame) = graft.prims.Hint.state(df, nV)
    var colors = g.vertices.select(col(ID),
      pmod(hash60(concat_ws("|", lit("color"), col(ID), lit(seed))),
        lit(initColors.toLong)).as("color")).mat
    def pOf(c: org.apache.spark.sql.Column) =
      hash60(concat_ws("|", lit("colp"), c, lit(seed)))
    var rounds = 0
    var done = false
    while (!done && rounds < maxRounds) {
      // loser endpoint of every monochromatic edge (und carries both
      // directions, so evaluating the rule once per direction and
      // dedup-ing yields each conflict's single loser)
      val cc = und
        .join(hinted(colors.select(col(ID).as(SRC), col("color").as("ca"))), SRC)
        .join(hinted(colors.select(col(ID).as(DST), col("color").as("cb"))), DST)
        .filter(col("ca") === col("cb"))
      val (losers, nLose) = graft.prims.Iterate.materializeCount(
        cc.select(when(struct(pOf(col(SRC)), col(SRC)) > struct(pOf(col(DST)), col(DST)),
          col(SRC)).otherwise(col(DST)).as(ID)).distinct(),
        count(lit(1)), _.count())
      if (nLose == 0) { graft.prims.Release.free(losers); done = true }
      else {
        rounds += 1
        // distinct neighbor colors of each loser (pre-update colors) — the
        // loser set broadcasts, so this too is a scan of the cached frame
        val nbrC = und.join(graft.prims.Hint.state(losers.withColumnRenamed(ID, SRC), nLose), SRC)
          .join(hinted(colors.select(col(ID).as(DST), col("color").as("nc"))), DST)
          .select(col(SRC).as(ID), col("nc")).distinct().mat
        // hash-jittered pick among the free candidates in 0..#colors-seen
        val w = org.apache.spark.sql.expressions.Window.partitionBy(ID)
        val pick = nbrC.groupBy(ID).agg(count(lit(1)).as("n"))
          .select(col(ID), explode(sequence(lit(0L), col("n") * 2 + 1)).as("c"))
          .join(nbrC.withColumnRenamed("nc", "c"), Seq(ID, "c"), "left_anti")
          .withColumn("rk", row_number().over(w.orderBy("c")))
          .withColumn("nf", count(lit(1)).over(w))
          .filter(col("rk") === lit(1) + pmod(
            hash60(concat_ws("|", lit("coljit"), col(ID), lit(rounds), lit(seed))),
            col("nf")))
          .select(col(ID), col("c").as("newc"))
        val next = colors.join(pick, Seq(ID), "left")
          .select(col(ID), coalesce(col("newc"), col("color")).as("color")).mat
        graft.prims.Release.free(colors, losers, nbrC)
        colors = next
      }
    }
    if (!done) {
      // the loop can exhaust maxRounds with its LAST repair having fixed
      // everything — one closing conflict count decides honestly
      done = und
        .join(hinted(colors.select(col(ID).as(SRC), col("color").as("ca"))), SRC)
        .join(hinted(colors.select(col(ID).as(DST), col("color").as("cb"))), DST)
        .filter(col("ca") === col("cb")).isEmpty
    }
    require(done, s"fastColoring: conflicts remain after $maxRounds repair rounds " +
      "(raise maxRounds; the jittered pick decays conflicts geometrically)")
    val nColors = colors.agg(coalesce(max("color"), lit(-1L))).first().getLong(0) + 1L
    graft.prims.Release.free(und)
    (colors, nColors, rounds)
  }

  /** Approximate weighted matching, fixed handshake rounds: every vertex
    * points at its heaviest remaining neighbor (key = weight·1e6 − dst,
    * deterministic tie-break), mutual pairs match and retire. Canonical
    * output (src < dst). Reference `approx_weighted_matching_impl.cuh`. */
  def weightedMatching(g: PropertyGraph, rounds: Int = 3): DataFrame = {
    val und = Structure.removeSelfLoops(
      Structure.symmetrize(g.weightedEdges.select(SRC, DST, WEIGHT), sumWeights = false)).mat
    var remE = und
    var pairs: DataFrame = null
    for (_ <- 1 to rounds) {
      val best = remE.groupBy(SRC)
        .agg(max_by(col(DST), col(WEIGHT) * lit(1e6) - col(DST)).as("m"))
      val b2 = best.select(col(SRC).as("b_src"), col("m").as("b_m"))
      val matched = best.join(b2, col("m") === col("b_src") && col("b_m") === col(SRC))
        .filter(col(SRC) < col("m"))
        .select(col(SRC), col("m").as(DST)).mat
      // compact per round: `pairs` feeds the mv anti-joins below, so a lazy
      // union chain would replan r frames in round r (matched is tiny —
      // the checkpoint is one cheap job per round)
      pairs = if (pairs == null) matched else pairs.union(matched).mat
      val mv = pairs.select(col(SRC).as(ID)).union(pairs.select(col(DST).as(ID))).distinct()
      remE = remE
        .join(mv.withColumnRenamed(ID, SRC), Seq(SRC), "left_anti")
        .join(mv.withColumnRenamed(ID, DST), Seq(DST), "left_anti")
        .mat
    }
    pairs
  }

  /** Exact linear assignment for square cost matrices, driver-side — the
    * analogue of the reference's dense single-GPU legacy Hungarian
    * (`linear_assignment/legacy/hungarian.cu`); a 100 TB engine only ever
    * calls this on collected small-to-mid problems (distributed scale goes
    * through [[auctionAssignment]]). Dispatch: n ≤ 20 keeps the subset DP
    * (its lexicographic tie-break is what the 8!-enumeration oracle pins);
    * 20 < n ≤ 2048 runs the O(n³) shortest-augmenting-path Hungarian with
    * potentials ([[assignmentJV]]) — exact on arbitrary doubles, unlike the
    * auction's ε-optimality on non-integral values. */
  def assignment(cost: Array[Array[Double]]): Array[Int] = {
    if (cost.length > 20) return assignmentJV(cost)
    assignmentDp(cost)
  }

  /** Subset-DP exact LAP (O(n²·2ⁿ), n ≤ 20), deterministic lexicographic
    * tie-break. */
  def assignmentDp(cost: Array[Array[Double]]): Array[Int] = {
    val n = cost.length
    require(n <= 20, "driver-side LAP DP supports n <= 20")
    val full = (1 << n) - 1
    val dp = Array.fill(1 << n)(Double.MaxValue)
    val choice = Array.fill(1 << n)(-1)
    dp(0) = 0.0
    for (mask <- 0 until full) if (dp(mask) != Double.MaxValue) {
      val row = Integer.bitCount(mask)
      for (j <- 0 until n if (mask & (1 << j)) == 0) {
        val nm = mask | (1 << j)
        val v = dp(mask) + cost(row)(j)
        if (v < dp(nm)) { dp(nm) = v; choice(nm) = j }
      }
    }
    val res = Array.fill(n)(-1)
    var mask = full
    while (mask != 0) {
      val j = choice(mask)
      res(Integer.bitCount(mask) - 1) = j
      mask &= ~(1 << j)
    }
    res
  }

  /** O(n³) shortest-augmenting-path Hungarian with row/column potentials
    * (the Jonker–Volgenant shape): each row is inserted by a Dijkstra-like
    * scan over reduced costs, potentials keep them non-negative, and the
    * found alternating path augments the matching. Exact for arbitrary
    * double costs; deterministic (scans pick the smallest column index on
    * ties). Mid-size driver path — n ≤ 2048 keeps the n² matrix and the
    * n³ work comfortably on one core (~10⁹ ops at the cap). */
  def assignmentJV(cost: Array[Array[Double]]): Array[Int] = {
    val n = cost.length
    require(n <= 2048, "driver-side LAP supports n <= 2048; use auctionAssignment beyond")
    require(cost.forall(_.length == n), "cost matrix must be square")
    val INF = Double.MaxValue / 4
    // 1-indexed: u,v potentials; p(j) = row matched to column j; way(j) =
    // previous column on the alternating path into j
    val u = new Array[Double](n + 1)
    val v = new Array[Double](n + 1)
    val p = new Array[Int](n + 1)
    val way = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(n + 1)(INF)
      val used = new Array[Boolean](n + 1)
      var augmenting = true
      while (augmenting) {
        used(j0) = true
        val i0 = p(j0)
        var delta = INF
        var j1 = -1
        var j = 1
        while (j <= n) {
          if (!used(j)) {
            val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        j = 0
        while (j <= n) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
          j += 1
        }
        j0 = j1
        augmenting = p(j0) != 0
      }
      // unwind the alternating path
      while (j0 != 0) { val j1 = way(j0); p(j0) = p(j1); j0 = j1 }
      i += 1
    }
    val res = new Array[Int](n)
    var j = 1
    while (j <= n) { if (p(j) != 0) res(p(j) - 1) = j - 1; j += 1 }
    res
  }

  /** DISTRIBUTED linear assignment via the Bertsekas Jacobi auction
    * (maximization form) — the scale path next to the driver-side
    * [[assignment]] DP (which mirrors the reference's dense single-GPU
    * legacy Hungarian, `linear_assignment/legacy/hungarian.cu`). `values`
    * = (i, j, v: long) person→object values; callers pre-scale integral
    * values by (n+1) so the unit bid increment ε = 1 guarantees an exact
    * optimum (total suboptimality < n·ε). Each round every unassigned
    * person bids best-net-minus-second-net + ε on its best object (join +
    * two hash aggs), each contested object takes the highest bid and
    * displaces the holder (one agg) — all tie-breaks by id, so the run is
    * deterministic under any partitioning; no driver-side matrix ever
    * materializes.
    *
    * Round count is governed by VALUE GAPS between competitors, not data
    * volume: near-tied bidders escalate by +ε per round, so callers keep
    * the integral value range as coarse as the needed optimum resolution
    * allows (the gate uses whole dollars, not cents — 100× shorter price
    * wars for the same argmax). Classical ε-scaling (phases with shrinking
    * ε and carried prices) was tried and REVERTED: clearing assignments
    * between phases re-bids everyone ~n·ratio rounds per phase on this
    * shape, costing more rounds than the flat ε = 1 run it replaced.
    * @return (assignment (i, j), rounds). */
  def auctionAssignment(values: DataFrame, maxRounds: Int = 500): (DataFrame, Int) = {
    val vals = values.select(col("i").cast("long"), col("j").cast("long"),
      col("v").cast("long")).mat
    val persons = vals.select("i").distinct().mat
    val nPersons = persons.count()
    // ONE object-state frame (j, price, holder) instead of separate prices
    // + assignment frames (r11-opt): the round's whole bid→win→update
    // pipeline rides a single materializeCount — 2 jobs per round where the
    // old shape paid 5 (unassigned count, winners mat, prices mat, assign
    // mat + its scan). The per-round arithmetic (bids, winners, price and
    // holder updates, tie-breaks) is unchanged, so the assignment and the
    // round count are identical.
    var state = vals.select("j").distinct()
      .select(col("j"), lit(0L).as("p"), lit(null).cast("long").as("hi")).mat
    var round = 0
    var nAssigned = 0L
    while (nAssigned < nPersons && round < maxRounds) {
      round += 1
      val unassigned = persons.join(
        state.filter(col("hi").isNotNull).select(col("hi").as("i")),
        Seq("i"), "left_anti")
      val cand = vals.join(unassigned, "i")
        .join(state.select(col("j"), col("p")), "j")
        .select(col("i"), col("j"), (col("v") - col("p")).as("net"), col("p"))
      // best object per person (net desc, j asc) with its price…
      val b1 = cand.groupBy("i")
        .agg(max_by(struct(col("j"), col("net"), col("p")),
          struct(col("net"), (-col("j")).as("nj"))).as("b"))
        .select(col("i"), col("b.j").as("j"), col("b.net").as("net1"),
          col("b.p").as("p1"))
      // …and the runner-up net (absent for 1-object problems → -2^40
      // stands in for the -infinity reservation value)
      val b2 = cand.join(b1.select(col("i"), col("j").as("bj")), "i")
        .filter(col("j") =!= col("bj"))
        .groupBy("i").agg(max(col("net")).as("net2"))
      val bids = b1.join(b2, Seq("i"), "left")
        .select(col("i"), col("j"),
          (col("p1") + col("net1") -
            coalesce(col("net2"), lit(-(1L << 40))) + lit(1L)).as("bid"))
      val winners = bids.groupBy("j")
        .agg(max_by(struct(col("i"), col("bid")),
          struct(col("bid"), (-col("i")).as("ni"))).as("w"))
        .select(col("j").as("wj"), col("w.i").as("wi"), col("w.bid").as("bid"))
      val (nextState, nAs) = graft.prims.Iterate.materializeCount(
        state.join(winners, col("j") === col("wj"), "left")
          .select(col("j"), coalesce(col("bid"), col("p")).as("p"),
            coalesce(col("wi"), col("hi")).as("hi")),
        sum(when(col("hi").isNotNull, 1L).otherwise(0L)),
        _.filter(col("hi").isNotNull).count())
      graft.prims.Release.free(state)
      state = nextState
      nAssigned = nAs
    }
    require(nAssigned == nPersons,
      s"auction did not complete within $maxRounds rounds")
    (state.filter(col("hi").isNotNull).select(col("hi").as("i"), col("j")), round)
  }

  /** ForceAtlas2-shaped layout: attraction along edges + cell-binned
    * repulsion, TWO-LEVEL QUADTREE by default (the Barnes-Hut far/near
    * opening criterion discretized to two fixed levels, as groupBy(cell) —
    * reference `layout/legacy/barnes_hut.cuh`): near-field cells (parent
    * coarse cell within Chebyshev distance 1 of the vertex's coarse cell)
    * contribute at FINE `gridSize`×`gridSize` resolution, the far field
    * collapses to `gridSize/4`-grid coarse centroids. Vs the r4 flat grid
    * this quadruples near-field resolution (16 vs 8 per axis) while the
    * per-vertex contribution table stays O(1) broadcast rows (≤ 256 fine +
    * 16 coarse). `quadtree = false` keeps the flat `gridSize`-cell grid
    * (the quality-comparison baseline in MiscSpec).
    * Deterministic hash init; `iters` bounded force rounds.
    * Output (id, x, y) in [0,1]². */
  def forceAtlas2(g: PropertyGraph, iters: Int = 5, gridSize: Int = 16,
                  step: Double = 0.05, seed: Long = 42,
                  quadtree: Boolean = true,
                  posList: Option[DataFrame] = None,
                  gravity: Double = 0.0,
                  scalingRatio: Double = 2.0): DataFrame = {
    // Option surface matching the reference signature
    // (`layout/force_atlas2.py:50`): `posList` = pos_list warm start
    // (id, x, y — missing vertices fall back to the hash init), `gravity`
    // pulls toward the layout center (0.5, 0.5 in our unit square; the
    // reference pulls to the origin of its unbounded plane), and
    // `scalingRatio` scales repulsion. Defaults preserve the gated layout
    // bit-for-bit: gravity 0 and scalingRatio 2.0 reproduce the original
    // 0.01 repulsion coefficient exactly.
    val coarseN = math.max(gridSize / 4, 1)
    val und = Structure.symmetrize(g.edges.select(SRC, DST)).mat
    val u01x = hash60(concat_ws("|", lit("fa2x"), col(ID), lit(seed))).cast("double") / lit(math.pow(2, 60))
    val u01y = hash60(concat_ws("|", lit("fa2y"), col(ID), lit(seed))).cast("double") / lit(math.pow(2, 60))
    val repCoeff = 0.01 * scalingRatio / 2.0
    val hashInit = Structure.extractVertexList(g.edges)
      .select(col(ID), u01x.as("x"), u01y.as("y"))
    var pos = (posList match {
      case Some(p0) =>
        val cols = p0.columns
        hashInit.join(p0.select(col(cols(0)).as(ID), col(cols(1)).as("wx"),
            col(cols(2)).as("wy")), Seq(ID), "left")
          .select(col(ID), coalesce(col("wx"), col("x")).as("x"),
            coalesce(col("wy"), col("y")).as("y"))
      case None => hashInit
    }).mat
    // shared repulsion kernel against a centroid table (mx, my, cnt)
    def kernel() = (
      ((col("x") - col("mx")) * col("cnt") /
        (pow(col("x") - col("mx"), 2) + pow(col("y") - col("my"), 2) + lit(1e-4))).as("rx"),
      ((col("y") - col("my")) * col("cnt") /
        (pow(col("x") - col("mx"), 2) + pow(col("y") - col("my"), 2) + lit(1e-4))).as("ry"))
    for (_ <- 1 to iters) {
      // attraction: pull toward neighbor positions (sum of deltas)
      val att = und
        .join(pos.select(col(ID).as(SRC), col("x").as("sx"), col("y").as("sy")), SRC)
        .join(pos.select(col(ID).as(DST), col("x").as("dx_"), col("y").as("dy_")), DST)
        .groupBy(col(SRC).as(ID))
        .agg(sum(col("dx_") - col("sx")).as("ax"), sum(col("dy_") - col("sy")).as("ay"))
      // fine cells: counts + centroids at gridSize resolution
      val cells = pos.select(floor(col("x") * gridSize).as("cx"),
          floor(col("y") * gridSize).as("cy"), col("x"), col("y"))
        .groupBy("cx", "cy")
        .agg(count(lit(1)).as("cnt"), avg("x").as("mx"), avg("y").as("my"))
      val rep =
        if (!quadtree) {
          val (rx, ry) = kernel()
          pos.crossJoin(broadcast(cells))
            .select(col(ID), col("x"), col("y"), rx, ry)
            .groupBy(ID).agg(first("x").as("x"), first("y").as("y"),
              sum("rx").as("rx"), sum("ry").as("ry"))
        } else {
          // coarse cells derived FROM the fine table (weighted centroids) —
          // the oracle mirrors this exact derivation, and the per-round
          // 1e-8 position snap absorbs cross-engine sum association
          val coarse = cells
            .groupBy(floor(col("cx") / 4).cast("long").as("px"),
              floor(col("cy") / 4).cast("long").as("py"))
            .agg(sum(col("cnt")).as("cnt"),
              (sum(col("mx") * col("cnt")) / sum(col("cnt"))).as("mx"),
              (sum(col("my") * col("cnt")) / sum(col("cnt"))).as("my"))
          val pc = pos.select(col(ID), col("x"), col("y"),
            floor(col("x") * coarseN).as("vcx"), floor(col("y") * coarseN).as("vcy"))
          val fineP = cells.select(col("cnt"), col("mx"), col("my"),
            floor(col("cx") / 4).cast("long").as("px"),
            floor(col("cy") / 4).cast("long").as("py"))
          val (nrx, nry) = kernel()
          val near = pc.crossJoin(broadcast(fineP))
            .filter(abs(col("px") - col("vcx")) <= 1 && abs(col("py") - col("vcy")) <= 1)
            .select(col(ID), col("x"), col("y"), nrx, nry)
          val (frx, fry) = kernel()
          val far = pc.crossJoin(broadcast(coarse))
            .filter(abs(col("px") - col("vcx")) > 1 || abs(col("py") - col("vcy")) > 1)
            .select(col(ID), col("x"), col("y"), frx, fry)
          // every vertex hits ≥ 1 near cell (its own), so the union keys
          // cover all ids — no left-join backfill needed
          near.union(far)
            .groupBy(ID).agg(first("x").as("x"), first("y").as("y"),
              sum("rx").as("rx"), sum("ry").as("ry"))
        }
      // snap to a 1e-8 grid each round: float-sum association differs across
      // partitionings (and engines), and without the snap an ulp of drift
      // compounds through floor(x*grid) cell binning into divergent layouts
      pos = rep.join(att, Seq(ID), "left")
        .select(col(ID),
          round(least(greatest(col("x") + lit(step) * (coalesce(col("ax"), lit(0.0)) * 0.1 + col("rx") * lit(repCoeff)
            + lit(gravity) * (lit(0.5) - col("x"))), lit(0.0)), lit(1.0)), 8).as("x"),
          round(least(greatest(col("y") + lit(step) * (coalesce(col("ay"), lit(0.0)) * 0.1 + col("ry") * lit(repCoeff)
            + lit(gravity) * (lit(0.5) - col("y"))), lit(0.0)), lit(1.0)), 8).as("y"))
        .mat
    }
    pos
  }
}
