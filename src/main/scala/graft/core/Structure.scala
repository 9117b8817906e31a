package graft.core

import graft.prims.Mat._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structural transforms over COO edge lists — projection/filter analogues.
  *
  * Reference inventory: SURVEY §2.2 / cugraph `structure/symmetrize.py`,
  * `graph_functions.hpp` (remove_self_loops :1062, remove_multi_edges :1131,
  * coarsen_graph :622, relabel :653), `simpleGraph.py` degrees :1021.
  *
  * All are pure declarative DataFrame programs: Catalyst plans the joins,
  * partial aggregation happens map-side, and at 100 TB every one of these is
  * a single shuffle keyed on (src,dst) or a vertex id.
  */
object Structure {
  import Gr._

  /** Undirected graph = union of edges with reversed copy, then multi-edge
    * dedup. Weight merge follows the reference: `symmetrize_df`
    * (`symmetrize.py:75`) keeps the MIN weight when collapsing an edge with
    * its reverse — that is our default. `sumWeights = true` gives the
    * multigraph-collapse semantics (sum of parallel edge weights) instead. */
  def symmetrize(edges: DataFrame, sumWeights: Boolean = false): DataFrame = {
    val hasW = edges.columns.contains(WEIGHT)
    val fwd = if (hasW) edges.select(SRC, DST, WEIGHT) else edges.select(SRC, DST)
    val rev = if (hasW) edges.select(col(DST).as(SRC), col(SRC).as(DST), col(WEIGHT))
              else edges.select(col(DST).as(SRC), col(SRC).as(DST))
    val uni = fwd.union(rev)
    if (hasW) {
      val agg = if (sumWeights) sum(WEIGHT) else min(WEIGHT)
      uni.groupBy(SRC, DST).agg(agg.as(WEIGHT))
    } else uni.distinct()
  }

  /** Drop self loops (`graph_functions.hpp:1062`). */
  def removeSelfLoops(edges: DataFrame): DataFrame = edges.filter(col(SRC) =!= col(DST))

  /** Collapse parallel edges; weight kept per `keep_min_value_edge`
    * (`graph_functions.hpp:1131`). */
  def removeMultiEdges(edges: DataFrame, keepMinWeight: Boolean = true): DataFrame =
    if (edges.columns.contains(WEIGHT)) {
      val agg = if (keepMinWeight) min(WEIGHT) else max(WEIGHT)
      edges.groupBy(SRC, DST).agg(agg.as(WEIGHT))
    } else edges.dropDuplicates(SRC, DST)

  /** Canonicalize an undirected edge list to src<=dst form (used by
    * triangle counting's degree/id ordering and `to_undirected`,
    * `simpleGraph.py:1415`). */
  def canonicalize(edges: DataFrame): DataFrame = {
    val hasW = edges.columns.contains(WEIGHT)
    val base = edges.select(
      least(col(SRC), col(DST)).as(SRC),
      greatest(col(SRC), col(DST)).as(DST))
    val withW = if (hasW) edges.select(
      least(col(SRC), col(DST)).as(SRC),
      greatest(col(SRC), col(DST)).as(DST), col(WEIGHT)) else base
    removeMultiEdges(removeSelfLoops(withW))
  }

  /** Distinct vertices of an edge list (`simpleGraph.py:883`). */
  def extractVertexList(edges: DataFrame): DataFrame =
    edges.select(col(SRC).as(ID)).union(edges.select(col(DST).as(ID))).distinct()

  /** Per-vertex in/out/total degrees (`simpleGraph.py:1021` degrees_function).
    * One hash agg per direction + outer join; vertices with no edges get 0. */
  def degrees(g: PropertyGraph): DataFrame = {
    val out = g.edges.groupBy(col(SRC).as(ID)).agg(count(lit(1)).as("out_degree"))
    val in = g.edges.groupBy(col(DST).as(ID)).agg(count(lit(1)).as("in_degree"))
    g.vertices.select(col(ID))
      .join(out, Seq(ID), "left").join(in, Seq(ID), "left")
      .select(col(ID),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"))
      .withColumn("degree", col("in_degree") + col("out_degree"))
  }

  /** Edges whose BOTH endpoints are in the vertex set S — two semi-joins
    * (reference `community/induced_subgraph.py:33`). S small → broadcast. */
  def inducedSubgraph(edges: DataFrame, verts: DataFrame): DataFrame = {
    val s = verts.select(col(verts.columns.head).as(ID))
    edges.join(s.withColumnRenamed(ID, SRC), Seq(SRC), "left_semi")
         .join(s.withColumnRenamed(ID, DST), Seq(DST), "left_semi")
  }

  /** Distinct vertex pairs exactly two hops apart (`simpleGraph.py:774`,
    * C++ `graph_functions.hpp:847`) — edge self-join a.dst==b.src. The
    * Σ deg² wedge stream dedupes on a packed single-long pair key when ids
    * fit 31 bits (cheaper hash + exchange than a two-column distinct). */
  def twoHopNeighbors(edges: DataFrame,
                      startVertices: Option[DataFrame] = None): DataFrame = {
    // start_vertices (reference `get_two_hop_neighbors(start_vertices=…)`):
    // restrict BEFORE the wedge join, so only the seeds' adjacency streams
    val a0 = edges.select(col(SRC).as("v"), col(DST).as("mid"))
    val a = startVertices match {
      case Some(s) => a0.join(s.select(col(s.columns.head).as("v")), Seq("v"), "left_semi")
      case None => a0
    }
    val b = edges.select(col(SRC).as("mid"), col(DST).as("w"))
    val wedges = a.join(b, "mid").filter(col("v") =!= col("w"))
    val bounds = edges.agg(least(min(SRC), min(DST)), greatest(max(SRC), max(DST))).first()
    // empty edge list → null bounds: fall through to the generic pair path
    if (!bounds.isNullAt(0) && bounds.getLong(0) >= 0 && bounds.getLong(1) < (1L << 31))
      wedges.select((shiftleft(col("v"), 32) + col("w")).as("p")).distinct()
        .select(shiftright(col("p"), 32).as(SRC),
          col("p").bitwiseAND(lit((1L << 32) - 1)).as(DST))
    else
      wedges.select(col("v").as(SRC), col("w").as(DST)).distinct()
  }

  /** Vertices within k hops of the seed set (`algorithms.hpp:2311`):
    * iterated frontier expansion join+distinct. Frontier stays a DataFrame —
    * never collected. */
  def kHopNeighbors(edges: DataFrame, seeds: DataFrame, k: Int): DataFrame = {
    val e = edges.select(SRC, DST)
    var reached = seeds.select(col(seeds.columns.head).as(ID)).distinct()
    var frontier = reached
    for (_ <- 1 to k) {
      val next = frontier.withColumnRenamed(ID, SRC).join(e, SRC)
        .select(col(DST).as(ID)).distinct()
        .join(reached, Seq(ID), "left_anti")
      frontier = next.mat
      reached = reached.union(frontier)
    }
    reached.distinct()
  }

  /** Contract vertices by a label map and sum parallel edge weights —
    * Louvain's contraction step (`coarsen_graph`, `graph_functions.hpp:622`;
    * used at `community/louvain_impl.cuh:267`). Two joins + one agg. */
  def coarsen(edges: DataFrame, labels: DataFrame): DataFrame = {
    // labels: (id, label)
    val l = labels.select(col(labels.columns(0)).as(ID), col(labels.columns(1)).as("label"))
    val hasW = edges.columns.contains(WEIGHT)
    val e = if (hasW) edges else edges.withColumn(WEIGHT, lit(1.0))
    e.join(l.select(col(ID).as(SRC), col("label").as("c_src")), SRC)
     .join(l.select(col(ID).as(DST), col("label").as("c_dst")), DST)
     .groupBy(col("c_src").as(SRC), col("c_dst").as(DST))
     .agg(sum(WEIGHT).as(WEIGHT))
  }

  /** Batched structural bipartiteness over SEVERAL graphs at once — the
    * min-(label, parity) fixpoint of PropertyGraph.isBipartite with a
    * graph-id key on every state row, so N graphs cost ONE set of
    * per-round jobs instead of N (the multi-source-BFS batching rule,
    * SURVEY §7.4-2; r11-opt — q_is_bipartite checks two graphs and was
    * paying two full fixpoint loops). Per-graph fixpoints are independent
    * under the gid key (monotone min — a converged graph's rows simply
    * stop changing while stragglers finish), so the booleans are exactly
    * the per-graph results. */
  def bipartiteBatch(gs: Seq[(String, PropertyGraph)]): Map[String, Boolean] = {
    val und = graft.prims.Iterate.materialize(
      gs.zipWithIndex.map { case ((_, g), i) =>
        symmetrize(g.edges.select(SRC, DST)).select(lit(i).as("gid"), col(SRC), col(DST))
      }.reduce(_ unionByName _))
    val verts = gs.zipWithIndex.map { case ((_, g), i) =>
      g.vertices.select(lit(i).as("gid"), col(ID))
    }.reduce(_ unionByName _)
    var st = graft.prims.Iterate.materialize(
      verts.select(col("gid"), col(ID), col(ID).as("ml"), lit(0).as("par")))
    val nV = st.count()
    var ch = 1L
    // GRAFT_BIPARTITE_BEFORE=1 reproduces the r11 shape (unhinted agg side)
    // for the plans/r12 before-capture.
    val bipBefore = sys.env.contains("GRAFT_BIPARTITE_BEFORE")
    var round = 0
    def loops[T](body: => T): T =
      if (nV <= 5000000L) graft.prims.Aqe.off(und.sparkSession, nV)(body) else body
    loops {
    while (ch > 0) {
      round += 1
      val nbrMin = und.join(
          graft.prims.Hint.state(st.withColumnRenamed(ID, SRC), nV), Seq("gid", SRC))
        .select(col("gid"), col(DST).as(ID), col("ml"), (lit(1) - col("par")).as("par"))
        .groupBy("gid", ID).agg(min(struct(col("ml"), col("par"))).as("nb"))
      // Hint.state on the agg side (r12): the r11 batching dropped the hint
      // PropertyGraph.isBipartite's per-graph loop carries — unhinted under
      // scoped AQE-off this planned as a stats-blind SMJ exchanging and
      // sorting BOTH state-sized sides every round (q_is_bipartite regressed
      // 6.6→9.1s in the r11 close; VERDICT r11 item #2 demanded the
      // isolated re-measure that found this).
      val stepFrame =
        st.join(if (bipBefore) nbrMin else graft.prims.Hint.state(nbrMin, nV),
            Seq("gid", ID), "left")
          .select(col("gid"), col(ID), struct(col("ml"), col("par")).as("old"),
            least(struct(col("ml"), col("par")),
              coalesce(col("nb"), struct(col("ml"), col("par")))).as("nw"))
      if (round == 2 && sys.env.contains("GRAFT_BIPARTITE_DEBUG"))
        System.err.println(stepFrame.queryExecution.executedPlan.toString)
      val (nxt, c) = graft.prims.Iterate.materializeCount(stepFrame,
        sum(when(col("nw") < col("old"), 1L).otherwise(0L)),
        _.filter(col("nw") < col("old")).count())
      ch = c
      graft.prims.Release.free(st)
      st = nxt.select(col("gid"), col(ID), col("nw.ml").as("ml"), col("nw.par").as("par"))
    }
    }
    val badPerGid = und
      .join(st.select(col("gid"), col(ID).as(SRC), col("par").as("pa")), Seq("gid", SRC))
      .join(st.select(col("gid"), col(ID).as(DST), col("par").as("pb")), Seq("gid", DST))
      .filter(col("pa") === col("pb"))
      .groupBy("gid").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    gs.zipWithIndex.map { case ((name, _), i) =>
      name -> (badPerGid.getOrElse(i, 0L) == 0L)
    }.toMap
  }

  /** Apply an old→new vertex id map to an edge list
    * (`graph_functions.hpp:653`) — join ×2. */
  def relabel(edges: DataFrame, mapping: DataFrame): DataFrame = {
    // alias the map per join side (same-instance double join is the
    // ambiguous-self-join trap — see Renumber.renumberEdges)
    val m = mapping.select(col(mapping.columns(0)).as("_old"), col(mapping.columns(1)).as("_new"))
    val carry = edges.columns.filterNot(c => c == SRC || c == DST).map(col)
    edges.join(m.as("_m1"), edges(SRC) === col("_m1._old"))
      .select((Seq(col("_m1._new").as(SRC), col(DST)) ++ carry.toIndexedSeq): _*)
      .join(m.as("_m2"), col(DST) === col("_m2._old"))
      .select((Seq(col(SRC), col("_m2._new").as(DST)) ++ carry.toIndexedSeq): _*)
  }
}
