package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{PropertyGraph, Gr}
import graft.prims.Mat._

/** Batched traversal surfaces: multi-source BFS, origin-destination
  * shortest distances, and BFS path extraction.
  *
  * Reference: `traversal/ms_bfs.py:97,172` (concurrent/multi-source BFS),
  * `algorithms.hpp:1244` + `traversal/od_shortest_distances_impl.cuh`,
  * `algorithms.hpp:1167` + `traversal/extract_bfs_paths_impl.cuh`.
  *
  * The batching trick is one extra key column: frontier state is keyed by
  * (source, vertex) instead of vertex, so B concurrent traversals cost the
  * same number of shuffles as one (each round's join moves B× rows, which
  * is exactly the reference's batched-frontier layout — SURVEY §2.3).
  */
object MultiTraversal {
  import Gr._

  /** Multi-source BFS: one BFS per row of `sources` (column `source`),
    * batched in a single loop. Output (source, id, distance, predecessor);
    * predecessor tie-break = min, as in Traversal.bfs. */
  def msBfs(g: PropertyGraph, sources: DataFrame, depthLimit: Int = Int.MaxValue): DataFrame =
    msBfsWithRounds(g, sources, depthLimit)._1

  def msBfsWithRounds(g: PropertyGraph, sources: DataFrame,
                      depthLimit: Int = Int.MaxValue): (DataFrame, Int) = {
    val e = g.edges.select(SRC, DST).mat
    var settled = sources.select(col("source"), col("source").as(ID),
      lit(0).as("distance"), lit(-1L).as("predecessor")).mat
    var frontier = settled.select("source", ID)
    var depth = 0
    var n = 1L
    var chainLen = 0
    while (n > 0 && depth < depthLimit) {
      depth += 1
      // frontier size rides the materialization job; settled stays a lazy
      // union of the per-depth checkpointed frames
      val (next, nNext) = graft.prims.Iterate.materializeCount(
        e.join(graft.prims.Hint.state(frontier.withColumnRenamed(ID, SRC), n), SRC)
          .groupBy(col("source"), col(DST).as(ID)).agg(min(SRC).as("predecessor"))
          .join(settled.select("source", ID), Seq("source", ID), "left_anti")
          .withColumn("distance", lit(depth))
          .select("source", ID, "distance", "predecessor"),
        count(lit(1)), _.count())
      n = nNext
      if (n > 0) {
        settled = settled.union(next)
        chainLen += 1
        // periodic compaction: the per-depth anti-join replans the whole
        // settled chain — O(depth²) planning on high-diameter graphs
        if (chainLen >= 8) { settled = settled.mat; chainLen = 0 }
        frontier = next.select("source", ID)
      }
    }
    (settled, depth)
  }

  /** Batched multi-seed ego graphs (reference `community/egonet.py:30`
    * batched_ego_graphs): ONE radius-bounded multi-source BFS settles every
    * seed's neighborhood in the same jobs (no per-seed loop), then two
    * keyed joins induce each seed's edge list, annotated with both
    * endpoints' hop distances from that seed.
    * Output (seed, src, dst, src_dist, dst_dist). */
  def batchedEgo(g: PropertyGraph, seeds: DataFrame, radius: Int): DataFrame = {
    val reach = msBfs(g, seeds.select(col(seeds.columns.head).as("source")),
        depthLimit = radius)
      .select(col("source").as("seed"), col(ID), col("distance"))
    g.edges.select(SRC, DST)
      .join(reach.select(col("seed"), col(ID).as(SRC), col("distance").as("src_dist")), SRC)
      .join(reach.select(col("seed"), col(ID).as(DST), col("distance").as("dst_dist")),
        Seq("seed", DST))
      .select(col("seed"), col(SRC), col(DST),
        col("src_dist").cast("long").as("src_dist"),
        col("dst_dist").cast("long").as("dst_dist"))
  }

  /** Origin-destination shortest hop distances: multi-source BFS from the
    * origins, semi-joined to the destination list.
    * Output (origin, destination, distance). */
  def odShortestDistances(g: PropertyGraph, origins: DataFrame, dests: DataFrame,
                          depthLimit: Int = Int.MaxValue): DataFrame = {
    val (bfs, _) = msBfsWithRounds(g, origins.select(col(origins.columns.head).as("source")),
      depthLimit)
    bfs.join(dests.select(col(dests.columns.head).as(ID)), ID)
      .select(col("source").as("origin"), col(ID).as("destination"),
        col("distance").cast("long").as("distance"))
  }

  /** WEIGHTED origin-destination shortest distances — the reference's
    * `od_shortest_distances` semantics (`algorithms.hpp:1244`): a batched
    * Bellman-Ford keyed by origin (state (source, id, distance)), then a
    * semi-join onto the destination list. Returns also the round count for
    * oracle budget asserts. */
  def odShortestDistancesWeighted(g: PropertyGraph, origins: DataFrame, dests: DataFrame,
                                  maxRounds: Int = 200): (DataFrame, Int) = {
    val e = g.weightedEdges.select(SRC, DST, WEIGHT).mat
    var dist = origins.select(col(origins.columns.head).as("source"))
      .select(col("source"), col("source").as(ID), lit(0.0).as("distance")).mat
    var improved = dist
    var nImp = 1L
    var round = 0
    while (nImp > 0 && round < maxRounds) {
      round += 1
      val cand = e.join(graft.prims.Hint.state(
          improved.select(col("source"), col(ID).as(SRC), col("distance").as("d_src")), nImp), SRC)
        .select(col("source"), col(DST).as(ID), (col("d_src") + col(WEIGHT)).as("distance"))
      val best = cand.groupBy("source", ID).agg(min("distance").as("distance"))
      val next = dist.union(best)
        .groupBy("source", ID).agg(min("distance").as("distance")).mat
      val (imp, nI) = graft.prims.Iterate.materializeCount(
        next.join(
            dist.select(col("source"), col(ID), col("distance").as("d_old")),
            Seq("source", ID), "left")
          .filter(col("d_old").isNull || col("distance") < col("d_old"))
          .select("source", ID, "distance"),
        count(lit(1)), _.count())
      nImp = nI
      dist = next
      improved = imp
    }
    val res = dist.join(dests.select(col(dests.columns.head).as(ID)), ID)
      .select(col("source").as("origin"), col(ID).as("destination"),
        col("distance"))
    (res, round)
  }

  /** Reconstruct root-to-destination paths from a BFS predecessor table
    * (id, distance, predecessor). Output one row per path position:
    * (destination, pos, vertex) with pos 0 at the destination walking back
    * to the source — k rounds of self-join on the predecessor column. */
  def extractBfsPaths(bfs: DataFrame, dests: DataFrame, maxDepth: Int): DataFrame = {
    val pred = bfs.select(col(ID), col("predecessor")).mat
    var cur = dests.select(col(dests.columns.head).as("destination"))
      .join(pred, col("destination") === col(ID))
      .select(col("destination"), lit(0).as("pos"), col(ID).as("vertex"),
        col("predecessor"))
      .mat
    var out = cur.select("destination", "pos", "vertex")
    var p = 0
    var n = cur.count()
    while (p < maxDepth && n > 0) {
      p += 1
      cur = cur.filter(col("predecessor") =!= -1L)
        .select(col("destination"), col("predecessor").as("vertex_next"), lit(p).as("pos"))
        .join(pred, col("vertex_next") === col(ID))
        .select(col("destination"), col("pos"), col(ID).as("vertex"), col("predecessor"))
        .mat
      n = cur.count()
      if (n > 0) out = out.union(cur.select("destination", "pos", "vertex"))
    }
    out.select(col("destination"), col("pos").cast("long").as("pos"), col("vertex"))
  }
}
