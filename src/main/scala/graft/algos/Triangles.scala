package graft.algos

import graft.prims.Mat._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{PropertyGraph, Structure, Gr}

/** Triangle counting and k-truss.
  *
  * Reference: `community/triangle_count_impl.cuh` (decl `algorithms.hpp:1871`),
  * `community/k_truss_impl.cuh` (`algorithms.hpp:1923`).
  *
  * Plan shape: canonical orientation (src<dst on the symmetrized graph) then
  * the classic two-path self-join + closing-edge semi-join. With the canonic
  * orientation every triangle {a<b<c} is counted exactly once as
  * (a,b)⋈(b,c)⋈(a,c). Both joins shuffle on a single vertex key; at scale
  * the degree-ordered orientation (order by degree, not id) bounds the
  * two-path fanout by arboricity — id order is used here because the oracle
  * must reproduce it in SQL; `orientByDegree=true` gives the skew-safe plan.
  */
object Triangles {
  import Gr._

  /** Canonically-oriented edge list of the undirected simple graph. */
  def oriented(g: PropertyGraph, orientByDegree: Boolean = false): DataFrame = {
    val canon = Structure.canonicalize(Structure.symmetrize(g.edges.select(SRC, DST)))
    if (!orientByDegree) canon.select(SRC, DST)
    else {
      // orient low-degree → high-degree (tie: smaller id first): bounds
      // per-vertex out-fanout by O(sqrt(E)) on any graph.
      val deg = canon.select(col(SRC).as(ID)).union(canon.select(col(DST).as(ID)))
        .groupBy(ID).agg(count(lit(1)).as("d"))
      canon
        .join(deg.select(col(ID).as(SRC), col("d").as("d_src")), SRC)
        .join(deg.select(col(ID).as(DST), col("d").as("d_dst")), DST)
        .select(
          when(col("d_src") < col("d_dst") ||
               (col("d_src") === col("d_dst") && col(SRC) < col(DST)), col(SRC))
            .otherwise(col(DST)).as(SRC),
          when(col("d_src") < col("d_dst") ||
               (col("d_src") === col("d_dst") && col(SRC) < col(DST)), col(DST))
            .otherwise(col(SRC)).as(DST))
    }
  }

  /** All triangles as (a,b,c) rows with a<b<c (id orientation). The closing
    * semi-join broadcasts the edge list when it is small enough — the wedge
    * stream (Σ deg², the dominant intermediate) then never shuffles. */
  def enumerate(g: PropertyGraph): DataFrame = {
    val e = oriented(g).mat
    enumerateOf(e, e.count())
  }

  private def enumerateOf(e: DataFrame, nE: Long): DataFrame = {
    val ab = e.select(col(SRC).as("a"), col(DST).as("b"))
    val bc = e.select(col(SRC).as("b"), col(DST).as("c"))
    val ac = e.select(col(SRC).as("a"), col(DST).as("c"))
    ab.join(bc, "b").join(graft.prims.Hint.state(ac, nE), Seq("a", "c"), "left_semi")
      .select("a", "b", "c")
  }

  /** Per-vertex triangle count (reference `triangle_count.py:34`).
    * One streaming pass: each triangle explodes into its three corners
    * feeding the hash agg directly — the O(#triangles) stream is never
    * checkpointed or rescanned. @return DataFrame(id, triangle_count). */
  def countPerVertex(g: PropertyGraph): DataFrame = {
    val counts = enumerate(g)
      .select(explode(array(col("a"), col("b"), col("c"))).as(ID))
      .groupBy(ID).agg(count(lit(1)).as("triangle_count"))
    g.vertices.select(ID).join(counts, Seq(ID), "left")
      .select(col(ID), coalesce(col("triangle_count"), lit(0L)).as("triangle_count"))
  }

  /** Total triangle count. */
  def countTotal(g: PropertyGraph): Long = enumerate(g).count()

  /** Per-edge triangle support (edge_triangle_count, `algorithms.hpp:1898`):
    * number of triangles each canonical edge participates in. */
  def edgeSupport(g: PropertyGraph): DataFrame = {
    val e = oriented(g).mat
    edgeSupportOf(e)
  }

  private def edgeSupportOf(e: DataFrame): DataFrame = {
    // one streaming pass: triangle → its three edges → hash agg (see
    // countPerVertex)
    val sup = enumerateOf(e, e.count())
      .select(explode(array(
        struct(col("a").as(SRC), col("b").as(DST)),
        struct(col("b").as(SRC), col("c").as(DST)),
        struct(col("a").as(SRC), col("c").as(DST)))).as("t"))
      .select(col(s"t.$SRC"), col(s"t.$DST"))
      .groupBy(SRC, DST).agg(count(lit(1)).as("support"))
    e.join(sup, Seq(SRC, DST), "left")
      .select(col(SRC), col(DST), coalesce(col("support"), lit(0L)).as("support"))
  }

  /** k-truss subgraph (reference `ktruss_subgraph.py:11`): iteratively drop
    * edges with support < k-2 until fixpoint. Returns canonical edges. */
  def kTruss(g: PropertyGraph, k: Int, maxIter: Int = 100): DataFrame =
    kTrussWithRounds(g, k, maxIter)._1

  /** k-truss also returning the number of peel rounds until fixpoint (for
    * oracle round-budget assertions).
    *
    * INCREMENTAL support maintenance (the reference's `k_truss_impl.cuh`
    * shape): the full Σ deg² wedge stream is paid ONCE for the initial
    * per-edge support (streamed straight into the hash agg — the triangle
    * set itself is never materialized, which matters on dense graphs where
    * #triangles ≫ E). Each peel round then enumerates only the triangles
    * that contain a deleted edge — wedges seeded FROM the deleted set, one
    * pattern per triangle-edge position, O(|del|·deg) not O(Σ deg²) — and
    * subtracts their contribution from the survivors' support. A triangle
    * with 2+ deleted edges is found by several patterns and deduplicated so
    * it decrements exactly once. */
  def kTrussWithRounds(g: PropertyGraph, k: Int, maxIter: Int = 100): (DataFrame, Int) = {
    val e0 = oriented(g).mat
    var alive = edgeSupportOf(e0).mat // (src, dst, support)
    def tri(d: DataFrame, p1: String, p2: String): DataFrame =
      d.select(col(SRC).as(p1), col(DST).as(p2))
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      it += 1
      val del = alive.filter(col("support") < k - 2).select(SRC, DST).mat
      if (del.isEmpty) done = true
      else {
        val e = alive.select(SRC, DST) // edge set at the start of the round
        // each pattern SEEDS from del — |del| ⋈ E on one vertex key, then a
        // closing semi-join — so no pattern replays the full wedge stream
        val asAB = tri(del, "a", "b") // deleted edge sits at position (a,b)
          .join(e.select(col(SRC).as("b"), col(DST).as("c")), "b")
          .join(e.select(col(SRC).as("a"), col(DST).as("c")), Seq("a", "c"), "left_semi")
        val asBC = tri(del, "b", "c") // position (b,c)
          .join(e.select(col(SRC).as("a"), col(DST).as("b")), "b")
          .join(e.select(col(SRC).as("a"), col(DST).as("c")), Seq("a", "c"), "left_semi")
        val asAC = tri(del, "a", "c") // position (a,c)
          .join(e.select(col(SRC).as("a"), col(DST).as("b")), "a")
          .join(e.select(col(SRC).as("b"), col(DST).as("c")), Seq("b", "c"), "left_semi")
        val dead = asAB.select("a", "b", "c")
          .union(asBC.select("a", "b", "c"))
          .union(asAC.select("a", "b", "c"))
          .distinct()
        val dec = dead
          .select(explode(array(
            struct(col("a").as(SRC), col("b").as(DST)),
            struct(col("b").as(SRC), col("c").as(DST)),
            struct(col("a").as(SRC), col("c").as(DST)))).as("t"))
          .select(col(s"t.$SRC"), col(s"t.$DST"))
          .groupBy(SRC, DST).agg(count(lit(1)).as("dec"))
        alive = alive.join(del, Seq(SRC, DST), "left_anti")
          .join(dec, Seq(SRC, DST), "left")
          .select(col(SRC), col(DST),
            (col("support") - coalesce(col("dec"), lit(0L))).as("support"))
          .mat
      }
    }
    (alive.select(SRC, DST), it)
  }
}
