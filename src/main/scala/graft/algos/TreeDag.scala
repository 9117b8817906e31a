package graft.algos

import graft.prims.Mat._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{PropertyGraph, Structure, Gr}

/** Minimum spanning tree (Borůvka) and DAG topological sort.
  *
  * Reference: `tree/legacy/mst.cu` (Borůvka, decl `algorithms.hpp:817`),
  * `dag/topological_sort_impl.cuh` (`algorithms.hpp:1132`).
  */
object TreeDag {
  import Gr._

  /** Borůvka MST over the undirected weighted graph. Deterministic: per-
    * component minimum edge chosen by (weight, src, dst) lexicographic
    * order, so ties never make the result run-dependent. log₂(V) rounds,
    * each = one join + one min-by agg + a small WCC to merge components.
    * @return canonical (src<dst) MST edges with weights (forest if the
    * graph is disconnected; maximum=true negates weights for max-ST). */
  def boruvkaMst(g: PropertyGraph, maximum: Boolean = false): DataFrame =
    boruvkaMstWithRounds(g, maximum)._1

  /** Borůvka also returning the merge-round count, for oracle round-budget
    * assertions (rounds ≤ ⌈log2 V⌉: components at least halve per round). */
  def boruvkaMstWithRounds(g: PropertyGraph, maximum: Boolean = false): (DataFrame, Int) = {
    val canon0 = Structure.canonicalize(g.weightedEdges.select(SRC, DST, WEIGHT))
    val canon = (if (maximum) canon0.withColumn(WEIGHT, -col(WEIGHT)) else canon0)
      .mat
    var comp = Structure.extractVertexList(canon)
      .select(col(ID), col(ID).as("comp")).mat
    // the component map stays exactly |V| rows every round — one count up
    // front feeds the size-gated broadcast of both per-round state joins
    // (edge table scanned in place instead of shuffled twice per round)
    val nV = comp.count()
    def st(df: DataFrame): DataFrame = graft.prims.Hint.state(df, nV)
    var mst = canon.limit(0)
    var more = true
    var round = 0
    while (more && round < 64) {
      round += 1
      val (e, nCross) = graft.prims.Iterate.materializeCount(
        canon
          .join(st(comp.select(col(ID).as(SRC), col("comp").as("c_src"))), SRC)
          .join(st(comp.select(col(ID).as(DST), col("comp").as("c_dst"))), DST)
          .filter(col("c_src") =!= col("c_dst")),
        count(lit(1)), _.count())
      if (nCross == 0) more = false
      else {
        // per-component min edge, deterministic tie-break
        val key = struct(col(WEIGHT), col(SRC), col(DST))
        val fromSrc = e.select(col("c_src").as("comp"), key.as("k"))
        val fromDst = e.select(col("c_dst").as("comp"), key.as("k"))
        val chosen = fromSrc.union(fromDst).groupBy("comp").agg(min("k").as("k"))
          .select(col("k.src").as(SRC), col("k.dst").as(DST), col("k.weight").as(WEIGHT))
          .distinct()
          .mat
        mst = mst.union(chosen) // lazy: only read after the loop
        // merge components along the chosen star forest — a lean min-label
        // propagation over ONLY the touched components (≤ 2·|chosen| ids;
        // untouched components keep their label through the left join
        // below). A full Components.wcc call here re-paid symmetrize,
        // vertex-count, and label-init jobs every Borůvka round.
        // no hint on the cg joins: `chosen` (≤ #components rows) is the
        // small side — AQE broadcasts it from runtime sizes; hinting comp
        // would broadcast the bigger side
        val cg = chosen
          .join(comp.select(col(ID).as(SRC), col("comp").as("ca")), SRC)
          .join(comp.select(col(ID).as(DST), col("comp").as("cb")), DST)
          .select(col("ca").as(SRC), col("cb").as(DST))
        val cgSym = cg.union(cg.select(col(DST).as(SRC), col(SRC).as(DST))).mat
        var lbl = cgSym.select(col(SRC).as(ID)).distinct()
          .select(col(ID), col(ID).as("ml")).mat
        var ch = 1L
        // AQE off + scoped width for the inner min-label rounds (see
        // prims.Aqe). UNLIKE the level loops, these joins are NOT
        // broadcast-hinted (r11-opt): both sides are the SAME shrinking
        // O(#components) merge-graph frames, so a broadcast buys no
        // scan-in-place of a bigger side — it only added two build jobs
        // per inner round; a plain join at the scoped width exchanges the
        // same magnitude of rows inside the materialize job itself
        // (2 jobs/inner round instead of 4).
        def innerLoop[T](body: => T): T =
          if (nV <= 5000000L) graft.prims.Aqe.off(canon.sparkSession, nV)(body) else body
        innerLoop {
        while (ch > 0) {
          val nbrMin = cgSym.join(lbl.withColumnRenamed(ID, SRC), SRC)
            .groupBy(col(DST).as(ID)).agg(min("ml").as("nm"))
          val (nxt, c) = graft.prims.Iterate.materializeCount(
            lbl.join(nbrMin, Seq(ID), "left")
              .select(col(ID), col("ml").as("old"),
                least(col("ml"), coalesce(col("nm"), col("ml"))).as("ml")),
            sum(when(col("ml") < col("old"), 1L).otherwise(0L)),
            _.filter(col("ml") < col("old")).count())
          ch = c
          lbl = nxt.select(col(ID), col("ml"))
        }
        }
        comp = comp.join(st(lbl.withColumnRenamed(ID, "comp")), Seq("comp"), "left")
          .select(col(ID), coalesce(col("ml"), col("comp")).as("comp"))
          .mat
      }
    }
    val mstOut = mst.mat
    (if (maximum) mstOut.withColumn(WEIGHT, -col(WEIGHT)) else mstOut, round)
  }

  /** Topological levels of a DAG by zero-in-degree peeling: level(v) =
    * length of the longest path from any source to v. Throws if a cycle
    * remains after V rounds (not a DAG), mirroring the reference error
    * contract. @return DataFrame(id, level). */
  def topologicalLevels(g: PropertyGraph, maxRounds: Int = 100000): DataFrame = {
    val e = g.edges.select(SRC, DST).mat
    var remainingV = g.vertices.select(ID).mat
    var remainingE = e
    var out = remainingV.limit(0).withColumn("level", lit(0))
    var lvl = 0
    var n = remainingV.count()
    while (n > 0 && lvl < maxRounds) {
      val withIn = remainingV.join(
        remainingE.groupBy(col(DST).as(ID)).agg(count(lit(1)).as("ind")), Seq(ID), "left")
      val (zero, nZero) = graft.prims.Iterate.materializeCount(
        withIn.filter(col("ind").isNull).select(ID), count(lit(1)), _.count())
      if (nZero == 0)
        throw new IllegalArgumentException("topological_sort: graph has a cycle")
      out = out.union(zero.withColumn("level", lit(lvl))).mat
      remainingV = remainingV.join(zero, Seq(ID), "left_anti").mat
      remainingE = remainingE.join(zero.withColumnRenamed(ID, SRC), Seq(SRC), "left_anti")
        .mat
      n -= nZero
      lvl += 1
    }
    out
  }
}
