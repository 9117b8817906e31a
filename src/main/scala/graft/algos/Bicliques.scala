package graft.algos

import graft.prims.Mat._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Gr

/** Top-k biclique mining over a machines×features bipartite edge list —
  * reference `experimental/structure/bicliques.py:10`
  * (`EXPERIMENTAL__find_bicliques`).
  *
  * Reference semantics, re-expressed set-wise: features are scanned in
  * degree-descending order; for feature f with machine set M(f), the
  * emitted biclique keeps every feature g whose machine overlap
  * |M(f) ∩ M(g)| reaches `int(deg(f)·support)`; a feature whose machine
  * set equals the immediately preceding feature's is skipped, and answers
  * stop after k. The reference walks features ONE AT A TIME on the GPU
  * (hand-partitioned chunk joins per feature); here the entire sweep is
  * three declarative steps: one src-keyed co-occurrence equi-join computes
  * every candidate's machine-set intersections at once, the ordered scan
  * (skip-same + answer numbering) becomes lag/row_number windows over the
  * candidate list (≤ maxIter rows — the features side of a
  * machines×features graph is the small one, so the window is never
  * corpus-sized), and the output tables are joins back against the edge
  * list. Equal-degree tie order is pinned to the feature id (the
  * reference's cudf sort leaves it unspecified).
  */
object Bicliques {
  import Gr._

  /** co(f, g) = |M(f) ∩ M(g)| for every candidate f — one equi-join on the
    * machine key against the BROADCAST candidate list; g ranges over all
    * features any of f's machines touch (includes g = f, whose count is
    * deg(f), mirroring the reference's ic). Package-visible so PlanSpec can
    * pin the join shape pre-materialization. */
  private[graft] def coOccurrence(e: DataFrame, cand: DataFrame): DataFrame =
    e.select(SRC, DST)
      .join(broadcast(cand.select(col(DST))), DST)
      .join(e.select(col(SRC), col(DST).as("g")), SRC)
      .groupBy(col(DST).as("f"), col("g")).agg(count(lit(1)).as("cnt"))

  /** @param edges   bipartite edge list (src = machine, dst = feature),
    *                plus `flagCol` marking bad machines (0/1)
    * @param k       stop after k bicliques (-1 = no cap)
    * @param support fraction of deg(f) a feature's overlap must reach
    * @param maxIter scan only the maxIter highest-degree features (-1 = all)
    * @return (B, S): B = (id, vert, type 0=machine|1=feature),
    *         S = (id, total, machines, features, bad_ratio) — ratio is
    *         bad machines over total vertices, matching the reference's
    *         code (its docstring says machines; its code divides by total).
    */
  def findBicliques(edges: DataFrame, k: Int, support: Double = 1.0,
                    minFeatures: Int = 1, minMachines: Int = 10,
                    maxIter: Int = -1,
                    flagCol: String = "flag"): (DataFrame, DataFrame) = {
    val e = edges.select(col(SRC), col(DST), col(flagCol).cast("long").as("flag")).mat
    val deg = e.groupBy(DST).agg(count(lit(1)).as("d"))
    val candBase = if (maxIter > 0) deg.orderBy(desc("d"), col(DST)).limit(maxIter) else deg
    // the ordered candidate list is ≤ maxIter (or |features|) rows: the
    // single-partition window is over the small side by construction
    val ordW = Window.orderBy(desc("d"), col(DST))
    val cand = candBase
      .withColumn("ord", row_number().over(ordW))
      .withColumn("pdst", lag(col(DST), 1).over(ordW))
      .withColumn("pd", lag(col("d"), 1).over(ordW))
      .mat
    val co = coOccurrence(e, cand).mat
    // kept features per candidate: overlap ≥ int(deg(f)·support)
    val kept = co
      .join(broadcast(cand.select(col(DST).as("f"), col("d"))), "f")
      .filter(col("cnt") >= floor(col("d") * support).cast("long"))
      .select("f", "g")
      .mat
    val nf = kept.groupBy("f").agg(count(lit(1)).as("nfeat"))
    // skip-same: machine set equal to the previous candidate's ⇔ equal
    // degree and full overlap (the reference compares the actual frames)
    val prevCnt = co.select(col("f"), col("g").as("pdst"), col("cnt").as("pcnt"))
    val qual = cand
      .join(nf.withColumnRenamed("f", DST), DST)
      .join(prevCnt.withColumnRenamed("f", DST), Seq(DST, "pdst"), "left")
      .filter(!(col("pd").isNotNull && col("pd") === col("d") &&
        col("pcnt").isNotNull && col("pcnt") === col("d")))
      .filter(col("nfeat") > minFeatures && col("d") >= minMachines)
    val ansW = Window.orderBy("ord")
    val ans = qual
      .select(col(DST).as("f"), (row_number().over(ansW) - 1).cast("long").as("id"))
      .filter(if (k > 0) col("id") < k else lit(true))
      .mat
    val bMachines = ans.join(e, col(DST) === col("f"))
      .select(col("id"), col(SRC).as("vert"), lit(0L).as("type"), col("flag"))
    val bFeatures = ans.join(kept, "f")
      .select(col("id"), col("g").as("vert"), lit(1L).as("type"),
        lit(0L).as("flag"))
    val b = bMachines.unionByName(bFeatures).mat
    val s = b.groupBy("id").agg(
      count(lit(1)).as("total"),
      sum(when(col("type") === 0L, 1L).otherwise(0L)).as("machines"),
      sum(when(col("type") === 0L, col("flag")).otherwise(0L)).as("n_bad"),
      sum(when(col("type") === 1L, 1L).otherwise(0L)).as("features"))
      .select(col("id"), col("total"), col("machines"), col("features"),
        round(col("n_bad") / col("total").cast("double"), 6).as("bad_ratio"))
    (b.select("id", "vert", "type"), s)
  }
}
