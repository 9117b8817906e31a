package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Edge-id ⇄ endpoints lookup and graph predicate/summary helpers.
  *
  * Reference: `cpp/src/lookup/lookup_src_dst_impl.cuh` builds a
  * (edge_id, edge_type) → (src, dst) kv_store; `kv_store.cuh` ≡ a broadcast
  * hash join. Predicates: `simpleGraph.py:1456,1463,1504,972,994`
  * (has_node / has_edge / has_self_loop / counts).
  */
object Lookup {
  import Gr._

  /** Attach deterministic dense edge ids (1-based rank in canonical
    * (src,dst) order) and a type column if absent — the build side of the
    * lookup table. Ids come from the distributed zipWithIndex over the
    * range-partitioned sort, NOT a global window (which would funnel the
    * whole edge list through one partition). */
  def edgeIdTable(edges: DataFrame): DataFrame = {
    val withId = if (edges.columns.contains(EDGE_ID)) edges
      else Renumber.assignIds(edges.orderBy(SRC, DST))
        .withColumn(EDGE_ID, (col(INT_ID) + 1).cast("long")).drop(INT_ID)
    if (withId.columns.contains(EDGE_TYPE)) withId
    else withId.withColumn(EDGE_TYPE, ((col(SRC) + col(DST)) % 3).cast("int"))
  }

  /** Look up endpoints for (edge_id, edge_type) pairs — broadcast the probe
    * side (the reference's kv_store query path). */
  def lookupEdges(table: DataFrame, ids: DataFrame): DataFrame =
    table.join(broadcast(ids), Seq(EDGE_ID, EDGE_TYPE))
      .select(EDGE_ID, EDGE_TYPE, SRC, DST)

  /** One-row structural summary: vertex/edge counts, self-loops,
    * multi-edges, density — the graph predicate surface as a query. */
  def graphSummary(edges: DataFrame): DataFrame = {
    val e = edges.select(SRC, DST)
    val verts = e.select(col(SRC).as(ID)).union(e.select(col(DST).as(ID))).distinct()
    val nV = verts.count()
    val nE = e.count()
    val selfLoops = e.filter(col(SRC) === col(DST)).count()
    val multi = nE - e.distinct().count()
    val density = if (nV > 1) nE.toDouble / (nV.toDouble * (nV - 1)) else 0.0
    e.sparkSession.range(1).select(
      lit(nV).as("num_vertices"), lit(nE).as("num_edges"),
      lit(selfLoops).as("self_loops"), lit(multi).as("multi_edges"),
      round(lit(density), 6).as("density"))
  }
}
