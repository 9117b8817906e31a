package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hypergraph construction: a wide "event" DataFrame becomes a bipartite
  * graph of row-nodes ↔ attribute-value-nodes, or (direct mode) a graph
  * between attribute-value-nodes that co-occur in a row.
  *
  * Reference: `structure/hypergraph.py:33-308` — a pure DataFrame program
  * (melt + delimiter-joined keys + unions); we use the same shape:
  * `stack`-style unpivot via a union of selects, `concat_ws` node keys.
  */
object Hypergraph {

  val DELIM = "::"

  /** Bipartite hypergraph edges: one edge per (row, categorical column).
    * @return DataFrame(event_id, col_name, node_key) where
    * node_key = "<col><DELIM><value>" (reference's categorical node ids). */
  def edges(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.select(col(idCol).cast("long").as("event_id"),
        lit(c).as("col_name"),
        concat_ws(DELIM, lit(c), col(c).cast("string")).as("node_key"))
        .filter(col(c).isNotNull)
    }.reduce(_ union _)

  /** Attribute-value nodes with per-column counts. */
  def nodes(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame =
    edges(df, idCol, cols).groupBy("col_name", "node_key")
      .agg(count(lit(1)).as("n_rows"))

  /** Direct mode: connect value-nodes that co-occur in a row (no row nodes),
    * like the reference's `direct=True` (`hypergraph.py:33`). */
  def directEdges(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame = {
    val e = edges(df, idCol, cols)
    val a = e.select(col("event_id"), col("node_key").as("src_key"))
    val b = e.select(col("event_id"), col("node_key").as("dst_key"))
    a.join(b, "event_id").filter(col("src_key") < col("dst_key"))
      .groupBy("src_key", "dst_key").agg(count(lit(1)).as("weight"))
  }
}
