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
    * node_key = "<col><DELIM><value>" (reference's categorical node ids).
    * `categoricalMetadata = false` (reference `hypergraph.py`
    * categorical_metadata option) emits the RAW value as the node key —
    * values from different columns then share nodes. `dropNa = false`
    * keeps null attribute values as explicit "<col>::null" nodes. */
  def edges(df: DataFrame, idCol: String, cols: Seq[String],
            categoricalMetadata: Boolean = true, dropNa: Boolean = true): DataFrame =
    cols.map { c =>
      // NB: concat_ws SKIPS null arguments (never returns null), so the
      // null-keeping path substitutes the value explicitly
      val v = if (dropNa) col(c).cast("string")
              else coalesce(col(c).cast("string"), lit("null"))
      val key = if (categoricalMetadata) concat(lit(s"$c$DELIM"), v) else v
      val base = df.select(col(idCol).cast("long").as("event_id"),
        lit(c).as("col_name"), key.as("node_key"))
      if (dropNa) base.filter(col(c).isNotNull) else base
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

  /** Direct mode with edge attributes retained (reference
    * `drop_edge_attrs=False`): one row per co-occurrence, carrying the
    * originating event id instead of collapsing to a weight. */
  def directEdgesWithEvent(df: DataFrame, idCol: String, cols: Seq[String]): DataFrame = {
    val e = edges(df, idCol, cols)
    val a = e.select(col("event_id"), col("node_key").as("src_key"))
    val b = e.select(col("event_id"), col("node_key").as("dst_key"))
    a.join(b, "event_id").filter(col("src_key") < col("dst_key"))
      .select(col("event_id"), col("src_key"), col("dst_key"))
  }
}
