package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, DoubleType, StringType}

/** Class-level graph surface — the reference's `MultiGraph` / `Tree` /
  * `NPartiteGraph` / `BiPartiteGraph` subclasses
  * (`structure/graph_classes.py:837-1045`). The carrier stays
  * [[PropertyGraph]]: classes are property tags plus the builder behaviors
  * they change (a MultiGraph KEEPS parallel edges where the plain builder's
  * symmetrize collapses them; partite graphs carry declared partition sets).
  */
object GraphClasses {
  import Gr._

  /** MultiGraph builder (`graph_classes.py:837-864`): parallel (src, dst)
    * rows survive construction, and each edge gets a per-pair occurrence
    * index `edge_seq` (1..multiplicity) so individual parallel edges stay
    * addressable — the role of the reference's per-edge ids. The window is
    * partitioned by the endpoint pair: one shuffle on the pair key, no
    * global sort, so the id assignment scales like any pair-keyed agg.
    * Undirected multigraphs keep BOTH directions of every parallel copy
    * (no dedup — that is the class's defining difference). */
  def multiGraphFromEdges(df: DataFrame, srcCol: String, dstCol: String,
                          weightCol: Option[String] = None,
                          directed: Boolean = true): PropertyGraph = {
    val base = weightCol match {
      case Some(w) => df.select(col(srcCol).cast(LongType).as(SRC),
        col(dstCol).cast(LongType).as(DST), col(w).cast(DoubleType).as(WEIGHT))
      case None => df.select(col(srcCol).cast(LongType).as(SRC),
        col(dstCol).cast(LongType).as(DST))
    }
    val oriented =
      if (directed) base
      else base.union(weightCol match {
        case Some(_) => base.select(col(DST).as(SRC), col(SRC).as(DST), col(WEIGHT))
        case None => base.select(col(DST).as(SRC), col(SRC).as(DST))
      })
    // parallel edges with identical (src, dst[, weight]) are interchangeable,
    // so the within-pair order only needs to be SOME total order per run;
    // weight-ascending keeps it deterministic when weights differ
    val ord = if (weightCol.isDefined) col(WEIGHT) else lit(1)
    val edges = oriented.withColumn("edge_seq",
      row_number().over(Window.partitionBy(SRC, DST).orderBy(ord)).cast(LongType))
    PropertyGraph(Structure.extractVertexList(edges), edges,
      GraphProperties(directed, weightCol.isDefined, multiEdge = true))
  }

  /** Tree (`graph_classes.py:866-873`): a property tag, exactly as in the
    * reference — construction does not parse the edge list for acyclicity
    * (callers that need the proof run wcc/topologicalSort). */
  def treeFromEdges(df: DataFrame, srcCol: String, dstCol: String,
                    weightCol: Option[String] = None,
                    directed: Boolean = false): PropertyGraph = {
    val g = GraphBuilder.fromEdges(df, srcCol, dstCol, weightCol, directed)
    g.copy(props = g.props.copy(tree = true))
  }

  /** N-partite graph (`graph_classes.py:877-1041`): a graph plus DECLARED
    * partition sets. Like the reference, `isMultipartite`/`isBipartite`
    * answer from the declaration, not from parsing the edge list
    * (`graph_classes.py:1037,1056`) — `crossPartitionViolations` is the
    * explicit structural check for callers that want one. */
  final case class NPartiteGraph(graph: PropertyGraph,
                                 partitions: DataFrame, // (set_name, id)
                                 bipartite: Boolean) {
    def isMultipartite: Boolean = true
    def isBipartite: Boolean = bipartite

    /** Reference `add_nodes_from(nodes, multipartite=name)`: register the
      * vertices of one named partition. */
    def addNodesFrom(nodes: DataFrame, setName: String): NPartiteGraph = {
      val p = nodes.select(lit(setName).cast(StringType).as("set_name"),
        col(nodes.columns.head).cast(LongType).as(ID))
      copy(partitions = partitions.union(p))
    }

    /** Reference `npartiteGraphImpl.sets()`: the declared partitions. */
    def sets(): DataFrame = partitions

    /** Edges whose two endpoints fall in the SAME declared partition — empty
      * iff the declaration is structurally consistent. Two hash joins on the
      * vertex id; the partition frame is O(V). */
    def crossPartitionViolations(): DataFrame =
      graph.edges
        .join(partitions.select(col(ID).as(SRC), col("set_name").as("sa")), SRC)
        .join(partitions.select(col(ID).as(DST), col("set_name").as("sb")), DST)
        .filter(col("sa") === col("sb"))
  }

  /** Reference `NPartiteGraph.from_cudf_edgelist` (`graph_classes.py:882`);
    * partitions start empty and arrive via [[NPartiteGraph.addNodesFrom]]. */
  def nPartiteFromEdges(df: DataFrame, srcCol: String, dstCol: String,
                        weightCol: Option[String] = None,
                        directed: Boolean = false,
                        bipartite: Boolean = false): NPartiteGraph = {
    val g = GraphBuilder.fromEdges(df, srcCol, dstCol, weightCol, directed)
    val spark = df.sparkSession
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("set_name", StringType),
        org.apache.spark.sql.types.StructField(ID, LongType))))
    NPartiteGraph(g, empty, bipartite)
  }

  /** Reference `BiPartiteGraph` (`graph_classes.py:1045-1060`): an n-partite
    * graph declared bipartite. */
  def biPartiteFromEdges(df: DataFrame, srcCol: String, dstCol: String,
                         weightCol: Option[String] = None,
                         directed: Boolean = false): NPartiteGraph =
    nPartiteFromEdges(df, srcCol, dstCol, weightCol, directed, bipartite = true)
}
