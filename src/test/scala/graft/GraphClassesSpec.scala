package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.core.Gr._

/** Class-level graph surface: MultiGraph keeps parallel edges, density
  * semantics, Tree tag, declared bi/n-partite partitions. */
class GraphClassesSpec extends SparkSpec {

  test("MultiGraph keeps parallel edges and numbers each pair 1..k") {
    val df = wEdgeDF(Seq((1L, 2L, 5.0), (1L, 2L, 3.0), (1L, 2L, 7.0),
      (2L, 3L, 1.0), (2L, 3L, 1.0), (3L, 1L, 2.0)))
    val mg = GraphClasses.multiGraphFromEdges(df, SRC, DST, Some(WEIGHT))
    assert(mg.props.multiEdge && mg.isMultigraph)
    assert(mg.numEdges == 6) // nothing collapsed
    val seqs = mg.edges.filter(col(SRC) === 1L && col(DST) === 2L)
      .orderBy("edge_seq").collect().map(r => (r.getLong(3), r.getDouble(2)))
    assert(seqs.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(seqs.map(_._2).toSeq == Seq(3.0, 5.0, 7.0)) // weight-ascending order
  }

  test("undirected MultiGraph keeps both directions of every parallel copy") {
    val df = edgeDF(Seq((1L, 2L), (1L, 2L), (2L, 3L)))
    val mg = GraphClasses.multiGraphFromEdges(df, SRC, DST, None, directed = false)
    assert(mg.numEdges == 6) // 3 edges x 2 directions, no dedup
    assert(mg.edges.filter(col(SRC) === 2L && col(DST) === 1L).count() == 2)
  }

  test("density: simple-graph value; refused on a MultiGraph") {
    // directed triangle on 3 vertices: 3 / (3*2) = 0.5
    val g = graphOf(Seq((1L, 2L), (2L, 3L), (3L, 1L)))
    assert(g.density == 0.5)
    // undirected square: stored 8 directed rows / (4*3) = 2E/(V(V-1))
    val u = graphOf(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    val und = PropertyGraph(u.vertices, Structure.symmetrize(u.edges),
      u.props.copy(directed = false))
    assert(math.abs(und.density - 8.0 / 12.0) < 1e-12)
    val mg = GraphClasses.multiGraphFromEdges(edgeDF(Seq((1L, 2L), (1L, 2L))), SRC, DST)
    assertThrows[IllegalArgumentException](mg.density)
  }

  test("Tree is a property tag, as in the reference") {
    val t = GraphClasses.treeFromEdges(edgeDF(Seq((1L, 2L), (1L, 3L), (3L, 4L))),
      SRC, DST, directed = true)
    assert(t.props.tree)
    assert(!GraphBuilder.fromEdges(edgeDF(Seq((1L, 2L))), SRC, DST).props.tree)
  }

  test("bi/n-partite: declared sets, predicates, and the structural check") {
    val sp = spark
    import sp.implicits._
    // bipartite edges: {1,2} x {10,11}
    val bg0 = GraphClasses.biPartiteFromEdges(
      edgeDF(Seq((1L, 10L), (2L, 11L), (1L, 11L))), SRC, DST)
    assert(bg0.isBipartite && bg0.isMultipartite)
    val bg = bg0.addNodesFrom(Seq(1L, 2L).toDF("id"), "left")
      .addNodesFrom(Seq(10L, 11L).toDF("id"), "right")
    assert(bg.sets().groupBy("set_name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap == Map("left" -> 2L, "right" -> 2L))
    assert(bg.crossPartitionViolations().isEmpty)
    // an edge inside one declared set is flagged
    val bad = GraphClasses.biPartiteFromEdges(
      edgeDF(Seq((1L, 10L), (1L, 2L))), SRC, DST)
      .addNodesFrom(Seq(1L, 2L).toDF("id"), "left")
      .addNodesFrom(Seq(10L).toDF("id"), "right")
    assert(bad.crossPartitionViolations().count() == 2) // both directions
    // n-partite without the bipartite declaration
    val np = GraphClasses.nPartiteFromEdges(edgeDF(Seq((1L, 10L))), SRC, DST)
    assert(np.isMultipartite && !np.isBipartite)
  }
}
