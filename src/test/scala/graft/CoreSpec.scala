package graft

import org.apache.spark.sql.functions._
import graft.core._
import graft.core.Gr._

/** Structure / renumber / builder invariants (SURVEY §5-d property tests). */
class CoreSpec extends SparkSpec {

  test("symmetrize doubles canonical edges and is idempotent on the pair set") {
    val e = edgeDF(Seq((1L, 2L), (2L, 3L), (1L, 3L)))
    val und = Structure.symmetrize(e)
    assert(und.count() == 6)
    val again = Structure.symmetrize(und)
    assert(again.select(SRC, DST).distinct().count() == und.select(SRC, DST).distinct().count())
  }

  test("symmetrize with conflicting reversed weights keeps the min (reference symmetrize_df)") {
    // ADVICE r1: fixture where (a,b) and (b,a) carry different weights
    val e = wEdgeDF(Seq((1L, 2L, 5.0), (2L, 1L, 3.0)))
    val und = Structure.symmetrize(e)
    val ws = und.orderBy(SRC).collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ws.toSet == Set((1L, 2L, 3.0), (2L, 1L, 3.0)))
  }

  test("renumber then unrenumber is the identity on external ids") {
    import spark.implicits._
    val ext = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("x", "a"))
      .toDF("es", "ed").withColumn(WEIGHT, lit(1.0))
    val g = GraphBuilder.fromEdgesRenumbered(ext, Seq("es"), Seq("ed"),
      Some(WEIGHT), directed = true, sorted = true)
    // internal ids are dense [0, V)
    val ids = g.vertices.select(ID).collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(0L until ids.length))
    val back = g.unrenumber(g.edges.select(col(SRC)), SRC)
      .collect().map(_.getString(0)).sorted
    assert(back.sameElements(Array("a", "b", "c", "x"))) // one edge per source
  }

  test("degrees on a known directed graph") {
    val g = graphOf(Seq((1L, 2L), (1L, 3L), (2L, 3L)))
    val d = Structure.degrees(g).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(d(1L) == (0L, 2L)) // (in, out)
    assert(d(3L) == (2L, 0L))
  }

  test("canonicalize orders endpoints and dedups") {
    val e = edgeDF(Seq((2L, 1L), (1L, 2L), (3L, 1L)))
    val c = Structure.canonicalize(e).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(c == Set((1L, 2L), (1L, 3L)))
  }

  test("coarsen sums parallel edge weights by label") {
    val e = wEdgeDF(Seq((1L, 2L, 1.0), (1L, 3L, 2.0), (2L, 3L, 4.0)))
    import spark.implicits._
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF(ID, "label")
    val c = Structure.coarsen(e, labels).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c((10L, 10L)) == 1.0 && c((10L, 20L)) == 6.0)
  }

  test("graph summary counts") {
    val e = edgeDF(Seq((1L, 2L), (1L, 2L), (2L, 2L), (2L, 3L)))
    val row = Lookup.graphSummary(e).collect().head
    assert(row.getAs[Long]("num_vertices") == 3)
    assert(row.getAs[Long]("num_edges") == 4)
    assert(row.getAs[Long]("self_loops") == 1)
    assert(row.getAs[Long]("multi_edges") == 1)
  }

  test("explicit vertex list keeps isolated vertices through construction") {
    import spark.implicits._
    val e = edgeDF(Seq((1L, 2L)))
    val verts = Seq(1L, 2L, 99L).toDF(ID)
    val g = GraphBuilder.fromEdges(e, SRC, DST, None, directed = false,
      vertices = Some(verts))
    assert(g.numVertices == 3)
    val comp = algos.Components.wcc(g).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(99L) == 99L) // isolated vertex is its own component
    val deg = Structure.degrees(g).filter(col(ID) === 99L).first()
    assert(deg.getLong(1) == 0L && deg.getLong(2) == 0L)
  }

  test("partition invariance: PageRank identical on 1 vs 32 partitions") {
    val edges = (0L until 40L).map(i => (i, (i * i + 1) % 40)).filter(p => p._1 != p._2)
    def ranks(parts: Int): Map[Long, Double] = {
      val e = Structure.symmetrize(edgeDF(edges)).repartition(parts)
      val g = core.PropertyGraph(Structure.extractVertexList(e), e,
        GraphProperties(directed = false))
      algos.PageRank.runFixed(g, iters = 8).collect()
        .map(r => r.getLong(0) -> (math.rint(r.getDouble(1) * 1e9) / 1e9)).toMap
    }
    assert(ranks(1) == ranks(32))
  }
}
