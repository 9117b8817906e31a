package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{PropertyGraph, GraphBuilder, Gr}

/** Curated-dataset registry (reference `datasets/dataset.py:165,267` +
  * YAML metadata `dataset metadata YAMLs`). Zero-egress environment: the
  * classic public-domain graphs ship inline ([[DatasetData]]) instead of
  * downloading from the reference's mirror; the Meta record carries the
  * same fields the reference's YAML does (counts, directedness, weights,
  * provenance), so `registry(name)` answers what `Dataset.metadata` does.
  */
object Datasets {

  /** Mirror of the reference's YAML metadata surface
    * (`datasets/metadata/dolphins.yaml` et al.). `edges` counts canonical
    * undirected pairs (the YAMLs count both stored directions for the
    * symmetric CSVs — e.g. netscience 5484 = 2 × 2742). */
  final case class Meta(name: String, directed: Boolean, weighted: Boolean,
                        vertices: Long, edges: Long,
                        hasLoop: Boolean = false, isMultigraph: Boolean = false,
                        description: String = "", refs: String = "")

  /** Zachary karate club: 34 vertices, 78 undirected edges. */
  val karateEdges: Seq[(Long, Long)] = Seq(
    (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8), (0, 10),
    (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21), (0, 31),
    (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19), (1, 21), (1, 30),
    (2, 3), (2, 7), (2, 8), (2, 9), (2, 13), (2, 27), (2, 28), (2, 32),
    (3, 7), (3, 12), (3, 13), (4, 6), (4, 10), (5, 6), (5, 10), (5, 16),
    (6, 16), (8, 30), (8, 32), (8, 33), (9, 33), (13, 33), (14, 32), (14, 33),
    (15, 32), (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
    (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32), (23, 33),
    (24, 25), (24, 27), (24, 31), (25, 31), (26, 29), (26, 33), (27, 33),
    (28, 31), (28, 33), (29, 32), (29, 33), (30, 32), (30, 33), (31, 32),
    (31, 33), (32, 33)).map { case (a, b) => (a.toLong, b.toLong) }

  /** Two disjoint karate copies, second offset by +34 (reference
    * `datasets/metadata/karate_disjoint.yaml`: 68 vertices, 312 stored
    * directions = 156 canonical pairs) — the reference's DEFAULT_DATASETS
    * multi-component fixture (`testing/__init__.py:39-64`). */
  lazy val karateDisjointEdges: Seq[(Long, Long)] =
    karateEdges ++ karateEdges.map { case (a, b) => (a + 34L, b + 34L) }

  lazy val dolphinsEdges: Seq[(Long, Long)] =
    DatasetData.parseUnweighted(DatasetData.dolphins)
  lazy val polbooksEdges: Seq[(Long, Long)] =
    DatasetData.parseUnweighted(DatasetData.polbooks)
  lazy val netscienceEdges: Seq[(Long, Long, Double)] =
    DatasetData.parseWeighted(DatasetData.netscience)

  /** The reference's one-direction karate storage with original 1-based
    * ids (`datasets/karate-asymmetric.csv`, metadata
    * `karate_asymmetric.yaml`: directed, 78 stored edges) — the directed
    * test fixture the reference loads with symmetrize off. */
  lazy val karateAsymmetricEdges: Seq[(Long, Long, Double)] =
    karateEdges.map { case (a, b) => (a + 1L, b + 1L, 1.0) }

  /** Nvidia demo path graph (`small_line.yaml`: 10 vertices, 9 edges) —
    * the maximum-diameter smoke fixture. */
  val smallLineEdges: Seq[(Long, Long, Double)] =
    (0L until 9L).map(i => (i, i + 1, 1.0))

  /** Nvidia demo directed tree (`small_tree.yaml`: 9 vertices, 11 edges —
    * a DAG, despite the name). */
  val smallTreeEdges: Seq[(Long, Long, Double)] = Seq(
    (0, 1, 1.0), (0, 2, 1.0), (0, 3, 1.0), (0, 4, 1.0),
    (1, 5, 1.0), (2, 5, 1.0), (3, 5, 1.0), (4, 5, 1.0),
    (5, 6, 1.0), (5, 7, 1.0), (5, 8, 1.0))
    .map { case (a, b, w) => (a.toLong, b.toLong, w) }

  /** Nvidia demo 6-vertex weighted graph, both directions stored
    * (`toy_graph.yaml`: directed, symmetric, 16 edges) — the reference's
    * eigenvector/katz centrality test fixture. */
  val toyGraphEdges: Seq[(Long, Long, Double)] = Seq(
    (0, 1, 0.1), (1, 3, 2.1), (1, 4, 1.1), (2, 0, 5.1),
    (2, 1, 3.1), (2, 3, 4.1), (3, 5, 7.2), (4, 5, 3.2),
    (1, 0, 0.1), (3, 1, 2.1), (4, 1, 1.1), (0, 2, 5.1),
    (1, 2, 3.1), (3, 2, 4.1), (5, 3, 7.2), (5, 4, 3.2))
    .map { case (a, b, w) => (a.toLong, b.toLong, w) }

  /** One-direction storage of the same toy graph
    * (`toy_graph_undirected.yaml`: 8 canonical weighted edges). */
  val toyGraphUndirectedEdges: Seq[(Long, Long, Double)] =
    toyGraphEdges.take(8)

  val registry: Map[String, Meta] = Map(
    "karate" -> Meta("karate", directed = false, weighted = false, 34, 78,
      description = "Zachary's karate club social network (1977)",
      refs = "W. W. Zachary, An information flow model for conflict and " +
        "fission in small groups, J. Anthropol. Res. 33, 452-473 (1977)"),
    "karate-disjoint" -> Meta("karate-disjoint", directed = false,
      weighted = false, 68, 156,
      description = "Disjoint variant of the karate dataset: two copies " +
        "of Zachary's club with the second id-shifted by 34",
      refs = "W. W. Zachary, An information flow model for conflict and " +
        "fission in small groups, J. Anthropol. Res. 33, 452-473 (1977)"),
    "dolphins" -> Meta("dolphins", directed = false, weighted = false, 62, 159,
      description = "Frequent associations between 62 dolphins living off " +
        "Doubtful Sound, New Zealand (Lusseau et al. 2003)",
      refs = "D. Lusseau et al., Behav. Ecol. Sociobiol. 54, 396-405 (2003)"),
    "polbooks" -> Meta("polbooks", directed = false, weighted = false, 105, 441,
      description = "Copurchasing network of books about U.S. politics " +
        "around the 2004 presidential election (V. Krebs)",
      refs = "V. Krebs, The political books network, unpublished"),
    "netscience" -> Meta("netscience", directed = false, weighted = true,
      1461, 2742,
      description = "Coauthorship network of scientists working on network " +
        "theory and experiment (M. Newman, May 2006)",
      refs = "M. E. J. Newman, Finding community structure in networks " +
        "using the eigenvectors of matrices, Phys. Rev. E 74, 036104 (2006)"),
    "karate-asymmetric" -> Meta("karate-asymmetric", directed = true,
      weighted = true, 34, 78,
      description = "Zachary's karate club stored one-direction with " +
        "1-based ids (the reference's directed karate fixture)",
      refs = "W. W. Zachary, An information flow model for conflict and " +
        "fission in small groups, J. Anthropol. Res. 33, 452-473 (1977)"),
    "small_line" -> Meta("small_line", directed = false, weighted = true,
      10, 9, description = "10-vertex path graph (Nvidia demo data)"),
    "small_tree" -> Meta("small_tree", directed = true, weighted = true,
      9, 11, description = "9-vertex directed tree/DAG (Nvidia demo data)"),
    "toy_graph" -> Meta("toy_graph", directed = true, weighted = true,
      6, 16, description = "6-vertex weighted demo graph, both directions " +
        "stored (Nvidia demo data)"),
    "toy_graph_undirected" -> Meta("toy_graph_undirected", directed = false,
      weighted = true, 6, 8,
      description = "Canonical one-direction storage of the 6-vertex " +
        "weighted demo graph (Nvidia demo data)"))

  def getEdgelist(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    name match {
      case "karate" => karateEdges.toDF(Gr.SRC, Gr.DST)
      case "karate-disjoint" => karateDisjointEdges.toDF(Gr.SRC, Gr.DST)
      case "dolphins" => dolphinsEdges.toDF(Gr.SRC, Gr.DST)
      case "polbooks" => polbooksEdges.toDF(Gr.SRC, Gr.DST)
      case "netscience" => netscienceEdges.toDF(Gr.SRC, Gr.DST, Gr.WEIGHT)
      case "karate-asymmetric" => karateAsymmetricEdges.toDF(Gr.SRC, Gr.DST, Gr.WEIGHT)
      case "small_line" => smallLineEdges.toDF(Gr.SRC, Gr.DST, Gr.WEIGHT)
      case "small_tree" => smallTreeEdges.toDF(Gr.SRC, Gr.DST, Gr.WEIGHT)
      case "toy_graph" => toyGraphEdges.toDF(Gr.SRC, Gr.DST, Gr.WEIGHT)
      case "toy_graph_undirected" => toyGraphUndirectedEdges.toDF(Gr.SRC, Gr.DST, Gr.WEIGHT)
      case other => throw new IllegalArgumentException(s"unknown dataset: $other")
    }
  }

  def getGraph(spark: SparkSession, name: String): PropertyGraph = {
    val meta = registry(name)
    GraphBuilder.fromEdges(getEdgelist(spark, name), Gr.SRC, Gr.DST,
      if (meta.weighted) Some(Gr.WEIGHT) else None, directed = meta.directed)
  }
}
