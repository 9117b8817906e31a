package graft.algos

import org.apache.spark.sql.DataFrame
import org.apache.spark.ml.clustering.PowerIterationClustering
import graft.core.{PropertyGraph, Structure, Gr}

/** Spectral graph clustering (reference: legacy Lanczos+kmeans
  * `algorithms.hpp:878` `spectralBalancedCutClustering`, `:914`
  * `spectralModularityMaximizationClustering`; quality analyzers live in
  * graft.algos.Community).
  *
  * Spark-native realization: power-iteration clustering (Lin & Cohen, ICML
  * 2010) from MLlib — the power-method embedding of the normalized affinity
  * matrix followed by k-means on the 1-D embedding, i.e. the same
  * eigenvector machinery the reference's Lanczos path approximates, but
  * expressed over the (src, dst, weight) edge DataFrame and therefore
  * distributed by construction.
  */
object Spectral {
  import Gr._

  /** Balanced-cut-style clustering into k parts. Output (id, cluster). */
  def balancedCut(g: PropertyGraph, k: Int, maxIter: Int = 10): DataFrame = {
    val und = Structure.removeSelfLoops(
      Structure.symmetrize(g.weightedEdges.select(SRC, DST, WEIGHT), sumWeights = false))
    val pic = new PowerIterationClustering()
      .setK(k).setMaxIter(maxIter).setInitMode("degree")
      .setSrcCol(SRC).setDstCol(DST).setWeightCol(WEIGHT)
    pic.assignClusters(und)
      .select(org.apache.spark.sql.functions.col(ID),
        org.apache.spark.sql.functions.col("cluster").cast("long").as("cluster"))
  }

  /** Modularity-maximization flavor: same embedding, random init (matches
    * the reference exposing two spectral entry points). */
  def modularityMaximization(g: PropertyGraph, k: Int, maxIter: Int = 10): DataFrame = {
    val und = Structure.removeSelfLoops(
      Structure.symmetrize(g.weightedEdges.select(SRC, DST, WEIGHT), sumWeights = false))
    val pic = new PowerIterationClustering()
      .setK(k).setMaxIter(maxIter).setInitMode("random")
      .setSrcCol(SRC).setDstCol(DST).setWeightCol(WEIGHT)
    pic.assignClusters(und)
      .select(org.apache.spark.sql.functions.col(ID),
        org.apache.spark.sql.functions.col("cluster").cast("long").as("cluster"))
  }
}
