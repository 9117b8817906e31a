package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{PropertyGraph, GraphBuilder, Gr}

/** Graph projections over the driver-provided TPC-H-ish parquet tables
  * (TESTDATA.md / FIXTURES.md §4). Each projection is defined so the DuckDB
  * oracle can reconstruct the identical edge list with plain SQL.
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}

object Fixtures {
  import Gr._

  /** Supplier co-order graph: suppliers appearing in the same order, canonical
    * src<dst, weight = number of shared orders. ~100 vertices at any SF —
    * the small dense fixture for triangle/similarity/PageRank/BFS oracles. */
  def supplierEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").select("l_orderkey", "l_suppkey").distinct()
    val a = li.select(col("l_orderkey"), col("l_suppkey").as(SRC))
    val b = li.select(col("l_orderkey"), col("l_suppkey").as(DST))
    a.join(b, "l_orderkey").filter(col(SRC) < col(DST))
      .groupBy(SRC, DST).agg(count(lit(1)).cast("double").as(WEIGHT))
  }

  /** SQL prelude reconstructing supplierEdges for the DuckDB oracle. */
  val SUPP_EDGES_SQL: String =
    """supp_edges AS MATERIALIZED (
      |  SELECT a.l_suppkey AS src, b.l_suppkey AS dst, CAST(count(*) AS DOUBLE) AS weight
      |  FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) a
      |  JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem) b USING (l_orderkey)
      |  WHERE a.l_suppkey < b.l_suppkey
      |  GROUP BY 1, 2
      |)""".stripMargin

  val SUPP_VERTS_SQL: String =
    "verts AS MATERIALIZED (SELECT src AS id FROM supp_edges UNION SELECT dst FROM supp_edges)"

  /** Symmetrized (both directions) supplier adjacency, for undirected algos. */
  val SUPP_UND_SQL: String =
    "und AS MATERIALIZED (SELECT src, dst, weight FROM supp_edges UNION ALL SELECT dst, src, weight FROM supp_edges)"

  def supplierGraph(spark: SparkSession, dir: String): PropertyGraph =
    GraphBuilder.fromEdges(supplierEdges(spark, dir), SRC, DST, Some(WEIGHT), directed = true)

  /** Customer→supplier bipartite graph (supplier ids offset by 100000 to
    * keep the id spaces disjoint): weight = total extended price. */
  def custSuppEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
    val o = Tables(spark, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_custkey").as(SRC), (col("l_suppkey") + 100000L).as(DST))
      .agg(sum("l_extendedprice").as(WEIGHT))
  }

  val CUSTSUPP_EDGES_SQL: String =
    """cs_edges AS MATERIALIZED (
      |  SELECT o_custkey AS src, l_suppkey + 100000 AS dst, sum(l_extendedprice) AS weight
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1, 2
      |)""".stripMargin

  def custSuppGraph(spark: SparkSession, dir: String): PropertyGraph =
    GraphBuilder.fromEdges(custSuppEdges(spark, dir), SRC, DST, Some(WEIGHT), directed = true)

  /** Part co-order graph (larger: ~2000 vertices at sf0.01) — parts appearing
    * in the same order. For WCC/community at a bigger scale. */
  def partEdges(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables(spark, dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    val a = li.select(col("l_orderkey"), col("l_partkey").as(SRC))
    val b = li.select(col("l_orderkey"), col("l_partkey").as(DST))
    a.join(b, "l_orderkey").filter(col(SRC) < col(DST))
      .groupBy(SRC, DST).agg(count(lit(1)).cast("double").as(WEIGHT))
  }

  val PART_EDGES_SQL: String =
    """part_edges AS MATERIALIZED (
      |  SELECT a.l_partkey AS src, b.l_partkey AS dst, CAST(count(*) AS DOUBLE) AS weight
      |  FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
      |  JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b USING (l_orderkey)
      |  WHERE a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |)""".stripMargin

  def partGraph(spark: SparkSession, dir: String): PropertyGraph =
    GraphBuilder.fromEdges(partEdges(spark, dir), SRC, DST, Some(WEIGHT), directed = true)

  def documents(spark: SparkSession, dir: String): DataFrame = Tables(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = Tables(spark, dir, "embeddings")
  def events(spark: SparkSession, dir: String): DataFrame = Tables(spark, dir, "events")
}
