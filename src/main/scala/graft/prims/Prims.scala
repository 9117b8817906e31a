package graft.prims

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Gr._

/** The primitive layer every algorithm is written against — the Spark
  * analogue of cugraph's `cpp/include/cugraph/prims/` .cuh headers (SURVEY §0):
  *
  *   - `aggregateToDst/Src` ≙ `per_v_transform_reduce_incoming_outgoing_e.cuh`
  *     — a join of vertex state onto edges followed by a hash aggregation on
  *     the other endpoint. Catalyst turns it into partial (map-side) + final
  *     aggregation, which is exactly the reference's edge-partition-local
  *     reduce + cross-GPU allreduce.
  *   - `Iterate.loop` ≙ the host-side iteration driver with convergence
  *     checks (`pagerank_impl.cuh:311`), plus lineage control: each round is
  *     `localCheckpoint`ed so 100-round loops don't build 100-deep plans.
  *   - `topKPerKey` ≙ the per-source top-k / fanout-sampling pattern
  *     (`transform_reduce_v_frontier_outgoing_e_by_dst.cuh` + sampling).
  *   - a broadcast-join lookup ≙ `kv_store.cuh`.
  */
object AggregateMessages {

  /** Join per-vertex state onto edge sources, emit a message expression per
    * edge, reduce by destination. `state` must have an `id` column; message
    * expressions may refer to edge columns and state columns.
    *
    * Pull-based algorithms (PageRank/Katz/HITS) call this with the natural
    * edge direction; push-based (BFS/SSSP) with the frontier as `state`.
    * `store_transposed` in the reference is just this join-key choice
    * (SURVEY §1.4) — no physical transpose.
    */
  def toDst(edges: DataFrame, state: DataFrame, msg: Column, agg: Column => Column,
            out: String = "msg"): DataFrame = {
    edges.join(state.withColumnRenamed(ID, SRC), SRC)
      .select(col(DST).as(ID), msg.as("_m"))
      .groupBy(ID).agg(agg(col("_m")).as(out))
  }

  def toSrc(edges: DataFrame, state: DataFrame, msg: Column, agg: Column => Column,
            out: String = "msg"): DataFrame = {
    edges.join(state.withColumnRenamed(ID, DST), DST)
      .select(col(SRC).as(ID), msg.as("_m"))
      .groupBy(ID).agg(agg(col("_m")).as(out))
  }
}

object Iterate {

  /** Materialize a loop-state DataFrame, truncating BOTH lineage and carried
    * plan statistics.
    *
    * `localCheckpoint` keeps the *estimated* Statistics of the plan it cut
    * (LogicalRDD originStats). Joins multiply children's sizeInBytes, so in a
    * loop whose step references the state more than once (Louvain reads
    * `labels` five times per round) the carried estimate is a product of
    * copies of the previous estimate — its digit count grows geometrically
    * and within ~10 rounds every stats visit does minutes of BigInteger
    * multiplication on the driver. Re-basing the checkpointed RDD through
    * `createDataFrame` resets leaf statistics to the constant
    * defaultSizeInBytes, keeping planning O(plan size) per round; AQE still
    * converts joins to broadcast from true runtime shuffle sizes. */
  def materialize(df: DataFrame): DataFrame = {
    val ck = df.localCheckpoint(eager = true, Release.CkLevel)
    ck.sparkSession.createDataFrame(ck.rdd, ck.schema)
  }

  /** Materialize a loop-state frame and read its convergence scalar.
    *
    * Default path (r12): the metric rides the checkpoint action itself via
    * `observe` — the CollectMetrics accumulator is read synchronously off
    * the executed plan, so the per-round count-scan job disappears.
    * History: the r7 A/B measured observe SLOWER on the ECG ensemble
    * (46.3s vs 43.0s) and the scan stayed default through r11; VERDICT r11
    * item #4 (community job floor) forced a re-A/B on the r12 round
    * shapes, which flipped the verdict — same host, interleaved runs:
    * q_ecg 43.3/49.9s scan vs 43.3/46.1s observe (parity, 139→118 jobs),
    * q_louvain 41.5s/84 → 40.5s/74, q_wcc_star 20.0s/50 → 18.5s/37,
    * q_scc 16.4s/60 → 16.3s/52. Fewer jobs at equal-or-better wall is
    * exactly the scheduler-floor lever the sf0.1 sweep is bound by, and at
    * data scale the accumulator add rides rows already being serialized
    * for the checkpoint while the scan it replaces costs a full task wave
    * over the cached frame. GRAFT_NO_OBSERVE=1 restores the scan path
    * (the listener-bus `Observation` variant stays rejected — it blocked
    * 100ms+ per round on async event delivery). If the metric does not
    * surface (defensive — never seen), the scan fallback still runs. */
  private val noObserve = sys.env.contains("GRAFT_NO_OBSERVE")
  def materializeCount(df: DataFrame, metric: Column,
                       scan: DataFrame => Long): (DataFrame, Long) = {
    if (!noObserve) {
      val named = df.observe("_graft_mc", metric.as("_m"))
      val ck = materialize(named)
      named.queryExecution.observedMetrics.get("_graft_mc") match {
        case Some(row) =>
          return (ck, Option(row.getAs[Any]("_m")).map(_.asInstanceOf[Number].longValue).getOrElse(0L))
        case None => return (ck, scan(ck))
      }
    }
    val ck = materialize(df)
    (ck, scan(ck))
  }

  /** Iteration driver for fixed-point DataFrame loops.
    *
    * Each step maps the current state DataFrame to the next; every
    * `checkpointEvery` rounds the state is materialized to truncate lineage — the Spark analogue of the reference keeping device
    * buffers across iterations instead of replaying the whole history.
    * `converged` (optional) is evaluated every `checkEvery` rounds; it costs
    * a job, so convergence checks are batched exactly as SURVEY §7.4-1
    * prescribes.
    */
  def loop(init: DataFrame, maxIter: Int,
           step: (DataFrame, Int) => DataFrame,
           converged: (DataFrame, DataFrame) => Boolean = null,
           checkEvery: Int = 1,
           checkpointEvery: Int = 3,
           releasePrev: Boolean = false): DataFrame =
    loopWithStatus(init, maxIter, step, converged, checkEvery, checkpointEvery,
      releasePrev)._1

  /** [[loop]] plus the convergence outcome: (final state, converged,
    * iterations run). With no `converged` predicate (fixed-iteration mode)
    * the flag is vacuously true — there is no tolerance contract to miss.
    * Feeds the reference's `fail_on_nonconvergence` surface
    * (`link_analysis/pagerank.py:78`). */
  /** `releasePrev`: eagerly [[Release.free]] the PREVIOUS materialized
    * state once the next one is materialized (and any convergence check on
    * the pair has run). Safe iff `step`/`converged` never retain an old
    * state frame outside the loop — with it a 100-round loop holds ONE
    * state's checkpoint blocks instead of 100 (the composed-operator heap
    * finding, BASELINE.md round-10). */
  def loopWithStatus(init: DataFrame, maxIter: Int,
                     step: (DataFrame, Int) => DataFrame,
                     converged: (DataFrame, DataFrame) => Boolean = null,
                     checkEvery: Int = 1,
                     checkpointEvery: Int = 3,
                     releasePrev: Boolean = false): (DataFrame, Boolean, Int) = {
    var cur = materialize(init)
    var lastMat = cur
    var it = 0
    var done = false
    while (it < maxIter && !done) {
      val nxt0 = step(cur, it)
      val wasMat = (it + 1) % checkpointEvery == 0 || converged != null
      val nxt = if (wasMat) materialize(nxt0) else nxt0
      if (converged != null && (it + 1) % checkEvery == 0)
        done = converged(cur, nxt)
      if (releasePrev && wasMat && (lastMat ne nxt)) {
        Release.free(lastMat)
        lastMat = nxt
      }
      cur = nxt
      it += 1
    }
    (cur, converged == null || done, it)
  }
}

/** Syntax for [[Iterate.materialize]]: `df.mat` — the required checkpoint
  * form inside every iterative loop (plain localCheckpoint carries
  * exploding stat estimates; see Iterate.materialize). */
object Mat {
  implicit class MatOps(private val df: DataFrame) extends AnyVal {
    def mat: DataFrame = Iterate.materialize(df)
  }
}

/** Eager release of dead [[Iterate.materialize]] blocks.
  *
  * `localCheckpoint` blocks are freed only when the driver GC collects the
  * RDD handle AND the ContextCleaner drains — on a long composed operator
  * that never idles the driver, effectively never. So a composed pipeline
  * (Leiden = Louvain levels + refinement WCC; ECG = ensemble + final pass)
  * holds EVERY phase's checkpoint blocks concurrently: the scale-22 leiden
  * probe needed a 48g heap where each single kernel runs in 32g, purely
  * from retained dead-phase storage. The fix is what a real engine does
  * between pipeline stages: free a phase's buffers the moment the next
  * phase's input is materialized.
  *
  * [[free]] walks the frame's RDD lineage and unpersists the FIRST
  * persisted ancestor on each branch (the localCheckpoint block holder —
  * lineage below it was already truncated). Call it ONLY on frames whose
  * data can never be read again: a loop state after the next state is
  * materialized, a phase input after the phase output is materialized.
  * Reading a freed frame throws (localCheckpointed RDDs cannot recompute),
  * so misuse fails loudly rather than silently recomputing — every free
  * site below is covered by the exact-gate suite. */
object Release {
  import org.apache.spark.rdd.RDD
  import org.apache.spark.storage.StorageLevel

  /** Storage level for every [[Iterate.materialize]] checkpoint:
    * MEMORY_AND_DISK_SER, not the localCheckpoint default MEMORY_AND_DISK.
    * Deserialized storage holds one on-heap UnsafeRow OBJECT per row
    * (header + reference + padded byte array) and unrolls each partition
    * through an Object[] vector whose doubling resize needs contiguous
    * heap at the worst moment — the r11 scale-22 leiden probe OOM'd in
    * exactly that resize (MemoryStore.putIteratorAsValues →
    * SizeTrackingVector) while storing a 134M-row frame with 32g. The
    * serialized form is ~2-3× denser, unrolls through chunked byte
    * buffers (no big-array resize), and spills incrementally — what a
    * data-scale engine stores between pipeline stages anyway. Loop states
    * are read 1-3× per round, so the per-read deserialization is noise
    * against the round's shuffle (r11 full bench on this binary confirms
    * the totals hold). GRAFT_CK_MEMORY=1 restores the deserialized level
    * for A/B. */
  val CkLevel: StorageLevel =
    if (sys.env.contains("GRAFT_CK_MEMORY")) StorageLevel.MEMORY_AND_DISK
    else StorageLevel.MEMORY_AND_DISK_SER

  // Spark WARNs on every unpersist of a localCheckpointed RDD ("lineage has
  // been truncated and cannot be recomputed") — here that is the intended
  // operation, on provably-dead frames, and a long loop would emit one line
  // per freed round. Quiet exactly that logger category once.
  private lazy val quietUnpersistWarn: Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD", org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () }

  /** Unpersist the checkpoint/cache blocks behind each frame. Null-safe so
    * loop code can free an optional carried frame unconditionally. */
  def free(dfs: DataFrame*): Unit = {
    quietUnpersistWarn
    dfs.foreach(df => if (df != null) freeRdd(df.rdd))
  }

  private def freeRdd(rdd: RDD[_]): Unit =
    if (rdd.getStorageLevel != StorageLevel.NONE) rdd.unpersist(blocking = false)
    else rdd.dependencies.foreach(d => freeRdd(d.rdd))
}

/** Size-aware broadcast of per-vertex state into edge joins.
  *
  * Every iterative algorithm's hot join is `edges ⋈ state-on-vertex`; when
  * the state side is known-small, broadcasting it turns the per-round
  * shuffle of the (billions-of-rows) edge table into a map-side hash join —
  * the single biggest lever for iterative cost at scale. At huge vertex
  * counts the state no longer fits in an executor and the hint degrades to
  * a plain join (AQE then picks the strategy from runtime shuffle sizes).
  * Callers pass the row count they already track (frontier size, |V|), so
  * the decision costs no extra job.
  */
object Hint {
  def state(df: DataFrame, nRows: Long, maxRows: Long = 5000000L): DataFrame =
    if (nRows >= 0 && nRows <= maxRows) broadcast(df) else df
}

/** Scoped AQE disable for iterative loops whose joins are ALL explicitly
  * planned (broadcast via [[Hint.state]] or salted via [[Skew]]).
  *
  * AQE materializes every exchange as its own query-stage job; on an
  * iterative loop that is pure scheduler floor per round — the r8 Louvain
  * audit measured 7 → 3 jobs/round at identical results, and AQE's two
  * runtime contributions (broadcast conversion, skew split) are exactly
  * the decisions such loops already make explicitly from tracked state
  * sizes. Callers must NOT wrap plans that rely on AQE's stats-blind
  * rescue (unhinted joins of materialized frames past the broadcast gate):
  * gate on the same size bound the hints use. The flag is session-global,
  * hence the save/restore; reentrant nesting is safe (restores the outer
  * value). */
object Aqe {
  /** Operational escape hatch (and the A/B knob behind the BASELINE.md
    * job-count audits): GRAFT_KEEP_AQE=1 makes [[off]] a no-op, so a
    * deployment can re-enable AQE inside the hinted loops without a code
    * change if its host profile rewards runtime re-planning more than it
    * charges per query-stage job. */
  private val keep = sys.env.contains("GRAFT_KEEP_AQE")
  def off[T](spark: org.apache.spark.sql.SparkSession)(body: => T): T =
    off(spark, -1L)(body)

  /** [[off]] that ALSO right-sizes reduce-side parallelism to the loop's
    * tracked row count. Disabling AQE loses its post-shuffle partition
    * coalescing, and these loops exchange SMALL frames (frontier / label /
    * pair state under the broadcast gate): at the session's full shuffle
    * width every tiny per-round exchange launches a whole task wave —
    * pure scheduler floor that AQE used to coalesce away (measured r8:
    * q_wcc_star 38.8s at fixed 32 partitions vs 23.8s under AQE on the
    * same host). Scoping `spark.sql.shuffle.partitions` to ~500k tracked
    * rows per reduce task (the same sizing rule ScaleProbe pinned at
    * scale 22, clamped to never exceed the session setting) restores the
    * coalescing deterministically — partitions sized to the DATA, which
    * is also the rule that holds at 100 TB. Reduce keys in these loops
    * are vertex-/pair-keyed, so `stateRows` bounds reduce-side rows even
    * when the map side scans a much larger edge stream. */
  def off[T](spark: org.apache.spark.sql.SparkSession, stateRows: Long)(body: => T): T =
    if (keep) body else {
      val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
      val beforeParts = spark.conf.get("spark.sql.shuffle.partitions", "200")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      if (stateRows >= 0) {
        val sized = math.max(1L, math.min(beforeParts.toLong, stateRows / 500000L + 1L))
        spark.conf.set("spark.sql.shuffle.partitions", sized.toString)
      }
      try body finally {
        spark.conf.set("spark.sql.adaptive.enabled", before)
        spark.conf.set("spark.sql.shuffle.partitions", beforeParts)
      }
    }
}

/** Skew-join salting for power-law graphs (SURVEY §7.4-5) — the explicit
  * fallback when AQE's runtime skew split doesn't apply (e.g. the skewed
  * side is a materialized loop state, or the join is inside a stage AQE
  * cannot re-plan). The big side gets a deterministic per-row salt, the
  * small side is replicated across all salt values, and the join key grows
  * by the salt column — a hub key's rows now spread over `salt` tasks. */
object Skew {
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int = 16, joinType: String = "inner"): DataFrame = {
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(salt)).cast("int"))
    val smallS = small.withColumn("_salt", explode(sequence(lit(0), lit(salt - 1))))
    bigS.join(smallS, (keys :+ "_salt").toIndexedSeq, joinType).drop("_salt")
  }
}

object TopK {

  /** Top-k rows per key — THE canonical Spark pattern for per-source fanout
    * sampling and similarity top-k (SURVEY §2.7): window row_number ≤ k.
    * For very large fanouts a TypedImperativeAggregate reservoir would beat
    * the sort; the window form is whole-stage-codegen'd and AQE-skew-safe. */
  def perKey(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= k).drop("_rn")
  }
}
