package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // deterministic name order: cross-round per-query comparisons would
    // otherwise shift with Map iteration order (the first query touching a
    // shared fixture pays its build)
    // optional arg: comma-separated query subset (iteration aid; the
    // driver's per-round bench passes no args and runs everything)
    val subset = if (args.nonEmpty) Some(args(0).split(",").toSet) else None
    // shared fixtures are built OFF the per-query clock (their cost is
    // reported separately below and included in the total): per-query
    // numbers otherwise charge each fixture's build to whichever query
    // touches it first, which moves across rounds as the name set changes.
    // Subset runs skip the prewarm — they exist to see one query's full
    // isolated cost.
    val warmSec = if (subset.isEmpty) {
      val t0 = System.nanoTime()
      Fixtures.prewarm(spark, sfDir)
      val w = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] fixture prewarm t=$w%.1fs")
      w
    } else 0.0
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => subset.forall(_.contains(n)) }
      .map { case (name, fn) =>
      // wall-clock start per query (epoch seconds): post-hoc contention
      // diagnosis — a machine-wide disturbance (e.g. a concurrent oracle
      // run) shows up as a time-localized block of slow queries, where a
      // code regression tracks the query, not the clock (BENCH_r04 was
      // poisoned exactly this way and undiagnosable without timestamps)
      val startedAt = System.currentTimeMillis() / 1000
      val t0 = System.nanoTime()
      // noop sink: forces full computation of every output column. A bare
      // count() lets Catalyst eliminate a final left join against unique
      // keys — the triangle-family queries then "benchmark" a plan whose
      // expensive aggregation never runs (caught in round 4; see
      // BASELINE.md). count() afterwards only feeds the progress line.
      val dfOpt = try {
        val df = fn(spark, sfDir)
        df.write.format("noop").mode("overwrite").save()
        Some(df)
      } catch { case _: Throwable => None }
      val dt = (System.nanoTime() - t0) / 1e9
      // rows are reported outside the timed window (count may replay a
      // purely-declarative plan; the timing contract is the noop write)
      val n = dfOpt.map(df => try df.count() catch { case _: Throwable => -1L }).getOrElse(-1L)
      // progress line per query (stderr — the stdout contract is one JSON
      // line), and a GC nudge so the ContextCleaner unpersists the
      // now-unreferenced per-query localCheckpoint RDDs; without it 80+
      // queries accumulate cached blocks until heavy queries spill.
      System.err.println(f"[bench] $name rows=$n t=$dt%.1fs")
      System.gc()
      (name, dt, startedAt)
    }
    val qs = results.map { case (k, v, _) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val starts = results.map { case (k, _, s) => s"\"" + k + "\":" + s }
      .mkString("{", ",", "}")
    // total stays honest: prewarm seconds are part of the run, reported
    // both inside the total and as their own field
    val total = results.map(_._2).sum + warmSec
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"started":$starts,"fixture_warm":$warmSec,"sf":"$sfDir"}"""
    println(line)
    // the stdout contract above is the driver's; ALSO persist the complete
    // JSON to a file — BENCH_r05.json reached the repo truncated mid-object
    // (ADVICE r5), and a committed local copy makes every bench total
    // independently substantiable even if the driver's capture clips again.
    if (subset.isEmpty) {
      try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_LOCAL.json"),
        (line + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
