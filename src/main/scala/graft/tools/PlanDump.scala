package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.core.GraftSession

/**
 * Dump `explain("formatted")` for every declared BATCH query to a directory
 * — the optimization rounds' plan-evidence artifact (`plans/r<n>/`).
 *
 * Harness (sq replay) queries are skipped: building their DataFrame RUNS
 * the bounded stream replay, and the returned frame is just a scan of the
 * replay output — there is no batch plan to audit.
 *
 *   SPARK_GRAFT_PLAN_OUT=plans/r15 SPARK_GRAFT_PLAN_SUFFIX=_before \
 *     sbt -batch "runMain graft.tools.PlanDump [query,query,...]"
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = sys.env.getOrElse("SPARK_GRAFT_PLAN_OUT", "/tmp/graft-plans")
    val suffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val only = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = GraftSession.local(8, "plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(graft.SparkEntry.harnessQueries)
      .filter(n => only.forall(_.contains(n)))
    names.foreach { name =>
      val plan =
        try PlanAudit.plan(spark, dir, name)
        catch { case t: Throwable => s"PLAN FAILED: ${t.getClass.getName}: ${t.getMessage}" }
      Files.write(Paths.get(outDir, s"$name$suffix.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"dumped $name")
    }
    spark.stop()
  }
}
