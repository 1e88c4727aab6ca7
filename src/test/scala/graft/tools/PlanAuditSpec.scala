package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkSpecBase

/**
 * Enforces the [[PlanAudit]] expectations as tests: the scale-critical plan
 * properties (pushdown, broadcast dims, window-group-limit, codegen kernels,
 * no low-cardinality WindowExec) must hold in the compiled plan, not just in
 * a manually-read CLI report. Plans are built, not executed (the one
 * exception: adaptive-cap queries run their tiny over-cap probe job at
 * construction — sub-second at sf0.001).
 */
class PlanAuditSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  PlanAudit.checks.zipWithIndex.foreach { case (c, i) =>
    test(s"plan[${c.query}#$i]: ${c.expect.map(_._1).mkString("; ").take(120)}") {
      assume(Files.exists(Paths.get(dir)), s"$dir not present")
      val p = PlanAudit.plan(spark, dir, c.query)
      c.expect.foreach { case (what, regex) =>
        assert(PlanAudit.holds(p, regex), s"— plan property violated: $what ($regex)")
      }
    }
  }
}
