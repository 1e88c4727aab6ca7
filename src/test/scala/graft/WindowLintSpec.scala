package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/**
 * Source lint: no raw unpartitioned `Window.orderBy(...)` in the full-data
 * tools — every global ordering there must go through
 * [[graft.operators.IdAllocator]], which either parallelizes the allocation
 * (sequentialId / denseKeyId) or names the single-partition choice explicitly
 * (sequentialIdSinglePartition, for label-sized tables). An unpartitioned
 * window funnels the whole dataset through one task — the first wall at
 * measurement-table scale.
 */
class WindowLintSpec extends AnyFunSuite {

  private val lintedDirs = Seq(
    "src/main/scala/graft/omop/tools",
    "src/main/scala/graft/omop")

  test("no raw unpartitioned Window.orderBy in tools or pipelines") {
    val offenders = lintedDirs.flatMap { dir =>
      Files.walk(Paths.get(dir)).iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        // IdAllocator itself owns the documented single-partition variant
        .filterNot(_.toString.endsWith("IdAllocator.scala"))
        .flatMap { p =>
          Files.readAllLines(p).asScala.zipWithIndex.collect {
            case (line, i)
                if line.contains("Window.orderBy")
                  && !line.trim.startsWith("//") && !line.trim.startsWith("*") =>
              s"$p:${i + 1}: ${line.trim}"
          }
        }
    }
    assert(offenders.isEmpty,
      s"unpartitioned windows found — route through IdAllocator:\n${offenders.mkString("\n")}")
  }
}
