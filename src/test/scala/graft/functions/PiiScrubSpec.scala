package graft.functions

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase

class PiiScrubSpec extends SparkSpecBase {

  import spark.implicits._

  private def run(texts: (Long, String)*): Map[Long, (Int, Int, String)] =
    texts.toDF("id", "text")
      .select(col("id"),
        TextFunctions.emailCount(col("text")).as("e"),
        TextFunctions.ipv4Count(col("text")).as("i"),
        TextFunctions.scrubPii(col("text")).as("s"))
      .as[(Long, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("emails and IPs are counted and redacted; clean text passes through") {
    val out = run(
      1L -> "write to alice99@mail.example today",
      2L -> "server 10.20.30.40 and 192.168.0.1 responded",
      3L -> "no pii here at all")
    assert(out(1L) === ((1, 0, "write to <EMAIL> today")))
    assert(out(2L) === ((0, 2, "server <IP> and <IP> responded")))
    assert(out(3L) === ((0, 0, "no pii here at all")))
  }

  test("mixed doc: both classes redacted, IP first then email") {
    val out = run(1L -> "bob7@host.example from 1.2.3.4 wrote")
    assert(out(1L) === ((1, 1, "<EMAIL> from <IP> wrote")))
  }

  test("greedy leftmost matching: a 5-octet run leaves the trailing octet") {
    val out = run(1L -> "odd 10.20.30.40.50 case")
    assert(out(1L)._2 === 1)
    assert(out(1L)._3 === "odd <IP>.50 case")
  }

  test("the scrub is per-row column algebra: no exchange") {
    val plan = Seq((1L, "x@y.z")).toDF("id", "text")
      .select(TextFunctions.scrubPii(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
