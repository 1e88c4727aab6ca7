package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpecBase

class PackingSpec extends SparkSpecBase {

  import spark.implicits._

  test("tokenChunks: hand-checked coordinates on one shard") {
    // one shard (shards=1), budget 10: docs of 4, 8, 10, 3 tokens —
    // stream spans [0,4) [4,12) [12,22) [22,25)
    val docs = Seq((0L, 4L), (1L, 8L), (2L, 10L), (3L, 3L)).toDF("id", "n")
    val out = Packing.tokenChunks(docs, col("id"), col("n"), shards = 1, budget = 10)
      .orderBy("doc_id")
      .select("doc_id", "first_chunk", "last_chunk", "chunk_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 0L, 0L),   // [0,4)   inside chunk 0
      (1L, 0L, 1L, 4L),   // [4,12)  straddles the 10-token cut
      (2L, 1L, 2L, 2L),   // [12,22) straddles the 20-token cut
      (3L, 2L, 2L, 2L)))  // [22,25) inside chunk 2
  }

  test("tokenChunks: shards are independent streams; coordinates are deterministic") {
    val docs = (0L until 1000L).map(i => (i, (i % 7) + 1)).toDF("id", "n")
    val a = Packing.tokenChunks(docs, col("id"), col("n"), 8, 64).collect().toSet
    val b = Packing.tokenChunks(docs.repartition(13), col("id"), col("n"), 8, 64)
      .collect().toSet
    assert(a === b) // partitioning-independent
    // within every shard the stream is gapless: each doc starts where the
    // previous ended (run-sum reconstruction)
    val byShard = Packing.tokenChunks(docs, col("id"), col("n"), 8, 64)
      .select("shard", "doc_id", "n_tok", "first_chunk", "chunk_offset")
      .as[(Long, Long, Long, Long, Long)].collect()
      .groupBy(_._1).values
    byShard.foreach { rows =>
      var run = 0L
      rows.sortBy(_._2).foreach { case (_, _, n, first, off) =>
        assert(first === run / 64 && off === run % 64)
        run += n
      }
    }
  }

  test("zero-token docs occupy an empty span (last_chunk = first_chunk)") {
    val docs = Seq((0L, 10L), (1L, 0L), (2L, 5L)).toDF("id", "n")
    val out = Packing.tokenChunks(docs, col("id"), col("n"), 1, 10)
      .orderBy("doc_id")
      .select("first_chunk", "last_chunk").as[(Long, Long)].collect().toSeq
    assert(out === Seq((0L, 0L), (1L, 1L), (1L, 1L)))
  }

  test("plan: one exchange on the shard id, nothing else") {
    val docs = (0L until 100L).map(i => (i, i % 5)).toDF("id", "n")
    val plan = Packing.tokenChunks(docs, col("id"), col("n"), 16, 512)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"expected at most the shard hash exchange, got:\n$plan")
  }
}
