package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence packing for training batches — the GPT-style "concatenate the
 * token stream, cut every `budget` tokens" layout, computed as COORDINATES
 * (which chunk(s) each document lands in) rather than by materializing
 * packed token arrays. Downstream loaders need exactly these coordinates
 * to assemble fixed-length training sequences; emitting them from the
 * engine keeps the packing decision deterministic, replayable, and
 * engine-independent (pure integer arithmetic a DuckDB oracle replays).
 *
 * Beyond the reference (its sequences are per-patient clinical timelines,
 * never packed to a token budget).
 *
 * 100 TB shape: a single global token stream would serialize the corpus
 * through one sort, so the stream is SHARDED by `key mod shards` — each
 * shard is an independent deterministic stream packed in `key` order.
 * The plan is one hash exchange on the shard id plus a per-shard sort:
 * the minimum any deterministic packing needs (the running sum is a
 * window cumsum, map-side after the sort, no second exchange). Pick
 * `shards` ≈ cluster parallelism; chunk ids are per-shard, so
 * `(shard, chunk)` is the global chunk key.
 */
object Packing {

  /**
   * Chunk coordinates per document: `doc_id, shard, n_tok, first_chunk,
   * last_chunk, chunk_offset` where the doc's tokens occupy the
   * half-open span `[run - n_tok, run)` of its shard's stream and chunks
   * are `budget`-token windows of that stream. `first_chunk` is where the
   * doc starts, `last_chunk` where its final token falls (equal unless
   * the doc straddles a cut), `chunk_offset` the doc's start position
   * inside `first_chunk`. Zero-token docs occupy the empty span at their
   * stream position (`last_chunk = first_chunk`).
   */
  def tokenChunks(df: DataFrame, key: Column, tokens: Column,
                  shards: Int, budget: Int): DataFrame = {
    require(shards >= 1, s"shards must be positive: $shards")
    require(budget >= 1, s"budget must be positive: $budget")
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(key.cast("long").as("doc_id"),
        pmod(key.cast("long"), lit(shards.toLong)).as("shard"),
        tokens.cast("long").as("n_tok"))
      .withColumn("__run", sum(col("n_tok")).over(w))
      .select(col("doc_id"), col("shard"), col("n_tok"),
        floor((col("__run") - col("n_tok")) / budget).cast("long").as("first_chunk"),
        when(col("n_tok") === 0,
            floor((col("__run") - col("n_tok")) / budget))
          .otherwise(floor((col("__run") - 1) / budget))
          .cast("long").as("last_chunk"),
        pmod(col("__run") - col("n_tok"), lit(budget.toLong)).as("chunk_offset"))
  }
}
