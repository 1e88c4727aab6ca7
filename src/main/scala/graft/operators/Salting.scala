package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salting utilities for skewed keys.
 *
 * AQE's skew-join splitting handles the JOIN side of skew at runtime, but a
 * `groupBy` on a power-law key (one user with 10⁹ events) still funnels the
 * hot key's rows into one reducer: partial aggregation helps only as much as
 * the map side pre-combines, and for high-cardinality aggregation state
 * (collect_list, exact distincts) it barely combines at all. Two-phase
 * salting bounds every reducer: phase 1 aggregates (key, salt) over
 * `buckets` random salts, phase 2 merges the ≤ `buckets` partials per key.
 *
 * For algebraic aggregates pass the partial and merge expressions separately
 * — e.g. count ≡ (count, sum), sum ≡ (sum, sum), max ≡ (max, max).
 */
object Salting {

  /** Add a uniform random salt column in [0, buckets). Deterministic per-run
    * when `seed` is given (Spark's rand is seeded per-partition). */
  def withSalt(df: DataFrame, buckets: Int, seed: Long = 42L): DataFrame =
    df.withColumn("__salt", (rand(seed) * buckets).cast("int"))

  /**
   * Two-phase salted aggregation: `partials` computed per (keys, salt),
   * `merges` computed per keys over the partials. Column names must line up:
   * each partial must be aliased to the name its merge expression reads.
   */
  def saltedAggregate(df: DataFrame, keys: Seq[String], buckets: Int,
                      partials: Seq[Column], merges: Seq[Column],
                      seed: Long = 42L): DataFrame = {
    require(partials.nonEmpty && merges.nonEmpty, "need at least one aggregate")
    val salted = withSalt(df, buckets, seed)
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /**
   * Salted equi-join for a skewed LEFT side against a small-ish right side:
   * left rows keep their salt; the right side is replicated `buckets` times
   * (explode) so every (key, salt) pair finds its match. Use when the right
   * side is too big to broadcast but small enough to replicate; otherwise
   * prefer AQE's runtime skew-join splitting.
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner",
                 seed: Long = 42L): DataFrame = {
    val saltedLeft = withSalt(left, buckets, seed)
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedLeft.join(replicatedRight, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
