package graft.core

import org.apache.spark.sql.SparkSession

/**
 * Runtime-overridable engine tunables (`spark.graft.*` confs).
 *
 * The adaptive operators pick execution shapes at measured data-size
 * crossovers (quantile cumulate tiers, the top-k / simhash scoped
 * materialization thresholds, ledger compaction width). The shipped
 * defaults are crossovers MEASURED on this sandbox (32 cores / 128 GiB) —
 * a cluster with a different memory-to-core ratio moves every one of them,
 * so hard-coding the literal would repeat the `initialPartitionNum` mistake
 * (a sandbox constant silently capping a 1000-core cluster). Call sites
 * read the boundary through here at call time: the measured value remains
 * the default, a deployment overrides per session
 * (`spark.conf.set("spark.graft….", …)`), and every read lands in
 * [[Decisions]] so a cluster run's driver log records which boundary value
 * actually steered each adaptive choice.
 */
object Tunables {

  /** Shuffle-codec advisory for the candidate-exchange operator family
    * (LSH/IVF ANN, and any operator shuffling billions of ~16-byte pair
    * rows). `spark.io.compression.codec` is a CONTEXT-level conf — it
    * cannot be flipped per session or per query, so the engine cannot
    * apply it itself; instead every family entry point calls this and the
    * effective codec plus the recommendation lands in [[Decisions]].
    *
    * WHY zstd (measured, r12 sf100 / BENCH_NOTES "Defect 2"): knn2's
    * pre-score candidate-pair dedup exchange at n=2M is ~10⁹-10¹⁰ 16-byte
    * pairs; under the default lz4 codec its spill peaked above a 56 GB
    * disk budget and ENOSPC'd every rep, while zstd (2-3× tighter on
    * small fixed-width pair rows) brought the peak to ~51 GB and the rep
    * to a clean 293.5 s completion at 6.26× sentinel — below the r7
    * 6.76× bound. On a cluster the exchange distributes across aggregate
    * disk, but the same lever applies whenever per-node shuffle spill is
    * the binding constraint: set `spark.io.compression.codec=zstd` at
    * context launch for ANN-heavy deployments. */
  def recommendShuffleCodec(spark: SparkSession, operator: String): String = {
    val codec = spark.conf.getOption("spark.io.compression.codec").getOrElse("lz4")
    val msg =
      if (codec.toLowerCase.contains("zstd")) s"$codec (recommended for this family)"
      else s"$codec — recommend spark.io.compression.codec=zstd at context " +
        "launch when disk-constrained: measured r12 sf100, zstd cut the " +
        "candidate-pair exchange's peak spill ~56->51 GB and turned ENOSPC " +
        "into a clean 293.5 s rep (BENCH_NOTES 'Defect 2')"
    Decisions.record(s"tunable.shuffleCodec($operator)", msg)
    msg
  }

  /** Read a long tunable: `spark.graft.*` conf if set, else `default`.
    * Records the effective value in [[Decisions]] (`tunable.<key>`). */
  def long(spark: SparkSession, key: String, default: Long): Long = {
    require(key.startsWith("spark.graft."), s"tunable key must be spark.graft.*: $key")
    val v = spark.conf.getOption(key) match {
      case Some(s) =>
        try s.trim.toLong
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(
              s"$key must be a long, got '$s'")
        }
      case None => default
    }
    Decisions.record(s"tunable.$key", v)
    v
  }
}
