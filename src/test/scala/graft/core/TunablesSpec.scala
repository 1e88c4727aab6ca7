package graft.core

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

/** The `spark.graft.*` tunables: measured defaults, session overrides, and
  * the Decisions record of the effective value — the tier boundaries are
  * sandbox-measured crossovers that a differently-shaped cluster must be
  * able to move without a rebuild. */
class TunablesSpec extends SparkSpecBase {

  private def withConf[T](key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("unset conf returns the measured default and records it") {
    Decisions.clear()
    assert(Tunables.long(spark, "spark.graft.test.someKnob", 42L) === 42L)
    assert(Decisions.snapshot.get("tunable.spark.graft.test.someKnob").contains("42"))
  }

  test("a set conf overrides the default") {
    withConf("spark.graft.test.someKnob", "7") {
      assert(Tunables.long(spark, "spark.graft.test.someKnob", 42L) === 7L)
    }
    assert(Tunables.long(spark, "spark.graft.test.someKnob", 42L) === 42L)
  }

  test("non-graft keys and non-numeric values are rejected loudly") {
    intercept[IllegalArgumentException] {
      Tunables.long(spark, "spark.sql.shuffle.partitions", 1L)
    }
    withConf("spark.graft.test.someKnob", "not-a-number") {
      intercept[IllegalArgumentException] {
        Tunables.long(spark, "spark.graft.test.someKnob", 42L)
      }
    }
  }

  test("shuffle-codec advisory records the effective codec and cites the measurement") {
    // local test sessions run the default codec (lz4) — the advisory must
    // recommend zstd with the r12 measurement, and the ANN entry points
    // must emit it (context conf: the engine can only advise, never set)
    Decisions.clear()
    val msg = Tunables.recommendShuffleCodec(spark, "knn.lshTopK")
    assert(msg.contains("zstd"), s"lz4 session should recommend zstd: $msg")
    assert(msg.contains("293.5"), s"recommendation must cite the r12 measurement: $msg")
    val recorded = Decisions.snapshot.get("tunable.shuffleCodec(knn.lshTopK)")
    assert(recorded.exists(_.contains("zstd")), s"decision missing: ${Decisions.snapshot}")
    // a zstd context is acknowledged, not re-recommended — simulate via the
    // message branch (the codec conf itself is static and cannot be set here)
    // by asserting the branch on the returned text contract instead
    assert(!msg.toLowerCase.startsWith("zstd"), "default-codec session starts from lz4")
  }

  test("ANN entry points emit the shuffle-codec advisory") {
    import spark.implicits._
    val vecs = (1 to 30).map(i => (i.toLong, Array.tabulate(4)(d => (i * (d + 1)).toFloat)))
      .toDF("id", "vec")
    Decisions.clear()
    graft.similarity.Knn.ivfTopK(vecs, "id", "vec", k = 2, nCells = 4).count()
    assert(Decisions.snapshot.contains("tunable.shuffleCodec(knn.ivfTopK)"),
      s"ivfTopK must record the advisory: ${Decisions.snapshot.keys}")
  }

  test("simhash materialization tier obeys the scopedMinDocs override") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta"), (2L, "gamma delta"), (3L, "epsilon"))
      .toDF("doc_id", "text")
    // 3 docs with the boundary lowered to 2 → eager tier
    withConf("spark.graft.simhash.scopedMinDocs", "2") {
      Decisions.clear()
      graft.dedup.SimHash.fingerprints(docs, "doc_id", col("text"), Some(3L)).count()
      assert(Decisions.snapshot.get("simhash.scopedMaterialize(n=3)").contains("true"))
    }
    // same corpus with the boundary above it → lazy tier
    withConf("spark.graft.simhash.scopedMinDocs", "10") {
      Decisions.clear()
      graft.dedup.SimHash.fingerprints(docs, "doc_id", col("text"), Some(3L)).count()
      assert(Decisions.snapshot.get("simhash.scopedMaterialize(n=3)").contains("false"))
    }
    // unknown count → conservative eager, no probe pass over a derived input
    Decisions.clear()
    graft.dedup.SimHash.fingerprints(docs, "doc_id", col("text")).count()
    assert(Decisions.snapshot.get("simhash.scopedMaterialize(n=-1)").contains("true"))
  }

  test("quantile tier boundaries obey the spark.graft.quantiles overrides") {
    import spark.implicits._
    val fact = (1 to 100).map(i => ("g", i.toDouble)).toDF("grp", "v")
    // force tier 3 (cache) by dropping the cache threshold below 100 rows
    withConf("spark.graft.quantiles.factRowsProbeThreshold", "10") {
      withConf("spark.graft.quantiles.compactCacheMinFactRows", "50") {
        Decisions.clear()
        val cum = graft.operators.ExactQuantiles.cumulateFromFact(
          fact, Seq("grp"), "v")
        assert(cum.count() === 100L)
        // tier 3 records the exact-count probe decision (not the
        // skipped-small-fact tier-1 marker)
        val keys = Decisions.snapshot.keys.filter(_.startsWith("quantiles.rangeParallel"))
        assert(keys.exists(_.contains("n=100, groups=")),
          s"expected the tier-3 exact probe decision, got: ${Decisions.snapshot}")
      }
    }
    // nFactKnown skips the probe count and still tiers correctly (tier 1)
    Decisions.clear()
    val cum1 = graft.operators.ExactQuantiles.cumulateFromFact(
      fact, Seq("grp"), "v", nFactKnown = Some(100L))
    assert(cum1.count() === 100L)
    assert(Decisions.snapshot.get("quantiles.rangeParallel(nFact=100)")
      .contains("skipped-small-fact"))
  }
}
