package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpecBase

class QuantizationSpec extends SparkSpecBase {

  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(-1.0f, 0.0f, 0.5f, 1.0f)),
    (2L, Array(0.25f, 0.25f, 0.25f, 0.25f)), // constant → scale 0
    (3L, Array(1e-6f, -1e-6f, 3.5e-7f, 0.0f)) // tiny dynamic range
  ).toDF("vec_id", "embedding")

  test("codes hit the endpoints exactly and stay in [0, 255]") {
    val q = Quantization.int8(vecs, "embedding")
      .select("vec_id", "q").as[(Long, Array[Int])].collect().toMap
    assert(q(1L).head === 0) // x = min → code 0
    assert(q(1L).last === 255) // x = max → code 255
    assert(q.values.flatten.forall(c => c >= 0 && c <= 255))
    assert(q(2L).toSeq === Seq(0, 0, 0, 0)) // constant vector: no div-by-zero
  }

  test("reconstruction error is bounded by half a quantization step, everywhere") {
    val out = Quantization.int8(vecs, "embedding")
      .withColumn("deq", Quantization.dequantize(col("q"), col("q_min"), col("q_scale")))
      .select(col("vec_id"),
        aggregate(zip_with(col("embedding"), col("deq"),
            (x, d) => abs(x.cast("double") - d)),
          lit(0.0), (a, e) => greatest(a, e)).as("max_err"),
        col("q_scale"))
      .as[(Long, Double, Double)].collect()
    out.foreach { case (id, err, scale) =>
      assert(err <= scale / 2 * 1.0001 + 1e-12, s"vec $id: err $err > half-step ${scale / 2}")
    }
  }

  test("quantization is pure column algebra: no shuffle, no UDF in the plan") {
    val plan = Quantization.int8(vecs, "embedding").queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }

  test("quantized-space ANN quality: exact top-3 overlap stays high on real embeddings") {
    // search entirely in DEQUANTIZED space and compare the retrieved
    // (query, neighbor) pairs against exact float search — the measured
    // form of "int8 cuts 4x storage at negligible retrieval cost". The
    // corpus is the structureless uniform one (near-tie gaps, the WORST
    // case for any approximation — BENCH_NOTES "Recall evidence"), so
    // this floor is conservative.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val deq = Quantization.int8(emb, "embedding")
      .select(col("vec_id"),
        Quantization.dequantize(col("q"), col("q_min"), col("q_scale"))
          .cast("array<float>").as("embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      Knn.bruteForceTopK(df, df, "vec_id", "embedding", 3)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val exact = pairs(emb.select("vec_id", "embedding"))
    val quant = pairs(deq)
    val overlap = (exact & quant).size.toDouble / exact.size
    info(f"quantized-space top-3 overlap: $overlap%.3f over ${exact.size} pairs")
    assert(overlap >= 0.95, f"overlap $overlap%.3f (measured 0.989 when pinned)")
  }

  test("real embeddings round-trip: every code in range, checksum stable across runs") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val run = () => Quantization.int8(emb, "embedding")
      .select(sum(aggregate(col("q"), lit(0L), (a, x) => a + x))).as[Long].collect()(0)
    val s1 = run(); val s2 = run()
    assert(s1 === s2)
    val bad = Quantization.int8(emb, "embedding")
      .filter(exists(col("q"), c => c < 0 || c > 255)).count()
    assert(bad === 0L)
  }
}
