package graft.tools

/**
 * Decompose the fixed per-query floor the bench pays on CHEAP queries
 * (VERDICT r15 item 4: ~0.2-0.25 s × 75 batch queries): per rep, time
 * separately (a) the GraftSession.tune conf-set calls, (b) DataFrame
 * construction (Tables.load footer reads + query building + analysis),
 * and (c) the noop-write action. Medians over many warm reps. Evidence
 * tool only — not part of the query surface.
 */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "20").toInt
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("mm10_jar_codec_features", "a9_value_ratio", "s11_stratified_sample"))
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "floor-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n => // warm every path once
      graft.SparkEntry.queries(n)(spark, dir).write.format("noop").mode("overwrite").save()
    }
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    // how much of build is the per-call spark.read.parquet schema read?
    Seq("lineitem", "documents", "events", "embeddings").foreach { t =>
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.core.Tables.load(spark, dir, t)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"load":"$t","load_s":${med(ts)}%.4f,"reps":$reps}""")
    }
    names.foreach { name =>
      val tune = Vector.newBuilder[Double]
      val build = Vector.newBuilder[Double]
      val act = Vector.newBuilder[Double]
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        graft.core.GraftSession.tune(spark)
        val t1 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, dir)
        df.queryExecution.assertAnalyzed()
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        tune += (t1 - t0) / 1e9; build += (t2 - t1) / 1e9; act += (t3 - t2) / 1e9
        System.gc()
      }
      println(f"""{"query":"$name","tune_s":${med(tune.result())}%.4f,"build_analyze_s":${med(build.result())}%.4f,"action_s":${med(act.result())}%.4f,"reps":$reps}""")
    }
    spark.stop()
  }
}
