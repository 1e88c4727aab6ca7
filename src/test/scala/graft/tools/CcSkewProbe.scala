package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement harness behind the skew note in `Dedup.connectedComponents`
  * (the lbl2 pointer-doubling lookup): on a synthetic power-law graph whose
  * giant component swallows most nodes — the worst case for the probe-side
  * component key — compare
  *   (a) the production shape: direct join, AQE skew-join splits the hot key;
  *   (b) a distinct-components pre-aggregation of the probe side joined to
  *       the lookup, broadcast back (the "obvious" skew fix).
  * Run: sbt -batch "Test/runMain graft.tools.CcSkewProbe [nNodes]"
  */
object CcSkewProbe {

  /** Variant (b): per round, shrink the probe side to its distinct component
    * ids, resolve label-of-label on that small set, broadcast it back. */
  private def ccBroadcastDistinct(edges: DataFrame, labels0: DataFrame,
                                  maxIterations: Int): DataFrame = {
    import graft.core.Checkpoints
    var labels = labels0
    var iter = 0
    var converged = false
    while (!converged && iter < maxIterations) {
      iter += 1
      val nbrMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(col("src").as("n")).agg(min("component").as("nbr_component"))
      val lbl2 = labels.select(col("node").as("__c"), col("component").as("__cc"))
      val distinctComponents = labels.select(col("component").as("__c")).distinct()
        .join(lbl2, Seq("__c")) // small: one row per live component id
      val updated = Checkpoints.cut(
        labels.join(nbrMin, labels("node") === nbrMin("n"), "left_outer")
          .join(broadcast(distinctComponents), labels("component") === col("__c"),
            "left_outer")
          .select(col("node"), col("component").as("__old"),
            least(
              least(col("component"), coalesce(col("nbr_component"), col("component"))),
              coalesce(col("__cc"), col("component")))
              .as("component")))
      if (updated.where(col("component") =!= col("__old")).isEmpty) converged = true
      labels = updated.drop("__old")
    }
    labels
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = graft.core.GraftSession.withDefaults(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.core.Checkpoints

    // Power-law-ish giant component: node i → i/2 (binary tree, depth log2 n,
    // so several pointer-doubling rounds) over 90% of nodes; the rest are
    // 5-node chains (many tiny components). All labels in the giant half
    // collapse onto component 0 — maximal probe-side skew.
    val giant = spark.range(1, (n * 9) / 10)
      .select(col("id").as("src"), (col("id") / 2).cast("long").as("dst"))
    val restBase = spark.range((n * 9) / 10, n)
    val rest = restBase
      .where(col("id") % 5 =!= 0)
      .select(col("id").as("src"), (col("id") - 1).as("dst"))
    val pairs = giant.unionByName(rest)
      .select(col("src").as("left_id"), col("dst").as("right_id"))

    val edges = Checkpoints.cut(
      pairs.select(explode(array(
          struct(col("left_id").as("src"), col("right_id").as("dst")),
          struct(col("right_id").as("src"), col("left_id").as("dst"))))
          .as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .distinct())
    def seed() = Checkpoints.cut(
      edges.groupBy(col("src").as("node"))
        .agg(min(col("dst")).as("__m"))
        .select(col("node"), least(col("node"), col("__m")).as("component")))

    def time(label: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val out = f
      val nComp = out.select("component").distinct().count()
      println(f"[ccprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s, " +
        s"components=$nComp")
    }

    // warm both paths once at small n to amortize JIT out of the comparison
    println(s"[ccprobe] n=$n edges=${edges.count()}")
    (1 to 2).foreach { rep =>
      time(s"rep$rep aqe-skew-join (cap=0)") {
        graft.dedup.Dedup.connectedComponents(pairs, "left_id", "right_id",
          broadcastComponentCap = 0L)
      }
      time(s"rep$rep unconditional broadcast-distinct") {
        ccBroadcastDistinct(edges, seed(), 20)
      }
      time(s"rep$rep adaptive (production default)") {
        graft.dedup.Dedup.connectedComponents(pairs, "left_id", "right_id")
      }
    }
    spark.stop()
  }
}
