package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/**
 * Exact and n-gram-Jaccard deduplication for document corpora.
 *
 * Exact dedup is a hash-groupBy on a normalized content fingerprint: one
 * shuffle on the 64-bit hash — the canonical 100 TB-safe layout (the hash is
 * uniformly distributed, so no skew, and only (hash, id) pairs shuffle, not
 * document bodies). Near-dup via n-gram Jaccard runs on candidate pairs only
 * (from [[MinHash]] banding) — never all-pairs.
 */
object Dedup {

  /** Mark exact duplicates by normalized-content fingerprint: adds
    * `dup_group` (the fingerprint), `dup_rank` (1 = keeper, ordered by
    * `keepOrder`), `is_dup`. */
  def exact(df: DataFrame, text: Column, keepOrder: Seq[Column]): DataFrame = {
    val withFp = df.withColumn("dup_group", TextFunctions.fingerprint(text))
    val w = Window.partitionBy(col("dup_group")).orderBy(keepOrder: _*)
    withFp
      .withColumn("dup_rank", row_number().over(w))
      .withColumn("is_dup", col("dup_rank") > 1)
  }

  /** Distinct-keeper projection: one row per exact-duplicate group. */
  def exactKeepers(df: DataFrame, text: Column, keepOrder: Seq[Column]): DataFrame =
    exact(df, text, keepOrder).filter(!col("is_dup"))
      .drop("dup_group", "dup_rank", "is_dup")

  /**
   * Exact n-gram Jaccard similarity for given candidate pairs.
   *
   * @param pairs  (leftId, rightId) candidate pairs (e.g. from MinHash bands)
   * @param docs   (id, text)
   * @return pairs with `jaccard` — |shingles∩| / |shingles∪| on word n-grams
   */
  def ngramJaccard(pairs: DataFrame, docs: DataFrame, idCol: String, text: Column,
                   n: Int = 3): DataFrame = {
    val leftId = pairs.columns(0)
    val rightId = pairs.columns(1)
    // Only documents that appear in a candidate pair need shingling — the
    // candidate id set is tiny relative to the corpus (that's the point of
    // LSH), so the expensive tokenize→shingle→hash runs on the few matched
    // docs, not the whole corpus, on BOTH join sides. No broadcast hint: AQE
    // picks broadcast when the id set is actually small, and degrades to a
    // shuffled semi-join instead of an OOM on near-dup-saturated corpora.
    val candIds = pairs.select(col(leftId).as("__cid"))
      .union(pairs.select(col(rightId).as("__cid"))).distinct()
    val docsNeeded = docs.join(candIds, col(idCol) === col("__cid"), "left_semi")
    // Shingles are hashed to 64-bit ints once per document, so the per-pair
    // array_intersect compares longs instead of strings — the pair join is
    // the quadratic part, so per-element cost there dominates everything.
    // (xxhash64 collisions within one document's shingle set are ~1e-15.)
    val sh = docsNeeded.select(col(idCol).as("__id"),
      array_distinct(transform(TextFunctions.shingles(text, n), s => xxhash64(s)))
        .as("__hs"))
    jaccardFromHashed(pairs, sh)
  }

  /** Exact Jaccard for candidate pairs from precomputed xxhash64'd distinct
    * shingle arrays `(__id, __hs)` — the join kernel of [[ngramJaccard]],
    * shared with pipelines (e.g. [[MinHash.nearDuplicates]]) that tokenize
    * the corpus once and reuse the persisted arrays across phases. */
  private[dedup] def jaccardFromHashed(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val leftId = pairs.columns(0)
    val rightId = pairs.columns(1)
    pairs
      .join(sh.select(col("__id").as(leftId), col("__hs").as("__sh_l")), leftId)
      .join(sh.select(col("__id").as(rightId), col("__hs").as("__sh_r")), rightId)
      .withColumn("__inter", size(array_intersect(col("__sh_l"), col("__sh_r"))))
      .withColumn("__union", size(col("__sh_l")) + size(col("__sh_r")) - col("__inter"))
      .withColumn("jaccard",
        when(col("__union") === 0, lit(0.0))
          .otherwise(col("__inter").cast("double") / col("__union")))
      .drop("__sh_l", "__sh_r", "__inter", "__union")
  }

  /**
   * Connected components over a near-duplicate pair relation: every document
   * gets `component` = the minimum doc id reachable through pair edges — the
   * canonical cluster id for group-level dedup decisions (keep one per
   * component, prefer the keeper by any order).
   *
   * Min-label propagation with pointer doubling to fixpoint: labels start as
   * own id; each round every node takes the min of its label, its neighbors'
   * labels, AND its label's label (path compression — the "label of label"
   * jump halves chain lengths, so rounds needed = O(log diameter), not
   * O(diameter)). The neighbor-min join + hash-agg shuffle on node ids
   * (uniform keys, map-side combinable). The label-of-label lookup is keyed
   * on component values, which COLLAPSE onto few hot keys as components
   * converge, so the lookup strategy is adaptive per round: a cheap
   * `approx_count_distinct` probe on the (already checkpointed) labels
   * decides between a broadcast of the distinct live components — measured
   * ~19-21 s → ~15-17 s warm for the full CC on a 2M-node binary-tree giant
   * component + 40k small components, local[32]
   * (`graft.tools.CcSkewProbe`) — and, when the live-component set is still
   * too large to broadcast (early rounds at corpus scale: O(n) live
   * labels), the direct join, whose hot keys AQE's skew join splits (the
   * lookup side is one row per key, so replication is cheap; a
   * distinct-component pre-aggregation WITHOUT the broadcast was measured
   * in r4 as a net loss — +2 shuffles per round). Lineage is
   * cut per round like [[graft.operators.TransitiveClosure]]. If the
   * fixpoint is not reached within `maxIterations` this THROWS rather than
   * silently returning split components — the guaranteed reach after r
   * rounds is a component diameter on the order of 2^(r−2) (the first round
   * advances one hop and the last only detects the fixpoint), i.e. ~2^18 at
   * the default 20.
   *
   * @param broadcastComponentCap switch the label-of-label lookup to a
   *   broadcast of the distinct live components once their (approximate)
   *   count drops to this many rows (~32 B/row driver-side). 0 disables.
   */
  def connectedComponents(pairs: DataFrame, leftCol: String, rightCol: String,
                          maxIterations: Int = 20,
                          broadcastComponentCap: Long = 2000000L): DataFrame = {
    import graft.core.Checkpoints
    // both edge directions from ONE evaluation of the (possibly expensive)
    // pair pipeline: explode emits (l→r, r→l) per pair, so a single
    // materialization replaces the self-union's double evaluation. Ids keep
    // their original type (no cast — string ids are legal; min-label is then
    // the lexicographic minimum, still a canonical component id).
    val edges = Checkpoints.cut(
      pairs.select(explode(array(
          struct(col(leftCol).as("src"), col(rightCol).as("dst")),
          struct(col(rightCol).as("src"), col(leftCol).as("dst"))))
          .as("__e"))
        .select(col("__e.src").as("src"), col("__e.dst").as("dst"))
        .distinct())
    // DRIVER tier (r15 optimization): below the edge cap the whole loop —
    // per-round join + aggregate + localCheckpoint + convergence action,
    // 4-6 driver-coordinated jobs even on a 2-row input — costs far more
    // than a driver-side union-find over a few MB of collected edges.
    // Micro-batch dedup (the streaming near-dup sink runs a CC per batch)
    // and small-corpus calls take this path; at corpus scale the count
    // exceeds the cap and nothing changes. Bounded by construction
    // (cap × ~32 B rows, default ≤ 2 MB on the driver) — the same
    // justified-bounded-collect pattern as the IVF centroid guard. The
    // count itself reads the just-checkpointed edges, no recompute.
    val driverCap = graft.core.Tunables.long(pairs.sparkSession,
      "spark.graft.cc.driverEdgeCap", DriverEdgeCap)
    val nEdges = edges.count()
    if (nEdges <= driverCap) {
      driverComponents(edges, nEdges) match {
        case Some(labels) => return labels
        case None => // unsupported id type — fall through to the loop
      }
    } else {
      graft.core.Decisions.record(s"cc.driverTier(edges=$nEdges)", false)
    }
    // seed with min(self, neighbors): exactly the fixpoint of round 1 under
    // identity labels (the label-of-label jump is the identity there), fused
    // into the node-extraction aggregation — one full join round saved, and
    // star-shaped inputs (exactStar pair feeds) converge in a single check
    var labels = Checkpoints.cut(
      edges.groupBy(col("src").as("node"))
        .agg(min(col("dst")).as("__m"))
        .select(col("node"), least(col("node"), col("__m")).as("component")))
    var iter = 0
    var converged = false
    var broadcastLookup = false
    while (!converged && iter < maxIterations) {
      iter += 1
      val nbrMin = edges.join(labels, edges("dst") === labels("node"))
        .groupBy(col("src").as("n")).agg(min("component").as("nbr_component"))
      // pointer doubling: the label my current label points at. Self-labeled
      // roots resolve to themselves, so coalesce only covers pruned labels.
      // Lookup strategy per round (measured rationale in the scaladoc):
      // when the approximate live-component count fits the cap, resolve
      // label-of-label on the distinct-component set and broadcast it back —
      // the giant-component hot key never shuffles; otherwise join directly
      // and let AQE's skew join (on in GraftSession) split hot partitions.
      // The probe is one HLL pass over the checkpointed labels — no shuffle
      // of the n rows — and stops for good on its first hit: distinct
      // components only ever MERGE (every update is a least() of existing
      // labels), so the live count is monotonically non-increasing and the
      // decision can never flip back.
      val lbl2 = labels.select(col("node").as("__c"), col("component").as("__cc"))
      if (!broadcastLookup && broadcastComponentCap > 0) {
        broadcastLookup = labels.agg(approx_count_distinct(col("component"), 0.05))
          .first().getLong(0) <= broadcastComponentCap
        if (broadcastLookup)
          graft.core.Decisions.record("cc.broadcastCutoverIteration", iter)
      }
      val lookup =
        if (broadcastLookup)
          broadcast(labels.select(col("component").as("__c")).distinct()
            .join(lbl2, Seq("__c")))
        else lbl2
      // old label rides along so convergence is read off the same
      // materialization — no second join per round
      val updated = Checkpoints.cut(
        labels.join(nbrMin, labels("node") === nbrMin("n"), "left_outer")
          .join(lookup, labels("component") === col("__c"), "left_outer")
          .select(col("node"), col("component").as("__old"),
            least(
              least(col("component"), coalesce(col("nbr_component"), col("component"))),
              coalesce(col("__cc"), col("component")))
              .as("component")))
      if (updated.where(col("component") =!= col("__old")).isEmpty) converged = true
      labels = updated.drop("__old")
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIterations rounds — " +
          s"component diameter is on the order of 2^($maxIterations-2) or " +
          "more; raise maxIterations")
    graft.core.Decisions.record("cc.iterations", iter)
    labels
  }

  /** Edge-count ceiling for [[connectedComponents]]' driver union-find tier
    * (`spark.graft.cc.driverEdgeCap` overrides). 64k bidirectional edge rows
    * ≈ 2 MB collected — comfortably bounded — while every micro-batch or
    * small-corpus CC below it saves the loop's 4-6 driver-coordinated jobs. */
  val DriverEdgeCap = 65536L

  /** Driver-side min-label union-find over a bounded, already-materialized
    * edge set — produces EXACTLY the fixpoint of the distributed loop: one
    * row per node appearing in `edges`, `component` = minimum reachable id
    * under the same ordering `least()` uses (numeric for integral ids,
    * binary UTF8 for strings — [[org.apache.spark.unsafe.types.UTF8String]]
    * compares bytewise exactly like Spark's string ordering). Returns None
    * for id types without a replicated comparator here (the distributed
    * loop handles any orderable type). */
  private def driverComponents(edges: DataFrame, nEdges: Long): Option[DataFrame] = {
    import org.apache.spark.sql.types._
    val spark = edges.sparkSession
    val idType = edges.schema("src").dataType
    val cmp: Option[(Any, Any) => Int] = idType match {
      case LongType | IntegerType | ShortType | ByteType =>
        Some((a, b) => java.lang.Long.compare(
          a.asInstanceOf[Number].longValue(), b.asInstanceOf[Number].longValue()))
      case StringType =>
        Some((a, b) => org.apache.spark.unsafe.types.UTF8String
          .fromString(a.asInstanceOf[String])
          .compareTo(org.apache.spark.unsafe.types.UTF8String
            .fromString(b.asInstanceOf[String])))
      case _ => None
    }
    cmp.map { lt =>
      graft.core.Decisions.record(s"cc.driverTier(edges=$nEdges)", true)
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (parent.get(c) != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      edges.collect().foreach { row =>
        val s = row.get(0); val d = row.get(1)
        if (!parent.containsKey(s)) parent.put(s, s)
        if (!parent.containsKey(d)) parent.put(d, d)
        val rs = find(s); val rd = find(d)
        if (rs != rd) { if (lt(rs, rd) <= 0) parent.put(rd, rs) else parent.put(rs, rd) }
      }
      val rows = new java.util.ArrayList[org.apache.spark.sql.Row](parent.size())
      val it = parent.keySet().iterator()
      while (it.hasNext) {
        val n = it.next()
        rows.add(org.apache.spark.sql.Row(n, find(n)))
      }
      spark.createDataFrame(rows, StructType(Seq(
        StructField("node", idType), StructField("component", idType))))
    }
  }

  /** All within-group candidate pairs (leftId < rightId) for a grouping key —
    * utility for small blocking keys (e.g. same source). */
  def blockedPairs(df: DataFrame, idCol: String, blockCol: Column): DataFrame = {
    val a = df.select(blockCol.as("__b"), col(idCol).as("left_id"))
    val b = df.select(blockCol.as("__b"), col(idCol).as("right_id"))
    a.join(b, Seq("__b")).filter(col("left_id") < col("right_id"))
      .select("left_id", "right_id").distinct()
  }

  /**
   * Blocked n-gram Jaccard via an inverted-index join: explode hashed
   * shingles, equi-join on (block, shingle) to count common shingles per
   * pair, then reconstruct Jaccard from per-doc set sizes.
   *
   * Produces exactly the pairs with ≥ 1 common shingle — identical to the
   * all-pairs variant for any threshold > 0 — but the shuffle moves
   * (block, shingle_hash, id) rows instead of evaluating |A|·|B| array
   * intersections per pair, so cost scales with actual overlap, not with
   * block size squared. This is the 100 TB shape for block-local near-dup.
   *
   * `maxShingleDocFreq`: skew guard for near-duplicate-heavy corpora. A
   * shingle present in d documents of a block contributes d² rows to the
   * index self-join, so one boilerplate phrase shared by 10⁵ docs is a
   * 10¹⁰-row skew bomb. With the cap set, shingles whose block-local doc
   * frequency exceeds it are dropped from CANDIDATE GENERATION only;
   * exact-fingerprint-duplicate pairs are unioned back in (so identical
   * documents — always a giant bucket — can never be lost) and Jaccard is
   * then computed exactly per candidate from the full shingle sets. The
   * only pairs that can be missed are non-identical docs whose overlap is
   * exclusively ubiquitous shingles — by construction the pairs with the
   * least discriminative similarity.
   *
   * NOTE: with the cap set this method is EAGER — it materializes the
   * frequent-shingle set at call time (one map-side-combinable pass over the
   * persisted shingle index) to pick between the guarded plan and the plain
   * inverted-index plan (identical output, half the stages, when no shingle
   * exceeds the cap). The plan choice is therefore frozen against the input
   * as of the call: build the DataFrame when you run it, not against a
   * source that will grow in between.
   */
  def ngramJaccardBlocked(docs: DataFrame, idCol: String, blockCol: Column,
                          text: Column, n: Int = 3,
                          threshold: Double = 0.0,
                          maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val shRaw = docs.select(col(idCol).as("__id"), blockCol.as("__b"),
        array_distinct(transform(TextFunctions.shingles(text, n), s => xxhash64(s))).as("__sh"))
      .withColumn("__size", size(col("__sh")))
    // under the df-cap the shingle arrays feed both the index and the
    // exact-duplicate fingerprints — compute the text processing once
    val sh = if (maxShingleDocFreq.isDefined)
      shRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    else shRaw
    val exploded = sh.select(col("__id"), col("__b"), col("__size"),
      explode(col("__sh")).as("__shingle"))

    // inverted-index self-join: pairs with ≥ 1 common shingle and their
    // common-shingle count — the shared kernel of both branches
    def indexPairs(index: DataFrame, interCol: String): DataFrame = {
      val a = index.toDF("left_id", "__b", "left_size", "__shingle")
      val b = index.toDF("right_id", "__b", "right_size", "__shingle")
      a.join(b, Seq("__b", "__shingle"))
        .filter(col("left_id") < col("right_id"))
        .groupBy("left_id", "right_id", "left_size", "right_size")
        .agg(count(lit(1)).as(interCol))
    }
    def finish(pairs: DataFrame): DataFrame = pairs
      .withColumn("jaccard",
        col("__inter").cast("double") /
          (col("left_size") + col("right_size") - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select("left_id", "right_id", "jaccard")

    maxShingleDocFreq match {
      case None =>
        finish(indexPairs(exploded, "__inter"))

      case Some(cap) =>
        // Split the index by block-local doc frequency. The d² join blow-up
        // comes entirely from high-df shingles, so only the RARE index
        // self-joins; the frequent side is folded back in linearly below.
        // By the cap's own premise the frequent-shingle SET is tiny (it is
        // boilerplate shared by > cap docs — see SkewGuards), so it is
        // BROADCAST to split the index. No sort, no window over the full
        // exploded index, and nothing index-sized persists: the consumers
        // re-explode from the persisted `sh` arrays.
        val freqSet = graft.operators.SkewGuards
          .overCapKeys(exploded, Seq("__b", "__shingle"), cap)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // Adaptive short-circuit: when NO shingle exceeds the cap the split
        // is the identity and the exact-fingerprint recovery is redundant —
        // the uncapped inverted-index plan produces the identical result with
        // half the stages. The emptiness probe is one map-side-combinable
        // hash-agg pass over the (persisted) index — negligible next to the
        // self-join it sizes, and `freqSet` feeds the guarded plan anyway.
        val splitActive = !freqSet.isEmpty
        graft.core.Decisions.record(
          s"ngram.frequentSplit(cap=$cap).active", splitActive)
        if (!splitActive) {
          freqSet.unpersist()
          return graft.core.OperatorCaches.owned(
            finish(indexPairs(exploded, "__inter")), Seq(sh))
        }
        val rareExpl = exploded
          .join(broadcast(freqSet), Seq("__b", "__shingle"), "left_anti")
          .select("__id", "__b", "__size", "__shingle") // fixed order: fed to positional toDF below
        // per-doc array of its frequent shingles — small for any real corpus
        // (a shingle shared by > cap docs is boilerplate, and a doc holds few)
        val freqArr = exploded
          .join(broadcast(freqSet), Seq("__b", "__shingle"), "left_semi")
          .groupBy("__id")
          .agg(collect_set(col("__shingle")).as("__fsh"))

        // exact-duplicate pairs: identical normalized token sequence ⇒
        // identical shingle set ⇒ Jaccard exactly 1 — no intersection needed.
        // (Also the giant-bucket case the rare index can no longer see.)
        val fps = sh.filter(col("__size") > 0)
          .select(col("__id"), col("__b"), xxhash64(concat_ws(" ",
            transform(col("__sh"), h => h.cast("string")))).as("__fp"))
        val fpPairs = fps.select(col("__b"), col("__fp"), col("__id").as("left_id"))
          .join(fps.select(col("__b"), col("__fp"), col("__id").as("right_id")),
            Seq("__b", "__fp"))
          .filter(col("left_id") < col("right_id"))
          .select("left_id", "right_id")

        // rare-index partial intersection counts (same shape as the uncapped
        // path, minus the skew bomb)
        val rarePairs = indexPairs(rareExpl, "__inter_rare")
          .join(fpPairs, Seq("left_id", "right_id"), "left_anti")
        // frequent-shingle correction: linear join of the small per-doc
        // frequent arrays onto the candidates, intersected per pair
        val corrected = rarePairs
          .join(freqArr.select(col("__id").as("left_id"), col("__fsh").as("__fsh_l")),
            Seq("left_id"), "left_outer")
          .join(freqArr.select(col("__id").as("right_id"), col("__fsh").as("__fsh_r")),
            Seq("right_id"), "left_outer")
          .withColumn("__inter",
            col("__inter_rare") + when(col("__fsh_l").isNull || col("__fsh_r").isNull, 0)
              .otherwise(size(array_intersect(col("__fsh_l"), col("__fsh_r")))))
          .withColumn("jaccard",
            col("__inter").cast("double") /
              (col("left_size") + col("right_size") - col("__inter")))
          .select("left_id", "right_id", "jaccard")

        val exactOnes = fpPairs.withColumn("jaccard", lit(1.0))
        graft.core.OperatorCaches.owned(
          corrected.unionByName(exactOnes)
            .filter(col("jaccard") >= threshold)
            .select("left_id", "right_id", "jaccard"),
          Seq(sh, freqSet))
    }
  }
}
