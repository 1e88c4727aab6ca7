package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Codegen'd Catalyst expressions for the dense-vector / sketch kernels.
 *
 * Spark's higher-order functions (`transform`, `zip_with`, `aggregate`) are
 * `CodegenFallback` — every lambda invocation is interpreted, which made the
 * brute-force cosine join evaluate ~64M interpreted closures at sf0.1 (knn1
 * was 29% of the whole round-1 bench). These expressions compile the same
 * math into tight primitive loops inside whole-stage codegen: one fused loop
 * per row-pair, no per-element allocation, no virtual dispatch.
 *
 * Element types: `array<float>` and `array<double>` are supported; elements
 * are assumed non-null (embedding columns — enforced upstream by schema).
 */
private[graft] object VectorExpressions {

  private[functions] def elementType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other // surfaced by checkInputDataTypes
  }

  private[functions] def checkVec(name: String, es: Expression*): TypeCheckResult = {
    val bad = es.filterNot(e => e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    })
    if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name expects array<float|double> inputs, got ${bad.map(_.dataType.sql).mkString(", ")}")
  }

  /** Java getter snippet producing a double for element `i` of ArrayData `arr`. */
  private[functions] def getJava(arr: String, i: String, et: DataType): String = et match {
    case FloatType => s"(double) $arr.getFloat($i)"
    case _         => s"$arr.getDouble($i)"
  }

  private[functions] def getScala(arr: ArrayData, i: Int, et: DataType): Double = et match {
    case FloatType => arr.getFloat(i).toDouble
    case _         => arr.getDouble(i)
  }
}

/** Pairwise fold over two vectors, fused into one codegen'd loop. */
private[graft] abstract class VectorPairFold extends BinaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVec(prettyName, left, right)

  /** Java expression combining one element pair (doubles `x`, `y`). */
  protected def combineJava(x: String, y: String): String
  protected def combineScala(x: Double, y: Double): Double
  /** Post-process the accumulated sum (e.g. sqrt). */
  protected def finishJava(acc: String): String = acc
  protected def finishScala(acc: Double): Double = acc

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (lt, rt) = (elementType(left), elementType(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += combineScala(getScala(x, i, lt), getScala(y, i, rt))
      i += 1
    }
    finishScala(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${combineJava(getJava(a, i, elementType(left)), getJava(b, i, elementType(right)))};
         |}
         |${ev.value} = ${finishJava(acc)};
       """.stripMargin
    })
}

/** Σ aᵢ·bᵢ — the per-pair kernel of every cosine join. */
private[graft] case class DotProduct(left: Expression, right: Expression) extends VectorPairFold {
  override def prettyName: String = "vec_dot"
  override protected def combineJava(x: String, y: String): String = s"$x * $y"
  override protected def combineScala(x: Double, y: Double): Double = x * y
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Σ (aᵢ−bᵢ)² — squared Euclidean distance. */
private[graft] case class SquaredDistance(left: Expression, right: Expression) extends VectorPairFold {
  override def prettyName: String = "vec_sq_dist"
  override protected def combineJava(x: String, y: String): String = s"($x - $y) * ($x - $y)"
  override protected def combineScala(x: Double, y: Double): Double = { val d = x - y; d * d }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SquaredDistance =
    copy(left = l, right = r)
}

/** Single-vector fold (sum / sum-of-squares → norm). */
private[graft] abstract class VectorFold extends UnaryExpression {
  import VectorExpressions._

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkVec(prettyName, child)

  protected def combineJava(x: String): String
  protected def combineScala(x: Double): Double
  protected def finishJava(acc: String): String = acc
  protected def finishScala(acc: Double): Double = acc

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val et = elementType(child)
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) { acc += combineScala(getScala(x, i, et)); i += 1 }
    finishScala(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${combineJava(getJava(a, i, elementType(child)))};
         |}
         |${ev.value} = ${finishJava(acc)};
       """.stripMargin
    })
}

private[graft] case class ArraySumD(child: Expression) extends VectorFold {
  override def prettyName: String = "vec_sum"
  override protected def combineJava(x: String): String = x
  override protected def combineScala(x: Double): Double = x
  override protected def withNewChildInternal(c: Expression): ArraySumD = copy(child = c)
}

private[graft] case class L2Norm(child: Expression) extends VectorFold {
  override def prettyName: String = "vec_l2_norm"
  override protected def combineJava(x: String): String = s"$x * $x"
  override protected def combineScala(x: Double): Double = x * x
  override protected def finishJava(acc: String): String = s"java.lang.Math.sqrt($acc)"
  override protected def finishScala(acc: Double): Double = math.sqrt(acc)
  override protected def withNewChildInternal(c: Expression): L2Norm = copy(child = c)
}

/**
 * Packed sign bits of the projections onto `planes` hyperplanes — the
 * random-hyperplane LSH key, all planes computed in ONE pass over the vector
 * (the HOF formulation re-walked the vector once per plane, interpreted).
 * Plane weights ride along as a codegen reference object, not literals, so
 * generated code stays small regardless of dims × planes.
 */
private[graft] case class HyperplaneSignBits(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  import VectorExpressions._
  require(planes.nonEmpty && planes.size <= 63, "pack at most 63 sign bits into a long")

  override def prettyName: String = "vec_hyperplane_bits"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = checkVec(prettyName, child)

  @transient private lazy val planesArr: Array[Array[Double]] = planes.map(_.toArray).toArray

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val et = elementType(child)
    var key = 0L
    var p = 0
    while (p < planesArr.length) {
      val w = planesArr(p)
      val n = math.min(x.numElements(), w.length)
      var proj = 0.0
      var i = 0
      while (i < n) { proj += getScala(x, i, et) * w(i); i += 1 }
      if (proj >= 0.0) key |= (1L << p)
      p += 1
    }
    key
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("planes", planesArr, "double[][]")
      val key = ctx.freshName("key")
      val p = ctx.freshName("p")
      val w = ctx.freshName("w")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val proj = ctx.freshName("proj")
      s"""
         |long $key = 0L;
         |for (int $p = 0; $p < $ref.length; $p++) {
         |  final double[] $w = $ref[$p];
         |  final int $n = java.lang.Math.min($a.numElements(), $w.length);
         |  double $proj = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $proj += ${getJava(a, i, elementType(child))} * $w[$i];
         |  }
         |  if ($proj >= 0.0) $key |= (1L << $p);
         |}
         |${ev.value} = $key;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HyperplaneSignBits =
    copy(child = c)
}

/**
 * Multi-probe LSH key sequence: the base hyperplane sign-bit key (element 0)
 * followed by `nProbes` single-bit-flip keys in order of increasing
 * |projection| — the perturbation heuristic of multi-probe LSH (Lv et al.,
 * VLDB 2007): a true neighbor that landed one bucket away most likely
 * disagrees on the hyperplane whose projection is closest to zero, so those
 * flips are probed first. One fused pass computes all projections (same
 * kernel cost as [[HyperplaneSignBits]]); the flip selection is `nProbes`
 * argmin scans over ≤ 63 magnitudes — noise next to the dims×planes flops.
 */
private[graft] case class HyperplaneProbeBits(child: Expression, planes: Seq[Seq[Double]],
    nProbes: Int) extends UnaryExpression {
  import VectorExpressions._
  require(planes.nonEmpty && planes.size <= 63, "pack at most 63 sign bits into a long")
  require(nProbes >= 0, "nProbes must be >= 0")

  override def prettyName: String = "vec_hyperplane_probe_bits"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = checkVec(prettyName, child)

  @transient private lazy val planesArr: Array[Array[Double]] = planes.map(_.toArray).toArray
  private def isFloat: Boolean = elementType(child) == FloatType

  override def nullSafeEval(a: Any): Any =
    HyperplaneProbeBits.compute(a.asInstanceOf[ArrayData], planesArr, nProbes, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("probePlanes", planesArr, "double[][]")
      s"""
         |${ev.value} = graft.functions.HyperplaneProbeBits.compute(
         |  $a, $ref, $nProbes, $isFloat);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HyperplaneProbeBits =
    copy(child = c)
}

private[graft] object HyperplaneProbeBits {
  /** Base key + `np` lowest-|projection| single-bit flips, shared by
    * interpreted eval and codegen. Flip order is deterministic: magnitude
    * ascending, plane index breaking exact ties (first-found argmin). */
  def compute(x: ArrayData, planes: Array[Array[Double]], np: Int,
              isFloat: Boolean): ArrayData = {
    val pCount = planes.length
    val mag = new Array[Double](pCount)
    var key = 0L
    var p = 0
    while (p < pCount) {
      val w = planes(p)
      val n = math.min(x.numElements(), w.length)
      var proj = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        proj += xv * w(i)
        i += 1
      }
      if (proj >= 0.0) key |= (1L << p)
      mag(p) = math.abs(proj)
      p += 1
    }
    val t = math.min(np, pCount)
    val out = new Array[Long](1 + t)
    out(0) = key
    val used = new Array[Boolean](pCount)
    var j = 0
    while (j < t) {
      var best = -1
      var bv = Double.PositiveInfinity
      var q = 0
      while (q < pCount) {
        if (!used(q) && mag(q) < bv) { bv = mag(q); best = q }
        q += 1
      }
      used(best) = true
      out(1 + j) = key ^ (1L << best)
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/**
 * MinHash signature: for base shingle-hashes x (array<bigint>, each in
 * [0, prime)), returns [min over x of (x·aⱼ + bⱼ) mod prime] for j < k, in a
 * single fused pass (k·|shingles| multiply-mods in compiled code — the HOF
 * version allocated k intermediate arrays per row, every element interpreted).
 * Empty input yields the all − 1 sentinel signature, so empty documents only
 * collide with each other.
 */
private[graft] case class MinHashSig(child: Expression, as: Seq[Long], bs: Seq[Long], prime: Long)
    extends UnaryExpression {
  require(as.nonEmpty && as.size == bs.size, "coefficient arrays must align")

  override def prettyName: String = "minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName expects array<bigint>, got ${dt.sql}")
  }

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val k = aArr.length
    val out = new Array[Long](k)
    val n = x.numElements()
    if (n == 0) {
      java.util.Arrays.fill(out, -1L)
    } else {
      var j = 0
      while (j < k) {
        val a = aArr(j); val b = bArr(j)
        var min = Long.MaxValue
        var i = 0
        while (i < n) {
          val h = (x.getLong(i) * a + b) % prime
          if (h < min) min = h
          i += 1
        }
        out(j) = min
        j += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val min = ctx.freshName("min")
      val h = ctx.freshName("h")
      s"""
         |final long[] $out = new long[$aRef.length];
         |final int $n = $x.numElements();
         |if ($n == 0) {
         |  java.util.Arrays.fill($out, -1L);
         |} else {
         |  for (int $j = 0; $j < $aRef.length; $j++) {
         |    long $min = Long.MAX_VALUE;
         |    for (int $i = 0; $i < $n; $i++) {
         |      final long $h = ($x.getLong($i) * $aRef[$j] + $bRef[$j]) % ${prime}L;
         |      if ($h < $min) $min = $h;
         |    }
         |    $out[$j] = $min;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/**
 * The `nProbe` nearest centroids for one vector, as an array of cell ids
 * ordered nearest-first — the IVF assignment collapsed into ONE expression.
 *
 * The relational formulation (crossJoin every vector with k broadcast
 * centroid rows, then rank with a window) materializes n·k rows and sorts
 * them just to keep each vector's top nProbe: at n=200k, k=633 that is
 * 1.3×10⁸ rows through a shuffle for a 4×10⁵-row answer. Here the centroid
 * matrix rides along as a codegen reference object (like
 * [[HyperplaneSignBits]]'s planes) and each row does k fused
 * squared-distance loops plus an insertion into an nProbe-slot buffer —
 * no join, no window, no intermediate rows.
 *
 * Semantics replicate the window formulation bit-for-bit:
 * distances accumulate in element order exactly like [[SquaredDistance]],
 * and on ties the EARLIER matrix row wins — callers must supply rows in
 * ascending cell-id order to match `row_number over (dist asc, cell_id
 * asc)`.
 */
private[graft] case class NearestCells(child: Expression, ids: Seq[Long],
    cents: Seq[Seq[Double]], nProbe: Int) extends UnaryExpression {
  import VectorExpressions._
  require(ids.size == cents.size, "one id per centroid row")
  require(nProbe >= 1, "nProbe must be >= 1")

  override def prettyName: String = "vec_nearest_cells"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = checkVec(prettyName, child)

  @transient private lazy val idArr: Array[Long] = ids.toArray
  @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
  private def isFloat: Boolean = elementType(child) == FloatType

  override def nullSafeEval(a: Any): Any =
    NearestCells.compute(a.asInstanceOf[ArrayData], centArr, idArr, nProbe, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cRef = ctx.addReferenceObj("nrCents", centArr, "double[][]")
      val iRef = ctx.addReferenceObj("nrIds", idArr, "long[]")
      // the selection kernel is one static JIT'd call per row — identical
      // code to the interpreted path, loop cost dominated by k·dims flops
      s"""
         |${ev.value} = graft.functions.NearestCells.compute(
         |  $a, $cRef, $iRef, $nProbe, $isFloat);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): NearestCells =
    copy(child = c)
}

private[graft] object NearestCells {
  /** Top-`np` (distance, id) selection over the centroid rows, nearest first;
    * ties keep the earlier row. Shared by interpreted eval and codegen. */
  def compute(x: ArrayData, cents: Array[Array[Double]], ids: Array[Long],
              np: Int, isFloat: Boolean): ArrayData = {
    val k = cents.length
    val m = math.min(np, k)
    val bestD = new Array[Double](math.max(m, 1))
    val bestI = new Array[Long](math.max(m, 1))
    var count = 0
    var p = 0
    while (p < k) {
      val w = cents(p)
      val n = math.min(x.numElements(), w.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val d = xv - w(i)
        acc += d * d
        i += 1
      }
      var j = count
      while (j > 0 && acc < bestD(j - 1)) j -= 1
      if (j < m) {
        var s = math.min(count, m - 1)
        while (s > j) { bestD(s) = bestD(s - 1); bestI(s) = bestI(s - 1); s -= 1 }
        bestD(j) = acc
        bestI(j) = ids(p)
        if (count < m) count += 1
      }
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(bestI, count))
  }
}
