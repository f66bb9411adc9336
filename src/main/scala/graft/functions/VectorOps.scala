package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native Catalyst expression for the hot loop of every cosine-similarity
  * operator: an ordered left-to-right dot product over two ARRAY<DOUBLE>
  * columns.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: the builtin
  * composition materializes an intermediate products array per row pair and
  * walks higher-order-function lambdas; this expression compiles (via
  * `doGenCode`) to a tight primitive loop inside whole-stage codegen — no
  * allocation, no virtual calls — which matters when a brute-force
  * verification pass evaluates tens of millions of pairs. Accumulation
  * order is the same strict left fold, so results are bit-identical to the
  * fold-based form and to DuckDB's `list_dot_product` oracle.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_product expects array<double>, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All multi-band hyperplane LSH keys in ONE expression: for each of
  * `bands` bands, the `bits`-bit sign key of the vector against that
  * band's hyperplanes, returned as ARRAY<BIGINT>(bands).
  *
  * Why: the first cut composed 96 independent `DotProduct` expressions
  * (16 bands × 6 bits, each with its own 64-literal plane array) — the
  * generated whole-stage code was enormous and codegen+JIT dominated the
  * operator's cold path (11.8 s to first result on a 2k×64-d corpus;
  * r6 VERDICT perf item #5). One expression over a single flattened
  * plane matrix compiles to three tight loops, loads the vector once,
  * and emits bit-identical keys: same left-to-right accumulation, same
  * `>= 0` sign rule, same `1L << j` weights as the fold it replaces.
  *
  * `right` is the flattened row-major plane matrix (bands·bits planes ×
  * stride dims); the per-plane stride is derived from its length so the
  * matrix literal stays self-describing.
  */
case class HyperplaneBandKeys(left: Expression, right: Expression,
    bands: Int, bits: Int) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"band_keys expects array<double>, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val p = b.asInstanceOf[ArrayData]
    val stride = p.numElements() / (bands * bits)
    val n = math.min(v.numElements(), stride)
    val keys = new Array[Long](bands)
    var b0 = 0
    while (b0 < bands) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val base = (b0 * bits + j) * stride
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += v.getDouble(i) * p.getDouble(base + i)
          i += 1
        }
        if (acc >= 0.0) key |= (1L << j)
        j += 1
      }
      keys(b0) = key
      b0 += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) => {
      val stride = ctx.freshName("stride")
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val key = ctx.freshName("key")
      val acc = ctx.freshName("acc")
      s"""
         |int $stride = $p.numElements() / ${bands * bits};
         |int $n = java.lang.Math.min($v.numElements(), $stride);
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    int $base = ($b * $bits + $j) * $stride;
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $acc += $v.getDouble($i) * $p.getDouble($base + $i);
         |    }
         |    if ($acc >= 0.0) $key |= (1L << $j);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** All product-quantization subspace code assignments in ONE expression:
  * for each of `m` subspaces, the argmin-squared-distance codebook id of
  * the subvector against that subspace's `k` centroids, returned as
  * ARRAY<INT>(m). `right` is the flattened row-major codebook tensor
  * (m·k centroids × subDim each; subDim derived from its length).
  *
  * Same motivation as HyperplaneBandKeys: the composed form (m×k
  * struct-least expressions, each with its own literal centroid array)
  * makes codegen+JIT the operator's dominant cost. Distances mirror the
  * composed form exactly — cnorm² (left-fold sum of squares) − 2·dot
  * (left fold), strict-less argmin so ties keep the smaller cid — so
  * assignments are bit-identical.
  */
case class PqCodes(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"pq_codes expects array<double>, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val p = b.asInstanceOf[ArrayData]
    val stride = p.numElements() / (m * k)
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < k) {
        val base = (s * k + c) * stride
        // clamp to the vector's real length (the DotProduct/band-keys
        // min-length contract): missing dims contribute 0, never an
        // out-of-bounds ArrayData read
        val lim = math.min(stride, math.max(0, v.numElements() - s * stride))
        var cn = 0.0
        var dot = 0.0
        var i = 0
        while (i < lim) {
          val pv = p.getDouble(base + i)
          cn += pv * pv
          dot += v.getDouble(s * stride + i) * pv
          i += 1
        }
        while (i < stride) { val pv = p.getDouble(base + i); cn += pv * pv; i += 1 }
        val d = cn - dot * 2
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(s) = best
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) => {
      val stride = ctx.freshName("stride")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val cn = ctx.freshName("cn")
      val dot = ctx.freshName("dot")
      val pv = ctx.freshName("pv")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val lim = ctx.freshName("lim")
      s"""
         |int $stride = $p.numElements() / ${m * k};
         |int[] $codes = new int[$m];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $best = 0;
         |  double $bestD = Double.POSITIVE_INFINITY;
         |  int $lim = java.lang.Math.min($stride,
         |    java.lang.Math.max(0, $v.numElements() - $s * $stride));
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $base = ($s * $k + $c) * $stride;
         |    double $cn = 0.0;
         |    double $dot = 0.0;
         |    int $i = 0;
         |    for (; $i < $lim; $i++) {
         |      double $pv = $p.getDouble($base + $i);
         |      $cn += $pv * $pv;
         |      $dot += $v.getDouble($s * $stride + $i) * $pv;
         |    }
         |    for (; $i < $stride; $i++) {
         |      double $pv = $p.getDouble($base + $i);
         |      $cn += $pv * $pv;
         |    }
         |    double $d = $cn - $dot * 2;
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$s] = $best;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The flat ADC lookup table in ONE expression: distance of the vector's
  * subvectors to EVERY codebook centroid, ARRAY<DOUBLE>(m·k) in (s, cid)
  * order — `lut[s*k + cid]`. Same distance formula and fold order as
  * PqCodes. */
case class PqDists(left: Expression, right: Expression, m: Int, k: Int)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"pq_dists expects array<double>, got $l / $r")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val p = b.asInstanceOf[ArrayData]
    val stride = p.numElements() / (m * k)
    val out = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      var c = 0
      while (c < k) {
        val base = (s * k + c) * stride
        val lim = math.min(stride, math.max(0, v.numElements() - s * stride))
        var cn = 0.0
        var dot = 0.0
        var i = 0
        while (i < lim) {
          val pv = p.getDouble(base + i)
          cn += pv * pv
          dot += v.getDouble(s * stride + i) * pv
          i += 1
        }
        while (i < stride) { val pv = p.getDouble(base + i); cn += pv * pv; i += 1 }
        out(s * k + c) = cn - dot * 2
        c += 1
      }
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p) => {
      val stride = ctx.freshName("stride")
      val out = ctx.freshName("out")
      val s = ctx.freshName("s")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val cn = ctx.freshName("cn")
      val dot = ctx.freshName("dot")
      val pv = ctx.freshName("pv")
      val lim = ctx.freshName("lim")
      s"""
         |int $stride = $p.numElements() / ${m * k};
         |double[] $out = new double[${m * k}];
         |for (int $s = 0; $s < $m; $s++) {
         |  int $lim = java.lang.Math.min($stride,
         |    java.lang.Math.max(0, $v.numElements() - $s * $stride));
         |  for (int $c = 0; $c < $k; $c++) {
         |    int $base = ($s * $k + $c) * $stride;
         |    double $cn = 0.0;
         |    double $dot = 0.0;
         |    int $i = 0;
         |    for (; $i < $lim; $i++) {
         |      double $pv = $p.getDouble($base + $i);
         |      $cn += $pv * $pv;
         |      $dot += $v.getDouble($s * $stride + $i) * $pv;
         |    }
         |    for (; $i < $stride; $i++) {
         |      double $pv = $p.getDouble($base + $i);
         |      $cn += $pv * $pv;
         |    }
         |    $out[$s * $k + $c] = $cn - $dot * 2;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Column-API entry point: `dot_product(a, b)` over ARRAY<DOUBLE>. */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expr(a), ColumnBridge.expr(b)))

  /** Column-API entry point: all `bands` LSH band keys of `v` against the
    * flattened `planes` matrix in one pass — ARRAY<BIGINT>(bands). */
  def band_keys(v: Column, planes: Column, bands: Int, bits: Int): Column =
    ColumnBridge.column(HyperplaneBandKeys(
      ColumnBridge.expr(v), ColumnBridge.expr(planes), bands, bits))

  /** All m PQ subspace codes of `v` against the flattened codebook
    * tensor — ARRAY<INT>(m). */
  def pq_codes(v: Column, books: Column, m: Int, k: Int): Column =
    ColumnBridge.column(PqCodes(
      ColumnBridge.expr(v), ColumnBridge.expr(books), m, k))

  /** The flat ADC lookup table of `v` — ARRAY<DOUBLE>(m·k), (s, cid)
    * order. */
  def pq_dists(v: Column, books: Column, m: Int, k: Int): Column =
    ColumnBridge.column(PqDists(
      ColumnBridge.expr(v), ColumnBridge.expr(books), m, k))
}
