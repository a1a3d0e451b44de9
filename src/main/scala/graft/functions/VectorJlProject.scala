package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Johnson–Lindenstrauss ±1 random projection of an `Array[Float]` column to
  * `outDims` dimensions as a native Catalyst expression with codegen:
  * out[p] = (float) round6(Σ_d sign(p,d)·v[d] / √outDims).
  *
  * Why not `zip_with` + `aggregate` per output dim: Spark's higher-order
  * functions evaluate INTERPRETED — a boxed lambda closure per element,
  * outside whole-stage codegen (the 60× MinHash cliff in SURVEY §9). A
  * 768→96 projection would run ~74k interpreted lambda calls per row; this
  * expression compiles to two nested primitive `for` loops inside the
  * generated stage, reading each input element once per output dim from the
  * unsafe array — scan speed, zero shuffle.
  *
  * Bit-identical to the HOF formulation it replaces (SimilaritySpec pins
  * this): the inner sum is the same sequential left fold in double precision,
  * the scale multiply happens after the fold, and round6 reproduces Spark's
  * `round(_, 6)` exactly (BigDecimal.valueOf + HALF_UP, NaN/∞ passthrough).
  * Signs are the same driver-side MD5-parity convention ([[Similarity]]'s
  * portable-LSH hyperplanes), precomputed once per expression instance and
  * shipped as a reference object (outDims × inDims doubles — a few hundred
  * KB at worst, per-executor once).
  *
  * Rows shorter than `inDims` fold over the available prefix (callers guard
  * width with assert_true, see [[Similarity.randomProject]]); array elements
  * are assumed non-null (embedding columns), like [[VectorCosine]].
  */
case class VectorJlProject(child: Expression, inDims: Int, outDims: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects an array<float> input, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = true)
  override def prettyName: String = "vector_jl_project"

  // flattened [p*inDims + d] sign matrix; @transient so only the (tiny)
  // constructor args serialize — each executor rebuilds locally once
  @transient private lazy val signs: Array[Double] =
    VectorJlProject.signMatrix(inDims, outDims)

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), inDims)
    val scale = 1.0 / math.sqrt(outDims.toDouble)
    val out = new Array[Float](outDims)
    var p = 0
    while (p < outDims) {
      val base = p * inDims
      var acc = 0.0
      var d = 0
      while (d < n) { acc += x.getFloat(d).toDouble * signs(base + d); d += 1 }
      out(p) = VectorJlProject.round6f(acc * scale)
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("jlSigns", signs, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n"); val p = ctx.freshName("p")
      val d = ctx.freshName("d"); val acc = ctx.freshName("acc")
      val base = ctx.freshName("base"); val out = ctx.freshName("out")
      val scale = ctx.freshName("scale")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $inDims);
         |double $scale = 1.0 / java.lang.Math.sqrt((double) $outDims);
         |float[] $out = new float[$outDims];
         |for (int $p = 0; $p < $outDims; $p++) {
         |  int $base = $p * $inDims;
         |  double $acc = 0.0;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $acc += ((double) $x.getFloat($d)) * $signsRef[$base + $d];
         |  }
         |  $out[$p] = graft.functions.VectorJlProject.round6f($acc * $scale);
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VectorJlProject =
    copy(child = newChild)
}

object VectorJlProject {
  /** ±1 signs, MD5 parity of "p,d" — the same portable convention as the
    * LSH hyperplanes in [[Similarity.lshBucket]], flattened row-major. */
  def signMatrix(inDims: Int, outDims: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Double](outDims * inDims)
    var p = 0
    while (p < outDims) {
      var d = 0
      while (d < inDims) {
        val hex = md.digest(s"$p,$d".getBytes("UTF-8"))
        out(p * inDims + d) = if (((hex(0) >> 4) & 0xf) % 2 == 0) 1.0 else -1.0
        d += 1
      }
      p += 1
    }
    out
  }

  /** Spark's `round(x, 6)` for doubles, then the double→float cast: finite
    * values go through BigDecimal.valueOf (== scala BigDecimal.decimal for
    * ≤17-sig-digit inputs) with HALF_UP; NaN/∞ pass through, matching
    * catalyst's RoundBase. Called from generated code — keep it static. */
  def round6f(v: Double): Float =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v.toFloat
    else java.math.BigDecimal.valueOf(v)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue().toFloat
}
