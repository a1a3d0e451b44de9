package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket id as a native Catalyst expression.
  *
  * The declarative formulation evaluates an md5-derived ±1 sign per (plane,
  * dimension) PER ROW — nPlanes×dim hash calls per vector, all interpreted
  * (HOFs sit outside codegen). The signs are row-independent, so this
  * expression precomputes the sign table once at plan time and emits a
  * primitive loop.
  *
  * Bit-compatible with the SQL form the oracles replicate: same sign
  * derivation (parity of md5("plane,dim")'s first hex digit), same
  * left-to-right double summation, same HALF_UP round to 6 decimals before
  * the sign test. */
case class VectorLshBucket(child: Expression, nPlanes: Int, planeOffset: Int = 0)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float> input, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "vector_lsh_bucket"

  // plane-major sign table, precomputed up to MaxDim dimensions
  @transient private lazy val signs: Array[Array[Float]] =
    Array.tabulate(nPlanes)(p =>
      Array.tabulate(VectorLshBucket.MaxDim)(d => VectorLshBucket.sign(p + planeOffset, d)))

  override protected def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    VectorLshBucket.bucket(v, signs, nPlanes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "float[][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.VectorLshBucket.bucket($v, $signsRef, $nPlanes)")
  }

  override protected def withNewChildInternal(newChild: Expression): VectorLshBucket =
    copy(child = newChild)
}

object VectorLshBucket {
  /** Dimensions precomputed; vectors longer than this are rejected loudly
    * rather than silently mis-bucketed. */
  val MaxDim = 8192

  /** ±1 from the parity of md5("plane,dim")'s first hex digit — identical to
    * `conv(substring(md5(concat_ws(',', p, d)), 1, 1), 16, 10) % 2`. */
  def sign(plane: Int, dim: Int): Float = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val h = md.digest(s"$plane,$dim".getBytes("UTF-8"))
    if (((h(0) >> 4) & 0xF) % 2 == 0) 1.0f else -1.0f
  }

  /** Shared by interpreted eval and generated code. */
  def bucket(v: ArrayData, signs: Array[Array[Float]], nPlanes: Int): Long = {
    val n = v.numElements()
    require(n <= MaxDim, s"vector dim $n exceeds precomputed LSH sign table ($MaxDim)")
    var out = 0L
    var p = 0
    while (p < nPlanes) {
      val s = signs(p)
      var proj = 0.0
      var d = 0
      while (d < n) {
        proj += v.getFloat(d).toDouble * s(d).toDouble
        d += 1
      }
      if (round6(proj) > 0) out |= (1L << p)
      p += 1
    }
    out
  }

  /** Spark's round(x, 6): BigDecimal HALF_UP — must match exactly or bucket
    * decisions drift from the declarative/oracle form near zero. */
  def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
}
