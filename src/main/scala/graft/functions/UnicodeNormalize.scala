package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native Catalyst
  * expression with codegen — the canonicalization step every dedup KEY
  * needs before hashing: visually identical text arrives from the web in
  * different codepoint sequences (composed `é` vs `e`+COMBINING ACUTE,
  * compatibility ligatures, width variants), and an exact/MinHash/paragraph
  * key computed over the raw bytes silently treats them as distinct
  * documents.
  *
  * Spark ships no normalization builtin, and a Scala UDF would break
  * whole-stage codegen on exactly the scan-shaped path where this runs
  * (every document, every ingest). The generated code is one static
  * `java.text.Normalizer.normalize` call inside the stage — no closure,
  * no boxing, null-safe via `nullSafeCodeGen`. The interpreted path is
  * bit-identical (same JDK call), and DuckDB replays NFC as
  * `nfc_normalize`, so the oracle hash-checks the result.
  *
  * `form` is validated at construction; an unknown form fails analysis,
  * not per-row.
  */
case class UnicodeNormalize(child: Expression, form: String = "NFC")
  extends UnaryExpression {

  private val validForms = Seq("NFC", "NFD", "NFKC", "NFKD")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string input, got ${child.dataType.sql}")
    else if (!validForms.contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName form must be one of ${validForms.mkString("/")}, got $form")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      input.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = UTF8String.fromString(java.text.Normalizer.normalize(
         |  $c.toString(), java.text.Normalizer.Form.$form));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
