package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization (canonical
  * decomposition + canonical composition, `java.text.Normalizer`
  * Form.NFC — the JDK's implementation of UAX #15, the same public
  * algorithm behind DuckDB's `nfc_normalize`). Canonicalizing text to
  * NFC before hashing/fingerprinting is the step that makes
  * `"e" + COMBINING ACUTE` and the precomposed `é` the SAME document
  * to every downstream dedup/fingerprint operator — without it,
  * byte-identical-looking corpora from different extractors never
  * match.
  *
  * Codegen shape: participates in whole-stage codegen (no UDF
  * conversion wrapper, no codegen-span break). The generated code
  * first walks the raw bytes once — a pure-ASCII string is NFC by
  * definition and is returned AS-IS, zero-copy, no String
  * materialization. Only strings with a non-ASCII byte pay the
  * String round trip through the Normalizer (unavoidable: canonical
  * composition operates on code points, not bytes). On web-corpus
  * distributions where most text is ASCII-dominant this skips the
  * allocation for the overwhelming majority of rows.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects a string input, got " +
          s"${other.simpleString}")
    }

  override def dataType: DataType = StringType

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.nfcUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.NfcNormalize.nfcUtf8($a);"
    })

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** ASCII fast path (NFC by definition, returned as-is), else the
    * JDK Normalizer. Called from both interpreted eval and the
    * generated code — one definition, no drift.
    */
  def nfcUtf8(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str,
          java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(java.text.Normalizer.normalize(str,
        java.text.Normalizer.Form.NFC))
    }
  }

  /** Column builder over the native expression. */
  def apply(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))
}
