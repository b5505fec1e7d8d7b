package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftColumn}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for the dedup surface.
  *
  * Byte-equality dedup misses duplicates that differ only in Unicode
  * composition ("café" as U+00E9 vs e+U+0301 — typical when one copy
  * of a page came through a macOS filesystem or a decomposing OCR
  * stack). NFC normalization before keying is the standard first step
  * of a training-data dedup pipeline; Spark has no built-in for it,
  * so this is a custom codegen'd expression (preference order (b) of
  * the build brief), NOT a UDF: the generated code calls one static
  * JDK helper, stays inside whole-stage codegen, and ships no
  * closures.
  *
  * Engine parity: the JDK's `java.text.Normalizer` and DuckDB's
  * utf8proc both implement Unicode-conformant NFC, so
  * `nfc_normalize(text)` in the oracle is byte-identical on any text
  * whose codepoints are stable across Unicode versions (everything in
  * the testdata; exotic just-assigned codepoints could differ between
  * the two libraries' Unicode tables and are out of scope).
  *
  * Scale note: a pure per-row projection — no shuffle; the fast path
  * (`Normalizer.isNormalized`, true for virtually all real text) is a
  * single scan that allocates nothing and returns the input buffer.
  */
object UnicodeExprs {
  /** Static target for the generated code: NFC-normalize one
    * UTF8String, returning the input object unchanged when it is
    * already normalized (the overwhelmingly common case). */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** `nfcNormalize(string) -> string` as a Column. */
  def nfcNormalize(c: Column): Column =
    GraftColumn(NfcNormalize(GraftColumn.expr(c)))
}

/** `graft_nfc(string) -> string`: Unicode NFC canonical composition.
  * Mirrors DuckDB's `nfc_normalize`. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.requireTypes(prettyName, (child, HashExprs.isString, "STRING"))

  protected override def nullSafeEval(input: Any): Any =
    UnicodeExprs.nfc(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeExprs.nfc($c)")

  protected override def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
