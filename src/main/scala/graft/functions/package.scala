package graft

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column-facing wrappers for the engine's native Catalyst expressions.
  * (Spark 4 moved Column↔Expression bridging to classic.ExpressionUtils,
  * reached via GraftColumnBridge.) */
package object functions {

  private def toExpr(c: Column): Expression = GraftColumnBridge.expression(c)
  private def toColumn(e: Expression): Column = GraftColumnBridge.column(e)

  /** 64-bit SimHash of a token-array column (see [[SimHash64]]). */
  def simhash64(tokens: Column): Column =
    toColumn(SimHash64(toExpr(tokens)))

  /** Codegen'd dot product of two numeric-array columns ([[FloatDot]]). */
  def vec_dot(a: Column, b: Column): Column =
    toColumn(FloatDot(toExpr(a), toExpr(b)))

  /** Codegen'd squared L2 norm of a numeric-array column ([[FloatNorm2]]). */
  def vec_norm2(a: Column): Column =
    toColumn(FloatNorm2(toExpr(a)))

  /** First 60 bits of md5 of a string column ([[Md5Hash60]]) — the
    * engine-portable hash primitive (≡ conv(substring(md5(s),1,15),16,10)). */
  def md5hash60(s: Column): Column =
    toColumn(Md5Hash60(toExpr(s)))

  /** One-pass k-component portable-md5 MinHash signature of a token
    * array ([[MinhashSig60]]). */
  def minhash_sig60(tokens: Column, k: Int): Column =
    toColumn(MinhashSig60(toExpr(tokens), k))

  /** Rolling polynomial fingerprint of a string column
    * ([[Fingerprint64]]): (h·31 + codepoint) mod 1e9+7. */
  def fingerprint64(s: Column): Column =
    toColumn(Fingerprint64(toExpr(s)))

  /** 8-bin byte-value histogram of a binary column ([[ByteHistogram]]). */
  def byte_histogram(payload: Column): Column =
    toColumn(ByteHistogram(toExpr(payload)))

  /** Unicode NFC canonical composition of a string column
    * ([[NfcNormalize]]) — ≡ DuckDB's nfc_normalize. */
  def nfc_normalize(s: Column): Column =
    toColumn(NfcNormalize(toExpr(s)))

  /** Codegen'd PQ coder: argmin code per subspace of a 1e6-scaled long
    * vector against a frozen codebook ([[PqEncode]]). */
  def pq_encode(xs: Column, rows: Seq[(Int, Long, Seq[Long])], dsub: Int): Column = {
    val (ids, offsets, cents) = PqEncode.fromRows(rows, dsub)
    toColumn(PqEncode(toExpr(xs), ids, offsets, cents, dsub))
  }
}
