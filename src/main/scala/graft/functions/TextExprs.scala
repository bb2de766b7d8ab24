package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native tokenizer for the engine's shared token definition
  * (`regexp_extract_all(lower(text), '[a-z]+')` — TextOps.tokens, the parity
  * contract with every DuckDB oracle).
  *
  * `[a-z]+` maximal runs over an already-lowercased string are a pure BYTE
  * scan: the bytes 0x61-0x7A never appear inside a multi-byte UTF-8 sequence
  * (continuation and lead bytes are ≥ 0x80), so splitting on byte runs is
  * EXACTLY the regex's match set — no regex engine, no per-row Matcher
  * allocation, one pass. The `lower()` stays an ordinary Catalyst call
  * upstream (Unicode lowercasing, e.g. İ → i + combining dot, must keep
  * String semantics; only the run extraction is bytes).
  *
  * OpsSpec pins bit-parity against the regex form on the corpus plus
  * Unicode/edge fixtures; every token-path oracle is unchanged.
  */
object TextExprs {

  val TokensFn = "graft_tokens"

  /** Idempotent per-session registration (same registry entry point as
    * [[VectorExprs.register]]; `GraftExtensions` injects it too).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(TokensFn,
      (es: Seq[Expression]) => AsciiTokens(es(0)), "scala_udf")

  /** Lowercase-alphabetic-run tokens of an ALREADY-LOWERCASED string. */
  def asciiTokens(loweredText: Column): Column = call_function(TokensFn, loweredText)
}

/** Maximal `[a-z]+` byte runs of a (lowercased) string as `array<string>` —
  * see [[TextExprs]] for why the byte scan equals the regex exactly.
  */
case class AsciiTokens(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    val b = s.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = b.length
    while (i < n) {
      if (b(i) >= 'a' && b(i) <= 'z') {
        val start = i
        while (i < n && b(i) >= 'a' && b(i) <= 'z') i += 1
        out.add(UTF8String.fromBytes(b, start, i - start))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val utf8 = classOf[UTF8String].getName
      val gad  = classOf[GenericArrayData].getName
      val b    = ctx.freshName("b")
      val out  = ctx.freshName("out")
      val i    = ctx.freshName("i")
      val n    = ctx.freshName("n")
      val st   = ctx.freshName("st")
      s"""
         |final byte[] $b = $a.getBytes();
         |final int $n = $b.length;
         |final java.util.ArrayList<$utf8> $out = new java.util.ArrayList<$utf8>();
         |int $i = 0;
         |while ($i < $n) {
         |  if ($b[$i] >= 'a' && $b[$i] <= 'z') {
         |    final int $st = $i;
         |    while ($i < $n && $b[$i] >= 'a' && $b[$i] <= 'z') $i++;
         |    $out.add($utf8.fromBytes($b, $st, $i - $st));
         |  } else $i++;
         |}
         |${ev.value} = new $gad($out.toArray());
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): AsciiTokens =
    copy(child = newChild)
}
