package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths — a codegen'd
  * `Expression` beats a Scala UDF (no serialization boundary, stays
  * inside whole-stage codegen). The Lucene ValueSource surface (§2.12)
  * maps here.
  */

/** BM25 partial score: weight * tf / (tf + cache(normByte & 0xFF)).
  * `weight` and the 256-entry `cache` are query-time constants
  * (TermWeight analog); arithmetic is 32-bit float in the reference's
  * order (`BM25Similarity.java:240-245`) — bit-identical to
  * [[graft.search.BM25.score]].
  */
case class Bm25Score(tf: Expression, normByte: Expression,
    weight: Float, cache: Array[Float])
  extends BinaryExpression {

  override def left: Expression = tf
  override def right: Expression = normByte
  override def dataType: DataType = FloatType
  override def prettyName: String = "bm25_score"

  override protected def nullSafeEval(t: Any, n: Any): Any = {
    val freq = t.asInstanceOf[Int].toFloat
    weight * freq / (freq + cache(n.asInstanceOf[Byte] & 0xff))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cacheRef = ctx.addReferenceObj("bm25cache", cache, "float[]")
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"""
         |float freq = (float) $t;
         |${ev.value} = ${weight}f * freq / (freq + $cacheRef[$n & 0xFF]);
       """.stripMargin)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Bm25Score = copy(tf = newLeft, normByte = newRight)
}

/** Tokenize with the engine's analyzer — array<string>. SQL surface for
  * the analysis chain (TokenStream → Generator mapping, SURVEY.md §2.2).
  */
case class GraftTokens(child: Expression, analyzer: String = "simple")
  extends UnaryExpression {

  @transient private lazy val tok =
    graft.index.IndexBuilder.tokenizerFn(analyzer)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override protected def nullSafeEval(s: Any): Any = {
    val toks = tok(s.asInstanceOf[UTF8String].toString)
    new GenericArrayData(toks.map(UTF8String.fromString(_)))
  }

  // evaluation calls back into the analyzer object; keep interpreted
  // (the build pipeline's hot path aggregates per doc anyway)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val expr = ctx.addReferenceObj("graftTokens", this, classOf[GraftTokens].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (${classOf[ArrayData].getName}) $expr.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): GraftTokens =
    copy(child = newChild)
}

/** Porter stem (release 3) of a lowercase word — the reference's
  * `analysis/en/PorterStemFilter.java` as a codegen'd scalar: the whole
  * stemming predicate stays inside whole-stage codegen when used in a
  * filter/projection over a term dictionary.
  */
case class PorterStemExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "porter_stem"
  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(graft.core.Porter.stem(s.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = UTF8String.fromString(graft.core.Porter.stem($c.toString()));")
  override protected def withNewChildInternal(newChild: Expression): PorterStemExpr =
    copy(child = newChild)
}

/** ASCII folding (ASCIIFoldingFilter law) as a codegen'd scalar. */
case class AsciiFoldExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "ascii_fold"
  override protected def nullSafeEval(s: Any): Any =
    UTF8String.fromString(graft.core.AsciiFold.fold(s.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = UTF8String.fromString(graft.core.AsciiFold.fold($c.toString()));")
  override protected def withNewChildInternal(newChild: Expression): AsciiFoldExpr =
    copy(child = newChild)
}

/** byte315 norm byte for a field length (`SmallFloat.floatToByte315`). */
case class NormByteExpr(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = ByteType
  override def prettyName: String = "graft_norm_byte"
  override protected def nullSafeEval(len: Any): Any =
    graft.core.Norms.normByte(len.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.core.Norms.normByte($c);")
  override protected def withNewChildInternal(newChild: Expression): NormByteExpr =
    copy(child = newChild)
}

/** BM25 idf as an expression: (float) ln(1 + (N - df + 0.5)/(df + 0.5)). */
case class Bm25Idf(df: Expression, docCount: Expression)
  extends BinaryExpression {
  override def left: Expression = df
  override def right: Expression = docCount
  override def dataType: DataType = FloatType
  override def prettyName: String = "bm25_idf"
  override protected def nullSafeEval(d: Any, n: Any): Any =
    graft.search.BM25.idf(d.asInstanceOf[Long], n.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, n) =>
      s"${ev.value} = (float) Math.log(1 + ($n - $d + 0.5D)/($d + 0.5D));")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Bm25Idf = copy(df = l, docCount = r)
}

/** Levenshtein-automaton acceptance: true iff the term is within
  * `maxEdits` plain-Levenshtein edits of `pattern` — the distributed
  * form of FuzzyQuery's automaton × dictionary intersection
  * (`search/FuzzyQuery.java:53`, `AutomatonQuery.java:48`). The DFA is
  * built once driver-side and shipped in the serialized expression; each
  * term is an O(len) packed-table walk instead of the O(len·|pattern|)
  * dynamic program `levenshtein()` runs, and the whole predicate stays
  * inside whole-stage codegen.
  */
case class LevAccept(child: Expression, pattern: String, maxEdits: Int)
  extends UnaryExpression {

  @transient private lazy val dfa = graft.search.LevDfa.build(pattern, maxEdits)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "lev_accept"

  override protected def nullSafeEval(term: Any): Any =
    dfa.accepts(term.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dfaRef = ctx.addReferenceObj("levDfa", dfa, classOf[graft.search.LevDfa].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $dfaRef.accepts($c.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): LevAccept =
    copy(child = newChild)
}

/** One-arg function call under the JavascriptCompiler binding law
  * (`expressions/js/JavascriptCompiler.java` binds `java.lang.Math`
  * statics; Spark's builtin math expressions use `StrictMath`, which
  * drifts from `Math.log` by 1 ULP at e.g. 3.0) — the expression-sort
  * Column form routes every function here so it is bit-identical to
  * [[graft.search.JsExpr.evalD]] by construction, inside whole-stage
  * codegen.
  */
case class JsMath1(fn: String, child: Expression) extends UnaryExpression {
  require(graft.search.JsExpr.Functions.get(fn).contains(1), fn)
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"js_$fn"
  override protected def nullSafeEval(v: Any): Any =
    graft.search.JsExpr.callD(fn, List(v.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${JsMath1.javaCall(fn, c)};")
  override protected def withNewChildInternal(newChild: Expression): JsMath1 =
    copy(child = newChild)
}

object JsMath1 {
  private[functions] def javaCall(fn: String, a: String): String = fn match {
    case "ln" => s"java.lang.Math.log($a)"
    case "acosh" | "asinh" | "atanh" => s"graft.search.JsExpr.${fn}D($a)"
    case other => s"java.lang.Math.$other($a)"
  }
}

/** Two-arg companion of [[JsMath1]] (atan2, pow, min, max, logn). */
case class JsMath2(fn: String, left: Expression, right: Expression)
  extends BinaryExpression {
  require(graft.search.JsExpr.Functions.get(fn).contains(2), fn)
  override def dataType: DataType = DoubleType
  override def prettyName: String = s"js_$fn"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.search.JsExpr.callD(fn,
      List(a.asInstanceOf[Double], b.asInstanceOf[Double]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => fn match {
      // MathUtil.log(base, x) (`util/MathUtil.java:50-52`)
      case "logn" =>
        s"${ev.value} = java.lang.Math.log($b) / java.lang.Math.log($a);"
      case other => s"${ev.value} = java.lang.Math.$other($a, $b);"
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): JsMath2 = copy(left = newLeft, right = newRight)
}

/** Column builders + SQL registration. */
object GraftFunctions {

  def jsMath1(fn: String, a: Column): Column =
    GraftColumnBridge.column(JsMath1(fn, GraftColumnBridge.expression(a)))

  def jsMath2(fn: String, a: Column, b: Column): Column =
    GraftColumnBridge.column(JsMath2(fn, GraftColumnBridge.expression(a),
      GraftColumnBridge.expression(b)))

  def bm25Score(tf: Column, normByte: Column, weight: Float,
      cache: Array[Float]): Column =
    GraftColumnBridge.column(Bm25Score(GraftColumnBridge.expression(tf),
      GraftColumnBridge.expression(normByte), weight, cache))

  def graftTokens(text: Column, analyzer: String = "simple"): Column =
    GraftColumnBridge.column(GraftTokens(GraftColumnBridge.expression(text), analyzer))

  def normByte(length: Column): Column = GraftColumnBridge.column(NormByteExpr(GraftColumnBridge.expression(length)))

  def bm25Idf(df: Column, docCount: Column): Column =
    GraftColumnBridge.column(Bm25Idf(GraftColumnBridge.expression(df),
      GraftColumnBridge.expression(docCount)))

  def levAccept(term: Column, pattern: String, maxEdits: Int): Column =
    GraftColumnBridge.column(LevAccept(GraftColumnBridge.expression(term),
      pattern, maxEdits))

  def porterStem(word: Column): Column =
    GraftColumnBridge.column(PorterStemExpr(GraftColumnBridge.expression(word)))

  def asciiFold(text: Column): Column =
    GraftColumnBridge.column(AsciiFoldExpr(GraftColumnBridge.expression(text)))

  /** Register the SQL-surface functions on a session (ValueSourceParser
    * registry analog, `solr/core/.../search/ValueSourceParser.java`).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_tokens",
      exprs => GraftTokens(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_norm_byte",
      exprs => NormByteExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("bm25_idf",
      exprs => Bm25Idf(exprs(0), exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction("porter_stem",
      exprs => PorterStemExpr(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("ascii_fold",
      exprs => AsciiFoldExpr(exprs.head), "scala_udf")
  }
}
