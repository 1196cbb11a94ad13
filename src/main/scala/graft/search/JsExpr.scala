package graft.search

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** The expressions-module JavaScript dialect
  * (`lucene/expressions/src/java/org/apache/lucene/expressions/js/
  * Javascript.g4`, compiled by `JavascriptCompiler.java`): one arithmetic
  * expression over double-valued variables, with C-style operators and a
  * fixed function table. The reference compiles to JVM bytecode against a
  * `DoubleValuesSource`; here the same AST evaluates two ways — a
  * driver-local closure (bit-faithful to the bytecode's typed stack) and
  * a Catalyst `Column` (whole-stage-codegen'd double arithmetic for the
  * executor-side sort/rescore paths).
  *
  * Typed-stack law (the part that is easy to get wrong): the reference
  * visitor pushes every subexpression with an EXPECTED type and casts the
  * node's NATURAL type to it with plain JVM primitive casts
  * (`JavascriptCompiler.java:420-640`):
  *   - arithmetic (`* / % + -`, unary `-`), variables, literals with a
  *     decimal point, and function calls are naturally DOUBLE;
  *   - bitwise (`& ^ | ~`) and shifts are naturally LONG (operands cast
  *     D2L, i.e. truncate toward zero); a shift's RIGHT operand is INT;
  *   - hex/octal literals are naturally LONG;
  *   - comparisons (`< <= > >= == !=`, on doubles), `&& || !` and the
  *     `?:` condition produce/consume INT booleans — so truthiness is
  *     "nonzero AFTER the cast to int" (`(int) 0.5 == 0` is falsy, and a
  *     long boolean-input truncates bits via L2I, not value).
  * The local evaluator reproduces this with three mutually recursive
  * typed evaluators; the Column form mirrors it with Spark casts (legacy
  * numeric casts are the same JVM truncations).
  *
  * Grammar subset: `VARIABLE`s are dotted identifiers (the reference
  * additionally allows `['…']` array syntax — not bound here since
  * bindings are flat docvalue fields plus `_score`). `haversin` is
  * geo-scope (SURVEY §2: geo n/a-by-design) and rejected loudly. The
  * Column form requires a LITERAL shift count (Spark's shift functions
  * take a static count); the local evaluator is fully general.
  */
object JsExpr {

  sealed trait Node
  final case class DNum(v: Double) extends Node
  final case class LNum(v: Long) extends Node
  final case class Vari(name: String) extends Node
  final case class Not(x: Node) extends Node
  final case class BwNot(x: Node) extends Node
  final case class Neg(x: Node) extends Node
  final case class Arith(op: Char, a: Node, b: Node) extends Node
  final case class Shift(op: String, a: Node, b: Node) extends Node
  final case class Cmp(op: String, a: Node, b: Node) extends Node
  final case class Bw(op: Char, a: Node, b: Node) extends Node
  final case class BoolOp(and: Boolean, a: Node, b: Node) extends Node
  final case class Cond(c: Node, a: Node, b: Node) extends Node
  final case class Call(fn: String, args: List[Node]) extends Node

  /** Function table = `JavascriptCompiler.properties` verbatim (name →
    * arity); bodies follow `java.lang.Math` / `MathUtil` case-by-case in
    * [[callD]].
    */
  val Functions: Map[String, Int] = Map(
    "abs" -> 1, "acos" -> 1, "acosh" -> 1, "asin" -> 1, "asinh" -> 1,
    "atan" -> 1, "atan2" -> 2, "atanh" -> 1, "ceil" -> 1, "cos" -> 1,
    "cosh" -> 1, "exp" -> 1, "floor" -> 1, "ln" -> 1, "log10" -> 1,
    "logn" -> 2, "max" -> 2, "min" -> 2, "pow" -> 2, "sin" -> 1,
    "sinh" -> 1, "sqrt" -> 1, "tan" -> 1, "tanh" -> 1)

  def parse(src: String): Node = {
    val p = new P(src)
    val n = p.parseExpr(0)
    p.skipWs()
    require(p.eof, s"unexpected trailing input at ${p.pos}: '${src.substring(p.pos)}'")
    n
  }

  /** Free variables of the expression (binding names, e.g. docvalue
    * fields and `_score`).
    */
  def variables(n: Node): Set[String] = n match {
    case Vari(v) => Set(v)
    case DNum(_) | LNum(_) => Set.empty
    case Not(x) => variables(x)
    case BwNot(x) => variables(x)
    case Neg(x) => variables(x)
    case Arith(_, a, b) => variables(a) ++ variables(b)
    case Shift(_, a, b) => variables(a) ++ variables(b)
    case Cmp(_, a, b) => variables(a) ++ variables(b)
    case Bw(_, a, b) => variables(a) ++ variables(b)
    case BoolOp(_, a, b) => variables(a) ++ variables(b)
    case Cond(c, a, b) => variables(c) ++ variables(a) ++ variables(b)
    case Call(_, as) => as.flatMap(variables).toSet
  }

  // ---------- driver-local typed evaluation ----------

  def evalD(n: Node, bind: String => Double): Double = n match {
    case DNum(v) => v
    case LNum(v) => v.toDouble
    case Vari(v) => bind(v)
    case Not(x) => if (evalI(x, bind) == 0) 1d else 0d
    case BwNot(x) => (evalL(x, bind) ^ -1L).toDouble
    case Neg(x) => -evalD(x, bind)
    case Arith(op, a, b) =>
      val x = evalD(a, bind); val y = evalD(b, bind)
      op match {
        case '*' => x * y
        case '/' => x / y
        case '%' => x % y
        case '+' => x + y
        case '-' => x - y
      }
    case s: Shift => shiftL(s, bind).toDouble
    case b: Bw => bwL(b, bind).toDouble
    case c: Cmp => if (cmpB(c, bind)) 1d else 0d
    case b: BoolOp => if (boolB(b, bind)) 1d else 0d
    case Cond(c, a, b) =>
      if (evalI(c, bind) != 0) evalD(a, bind) else evalD(b, bind)
    case Call(fn, args) => callD(fn, args.map(evalD(_, bind)))
  }

  private def evalL(n: Node, bind: String => Double): Long = n match {
    case DNum(v) => v.toLong
    case LNum(v) => v
    case Vari(v) => bind(v).toLong
    case Not(x) => if (evalI(x, bind) == 0) 1L else 0L
    case BwNot(x) => evalL(x, bind) ^ -1L
    case Neg(_) | Arith(_, _, _) | Call(_, _) => evalD(n, bind).toLong
    case s: Shift => shiftL(s, bind)
    case b: Bw => bwL(b, bind)
    case c: Cmp => if (cmpB(c, bind)) 1L else 0L
    case b: BoolOp => if (boolB(b, bind)) 1L else 0L
    case Cond(c, a, b) =>
      if (evalI(c, bind) != 0) evalL(a, bind) else evalL(b, bind)
  }

  private def evalI(n: Node, bind: String => Double): Int = n match {
    case DNum(v) => v.toInt
    case LNum(v) => v.toInt
    case Vari(v) => bind(v).toInt
    case Not(x) => if (evalI(x, bind) == 0) 1 else 0
    case BwNot(_) => evalL(n, bind).toInt
    case Neg(_) | Arith(_, _, _) | Call(_, _) => evalD(n, bind).toInt
    case s: Shift => shiftL(s, bind).toInt
    case b: Bw => bwL(b, bind).toInt
    case c: Cmp => if (cmpB(c, bind)) 1 else 0
    case b: BoolOp => if (boolB(b, bind)) 1 else 0
    case Cond(c, a, b) =>
      if (evalI(c, bind) != 0) evalI(a, bind) else evalI(b, bind)
  }

  private def shiftL(s: Shift, bind: String => Double): Long = {
    val x = evalL(s.a, bind); val y = evalI(s.b, bind)
    s.op match {
      case "<<" => x << y
      case ">>" => x >> y
      case ">>>" => x >>> y
    }
  }

  private def bwL(b: Bw, bind: String => Double): Long = {
    val x = evalL(b.a, bind); val y = evalL(b.b, bind)
    b.op match {
      case '&' => x & y
      case '^' => x ^ y
      case '|' => x | y
    }
  }

  private def cmpB(c: Cmp, bind: String => Double): Boolean = {
    val x = evalD(c.a, bind); val y = evalD(c.b, bind)
    c.op match {
      case "<" => x < y
      case "<=" => x <= y
      case ">" => x > y
      case ">=" => x >= y
      case "==" => x == y
      case "!=" => x != y
    }
  }

  private def boolB(b: BoolOp, bind: String => Double): Boolean =
    if (b.and) evalI(b.a, bind) != 0 && evalI(b.b, bind) != 0
    else evalI(b.a, bind) != 0 || evalI(b.b, bind) != 0

  private[graft] def callD(fn: String, a: List[Double]): Double = fn match {
    case "abs" => math.abs(a(0))
    case "acos" => math.acos(a(0))
    case "asin" => math.asin(a(0))
    case "atan" => math.atan(a(0))
    case "atan2" => math.atan2(a(0), a(1))
    case "ceil" => math.ceil(a(0))
    case "cos" => math.cos(a(0))
    case "cosh" => math.cosh(a(0))
    case "exp" => math.exp(a(0))
    case "floor" => math.floor(a(0))
    case "ln" => math.log(a(0))
    case "log10" => math.log10(a(0))
    // MathUtil.log(base, x) (`util/MathUtil.java:50-52`)
    case "logn" => math.log(a(1)) / math.log(a(0))
    case "max" => math.max(a(0), a(1))
    case "min" => math.min(a(0), a(1))
    case "pow" => math.pow(a(0), a(1))
    case "sin" => math.sin(a(0))
    case "sinh" => math.sinh(a(0))
    case "sqrt" => math.sqrt(a(0))
    case "tan" => math.tan(a(0))
    case "tanh" => math.tanh(a(0))
    case "acosh" => acoshD(a(0))
    case "asinh" => asinhD(a(0))
    case "atanh" => atanhD(a(0))
  }

  // MathUtil.acosh/asinh/atanh (`util/MathUtil.java:100-150`) — public
  // so [[graft.functions.JsMath1]] codegen can call the static
  // forwarders; single body shared by both evaluation forms.
  def acoshD(x: Double): Double = math.log(math.sqrt(x * x - 1d) + x)
  def asinhD(x: Double): Double = {
    val sign = if (java.lang.Double.doubleToRawLongBits(x) < 0) -1d else 1d
    val ax = math.abs(x)
    sign * math.log(math.sqrt(ax * ax + 1d) + ax)
  }
  def atanhD(x: Double): Double = {
    val mult = if (java.lang.Double.doubleToRawLongBits(x) < 0) -0.5d else 0.5d
    val ax = math.abs(x)
    mult * math.log((1d + ax) / (1d - ax))
  }

  // ---------- Catalyst Column compilation ----------

  /** The expression as a DoubleType Column over `bind`-resolved variable
    * columns (each already DoubleType). Mirrors the typed-stack law with
    * Spark's legacy numeric casts (double→long/int and long→int are the
    * same JVM truncations); function calls go through the codegen'd
    * JsMath expressions so both evaluation forms share one
    * `java.lang.Math` body — bit-for-bit parity is spec-pinned
    * (JsExprSpec value grid).
    */
  def toColumn(n: Node, bind: String => Column): Column = colD(n, bind)

  private def colD(n: Node, bind: String => Column): Column = n match {
    case DNum(v) => lit(v)
    case LNum(v) => lit(v.toDouble)
    case Vari(v) => bind(v)
    case Not(x) => when(colI(x, bind) === lit(0), lit(1d)).otherwise(lit(0d))
    case _: BwNot => colL(n, bind).cast(DoubleType)
    case Neg(x) => -colD(x, bind)
    case Arith(op, a, b) =>
      val x = colD(a, bind); val y = colD(b, bind)
      op match {
        case '*' => x * y
        case '/' => x / y
        case '%' => x % y
        case '+' => x + y
        case '-' => x - y
      }
    case _: Shift | _: Bw => colL(n, bind).cast(DoubleType)
    case c: Cmp => when(cmpCol(c, bind), lit(1d)).otherwise(lit(0d))
    case b: BoolOp => when(boolCol(b, bind), lit(1d)).otherwise(lit(0d))
    case Cond(c, a, b) =>
      when(colI(c, bind) =!= lit(0), colD(a, bind)).otherwise(colD(b, bind))
    case Call(fn, args) => callCol(fn, args.map(colD(_, bind)))
  }

  private def colL(n: Node, bind: String => Column): Column = n match {
    case LNum(v) => lit(v)
    case BwNot(x) => colL(x, bind).bitwiseXOR(lit(-1L))
    case Shift(op, a, b) =>
      val x = colL(a, bind)
      val cnt = shiftCount(b)
      op match {
        case "<<" => shiftleft(x, cnt)
        case ">>" => shiftright(x, cnt)
        case ">>>" => shiftrightunsigned(x, cnt)
      }
    case Bw(op, a, b) =>
      val x = colL(a, bind); val y = colL(b, bind)
      op match {
        case '&' => x.bitwiseAND(y)
        case '^' => x.bitwiseXOR(y)
        case '|' => x.bitwiseOR(y)
      }
    case c: Cmp => when(cmpCol(c, bind), lit(1L)).otherwise(lit(0L))
    case b: BoolOp => when(boolCol(b, bind), lit(1L)).otherwise(lit(0L))
    case Not(x) => when(colI(x, bind) === lit(0), lit(1L)).otherwise(lit(0L))
    case Cond(c, a, b) =>
      when(colI(c, bind) =!= lit(0), colL(a, bind)).otherwise(colL(b, bind))
    case _ => colD(n, bind).cast(LongType)
  }

  private def colI(n: Node, bind: String => Column): Column = n match {
    case c: Cmp => when(cmpCol(c, bind), lit(1)).otherwise(lit(0))
    case b: BoolOp => when(boolCol(b, bind), lit(1)).otherwise(lit(0))
    case Not(x) => when(colI(x, bind) === lit(0), lit(1)).otherwise(lit(0))
    case _: Shift | _: Bw | _: BwNot | LNum(_) =>
      colL(n, bind).cast(IntegerType)
    case Cond(c, a, b) =>
      when(colI(c, bind) =!= lit(0), colI(a, bind)).otherwise(colI(b, bind))
    case _ => colD(n, bind).cast(IntegerType)
  }

  /** Column-form shift counts must be literal (Spark's shift builtins
    * take a static count); the reference compiles arbitrary expressions
    * there — use the local evaluator for those.
    */
  private def shiftCount(n: Node): Int = n match {
    case LNum(v) => v.toInt
    case DNum(v) => v.toInt
    case Neg(LNum(v)) => (-v.toDouble).toLong.toInt
    case Neg(DNum(v)) => (-v).toInt
    case other => throw new IllegalArgumentException(
      s"Column form requires a literal shift count, got $other")
  }

  private def cmpCol(c: Cmp, bind: String => Column): Column = {
    val x = colD(c.a, bind); val y = colD(c.b, bind)
    c.op match {
      case "<" => x < y
      case "<=" => x <= y
      case ">" => x > y
      case ">=" => x >= y
      case "==" => x === y
      case "!=" => x =!= y
    }
  }

  private def boolCol(b: BoolOp, bind: String => Column): Column =
    if (b.and) (colI(b.a, bind) =!= lit(0)) && (colI(b.b, bind) =!= lit(0))
    else (colI(b.a, bind) =!= lit(0)) || (colI(b.b, bind) =!= lit(0))

  /** Every function call routes through the codegen'd
    * [[graft.functions.JsMath1]]/[[graft.functions.JsMath2]] expressions
    * (which call `java.lang.Math`, the JavascriptCompiler binding law):
    * Spark's builtin math expressions moved to `StrictMath` (1-ULP drift
    * vs `Math.log` at e.g. 3.0), its `log`/`log10` NULL out non-positive
    * input (Hive law), and `least`/`greatest` order NaN differently from
    * `Math.min`/`max` — one shared body per function sidesteps all three
    * while staying inside whole-stage codegen.
    */
  private def callCol(fn: String, a: List[Column]): Column =
    if (a.length == 1) graft.functions.GraftFunctions.jsMath1(fn, a(0))
    else graft.functions.GraftFunctions.jsMath2(fn, a(0), a(1))

  // ---------- parser ----------

  /** Recursive-descent precedence parser for Javascript.g4's ladder:
    * unary > muldiv > addsub > shift > relational > equality > `&` > `^`
    * > `|` > `&&` > `||` > `?:` (right-assoc).
    */
  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit =
      while (!eof && s.charAt(pos).isWhitespace) pos += 1

    private def peekOp(op: String): Boolean = {
      skipWs()
      s.regionMatches(pos, op, 0, op.length)
    }

    /** Match `op` unless the following char would extend it into a
      * different operator (`<` vs `<<` vs `<=`, `>` vs `>>>`, …).
      */
    private def tryOp(op: String, notFollowedBy: String = ""): Boolean = {
      if (!peekOp(op)) return false
      val nxt = pos + op.length
      if (nxt < s.length && notFollowedBy.indexOf(s.charAt(nxt)) >= 0)
        return false
      pos = nxt
      true
    }

    private def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }

    // precedence levels, loosest first; parseExpr(0) = full expression
    def parseExpr(level: Int): Node = level match {
      case 0 => // ?: right-assoc
        val c = parseExpr(1)
        if (tryOp("?")) {
          val a = parseExpr(0)
          expect(':')
          Cond(c, a, parseExpr(0))
        } else c
      case 1 => // ||
        var n = parseExpr(2)
        while (tryOp("||")) n = BoolOp(and = false, n, parseExpr(2))
        n
      case 2 => // &&
        var n = parseExpr(3)
        while (tryOp("&&")) n = BoolOp(and = true, n, parseExpr(3))
        n
      case 3 => // |
        var n = parseExpr(4)
        while (!peekOp("||") && tryOp("|")) n = Bw('|', n, parseExpr(4))
        n
      case 4 => // ^
        var n = parseExpr(5)
        while (tryOp("^")) n = Bw('^', n, parseExpr(5))
        n
      case 5 => // &
        var n = parseExpr(6)
        while (!peekOp("&&") && tryOp("&")) n = Bw('&', n, parseExpr(6))
        n
      case 6 => // == !=
        var n = parseExpr(7)
        var go = true
        while (go) {
          if (tryOp("==")) n = Cmp("==", n, parseExpr(7))
          else if (tryOp("!=")) n = Cmp("!=", n, parseExpr(7))
          else go = false
        }
        n
      case 7 => // < <= > >=
        var n = parseExpr(8)
        var go = true
        while (go) {
          if (tryOp("<=")) n = Cmp("<=", n, parseExpr(8))
          else if (tryOp(">=")) n = Cmp(">=", n, parseExpr(8))
          else if (tryOp("<", "<=")) n = Cmp("<", n, parseExpr(8))
          else if (tryOp(">", ">=")) n = Cmp(">", n, parseExpr(8))
          else go = false
        }
        n
      case 8 => // << >> >>>
        var n = parseExpr(9)
        var go = true
        while (go) {
          if (tryOp("<<")) n = Shift("<<", n, parseExpr(9))
          else if (tryOp(">>>")) n = Shift(">>>", n, parseExpr(9))
          else if (tryOp(">>", ">")) n = Shift(">>", n, parseExpr(9))
          else go = false
        }
        n
      case 9 => // + -
        var n = parseExpr(10)
        var go = true
        while (go) {
          if (tryOp("+")) n = Arith('+', n, parseExpr(10))
          else if (tryOp("-")) n = Arith('-', n, parseExpr(10))
          else go = false
        }
        n
      case 10 => // * / %
        var n = parseExpr(11)
        var go = true
        while (go) {
          if (tryOp("*")) n = Arith('*', n, parseExpr(11))
          else if (tryOp("/")) n = Arith('/', n, parseExpr(11))
          else if (tryOp("%")) n = Arith('%', n, parseExpr(11))
          else go = false
        }
        n
      case _ => parseUnary()
    }

    private def parseUnary(): Node = {
      skipWs()
      require(!eof, "unexpected end of expression")
      s.charAt(pos) match {
        case '!' => pos += 1; Not(parseUnary())
        case '~' => pos += 1; BwNot(parseUnary())
        case '+' => pos += 1; parseUnary() // unary + is identity
        case '-' => pos += 1; Neg(parseUnary())
        case '(' =>
          pos += 1
          val n = parseExpr(0)
          expect(')')
          n
        case c if c.isDigit || c == '.' => parseNumber()
        case c if c == '_' || c == '$' || c.isLetter => parseVarOrCall()
        case c => throw new IllegalArgumentException(
          s"unexpected '$c' at $pos")
      }
    }

    private def parseNumber(): Node = {
      val start = pos
      if (s.charAt(pos) == '0' && pos + 1 < s.length &&
        (s.charAt(pos + 1) == 'x' || s.charAt(pos + 1) == 'X')) {
        pos += 2
        val hs = pos
        while (!eof && isHex(s.charAt(pos))) pos += 1
        require(pos > hs, s"bad hex literal at $start")
        return LNum(java.lang.Long.parseLong(s.substring(hs, pos), 16))
      }
      if (s.charAt(pos) == '0' && pos + 1 < s.length &&
        s.charAt(pos + 1) >= '0' && s.charAt(pos + 1) <= '7') {
        pos += 1
        val os = pos
        while (!eof && s.charAt(pos) >= '0' && s.charAt(pos) <= '7') pos += 1
        return LNum(java.lang.Long.parseLong(s.substring(os, pos), 8))
      }
      while (!eof && s.charAt(pos).isDigit) pos += 1
      if (!eof && s.charAt(pos) == '.') {
        pos += 1
        while (!eof && s.charAt(pos).isDigit) pos += 1
      }
      if (!eof && (s.charAt(pos) == 'e' || s.charAt(pos) == 'E')) {
        pos += 1
        if (!eof && (s.charAt(pos) == '+' || s.charAt(pos) == '-')) pos += 1
        while (!eof && s.charAt(pos).isDigit) pos += 1
      }
      // DECIMAL is ALWAYS a double push (JavascriptCompiler visitNumeric
      // runs Double.parseDouble even on "5"); only HEX/OCTAL are longs.
      // A 19-digit integer literal therefore rounds like a double here,
      // exactly as in the reference.
      DNum(java.lang.Double.parseDouble(s.substring(start, pos)))
    }

    private def isHex(c: Char): Boolean =
      c.isDigit || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

    private def parseVarOrCall(): Node = {
      val start = pos
      while (!eof && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_' ||
        s.charAt(pos) == '$' || s.charAt(pos) == '.')) pos += 1
      val name = s.substring(start, pos)
      skipWs()
      if (!eof && s.charAt(pos) == '(') {
        require(name == "haversin" || Functions.contains(name),
          s"Unrecognized function call ($name)")
        require(name != "haversin",
          "haversin is geo scope (n/a-by-design, SURVEY.md §2)")
        pos += 1
        val args = List.newBuilder[Node]
        skipWs()
        if (!eof && s.charAt(pos) != ')') {
          args += parseExpr(0)
          while ({ skipWs(); !eof && s.charAt(pos) == ',' }) {
            pos += 1
            args += parseExpr(0)
          }
        }
        expect(')')
        val a = args.result()
        require(a.length == Functions(name),
          s"$name expects ${Functions(name)} args, got ${a.length}")
        Call(name, a)
      } else Vari(name)
    }
  }
}
