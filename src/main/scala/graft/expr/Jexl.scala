package graft.expr

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiler for the reference's JEXL filter dialect → a Catalyst `Column`.
  *
  * The reference evaluates a JEXL expression per record against the context
  * `{metadata{operation, approximateArrivalTimestamp}, newImage{...},
  * oldImage{...}}` and keeps the record iff the result is truthy; evaluation
  * errors filter the record out (fail-closed) — JexlFilterService.java:50-80,
  * truthiness coercion at :65-74, error→false at :76-79. It re-parses the
  * expression per record (JexlFilterService.java:52); we parse once at plan
  * time and let Catalyst whole-stage-codegen the predicate.
  *
  * Documented surface (sqs-connector/README.md:357-458,
  * sqs-application-with-jexl.conf:17-51, streams-application.conf:32):
  * `==`/`!=` (incl. against null), numeric comparisons, `&&`/`||`/`!`,
  * parentheses, arithmetic, elvis `?:`, `empty(x)`, cross-image comparison,
  * and the `converters:` namespace (`to_big_decimal`, `compare_to`,
  * JexlFilterFunctions.java:4-21).
  *
  * Fail-closed parity: all arithmetic lowers to `try_*` functions and casts
  * to `try_cast`, so a row-level error yields NULL → filtered out, instead of
  * failing the Spark job under ANSI mode. A malformed expression compiles to
  * `lit(false)` — matching the reference, where a per-record parse error
  * rejects every record.
  */
object Jexl {

  // ---------------------------------------------------------------- AST
  sealed trait Node
  case class NumLit(text: String) extends Node
  case class StrLit(value: String) extends Node
  case class BoolLit(value: Boolean) extends Node
  case object NullLit extends Node
  case class Ref(path: List[String]) extends Node
  case class Un(op: String, e: Node) extends Node
  case class Bin(op: String, l: Node, r: Node) extends Node
  case class Call(ns: Option[String], name: String, args: List[Node]) extends Node

  // ---------------------------------------------------------------- Lexer
  private sealed trait Tok
  private case class TNum(s: String) extends Tok
  private case class TStr(s: String) extends Tok
  private case class TId(s: String) extends Tok
  private case class TOp(s: String) extends Tok

  private def lex(src: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit) {
        val start = i
        while (i < n && (src(i).isDigit || src(i) == '.')) i += 1
        out += TNum(src.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        out += TId(src.substring(start, i))
      } else if (c == '\'' || c == '"') {
        val q = c
        val sb = new StringBuilder
        i += 1
        while (i < n && src(i) != q) {
          if (src(i) == '\\' && i + 1 < n) { sb += src(i + 1); i += 2 }
          else { sb += src(i); i += 1 }
        }
        if (i >= n) throw new IllegalArgumentException("unterminated string")
        i += 1
        out += TStr(sb.toString)
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (Set("?:", "==", "!=", "<=", ">=", "&&", "||").contains(two)) {
          out += TOp(two); i += 2
        } else if ("()<>!+-*/%.,:".indexOf(c) >= 0) {
          out += TOp(c.toString); i += 1
        } else throw new IllegalArgumentException(s"unexpected char '$c' at $i")
      }
    }
    out.toList
  }

  // ---------------------------------------------------------------- Parser
  private class P(var toks: List[Tok]) {
    def peek: Option[Tok] = toks.headOption
    def next(): Tok = { val t = toks.head; toks = toks.tail; t }
    def eat(op: String): Boolean = toks match {
      case TOp(`op`) :: rest => toks = rest; true
      case _ => false
    }
    def expect(op: String): Unit =
      if (!eat(op)) throw new IllegalArgumentException(s"expected '$op' at $toks")

    def parseExpr(): Node = parseElvis()

    def parseElvis(): Node = {
      var l = parseOr()
      while (eat("?:")) l = Bin("?:", l, parseOr())
      l
    }
    def parseOr(): Node = {
      var l = parseAnd()
      while (eat("||") || peekId("or")) l = Bin("||", l, parseAnd())
      l
    }
    def parseAnd(): Node = {
      var l = parseEq()
      while (eat("&&") || peekId("and")) l = Bin("&&", l, parseEq())
      l
    }
    private def peekId(kw: String): Boolean = toks match {
      case TId(`kw`) :: rest => toks = rest; true
      case _ => false
    }
    def parseEq(): Node = {
      var l = parseRel()
      var go = true
      while (go) toks match {
        case TOp(op @ ("==" | "!=")) :: rest => toks = rest; l = Bin(op, l, parseRel())
        case TId(kw @ ("eq" | "ne")) :: rest =>
          toks = rest; l = Bin(if (kw == "eq") "==" else "!=", l, parseRel())
        case _ => go = false
      }
      l
    }
    def parseRel(): Node = {
      var l = parseAdd()
      var go = true
      while (go) toks match {
        case TOp(op @ ("<" | "<=" | ">" | ">=")) :: rest => toks = rest; l = Bin(op, l, parseAdd())
        case TId(kw @ ("lt" | "le" | "gt" | "ge")) :: rest =>
          toks = rest
          l = Bin(Map("lt" -> "<", "le" -> "<=", "gt" -> ">", "ge" -> ">=")(kw), l, parseAdd())
        case _ => go = false
      }
      l
    }
    def parseAdd(): Node = {
      var l = parseMul()
      var go = true
      while (go) toks match {
        case TOp(op @ ("+" | "-")) :: rest => toks = rest; l = Bin(op, l, parseMul())
        case _ => go = false
      }
      l
    }
    def parseMul(): Node = {
      var l = parseUnary()
      var go = true
      while (go) toks match {
        case TOp(op @ ("*" | "/" | "%")) :: rest => toks = rest; l = Bin(op, l, parseUnary())
        case _ => go = false
      }
      l
    }
    def parseUnary(): Node = toks match {
      case TOp("!") :: rest => toks = rest; Un("!", parseUnary())
      case TOp("-") :: rest => toks = rest; Un("-", parseUnary())
      case TId("not") :: rest => toks = rest; Un("!", parseUnary())
      case _ => parsePrimary()
    }
    def parsePrimary(): Node = next() match {
      case TNum(s) => NumLit(s)
      case TStr(s) => StrLit(s)
      case TOp("(") =>
        val e = parseExpr(); expect(")"); e
      case TId("true") => BoolLit(true)
      case TId("false") => BoolLit(false)
      case TId("null") => NullLit
      case TId("empty") if eat("(") =>
        val e = parseExpr(); expect(")"); Call(None, "empty", List(e))
      case TId("size") if eat("(") =>
        val e = parseExpr(); expect(")"); Call(None, "size", List(e))
      case TId(id) =>
        if (eat(":")) { // namespace function, e.g. converters:to_big_decimal(x)
          val fn = next() match {
            case TId(f) => f
            case t => throw new IllegalArgumentException(s"expected function name, got $t")
          }
          expect("(")
          val args = scala.collection.mutable.ListBuffer[Node]()
          if (!eat(")")) {
            args += parseExpr()
            while (eat(",")) args += parseExpr()
            expect(")")
          }
          Call(Some(id), fn, args.toList)
        } else {
          val path = scala.collection.mutable.ListBuffer(id)
          while (eat(".")) next() match {
            case TId(p) => path += p
            case t => throw new IllegalArgumentException(s"expected field after '.', got $t")
          }
          Ref(path.toList)
        }
      case t => throw new IllegalArgumentException(s"unexpected token $t")
    }
  }

  def parse(src: String): Node = {
    val p = new P(lex(src))
    val e = p.parseExpr()
    if (p.toks.nonEmpty) throw new IllegalArgumentException(s"trailing tokens: ${p.toks}")
    e
  }

  // ------------------------------------------------- Render to Spark SQL
  /** JEXL context root → envelope column (JexlFilterService.java:92-130). */
  private def refSql(path: List[String]): String = {
    val mapped = path match {
      case "newImage" :: rest => "image" :: rest
      case "metadata" :: "operation" :: rest =>
        "metadata" :: "stream_operation_type" :: rest
      case "metadata" :: "approximateArrivalTimestamp" :: rest =>
        "metadata" :: "stream_arrival_timestamp" :: rest
      case other => other
    }
    mapped.map(f => s"`$f`").mkString(".")
  }

  private def sql(n: Node): String = n match {
    case NumLit(s) => if (s.contains('.')) s"CAST($s AS DOUBLE)" else s
    case StrLit(s) => "'" + s.replace("'", "''") + "'"
    case BoolLit(b) => b.toString
    case NullLit => "NULL"
    case Ref(path) => refSql(path)
    case Un("!", e) => s"(NOT coalesce(try_cast(${sql(e)} AS BOOLEAN), false))"
    case Un("-", e) => s"(- ${sql(e)})"
    case Un(op, _) => throw new IllegalArgumentException(s"unary $op")
    // JEXL equality is null-safe w.r.t. `x == null` checks: translate those
    // to IS NULL; other comparisons go through JEXL-style coercion (cmpSql).
    case Bin("==", e, NullLit) => s"(${sql(e)} IS NULL)"
    case Bin("==", NullLit, e) => s"(${sql(e)} IS NULL)"
    case Bin("!=", e, NullLit) => s"(${sql(e)} IS NOT NULL)"
    case Bin("!=", NullLit, e) => s"(${sql(e)} IS NOT NULL)"
    case Bin(op @ ("==" | "!=" | "<" | "<=" | ">" | ">="), l, r) => cmpSql(op, l, r)
    case Bin("&&", l, r) => s"(${truthy(l)} AND ${truthy(r)})"
    case Bin("||", l, r) => s"(${truthy(l)} OR ${truthy(r)})"
    case Bin("?:", l, r) => s"coalesce(${sql(l)}, ${sql(r)})"
    case Bin(op @ ("+" | "-" | "*" | "/" | "%"), l, r) =>
      val fn = Map("+" -> "try_add", "-" -> "try_subtract", "*" -> "try_multiply",
        "/" -> "try_divide", "%" -> "try_mod")(op)
      s"$fn(${num(l)}, ${num(r)})"
    case Bin(op, _, _) => throw new IllegalArgumentException(s"binary $op")
    case Call(Some("converters"), "to_big_decimal", List(a)) =>
      s"try_cast(${sql(a)} AS DECIMAL(38,18))"
    case Call(Some("converters"), "compare_to", List(a, b)) =>
      s"CAST(sign(try_subtract(try_cast(${sql(a)} AS DECIMAL(38,18)), " +
        s"try_cast(${sql(b)} AS DECIMAL(38,18)))) AS INT)"
    case Call(None, "empty", List(a)) =>
      s"(${sql(a)} IS NULL OR try_cast(${sql(a)} AS STRING) = '')"
    case Call(None, "size", List(a)) =>
      s"length(try_cast(${sql(a)} AS STRING))"
    case Call(ns, f, _) =>
      throw new IllegalArgumentException(s"unknown function ${ns.fold("")(_ + ":")}$f")
  }

  /** Numeric normalization: JEXL coerces operands to numbers and raises (→
    * fail-closed false) when coercion fails; `try_cast` reproduces that as
    * NULL without aborting the Spark job under ANSI mode. */
  private def num(n: Node): String = s"try_cast(${sql(n)} AS DOUBLE)"

  /** JEXL comparison semantics, error-absorbing:
    *  - both operands numerically coercible → numeric comparison;
    *  - neither coercible (two strings) → lexical comparison;
    *  - mixed (e.g. `'error' > 5`) → JEXL throws → fail-closed false.
    * Direct `string OP number` SQL would make ANSI Spark abort the job on
    * the first malformed row — the reference filters that row out instead
    * (JexlFilterService.java:76-79).
    */
  private def cmpSql(op: String, l: Node, r: Node): String = {
    val (ld, rd) = (num(l), num(r))
    val (ls, rs) = (s"cast(${sql(l)} AS STRING)", s"cast(${sql(r)} AS STRING)")
    op match {
      case "==" =>
        s"(CASE WHEN $ld IS NOT NULL AND $rd IS NOT NULL THEN $ld = $rd " +
          s"WHEN $ld IS NULL AND $rd IS NULL THEN $ls <=> $rs ELSE false END)"
      case "!=" => s"(NOT ${cmpSql("==", l, r)})"
      case rel =>
        s"(CASE WHEN $ld IS NOT NULL AND $rd IS NOT NULL THEN $ld $rel $rd " +
          s"WHEN $ld IS NULL AND $rd IS NULL THEN coalesce($ls $rel $rs, false) " +
          s"ELSE false END)"
    }
  }

  /** Truthiness of a sub-expression in boolean position
    * (JexlFilterService.java:65-74): booleans pass through, strings go
    * through Boolean.parseBoolean, numbers are truthy iff != 0; anything
    * null/failing is false.
    */
  private def truthy(n: Node): String = n match {
    case Bin(op, _, _) if Set("==", "!=", "&&", "||", "<", "<=", ">", ">=").contains(op) =>
      s"coalesce(${sql(n)}, false)"
    case Un("!", _) => s"coalesce(${sql(n)}, false)"
    case BoolLit(b) => b.toString
    case StrLit(s) => (s.trim.equalsIgnoreCase("true")).toString // Boolean.parseBoolean
    case NumLit(s) => (s.toDouble != 0.0).toString
    case Bin(op, _, _) if Set("+", "-", "*", "/", "%").contains(op) =>
      s"coalesce(${sql(n)} <> 0.0, false)"
    case _ =>
      val e = sql(n)
      // Runtime dispatch mirroring JexlFilterService.java:65-74: numbers are
      // truthy iff != 0; booleans/strings via Boolean.parseBoolean (so only
      // the exact word 'true' — NOT Spark's lenient 'yes'/'y'/'1' cast).
      s"(CASE WHEN try_cast($e AS DOUBLE) IS NOT NULL THEN try_cast($e AS DOUBLE) <> 0.0 " +
        s"ELSE lower(trim(coalesce(cast($e AS STRING), ''))) = 'true' END)"
  }

  /** Compile a JEXL filter to a Spark boolean Column. A malformed expression
    * compiles to `lit(false)` — the reference's per-record evaluation error
    * path rejects every record (JexlFilterService.java:76-79).
    */
  def compile(src: String): Column = Try {
    val ast = parse(src)
    expr(truthy(ast))
  } match {
    case Success(c) => c
    case Failure(_) => lit(false)
  }

  /** Null/empty-expression guard (AbstractTargetMapper.java:52-58):
    * no filter configured → pass-through. */
  def filter(df: DataFrame, jexl: Option[String]): DataFrame = jexl match {
    case None | Some("") => df
    case Some(s) => df.filter(compile(s))
  }
}
