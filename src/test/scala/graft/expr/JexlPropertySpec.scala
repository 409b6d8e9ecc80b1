package graft.expr

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Jexl._

/** Differential property tests for the JEXL compiler (VERDICT r2 #8): a
  * generator produces typed random expressions over the documented surface
  * (numeric/string comparisons incl. mixed-type, arithmetic, nested elvis,
  * null checks, empty()/size(), &&/||/!), renders them to JEXL source with
  * MINIMAL precedence-aware parenthesization (so lexer/parser/precedence
  * bugs surface as mismatches), and compares the compiled Spark filter
  * against a direct interpreter implementing the reference semantics
  * (JexlFilterService.java:50-80): numeric coercion, lexical compare for
  * non-coercible pairs, fail-closed mixed comparisons, parseBoolean
  * truthiness, number-truthy-iff-nonzero. Null struct-field access follows
  * Spark/lenient null propagation — the compiler's documented behavior
  * (outcome-equivalent to strict JEXL's error→false for predicates).
  *
  * Deterministic seeds — the scalatest/scalacheck bridge isn't in the
  * offline cache (same approach as PackingPropertySpec).
  */
case class JxImg(title: String, vote_average: java.lang.Double,
    vote_count: java.lang.Integer)
case class JxMeta(stream_keyspace_name: String, stream_table_name: String,
    stream_operation_type: String, stream_arrival_timestamp: Long,
    stream_sequence_number: String)
case class JxCtx(id: Int, origin: String, metadata: JxMeta, image: JxImg,
    oldImage: JxImg)

class JexlPropertySpec extends SparkSpec {
  import spark.implicits._

  private type Img = JxImg
  private type Ctx = JxCtx

  private val titles = Seq(null, "abc", "true", "TRUE", "7", "", "zz", "0", "-3.5")
  private val avgs = Seq[java.lang.Double](null, 0.0, 7.2, -3.5, 100.0, 7.0)
  private val counts = Seq[java.lang.Integer](null, 0, 5, 123, -7)
  private val ops = Seq("INSERT", "UPDATE", "DELETE", "TTL")

  private def mkRows(rng: Random, n: Int): Seq[Ctx] = (1 to n).map { i =>
    def img(): Img =
      if (rng.nextInt(5) == 0) null
      else JxImg(titles(rng.nextInt(titles.size)), avgs(rng.nextInt(avgs.size)),
        counts(rng.nextInt(counts.size)))
    JxCtx(i, "USER", JxMeta("ks", "t", ops(rng.nextInt(ops.size)),
      1700000000000L + rng.nextInt(1000), f"$i%020d"), img(), img())
  }

  // ------------------------------------------------------- typed generator
  private val numRefs = Seq(
    List("newImage", "vote_average"), List("newImage", "vote_count"),
    List("oldImage", "vote_average"), List("oldImage", "vote_count"))
  private val strRefs = Seq(
    List("newImage", "title"), List("oldImage", "title"),
    List("metadata", "operation"))

  private def genNum(rng: Random, d: Int): Node =
    if (d == 0 || rng.nextInt(3) == 0) rng.nextInt(4) match {
      case 0 => NumLit(rng.nextInt(10).toString)
      case 1 => NumLit(f"${rng.nextDouble() * 10}%.1f")
      case _ => Ref(numRefs(rng.nextInt(numRefs.size)))
    } else rng.nextInt(5) match {
      case 0 => Bin("?:", Ref(numRefs(rng.nextInt(numRefs.size))), genNum(rng, d - 1))
      case 1 => Bin("?:", Bin("?:", Ref(numRefs(rng.nextInt(numRefs.size))),
        Ref(numRefs(rng.nextInt(numRefs.size)))), genNum(rng, d - 1)) // nested elvis
      case 2 => Un("-", genNum(rng, d - 1))
      case _ => Bin(Seq("+", "-", "*")(rng.nextInt(3)), genNum(rng, d - 1), genNum(rng, d - 1))
    }

  private def genAtom(rng: Random): Node = rng.nextInt(4) match {
    case 0 => StrLit(titles.drop(1)(rng.nextInt(titles.size - 1)))
    case 1 => Ref(strRefs(rng.nextInt(strRefs.size)))
    case 2 => NumLit(rng.nextInt(10).toString)
    case _ => Ref(numRefs(rng.nextInt(numRefs.size)))
  }

  private def genCmp(rng: Random, d: Int): Node = rng.nextInt(6) match {
    case 0 => // numeric comparison (arithmetic operands)
      Bin(Seq("<", "<=", ">", ">=", "==", "!=")(rng.nextInt(6)),
        genNum(rng, d), genNum(rng, d))
    case 1 => // mixed-type / string comparison matrix
      Bin(Seq("<", ">", "==", "!=")(rng.nextInt(4)), genAtom(rng), genAtom(rng))
    case 2 => // null checks
      val r = (numRefs ++ strRefs ++ Seq(List("newImage"), List("oldImage")))
      Bin(if (rng.nextBoolean()) "==" else "!=", Ref(r(rng.nextInt(r.size))), NullLit)
    case 3 => Call(None, "empty", List(genAtom(rng))) // incl. empty() on numerics
    case 4 => Bin("==", Call(None, "size", List(genAtom(rng))),
      NumLit(rng.nextInt(4).toString))
    case _ => Bin(Seq("==", "!=")(rng.nextInt(2)),
      Ref(List("metadata", "operation")), StrLit(ops(rng.nextInt(ops.size))))
  }

  private def genBool(rng: Random, d: Int): Node =
    if (d == 0 || rng.nextInt(3) == 0) genCmp(rng, 1)
    else rng.nextInt(4) match {
      case 0 => Bin("&&", genBool(rng, d - 1), genBool(rng, d - 1))
      case 1 => Bin("||", genBool(rng, d - 1), genBool(rng, d - 1))
      case 2 => Un("!", genBool(rng, d - 1))
      case _ => genCmp(rng, d)
    }

  // ------------------------------------- precedence-aware minimal renderer
  private def prec(n: Node): Int = n match {
    case Bin("?:", _, _) => 1
    case Bin("||", _, _) => 2
    case Bin("&&", _, _) => 3
    case Bin("==" | "!=", _, _) => 4
    case Bin("<" | "<=" | ">" | ">=", _, _) => 5
    case Bin("+" | "-", _, _) => 6
    case Bin("*" | "/" | "%", _, _) => 7
    case Un(_, _) => 8
    case _ => 9
  }

  private def render(n: Node, parent: Int = 0): String = {
    val s = n match {
      case NumLit(t) => t
      case StrLit(v) => "'" + v.replace("'", "\\'") + "'"
      case BoolLit(b) => b.toString
      case NullLit => "null"
      case Ref(p) => p.mkString(".")
      case Un(op, e) => op + render(e, prec(n) + 1)
      case Bin(op, l, r) => s"${render(l, prec(n))} $op ${render(r, prec(n) + 1)}"
      case Call(ns, f, args) =>
        ns.fold("")(_ + ":") + f + args.map(render(_, 0)).mkString("(", ", ", ")")
    }
    if (prec(n) < parent) s"($s)" else s
  }

  // --------------------------------------------- reference-semantics oracle
  private class EvalError extends RuntimeException
  private def err(): Nothing = throw new EvalError

  private def toNum(v: Any): Double = v match {
    case null => err()
    case d: java.lang.Double => d
    case i: java.lang.Integer => i.toDouble
    case l: java.lang.Long => l.toDouble
    case s: String => try s.trim.toDouble catch { case _: NumberFormatException => err() }
    case _ => err()
  }
  private def numOpt(v: Any): Option[Double] = v match {
    case null => None
    case d: java.lang.Double => Some(d)
    case i: java.lang.Integer => Some(i.toDouble)
    case l: java.lang.Long => Some(l.toDouble)
    case s: String => try Some(s.trim.toDouble) catch { case _: NumberFormatException => None }
    case _ => None
  }
  private def toBool(v: Any): Boolean = v match {
    case null => false
    case b: java.lang.Boolean => b
    case s: String => s.trim.equalsIgnoreCase("true") // Boolean.parseBoolean
    case other => numOpt(other).exists(_ != 0.0)
  }

  private def evalRef(path: List[String], ctx: Ctx): Any = path match {
    case List("newImage") => ctx.image
    case List("oldImage") => ctx.oldImage
    case "newImage" :: f :: Nil => field(ctx.image, f)
    case "oldImage" :: f :: Nil => field(ctx.oldImage, f)
    case List("metadata", "operation") => ctx.metadata.stream_operation_type
    case List("metadata", "approximateArrivalTimestamp") =>
      ctx.metadata.stream_arrival_timestamp
    case other => err()
  }
  private def field(i: Img, f: String): Any =
    if (i == null) null // lenient null propagation (Spark semantics, doc'd)
    else f match {
      case "title" => i.title
      case "vote_average" => i.vote_average
      case "vote_count" => i.vote_count
      case _ => err()
    }

  private def eval(n: Node, ctx: Ctx): Any = n match {
    // integer literals stay integral (the compiler renders them as SQL int
    // literals — their CAST-to-string form has no trailing ".0")
    case NumLit(s) => if (s.contains('.')) s.toDouble else s.toLong
    case StrLit(s) => s
    case BoolLit(b) => b
    case NullLit => null
    case Ref(p) => evalRef(p, ctx)
    case Un("-", e) => eval(e, ctx) match { case null => null; case v => -toNum(v) }
    case Un("!", e) => !toBool(eval(e, ctx))
    case Bin("?:", l, r) =>
      // compiled form is coalesce(...): lhs evaluation NULLS (not errors)
      // select the default — generator keeps lhs error-free (plain refs)
      val lv = try eval(l, ctx) catch { case _: EvalError => null }
      if (lv != null) lv else eval(r, ctx)
    case Bin("&&", l, r) => toBool(eval(l, ctx)) && toBool(eval(r, ctx))
    case Bin("||", l, r) => toBool(eval(l, ctx)) || toBool(eval(r, ctx))
    case Bin("==", e, NullLit) => eval(e, ctx) == null
    case Bin("==", NullLit, e) => eval(e, ctx) == null
    case Bin("!=", e, NullLit) => eval(e, ctx) != null
    case Bin("!=", NullLit, e) => eval(e, ctx) != null
    case Bin(op @ ("==" | "!=" | "<" | "<=" | ">" | ">="), l, r) =>
      val (lv, rv) = (eval(l, ctx), eval(r, ctx))
      val (ln, rn) = (numOpt(lv), numOpt(rv))
      def strCmp: Option[Int] = (lv, rv) match {
        case (a: String, b: String) => Some(a.compareTo(b))
        case _ => None
      }
      (op, ln, rn) match {
        case ("==", Some(a), Some(b)) => a == b
        case ("!=", Some(a), Some(b)) => a != b
        case ("==", None, None) => (lv == null && rv == null) || strCmp.exists(_ == 0)
        case ("!=", None, None) => !((lv == null && rv == null) || strCmp.exists(_ == 0))
        case ("==", _, _) => false // mixed coercibility
        case ("!=", _, _) => true
        case (rel, Some(a), Some(b)) => rel match {
          case "<" => a < b
          case "<=" => a <= b
          case ">" => a > b
          case ">=" => a >= b
        }
        case (rel, None, None) => strCmp.exists { c => rel match {
          case "<" => c < 0
          case "<=" => c <= 0
          case ">" => c > 0
          case ">=" => c >= 0
        }}
        case _ => false // mixed -> JEXL error -> fail-closed
      }
    case Bin(op @ ("+" | "-" | "*" | "/" | "%"), l, r) =>
      val (a, b) = (eval(l, ctx), eval(r, ctx))
      if (a == null || b == null) null // try_* null propagation
      else {
        val (x, y) = (toNum(a), toNum(b))
        op match {
          case "+" => x + y
          case "-" => x - y
          case "*" => x * y
          case "/" => if (y == 0.0) null else x / y // try_divide
          case "%" => if (y == 0.0) null else x % y
        }
      }
    case Call(None, "empty", List(a)) =>
      val v = try eval(a, ctx) catch { case _: EvalError => null }
      v == null || stringOf(v).isEmpty
    case Call(None, "size", List(a)) => eval(a, ctx) match {
      case null => null
      case v => stringOf(v).length.toDouble
    }
    case _ => err()
  }

  /** Spark CAST-to-string rendering for the value types in play
    * (Double.toString matches Spark's cast for the magnitudes generated). */
  private def stringOf(v: Any): String = v.toString

  private def oracle(n: Node, ctx: Ctx): Boolean =
    try toBool(eval(n, ctx)) catch { case _: EvalError => false }

  // ------------------------------------------------------------------ tests
  test("compiled filters match the reference-semantics oracle on 150 random expressions") {
    val rng = new Random(20260812)
    val rows = mkRows(rng, 60)
    val df = spark.createDataset(rows).toDF().cache()
    var totalKept = 0L
    (1 to 150).foreach { i =>
      val ast = genBool(rng, 3)
      val src = render(ast)
      val expected = rows.filter(oracle(ast, _)).map(_.id).toSet
      val got = df.filter(Jexl.compile(src)).select("id").as[Int].collect().toSet
      assert(got == expected,
        s"""|expr #$i: $src
            |  spark-only: ${(got -- expected).toSeq.sorted.take(5)}
            |  oracle-only: ${(expected -- got).toSeq.sorted.take(5)}""".stripMargin)
      totalKept += expected.size
    }
    df.unpersist()
    // sanity: the corpus is not degenerate (a parser bug that compiles
    // everything to lit(false) would otherwise pass vacuously)
    assert(totalKept > 500, s"degenerate corpus: only $totalKept row-keeps")
  }

  test("round-trip: render(parse(render(ast))) is stable for random expressions") {
    val rng = new Random(42)
    (1 to 200).foreach { _ =>
      val ast = genBool(rng, 3)
      val src = render(ast)
      val reparsed = Jexl.parse(src)
      assert(render(reparsed) == src,
        s"parse/render mismatch:\n  src: $src\n  got: ${render(reparsed)}")
    }
  }
}
