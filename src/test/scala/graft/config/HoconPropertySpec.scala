package graft.config

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Differential property test for the homegrown HOCON-subset parser: build
  * random nested config trees, render them in randomized concrete syntax
  * (inline vs newline braces, `=` vs `:`, comments, indentation, trailing
  * commas, quoted vs bare values), and assert the parse equals the tree's
  * flattened key space. The round-2 inline-brace key-drop bug is exactly
  * the class of regression this pins down.
  *
  * Known parser limits (per HOCON subset contract, excluded from the
  * generator): multiple assignments on one line separated by commas, quote
  * escapes, `include`, substitutions.
  */
class HoconPropertySpec extends AnyFunSuite {

  sealed trait Node
  final case class Leaf(value: String, quoted: Boolean) extends Node
  final case class Branch(children: Seq[(String, Node)]) extends Node

  private def genKey(rnd: Random): String = {
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val n = 1 + rnd.nextInt(8)
    (0 until n).map { i =>
      if (i > 0 && rnd.nextInt(4) == 0) '-' else alpha(rnd.nextInt(alpha.length))
    }.mkString
  }

  private def genLeaf(rnd: Random): Leaf = rnd.nextInt(5) match {
    case 0 => Leaf(rnd.nextInt(100000).toString, quoted = false)
    case 1 => Leaf(rnd.nextBoolean().toString, quoted = false)
    case 2 => Leaf(s"plain-${rnd.nextInt(100)}", quoted = false)
    // quoted values may contain the characters the bare form can't
    case 3 => Leaf(s"a{b}#c d:e=${rnd.nextInt(10)}", quoted = true)
    case _ => Leaf(s"s3://bucket/p-${rnd.nextInt(100)}/x", quoted = true)
  }

  private def genTree(rnd: Random, depth: Int): Branch = {
    val n = 1 + rnd.nextInt(4)
    val used = scala.collection.mutable.Set[String]()
    Branch((0 until n).flatMap { _ =>
      val k = genKey(rnd)
      if (!used.add(k)) None
      else if (depth > 0 && rnd.nextInt(3) == 0)
        Some(k -> genTree(rnd, depth - 1))
      else Some(k -> genLeaf(rnd))
    })
  }

  private def flatten(prefix: Seq[String], node: Node): Map[String, String] = node match {
    case Leaf(v, _) => Map(prefix.mkString(".") -> v)
    case Branch(cs) => cs.flatMap { case (k, c) => flatten(prefix :+ k, c) }.toMap
  }

  private def render(rnd: Random, node: Branch, indent: Int): String = {
    val sb = new StringBuilder
    def pad(i: Int) = " " * (i * (1 + rnd.nextInt(3)))
    def line(i: Int, s: String): Unit = {
      sb ++= pad(i) ++= s
      if (rnd.nextInt(6) == 0) sb ++= "   # trailing comment {not real}"
      else if (rnd.nextInt(8) == 0) sb ++= "  // slashes"
      sb += '\n'
      if (rnd.nextInt(10) == 0) sb ++= "# full-line comment = ignored\n"
    }
    def renderLeaf(i: Int, k: String, l: Leaf): Unit = {
      val sep = if (rnd.nextBoolean()) " = " else ": "
      val v = if (l.quoted) "\"" + l.value + "\"" else l.value
      val comma = if (rnd.nextInt(5) == 0) "," else ""
      line(i, s"$k$sep$v$comma")
    }
    def renderBranch(i: Int, k: String, b: Branch): Unit = {
      rnd.nextInt(3) match {
        case 0 if b.children.forall(_._2.isInstanceOf[Leaf]) && b.children.size == 1 =>
          // inline one-liner: `key { a = 1 }` (the round-2 bug shape)
          val (ck, cl: Leaf) = b.children.head: @unchecked
          val sep = if (rnd.nextBoolean()) " = " else ": "
          val v = if (cl.quoted) "\"" + cl.value + "\"" else cl.value
          line(i, s"$k { $ck$sep$v }")
        case 1 =>
          // opening brace shares the line with the first child
          line(i, s"$k {")
          walk(i + 1, b)
          line(i, "}")
        case _ =>
          val eq = if (rnd.nextBoolean()) " " else " = "
          line(i, s"$k$eq{")
          walk(i + 1, b)
          line(i, "}")
      }
    }
    def walk(i: Int, b: Branch): Unit = b.children.foreach {
      case (k, l: Leaf) => renderLeaf(i, k, l)
      case (k, c: Branch) => renderBranch(i, k, c)
    }
    walk(indent, node)
    sb.toString
  }

  test("random config trees round-trip through every concrete syntax") {
    val rnd = new Random(20260812L)
    (1 to 300).foreach { i =>
      val tree = genTree(rnd, 3)
      val expected = flatten(Nil, tree)
      val text = render(rnd, tree, 0)
      val parsed = Hocon.parse(text)
      assert(parsed == expected,
        s"iteration $i\n--- rendered ---\n$text\n--- expected ---\n$expected\n--- got ---\n$parsed")
    }
  }

  test("the reference conf shapes parse (dotted keys, mixed separators)") {
    val parsed = Hocon.parse(
      """keyspaces-cdc-streams.stream {
        |  source = shardlog
        |  connector { sink = jsonobj, }
        |  coordinator.parent-shard-poll-interval-millis: 1000
        |}
        |""".stripMargin)
    assert(parsed("keyspaces-cdc-streams.stream.source") == "shardlog")
    assert(parsed("keyspaces-cdc-streams.stream.connector.sink") == "jsonobj")
    assert(parsed(
      "keyspaces-cdc-streams.stream.coordinator.parent-shard-poll-interval-millis") == "1000")
  }
}
