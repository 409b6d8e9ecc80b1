package graft.config

/** Minimal HOCON-subset parser (no third-party deps are allowed beyond the
  * Spark classpath, which does not ship Typesafe Config): nested `key { }`
  * blocks, `key = value` / `key: value`, quoted strings, `#`/`//` comments,
  * dotted keys. Covers the reference's streams-application.conf surface.
  */
object Hocon {
  def parse(src: String): Map[String, String] = {
    val out = scala.collection.mutable.Map[String, String]()
    val stack = scala.collection.mutable.Stack[String]()
    src.linesIterator.flatMap(raw => splitBraces(stripComment(raw))).foreach { line =>
      if (line.nonEmpty) {
        if (line == "}") { if (stack.nonEmpty) stack.pop() }
        else if (line.endsWith("{")) {
          stack.push(line.dropRight(1).trim.stripSuffix("=").stripSuffix(":").trim)
        } else {
          val idx = math.min(
            Some(line.indexOf('=')).filter(_ >= 0).getOrElse(Int.MaxValue),
            Some(line.indexOf(':')).filter(_ >= 0).getOrElse(Int.MaxValue))
          if (idx != Int.MaxValue) {
            val key = line.substring(0, idx).trim
            val value = unquote(line.substring(idx + 1).trim.stripSuffix(","))
            val prefix = stack.toSeq.reverse
            out(((prefix :+ key)).mkString(".")) = value
          }
        }
      }
    }
    out.toMap
  }

  /** HOCON allows content on the same line as braces
    * (`connector { sink = x }`); split such a line into the sub-lines the
    * line-based logic expects (`connector {` / `sink = x` / `}`), leaving
    * braces inside quoted values untouched. Braces in UNQUOTED values are
    * not representable — the HOCON spec itself forbids `{`/`}` in unquoted
    * strings, so `path = /tmp/a-{b}` must be written quoted. */
  private def splitBraces(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inQ = false
    s.foreach { c =>
      if (c == '"') { inQ = !inQ; cur += c }
      else if (!inQ && c == '{') { cur += c; out += cur.toString.trim; cur.clear() }
      else if (!inQ && c == '}') {
        val t = cur.toString.trim
        if (t.nonEmpty) out += t
        out += "}"
        cur.clear()
      } else cur += c
    }
    val tail = cur.toString.trim
    if (tail.nonEmpty) out += tail
    out.result().filter(_.nonEmpty)
  }

  private def stripComment(line: String): String = {
    // respect quotes: only cut #/// outside a quoted string
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line(i)
      if (c == '"') inQ = !inQ
      else if (!inQ && (c == '#' || (c == '/' && i + 1 < line.length && line(i + 1) == '/')))
        return line.substring(0, i)
      i += 1
    }
    line
  }

  private def unquote(s: String): String =
    if (s.length >= 2 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1) else s
}

/** HOCON + env-var configuration, drop-in compatible with the reference's
  * key space (`keyspaces-cdc-streams.stream.connector.*`) and its env-var
  * override convention (KeyspacesConfig.java:261-357, name mangling at
  * :366-375): strip the `keyspaces-cdc-streams.` prefix, upper-snake the
  * full remainder.
  */
final class GraftConfig(conf: Map[String, String], env: Map[String, String] = sys.env) {

  /** `keyspaces-cdc-streams.stream.connector.bucket-id` →
    * `STREAM_CONNECTOR_BUCKET_ID` (KeyspacesConfig.java:366-375: only the
    * product prefix is stripped; every remaining segment is mangled). */
  def envVarName(path: String): String =
    path.stripPrefix("keyspaces-cdc-streams.")
      .replace('.', '_').replace('-', '_').toUpperCase

  def get(path: String): Option[String] =
    env.get(envVarName(path)).orElse(conf.get(path))

  def get(path: String, default: String): String = get(path).getOrElse(default)

  def required(path: String): String = get(path).getOrElse(
    throw new IllegalArgumentException(
      s"missing required config '$path' (or env ${envVarName(path)})"))

  def getInt(path: String, default: Int): Int = get(path).map(_.toInt).getOrElse(default)
  def getLong(path: String, default: Long): Long = get(path).map(_.toLong).getOrElse(default)
  def getBoolean(path: String, default: Boolean): Boolean =
    get(path).map(_.toBoolean).getOrElse(default)
}

object GraftConfig {
  val Root = "keyspaces-cdc-streams.stream"

  def load(path: String): GraftConfig =
    new GraftConfig(Hocon.parse(
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")))

  def fromString(hocon: String, env: Map[String, String] = sys.env): GraftConfig =
    new GraftConfig(Hocon.parse(hocon), env)

  /** Connector settings bundle (defaults match the reference: 256 KiB
    * messages, unlimited records/message, 3 retries — BASELINE.md). */
  final case class ConnectorSettings(
      filterExpression: Option[String],
      filterAction: String = "drop", // or "quarantine": route, don't drop
      fieldsToInclude: Seq[String],
      recordFormat: String,
      includeMetadata: Boolean,
      maxMessageSize: Long,
      maxRecordsPerMessage: Int,
      timestampPartition: String,
      maxRetries: Int)

  def connector(c: GraftConfig): ConnectorSettings = ConnectorSettings(
    filterExpression = c.get(s"$Root.filter-expression").filter(_.nonEmpty),
    filterAction = c.get(s"$Root.connector.filter-action", "drop"),
    fieldsToInclude = c.get(s"$Root.connector.fields-to-include", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq,
    recordFormat = c.get(s"$Root.connector.record-format", "new-image"),
    includeMetadata = c.getBoolean(s"$Root.connector.include-metadata", true),
    maxMessageSize = c.getLong(s"$Root.connector.max-message-size", 256L * 1024),
    maxRecordsPerMessage = c.getInt(s"$Root.connector.max-records-per-message", -1),
    timestampPartition = c.get(s"$Root.connector.timestamp-partition", "hours"),
    maxRetries = c.getInt(s"$Root.connector.max-retries", 3))
}
