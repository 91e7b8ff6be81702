package graft.config

/**
 * Minimal text-format protobuf reader for the reference's config
 * syntax (config.txt; parsed there through the protobuf TextFormat
 * library — here a ~60-line recursive descent, since only the textual
 * shape matters, not proto reflection):
 *
 *  - `key: value` scalar fields (quoted strings, numbers, enum idents)
 *  - `key { ... }` nested blocks, with the optional colon the format
 *    allows (`variable: { ... }` and `variable { ... }` both occur)
 *  - repeated keys (a field list, not a map)
 *  - `#` line comments
 *
 * The result is an ordered field multimap tree; typed accessors pull
 * scalars out where the callers ([[StoreConfig]]) expect them.
 */
object TextProto {

  /** One parsed message block: ordered (key, String | Msg) pairs. */
  final case class Msg(fields: Seq[(String, Any)]) {
    def all(key: String): Seq[Any] =
      fields.collect { case (k, v) if k == key => v }
    def msgs(key: String): Seq[Msg] = all(key).collect { case m: Msg => m }
    def strs(key: String): Seq[String] = all(key).collect { case s: String => s }
    def str(key: String): Option[String] = strs(key).headOption
    def long(key: String): Option[Long] = str(key).map(_.toLong)
    def dbl(key: String): Option[Double] = str(key).map(_.toDouble)
    def int(key: String): Option[Int] = str(key).map(_.toInt)
  }

  private def tokenize(text: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < n && text(i) != '\n') i += 1 }
      else if (c == '{' || c == '}' || c == ':') { out += c.toString; i += 1 }
      else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && text(i) != '"') {
          if (text(i) == '\\') {
            if (i + 1 >= n) throw new IllegalArgumentException(
              "dangling escape at end of config text")
            // standard TextFormat escapes; \\ and \" (and anything
            // unrecognized) copy the escaped char literally
            sb += (text(i + 1) match {
              case 'n' => '\n'
              case 't' => '\t'
              case 'r' => '\r'
              case other => other
            })
            i += 2
          } else { sb += text(i); i += 1 }
        }
        if (i >= n) throw new IllegalArgumentException(
          "unterminated string literal in config text")
        i += 1 // closing quote
        // the sentinel prefix marks "was quoted" so an empty string
        // literal survives and `{`/`:` never collide with content
        out += "\u0000" + sb.result()
      } else {
        val start = i
        while (i < n && !text(i).isWhitespace &&
               !"{}:#\"".contains(text(i))) i += 1
        out += text.substring(start, i)
      }
    }
    out.result()
  }

  private def unquote(tok: String): String =
    if (tok.startsWith("\u0000")) tok.substring(1) else tok

  /** Parse a whole config document (an implicit top-level message). */
  def parse(text: String): Msg = {
    val toks = tokenize(text)
    var i = 0
    def parseBlock(): Msg = { // after '{': fields, then the closing '}'
      val m = parseFields()
      if (i >= toks.length || toks(i) != "}")
        throw new IllegalArgumentException("missing '}' in config")
      i += 1
      m
    }
    def parseFields(): Msg = {
      val fields = Seq.newBuilder[(String, Any)]
      while (i < toks.length && toks(i) != "}") {
        val key = toks(i)
        i += 1
        if (i >= toks.length)
          throw new IllegalArgumentException(s"dangling field '$key'")
        if (toks(i) == ":") {
          i += 1
          if (i >= toks.length)
            throw new IllegalArgumentException(s"missing value after '$key:'")
          if (toks(i) == "{") {
            i += 1
            fields += key -> parseBlock()
          } else {
            fields += key -> unquote(toks(i))
            i += 1
          }
        } else if (toks(i) == "{") {
          i += 1
          fields += key -> parseBlock()
        } else throw new IllegalArgumentException(
          s"expected ':' or '{' after '$key', got '${toks(i)}'")
      }
      Msg(fields.result())
    }
    val m = parseFields()
    if (i < toks.length)
      throw new IllegalArgumentException("unbalanced '}' in config")
    m
  }
}
