package graft.util

/** Minimal recursive-descent JSON reader for HARNESS artifacts (the
  * committed `BENCH_r{N}.json` files feeding [[graft.Bench]]'s stall
  * detection). The dependency budget is fixed (no ujson et al.), and the
  * alternative — regex extraction — silently breaks on any pretty-print
  * change of the artifact writer, which is exactly how stall detection can
  * get disabled without a visible failure. Not a general-purpose parser:
  * no streaming, whole input in memory, throws `IllegalArgumentException`
  * on malformed input (callers Try per file).
  *
  * Mapping: object → Map[String, Any], array → List[Any], string → String,
  * number → Double, true/false → Boolean, null → null.
  */
object MiniJson {

  def parse(s: String): Any = {
    val p = new P(s)
    val v = p.value()
    p.ws()
    if (!p.eof) p.fail("trailing content")
    v
  }

  /** The value at `path` (object keys only), or None on any miss/shape. */
  def at(v: Any, path: String*): Option[Any] =
    path.foldLeft(Option(v)) {
      case (Some(m: Map[String @unchecked, Any @unchecked]), k) => m.get(k)
      case _ => None
    }

  private final class P(s: String) {
    private var i = 0
    def eof: Boolean = i >= s.length
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"MiniJson: $msg at offset $i")
    def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\n' ||
        s.charAt(i) == '\r' || s.charAt(i) == '\t')) i += 1
    private def expect(c: Char): Unit = {
      if (eof || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }

    def value(): Any = {
      ws()
      if (eof) fail("unexpected end")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", true)
        case 'f' => lit("false", false)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }

    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, i)) fail(s"expected $word")
      i += word.length
      v
    }

    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val b = Map.newBuilder[String, Any]
      if (!eof && s.charAt(i) == '}') { i += 1; return b.result() }
      var done = false
      while (!done) {
        ws()
        val k = str()
        ws(); expect(':')
        b += k -> value()
        ws()
        if (eof) fail("unterminated object")
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case _ => fail("expected ',' or '}'")
        }
      }
      b.result()
    }

    private def arr(): List[Any] = {
      expect('['); ws()
      val b = List.newBuilder[Any]
      if (!eof && s.charAt(i) == ']') { i += 1; return b.result() }
      var done = false
      while (!done) {
        b += value()
        ws()
        if (eof) fail("unterminated array")
        s.charAt(i) match {
          case ',' => i += 1
          case ']' => i += 1; done = true
          case _ => fail("expected ',' or ']'")
        }
      }
      b.result()
    }

    private def str(): String = {
      expect('"')
      val b = new java.lang.StringBuilder
      while (!eof && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (eof) fail("unterminated escape")
          s.charAt(i) match {
            case '"' => b.append('"')
            case '\\' => b.append('\\')
            case '/' => b.append('/')
            case 'b' => b.append('\b')
            case 'f' => b.append('\f')
            case 'n' => b.append('\n')
            case 'r' => b.append('\r')
            case 't' => b.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) fail("truncated \\u escape")
              b.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => fail(s"bad escape '\\$other'")
          }
        } else b.append(c)
        i += 1
      }
      expect('"')
      b.toString
    }

    private def num(): Double = {
      val start = i
      if (!eof && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      while (!eof && (s.charAt(i).isDigit || s.charAt(i) == '.' ||
        s.charAt(i) == 'e' || s.charAt(i) == 'E' || s.charAt(i) == '-' ||
        s.charAt(i) == '+')) i += 1
      if (i == start) fail("expected a value")
      try s.substring(start, i).toDouble
      catch { case _: NumberFormatException => fail("bad number") }
    }
  }
}
