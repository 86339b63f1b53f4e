package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Source lint promoting the RoundCheckpoints rotation contract to a
  * build-time invariant (VERDICT r12 ask #5): `RoundCheckpoints.scala`'s
  * contract line says an UNTRACKED round-state checkpoint inside a loop
  * re-opens the O(rounds × state) storage leak that GC-thrashed the sf10
  * driver into RPC-timeout shutdown (round 11, kCore). The operator
  * storage-bound specs catch the operators they cover; this lint makes
  * the pattern un-reintroducible anywhere in main sources.
  *
  * Rule, over comment/string-stripped source: every `.localCheckpoint(`
  * lexically inside a `while`/`for` body must sit inside a `track(...)`
  * call (RoundCheckpoints exact ownership). `.persist(`/`.cache()` in a
  * loop body are fine when the body also `.unpersist(`s (the documented
  * intra-round pair) or when tracked. A deliberate exception carries
  * `lint:checkpoint-ok` on the same line with the reason.
  *
  * `.foreach` lambda loops are in scope too (round 13) — same
  * O(items × state) accumulation class as while/for. Heuristic limit,
  * chosen to UNDER-flag rather than false-alarm: a single-expression
  * loop body extends to the first newline at bracket depth 0. The
  * deliberately-broken fixtures below pin that the net actually catches
  * the defect class.
  */
object CheckpointLint {

  final case class Violation(file: String, line: Int, what: String)

  private val loopRe = "\\b(while|for)\\s*\\(".r
  private val foreachRe = "\\.foreach\\s*[({]".r
  private val trackRe = "\\btrack\\s*\\(".r

  /** Blank out comments (nested block + line), string literals (single,
    * triple, interpolated bodies) and char literals, preserving offsets
    * and newlines so line numbers survive. */
  private[core] def strip(src: String): String = {
    val out = src.toCharArray
    val n = src.length
    def blank(j: Int): Unit = if (j < n && out(j) != '\n') out(j) = ' '
    var i = 0
    while (i < n) {
      val c = src(i)
      if (c == '/' && i + 1 < n && src(i + 1) == '/') {
        while (i < n && src(i) != '\n') { blank(i); i += 1 }
      } else if (c == '/' && i + 1 < n && src(i + 1) == '*') {
        var depth = 0
        var go = true
        while (go && i < n) {
          if (i + 1 < n && src(i) == '/' && src(i + 1) == '*') {
            depth += 1; blank(i); blank(i + 1); i += 2
          } else if (i + 1 < n && src(i) == '*' && src(i + 1) == '/') {
            depth -= 1; blank(i); blank(i + 1); i += 2
            if (depth == 0) go = false
          } else { blank(i); i += 1 }
        }
      } else if (c == '"' && i + 2 < n && src(i + 1) == '"' && src(i + 2) == '"') {
        blank(i); blank(i + 1); blank(i + 2); i += 3
        while (i < n && !(src(i) == '"' && i + 2 < n &&
            src(i + 1) == '"' && src(i + 2) == '"')) { blank(i); i += 1 }
        if (i < n) { blank(i); blank(i + 1); blank(i + 2); i += 3 }
      } else if (c == '"') {
        blank(i); i += 1
        while (i < n && src(i) != '"' && src(i) != '\n') {
          if (src(i) == '\\' && i + 1 < n) { blank(i); blank(i + 1); i += 2 }
          else { blank(i); i += 1 }
        }
        if (i < n && src(i) == '"') { blank(i); i += 1 }
      } else if (c == '\'' && i + 2 < n && src(i + 1) != '\\' && src(i + 2) == '\'') {
        blank(i); blank(i + 1); blank(i + 2); i += 3
      } else if (c == '\'' && i + 3 < n && src(i + 1) == '\\' && src(i + 3) == '\'') {
        blank(i); blank(i + 1); blank(i + 2); blank(i + 3); i += 4
      } else i += 1
    }
    new String(out)
  }

  /** Offset of the delimiter matching the opener at `open` (-1 if the
    * text ends first — tolerated, the span just runs to EOF). */
  private def matching(s: String, open: Int, o: Char, c: Char): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      if (s(i) == o) depth += 1
      else if (s(i) == c) { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    -1
  }

  /** (start, end) span of the loop body for a loop header whose `(`
    * is at `parenStart`. */
  private def bodySpan(s: String, parenStart: Int): (Int, Int) = {
    val parenEnd = matching(s, parenStart, '(', ')')
    if (parenEnd < 0) return (s.length, s.length)
    var j = parenEnd + 1
    while (j < s.length && s(j).isWhitespace) j += 1
    if (j + 5 <= s.length && s.regionMatches(j, "yield", 0, 5)) {
      j += 5
      while (j < s.length && s(j).isWhitespace) j += 1
    }
    if (j < s.length && s(j) == '{') {
      val end = matching(s, j, '{', '}')
      (j, if (end < 0) s.length else end)
    } else {
      // single-expression body: to the first newline at bracket depth 0
      var k = j
      var depth = 0
      while (k < s.length && !(s(k) == '\n' && depth <= 0)) {
        s(k) match {
          case '(' | '{' | '[' => depth += 1
          case ')' | '}' | ']' => depth -= 1
          case _ =>
        }
        k += 1
      }
      (j, k)
    }
  }

  def scan(source: String, file: String): Seq[Violation] = {
    val s = strip(source)
    val lines = source.linesIterator.toArray
    def lineOf(off: Int): Int = s.substring(0, off).count(_ == '\n') + 1
    def suppressed(off: Int): Boolean = {
      val ln = lineOf(off) - 1
      ln < lines.length && lines(ln).contains("lint:checkpoint-ok")
    }
    val found = scala.collection.mutable.LinkedHashMap.empty[Int, Violation]
    // while/for: the paren is the CONDITION, body follows it.
    // .foreach: the paren/brace IS the body — a lambda loop (same
    // O(items × state) accumulation class; round 13 widened the net).
    val spans =
      loopRe.findAllMatchIn(s).map { m =>
        bodySpan(s, s.indexOf('(', m.start))
      } ++ foreachRe.findAllMatchIn(s).map { m =>
        val open = m.end - 1
        val (o, c) = if (s(open) == '(') ('(', ')') else ('{', '}')
        val end = matching(s, open, o, c)
        (open, if (end < 0) s.length else end)
      }
    for ((b0, b1) <- spans) {
      if (b1 > b0) {
        val body = s.substring(b0, b1)
        val trackSpans = trackRe.findAllMatchIn(body).flatMap { t =>
          val open = body.indexOf('(', t.start)
          val close = matching(body, open, '(', ')')
          if (close < 0) Some((open, body.length)) else Some((open, close))
        }.toList
        def tracked(pos: Int): Boolean =
          trackSpans.exists { case (o, c) => pos > o && pos < c }
        val hasUnpersist = body.contains(".unpersist(")
        def flag(pat: String, what: String, pairOk: Boolean): Unit = {
          var idx = body.indexOf(pat)
          while (idx >= 0) {
            val abs = b0 + idx
            if (!tracked(idx) && !(pairOk && hasUnpersist) && !suppressed(abs))
              found.getOrElseUpdate(abs, Violation(file, lineOf(abs), what))
            idx = body.indexOf(pat, idx + 1)
          }
        }
        flag(".localCheckpoint(", "untracked localCheckpoint in loop body",
          pairOk = false)
        flag(".persist(", "unpaired persist in loop body", pairOk = true)
        flag(".cache()", "unpaired cache in loop body", pairOk = true)
      }
    }
    found.values.toSeq
  }
}

class CheckpointLintSpec extends AnyFunSuite {

  private val broken =
    """object Bad {
      |  def loop(df: DF): DF = {
      |    var state = df
      |    while (cond) {
      |      state = step(state).localCheckpoint() // the r11 kCore defect
      |    }
      |    state
      |  }
      |}""".stripMargin

  test("the net catches the defect class: bare checkpoint in a while body") {
    val v = CheckpointLint.scan(broken, "Bad.scala")
    assert(v.size == 1 && v.head.line == 5 &&
      v.head.what.contains("untracked localCheckpoint"))
  }

  test("a rotate/track-wrapped loop body is clean; for-bodies are covered") {
    val fixed =
      """object Good {
        |  def loop(df: DF): DF = {
        |    val rc = new RoundCheckpoints(sc)
        |    var state = rc.rotate(rc.track(df.localCheckpoint()))
        |    for (_ <- 1 to n) state = rc.rotate {
        |      rc.track(step(state).localCheckpoint())
        |    }
        |    state
        |  }
        |}""".stripMargin
    assert(CheckpointLint.scan(fixed, "Good.scala").isEmpty)
    val brokenFor =
      """object BadFor {
        |  def loop(df: DF): DF = {
        |    var s = df
        |    for (_ <- 1 to n) s = step(s).localCheckpoint()
        |    s
        |  }
        |}""".stripMargin
    assert(CheckpointLint.scan(brokenFor, "BadFor.scala").size == 1)
  }

  test("foreach lambda loops are in the net, both paren and brace forms") {
    val bad1 = "items.foreach { i =>\n  acc = step(acc, i).localCheckpoint()\n}"
    assert(CheckpointLint.scan(bad1, "f1.scala").size == 1)
    val bad2 = "items.foreach(i => acc = step(acc, i).localCheckpoint())"
    assert(CheckpointLint.scan(bad2, "f2.scala").size == 1)
    val good = "items.foreach { i =>\n  acc = rc.rotate(rc.track(step(acc, i).localCheckpoint()))\n}"
    assert(CheckpointLint.scan(good, "f3.scala").isEmpty)
  }

  test("intra-round cache/unpersist pairs pass; an unpaired cache flags") {
    val paired =
      """while (cond) {
        |  val t = x.cache()
        |  use(t)
        |  t.unpersist()
        |}""".stripMargin
    assert(CheckpointLint.scan(paired, "p.scala").isEmpty)
    val unpaired = "while (cond) {\n  val t = x.cache()\n  use(t)\n}"
    assert(CheckpointLint.scan(unpaired, "u.scala").size == 1)
  }

  test("comments, strings, and the suppression marker do not false-flag") {
    val commenty =
      """while (cond) {
        |  // a comment saying localCheckpoint() is fine here
        |  /* block with .cache() inside /* nested */ still comment */
        |  val s = "df.localCheckpoint() in a string"
        |  val ok = special.localCheckpoint() // lint:checkpoint-ok released by caller
        |}""".stripMargin
    assert(CheckpointLint.scan(commenty, "c.scala").isEmpty)
  }

  test("every main source honors the rotation contract (the actual gate)") {
    val root = java.nio.file.Paths.get("src/main/scala")
    val files = {
      val it = java.nio.file.Files.walk(root).iterator()
      val buf = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
      while (it.hasNext) {
        val f = it.next()
        if (f.toString.endsWith(".scala")) buf += f
      }
      buf.toSeq
    }
    assert(files.size > 30, s"main-source walk looks wrong: ${files.size} files")
    val violations = files.flatMap { f =>
      CheckpointLint.scan(
        new String(java.nio.file.Files.readAllBytes(f),
          java.nio.charset.StandardCharsets.UTF_8),
        root.relativize(f).toString)
    }
    assert(violations.isEmpty, "rotation-contract violations:\n" +
      violations.map(v => s"  ${v.file}:${v.line} ${v.what}").mkString("\n"))
  }
}
