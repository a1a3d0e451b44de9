package graft.functions

/** Parser/holder for public-suffix rules in the publicsuffix.org list
  * format (the fixture ships at `graft/public_suffix_list.dat` — a snapshot
  * subset; drop in the full upstream file for exhaustive coverage).
  *
  * Rule grammar (https://publicsuffix.org/list/):
  *   - `// …` comment lines and blank lines are skipped;
  *   - `foo.bar` — exact rule: `foo.bar` is a public suffix;
  *   - `*.bar`  — wildcard rule: EVERY `<label>.bar` is a public suffix;
  *   - `!baz.bar` — exception: `baz.bar` is NOT a public suffix even where
  *     a wildcard says it is (so `baz.bar` itself is registrable).
  * The registered domain (eTLD+1) of a host is the longest matching public
  * suffix plus one label; the implicit `*` rule makes every unlisted TLD a
  * 1-label public suffix.
  */
object PublicSuffixList {

  /** Parsed rule sets, pre-grouped by label count so the Column translation
    * in [[Web.registeredDomain]] tests each suffix length with one set
    * membership: `exactByLen(k)` = exact rules of k labels; `wildcardBases`
    * = the base (the part after `*.`) of each wildcard rule, by ITS label
    * count (a base of k labels makes k+1-label suffixes); `exceptionsByLen`
    * = exception rules (without `!`) by label count. */
  final case class Rules(exactByLen: Map[Int, Set[String]],
                         wildcardBasesByLen: Map[Int, Set[String]],
                         exceptionsByLen: Map[Int, Set[String]]) {
    def isEmpty: Boolean =
      exactByLen.isEmpty && wildcardBasesByLen.isEmpty && exceptionsByLen.isEmpty
  }

  private def labelCount(rule: String): Int = rule.count(_ == '.') + 1

  /** A rule in host form: lowercased AND ACE-encoded (punycode). The real
    * upstream list stores IDN rules as Unicode (`中国`, `рф`), while crawl
    * hosts arrive ASCII-compatible-encoded (`xn--fiqs8s`) — without this
    * fold every IDN registry rule would silently never match and its
    * registrants would collapse under the implicit `*` rule. Labels that
    * fail IDN conversion keep their lowercase form. */
  private def ace(rule: String): String =
    try java.net.IDN.toASCII(rule).toLowerCase(java.util.Locale.ROOT)
    catch { case _: Exception => rule }

  /** Parse PSL-format text into [[Rules]]. Rules are lowercased and
    * ACE-encoded ([[ace]]) to match [[Web.urlHost]]'s output form. */
  def parse(text: String): Rules = {
    val lines = text.linesIterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map(_.toLowerCase(java.util.Locale.ROOT))
      .toVector
    // strip the rule-kind markers BEFORE ACE-encoding: IDN.toASCII rejects
    // '!' and '*' characters, so encoding first would leave exactly the
    // Unicode wildcard/exception rules un-encoded
    val (exc, rest) = lines.partition(_.startsWith("!"))
    val (wild, exact) = rest.partition(_.startsWith("*."))
    Rules(
      exactByLen = exact.map(ace).groupBy(labelCount).map { case (k, v) => k -> v.toSet },
      wildcardBasesByLen = wild.map(w => ace(w.stripPrefix("*.")))
        .groupBy(labelCount).map { case (k, v) => k -> v.toSet },
      exceptionsByLen = exc.map(e => ace(e.stripPrefix("!")))
        .groupBy(labelCount).map { case (k, v) => k -> v.toSet })
  }

  /** The classpath fixture, parsed once per JVM (driver-side only — the
    * rules are folded into the Column expression at plan time, so executors
    * never load the resource). None when the resource is absent, which
    * makes [[Web.registeredDomain]] fall back to its built-in subset. */
  lazy val loaded: Option[Rules] = {
    val in = Option(getClass.getClassLoader
      .getResourceAsStream("graft/public_suffix_list.dat"))
    in.map { s =>
      try parse(new String(s.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
      finally s.close()
    }.filter(!_.isEmpty)
  }
}
