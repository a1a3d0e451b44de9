package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row charset decode (bytes → string) as a native Catalyst expression
  * with codegen — the stage between [[Html.extractCharset]] (which reads
  * the DECLARED encoding out of raw markup) and every text operator: a
  * 100 TB crawl is ~5% legacy-encoded, each page declaring its OWN
  * charset, and Spark's builtin `decode(bin, charset)` takes a constant
  * charset (and under Spark 4 defaults rejects the legacy charsets — the
  * windows-125x/koi8/shift_jis cohort — outright, and THROWS on malformed
  * bytes, `MALFORMED_CHARACTER_CODING`). This expression gives the crawl
  * semantics instead, with PER-ROW failure isolation:
  *
  *  - unknown / unsupported / empty / null charset names take the
  *    WHATWG/browser fallback — bytes that VALIDATE as UTF-8 decode as
  *    UTF-8, anything else as windows-1252 (readable mojibake, never
  *    U+FFFD soup, never a failed task);
  *  - malformed input and unmappable characters decode to U+FFFD
  *    (`CodingErrorAction.REPLACE`, the browser behavior) — one corrupt
  *    page can't kill a scan;
  *  - any charset the JVM ships (ICU-complete in practice) is accepted,
  *    resolved once per distinct name per executor via a bounded cache.
  *
  * Codegen is one static call inside the stage — no closure, no boxing —
  * so sniff → decode → extract chains stay in whole-stage codegen. */
case class DecodeCharset(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a binary payload, got ${left.dataType.sql}")
    else if (!right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a string charset, got ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "decode_charset"

  override protected def nullSafeEval(bytes: Any, cs: Any): Any =
    CharsetCodec.decode(bytes.asInstanceOf[Array[Byte]],
      cs.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"${ev.value} = graft.functions.CharsetCodec.decode($b, $c);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DecodeCharset =
    copy(left = newLeft, right = newRight)
}

/** The runtime behind [[DecodeCharset]] — a top-level object so codegen
  * can call it through the static-forwarder mirror class. */
object CharsetCodec {
  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")
  private val Unresolved = java.util.Optional.empty[java.nio.charset.Charset]()
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.Optional[java.nio.charset.Charset]]()

  /** Charset by (case-folded) name; empty when the JVM doesn't know it.
    * The cache is bounded: past 1024 distinct names (a corpus feeding
    * garbage declarations) lookups still work, they just stop caching. */
  private def resolve(name: String): java.util.Optional[java.nio.charset.Charset] = {
    if (name == null) return Unresolved
    val n = name.trim.toLowerCase(java.util.Locale.ROOT)
    if (n.isEmpty) return Unresolved
    val hit = cache.get(n)
    if (hit != null) return hit
    val resolved =
      try {
        if (java.nio.charset.Charset.isSupported(n))
          java.util.Optional.of(java.nio.charset.Charset.forName(n))
        else Unresolved
      } catch { case _: Exception => Unresolved }
    if (cache.size < 1024) cache.putIfAbsent(n, resolved)
    resolved
  }

  /** Spec-visible resolution (UTF-8 for unknown names — the DECODER
    * fallback then refines by content, see [[decode]]). */
  private[functions] def lookup(name: String): java.nio.charset.Charset =
    resolve(name).orElse(Utf8)

  /** Strict UTF-8 validity (RFC 3629: continuation framing, no overlongs,
    * no surrogates, ≤ U+10FFFF) in one branch-predictable scan. */
  private[functions] def isValidUtf8(b: Array[Byte]): Boolean = {
    var i = 0
    while (i < b.length) {
      val c = b(i) & 0xff
      if (c < 0x80) i += 1
      else if (c < 0xC2) return false // bare continuation / overlong lead
      else if (c < 0xE0) {
        if (i + 1 >= b.length || (b(i + 1) & 0xC0) != 0x80) return false
        i += 2
      } else if (c < 0xF0) {
        if (i + 2 >= b.length) return false
        val b1 = b(i + 1) & 0xff
        if ((b1 & 0xC0) != 0x80 || (b(i + 2) & 0xC0) != 0x80) return false
        if (c == 0xE0 && b1 < 0xA0) return false // overlong
        if (c == 0xED && b1 >= 0xA0) return false // UTF-16 surrogates
        i += 3
      } else if (c < 0xF5) {
        if (i + 3 >= b.length) return false
        val b1 = b(i + 1) & 0xff
        if ((b1 & 0xC0) != 0x80 || (b(i + 2) & 0xC0) != 0x80 ||
          (b(i + 3) & 0xC0) != 0x80) return false
        if (c == 0xF0 && b1 < 0x90) return false // overlong
        if (c == 0xF4 && b1 >= 0x90) return false // > U+10FFFF
        i += 4
      } else return false
    }
    true
  }

  /** Decoders are stateful (not thread-safe, reusable after the reset the
    * convenience decode() performs) — one per (thread, charset), so the
    * hot path allocates no decoder per row. */
  private val decoders = new ThreadLocal[
      java.util.HashMap[java.nio.charset.Charset, java.nio.charset.CharsetDecoder]] {
    override def initialValue() = new java.util.HashMap()
  }

  /** Charsets PROVEN ASCII-transparent (bytes < 0x80 decode to
    * themselves): a WHITELIST, not a blacklist — the 7-bit STATEFUL
    * encodings (ISO-2022-JP/KR/CN, HZ) consist entirely of bytes < 0x80
    * yet do NOT decode to themselves (ESC sequences shift modes), and
    * EBCDIC is 8-bit-but-not-ASCII, so excluding families by name is a
    * corruption bug waiting for the next exotic alias. Encodings off
    * this list (Shift_JIS, EUC, GB*) are also ASCII-transparent but just
    * take the decoder path — correctness first, the fast path is an
    * optimization. */
  private def asciiCompatible(cs: java.nio.charset.Charset): Boolean = {
    val n = cs.name().toLowerCase(java.util.Locale.ROOT)
    n == "utf-8" || n == "us-ascii" || n.startsWith("iso-8859-") ||
      n.startsWith("windows-125") || n.startsWith("koi8")
  }

  def decode(bytes: Array[Byte], charset: UTF8String): UTF8String = {
    val declared = resolve(if (charset == null) null else charset.toString)
    if (!declared.isPresent) {
      // UNDECLARED or unknown charset: the WHATWG/browser fallback —
      // content that validates as UTF-8 IS UTF-8; anything else reads as
      // WHATWG windows-1252 (a total single-byte map, so legacy-encoded
      // pages degrade to readable mojibake instead of U+FFFD soup —
      // exactly what real crawl pipelines and browsers do)
      if (isValidUtf8(bytes)) return UTF8String.fromBytes(bytes)
      return decode1252(bytes)
    }
    val cs = declared.get()
    // fast path: pure-ASCII payload under an ASCII-compatible charset IS
    // its own UTF-8 — one validation scan, zero transcoding, no decoder.
    // (Covers robots/sitemaps/markup-heavy pages and most English text.)
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) { ascii = bytes(i) >= 0; i += 1 }
    // no defensive copy: expression inputs are already materialized
    // per-row arrays (Spark's own UTF-8 decode fast path wraps likewise)
    if (ascii && asciiCompatible(cs))
      return UTF8String.fromBytes(bytes)
    decodeWith(cs, bytes)
  }

  /** WHATWG windows-1252 (the fallback leg's map): Java's cp1252 decoder
    * REPLACEs the five unassigned bytes (0x81/0x8D/0x8F/0x90/0x9D) with
    * U+FFFD, but the WHATWG encoding standard — what browsers actually
    * do — maps them to their C1 controls. A 256-entry table decode is
    * also faster than a CharsetDecoder for a single-byte map. */
  private val Whatwg1252: Array[Char] = {
    val t = new Array[Char](256)
    val one = new Array[Byte](1)
    var i = 0
    while (i < 256) {
      one(0) = i.toByte
      t(i) = new String(one, Cp1252).charAt(0)
      i += 1
    }
    Seq(0x81, 0x8D, 0x8F, 0x90, 0x9D).foreach(b => t(b) = b.toChar)
    t
  }

  private def decode1252(bytes: Array[Byte]): UTF8String = {
    val chars = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { chars(i) = Whatwg1252(bytes(i) & 0xff); i += 1 }
    UTF8String.fromString(new String(chars))
  }

  /** The declared-charset path: per-(thread, charset) decoder reuse,
    * REPLACE on malformed/unmappable (a DECLARED encoding wins even over
    * invalid bytes — the author said so; only the undeclared path
    * content-sniffs). */
  private def decodeWith(cs: java.nio.charset.Charset,
                         bytes: Array[Byte]): UTF8String = {
    val perThread = decoders.get()
    var dec = perThread.get(cs)
    if (dec == null) {
      dec = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      perThread.put(cs, dec)
    }
    // the convenience decode() resets the decoder first and CANNOT throw
    // CharacterCodingException (both actions are REPLACE)
    UTF8String.fromString(
      dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString)
  }
}
