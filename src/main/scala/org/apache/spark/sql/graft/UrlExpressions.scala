package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType,
  StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for crawl curation. Both C4 and CCNet-style
  * pipelines dedup and filter BY URL before any content pass, and a
  * raw crawl carries the same page under dozens of spellings —
  * scheme/host case, default ports, dot-segments, duplicate slashes,
  * tracking params, param order, fragments. The canonical form is
  * the dedup key; computing it is a pure per-row transform that must
  * stay inside whole-stage codegen at corpus scale, hence an
  * Expression with a static-helper `doGenCode` (the NfcNormalize
  * pattern), never a UDF.
  *
  * Declared rule set (clean-room, the published-practice subset —
  * RFC 3986 §6 normalizations plus the tracking-param strip every
  * crawl pipeline adds):
  *   1. scheme and host lowercase;
  *   2. default port stripped (http:80, https:443); others kept;
  *   3. path: duplicate slashes collapsed, `.` segments dropped,
  *      `..` pops (at root it is dropped — RFC 3986
  *      remove_dot_segments), trailing slash stripped so `/a/` and
  *      `/a` unify, root collapses to the EMPTY path (`http://h/`
  *      == `http://h`);
  *   4. query: `utm_*`-prefixed, `fbclid` and `gclid` params
  *      dropped; survivors sorted lexicographically by their full
  *      `k=v` text (a total order — duplicate keys stay
  *      deterministic); an emptied query drops its `?`;
  *   5. fragment dropped.
  * Inputs without a `://` are not absolute URLs and pass through
  * trimmed-only (never a guessed parse). Percent-escapes are kept
  * byte-for-byte (unescaping is a lossy transform some pipelines
  * deliberately avoid — declared out of scope).
  */
object UrlNormalizer {

  private def dropParam(kv: String): Boolean = {
    val k = kv.indexOf('=') match {
      case -1 => kv
      case i  => kv.substring(0, i)
    }
    k.startsWith("utm_") || k == "fbclid" || k == "gclid"
  }

  /** RFC 3986 scheme = ALPHA *(ALPHA / DIGIT / '+' / '-' / '.').
    * Without this check, a NON-URL whose query happens to contain
    * "://" (e.g. `example.com?u=http://x`) would be parsed as an
    * absolute URL with a garbage scheme and silently restructured —
    * scheme validation is what makes the passthrough rule safe. */
  private def validScheme(s: String): Boolean =
    s.nonEmpty && s.charAt(0).isLetter && s.forall(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.')

  /** Java-callable so doGenCode can emit a static call and stay in
    * the whole-stage pipeline. All case-folding is Locale.ROOT —
    * a default-locale toLowerCase would make the dedup key depend
    * on the JVM's locale (the Turkish-I trap), breaking
    * cross-cluster determinism. */
  def normalize(raw: String): String = {
    val url = raw.trim
    val sep = url.indexOf("://")
    if (sep <= 0 || !validScheme(url.substring(0, sep))) return url
    val scheme = url.substring(0, sep)
      .toLowerCase(java.util.Locale.ROOT)
    val rest = url.substring(sep + 3)
    // split off fragment first (it may contain '?' per RFC)
    val hashAt = rest.indexOf('#')
    val noFrag = if (hashAt >= 0) rest.substring(0, hashAt) else rest
    val qAt = noFrag.indexOf('?')
    val (authPath, query) =
      if (qAt >= 0) (noFrag.substring(0, qAt), noFrag.substring(qAt + 1))
      else (noFrag, null)
    val slashAt = authPath.indexOf('/')
    val (auth, path) =
      if (slashAt >= 0)
        (authPath.substring(0, slashAt), authPath.substring(slashAt))
      else (authPath, "")
    // authority: [userinfo@]host[:port] — lowercase host, strip
    // the scheme's default port
    val atSign = auth.lastIndexOf('@')
    val userinfo = if (atSign >= 0) auth.substring(0, atSign + 1) else ""
    val hostPort = if (atSign >= 0) auth.substring(atSign + 1) else auth
    val colonAt = hostPort.lastIndexOf(':')
    // ASCII digits only (Char.isDigit accepts Unicode digit classes
    // — an Arabic-Indic "port" must pass through unparsed, matching
    // the ASCII-only scheme discipline)
    val (host, port) =
      if (colonAt >= 0 &&
        hostPort.substring(colonAt + 1)
          .forall(c => c >= '0' && c <= '9'))
        (hostPort.substring(0, colonAt), hostPort.substring(colonAt + 1))
      else (hostPort, "")
    val keepPort = port.nonEmpty &&
      !(scheme == "http" && port == "80") &&
      !(scheme == "https" && port == "443")
    val normAuth = userinfo +
      host.toLowerCase(java.util.Locale.ROOT) +
      (if (keepPort) ":" + port else "")
    // path: collapse '//', resolve '.'/'..', strip trailing '/'
    val segs = new scala.collection.mutable.ArrayBuffer[String]()
    path.split("/").foreach {
      case "" | "." => () // duplicate slash or current-dir segment
      case ".."     => if (segs.nonEmpty) segs.remove(segs.length - 1)
      case s        => segs += s
    }
    val normPath =
      if (segs.isEmpty) "" else segs.mkString("/", "/", "")
    // query: drop tracking params and empties, sort by full k=v text
    val normQuery =
      if (query == null) ""
      else {
        val kept = query.split("&").toSeq
          .filter(kv => kv.nonEmpty && !dropParam(kv)).sorted
        if (kept.isEmpty) "" else "?" + kept.mkString("&")
      }
    scheme + "://" + normAuth + normPath + normQuery
  }
}

/** `url_normalize(url)` — see [[UrlNormalizer]]. */
case class UrlNormalize(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "url_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(UrlNormalizer.normalize(
      input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
    : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.spark.unsafe.types.UTF8String.fromString(
         |  org.apache.spark.sql.graft.UrlNormalizer.normalize(
         |    $c.toString()))""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression)
    : Expression = copy(child = newChild)
}
