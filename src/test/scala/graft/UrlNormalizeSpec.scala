package graft

import org.apache.spark.sql.graft.UrlNormalizer.normalize
import org.scalatest.funsuite.AnyFunSuite

/** [[org.apache.spark.sql.graft.UrlNormalizer]] — the hostile shapes
  * t28's planted arms can't reach. The t28 oracle pins the rule set
  * end-to-end over 120 arm combinations; this pins the parser edges
  * (no-scheme passthrough, userinfo, bracketed IPv6, `..` past
  * root, duplicate keys, '?'-only, '#' before '?', non-digit
  * ports). */
class UrlNormalizeSpec extends AnyFunSuite {

  test("scheme/host case, default ports, fragments") {
    assert(normalize("HTTP://Ex.COM/a") == "http://ex.com/a")
    assert(normalize("http://ex.com:80/a") == "http://ex.com/a")
    assert(normalize("HTTPS://Ex.COM:443/a") == "https://ex.com/a")
    // a default port only defaults for ITS scheme
    assert(normalize("https://ex.com:80/a") == "https://ex.com:80/a")
    assert(normalize("http://ex.com:8080/a") == "http://ex.com:8080/a")
    assert(normalize("http://ex.com/a#Sec1") == "http://ex.com/a")
    // '#' before '?': everything after '#' is fragment per RFC
    assert(normalize("http://ex.com/a#f?x=1") == "http://ex.com/a")
  }

  test("path: dot-segments, duplicate slashes, trailing slash, root") {
    assert(normalize("http://h/a/./b/") == "http://h/a/b")
    assert(normalize("http://h/a/b/../c") == "http://h/a/c")
    assert(normalize("http://h//x//y") == "http://h/x/y")
    // '..' past root is dropped, not an error (RFC 3986
    // remove_dot_segments)
    assert(normalize("http://h/../../x") == "http://h/x")
    assert(normalize("http://h/..") == "http://h")
    // root and empty path unify
    assert(normalize("http://H/") == "http://h")
    assert(normalize("http://H") == "http://h")
    assert(normalize("http://h/.") == "http://h")
  }

  test("query: tracking-param drop, full-text sort, empties") {
    assert(normalize("http://h/p?utm_source=f&z=1&a=2")
      == "http://h/p?a=2&z=1")
    // duplicate keys keep a deterministic total order
    assert(normalize("http://h/p?b=1&a=2&a=1")
      == "http://h/p?a=1&a=2&b=1")
    // all params dropped -> the '?' goes too; bare '?' likewise
    assert(normalize("http://h/p?utm_campaign=x&gclid=123")
      == "http://h/p")
    assert(normalize("http://h/p?") == "http://h/p")
    // bare utm_ key without '=', and gclid with an empty value
    assert(normalize("http://h/p?utm_flag&a=1") == "http://h/p?a=1")
    assert(normalize("http://h/p?gclid=&a=1") == "http://h/p?a=1")
    // fbclid is in the drop set; ordinary params named close to the
    // tracking set are NOT dropped
    assert(normalize("http://h/p?fbclid=x&utmost=1")
      == "http://h/p?utmost=1")
  }

  test("authority: userinfo kept verbatim, IPv6, non-digit port") {
    assert(normalize("https://User@Host.COM:443/x")
      == "https://User@host.com/x")
    // bracketed IPv6: the last ':' belongs to the port only when
    // what follows is all digits
    assert(normalize("http://[::1]:8080/a") == "http://[::1]:8080/a")
    assert(normalize("http://[::1]:80/a") == "http://[::1]/a")
    assert(normalize("http://[::1]/a") == "http://[::1]/a")
    // a non-numeric "port" is not a port — kept as written
    assert(normalize("http://h:8x80/p") == "http://h:8x80/p")
    // ASCII digits ONLY (round-12 advice): Unicode digit classes
    // (here Arabic-Indic ٨٠) must NOT parse as host+port — Char
    // .isDigit would have accepted them against the ASCII-only
    // scheme discipline
    assert(normalize("http://h:\u0668\u0660/p")
      == "http://h:\u0668\u0660/p")
  }

  test("non-absolute inputs pass through trimmed, never parsed") {
    assert(normalize("  example.com/a b ") == "example.com/a b")
    assert(normalize("mailto:x@y") == "mailto:x@y")
    assert(normalize("://nohost") == "://nohost")
    assert(normalize("") == "")
    // a NON-URL whose query contains "://" must not be parsed as an
    // absolute URL with a garbage scheme (RFC 3986 scheme chars)
    assert(normalize("example.com?u=http://x")
      == "example.com?u=http://x")
    assert(normalize("foo bar://x") == "foo bar://x")
    // valid non-alpha-leading-rejected vs valid plus/dash schemes
    assert(normalize("1http://h/a") == "1http://h/a")
    assert(normalize("git+ssh://Host.COM/Repo")
      == "git+ssh://host.com/Repo")
  }

  test("case-folding is Locale.ROOT — the dedup key must not depend " +
    "on the JVM's default locale (Turkish-I)") {
    val prev = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      // default-locale toLowerCase would fold 'I' to dotless 'ı'
      assert(normalize("HTTP://WIKI.Example.COM/Page")
        == "http://wiki.example.com/Page")
    } finally java.util.Locale.setDefault(prev)
  }

  test("idempotence over the t28 arm product and hostile shapes") {
    val shapes = for {
      scheme <- Seq("HTTP", "https")
      port <- Seq("", ":80", ":443", ":8080")
      path <- Seq("/a/./b/", "/a/b/../c", "//x//y", "/../deep", "", "/")
      query <- Seq("", "?utm_source=f&z=1&a=2", "?b=2&a=1", "?")
      frag <- Seq("", "#Sec1")
    } yield s"$scheme://WWW.Ex.COM$port$path$query$frag"
    shapes.foreach { u =>
      val once = normalize(u)
      assert(normalize(once) == once, s"not idempotent on $u -> $once")
    }
  }
}
