package graft.wbot

/**
 * A Go `net/url`-compatible URL model, reimplemented from scratch in Scala.
 *
 * The reference engine (twiny/wbot) derives URL identity from Go's
 * `net/url.URL` parse/serialize round-trips (`/root/reference/pkg/api/wbot.go:132-238`).
 * To match its crawl ordering and URL-seen set byte-for-byte we need the same
 * parse / escape / resolve / serialize semantics, so this object models the
 * relevant subset of Go's `net/url` (https://pkg.go.dev/net/url, public API
 * semantics) rather than using `java.net.URI` (which differs on escaping,
 * empty paths, and relative resolution edge cases).
 *
 * Supported subset: hierarchical and opaque URLs with scheme, userinfo, host,
 * path (decoded + raw), query, fragment. Not supported (not needed by the
 * fixture grammar): IPv6 zone identifiers, percent-escapes in hostnames.
 */
final case class GoUrl(
    scheme: String = "",
    opaque: String = "",
    user: String = "", // userinfo, raw; hasUser distinguishes "" from absent
    hasUser: Boolean = false,
    host: String = "", // host[:port], case preserved (Go does not normalize)
    path: String = "", // decoded path
    rawPath: String = "", // original escaped path iff it differs from `path`
    omitHost: Boolean = false,
    forceQuery: Boolean = false, // URL ended with '?' and empty query
    rawQuery: String = "", // raw, never decoded at parse time
    fragment: String = "", // decoded
    rawFragment: String = "" // original escaped fragment iff differs
) {

  /** Go `URL.EscapedPath()`: prefer rawPath when it is a valid encoding of path. */
  def escapedPath: String =
    if (rawPath.nonEmpty && GoUrl.validEncoded(rawPath, GoUrl.EncodePath) &&
      GoUrl.unescape(rawPath, GoUrl.EncodePath).toOption.contains(path)) rawPath
    else GoUrl.escape(path, GoUrl.EncodePath)

  /** Go `URL.EscapedFragment()`. */
  def escapedFragment: String =
    if (rawFragment.nonEmpty && GoUrl.validEncoded(rawFragment, GoUrl.EncodeFragment) &&
      GoUrl.unescape(rawFragment, GoUrl.EncodeFragment).toOption.contains(fragment)) rawFragment
    else GoUrl.escape(fragment, GoUrl.EncodeFragment)

  /** Go `URL.Hostname()`: host without port / IPv6 brackets. */
  def hostnameOnly: String = GoUrl.stripPort(host)

  /** Go `URL.String()` (net/url URL.String algorithm). */
  def str: String = {
    val buf = new StringBuilder
    if (scheme.nonEmpty) { buf.append(scheme); buf.append(':') }
    if (opaque.nonEmpty) buf.append(opaque)
    else {
      if (scheme.nonEmpty || host.nonEmpty || hasUser) {
        if (omitHost && host.isEmpty && !hasUser) { /* omit empty host */ }
        else {
          if (host.nonEmpty || path.nonEmpty || hasUser) buf.append("//")
          if (hasUser) { buf.append(user); buf.append('@') }
          if (host.nonEmpty) buf.append(host)
        }
      }
      val p = escapedPath
      if (p.nonEmpty && p.charAt(0) != '/' && host.nonEmpty) buf.append('/')
      if (buf.isEmpty) {
        val seg = p.takeWhile(_ != '/')
        if (seg.contains(':')) buf.append("./")
      }
      buf.append(p)
    }
    if (forceQuery || rawQuery.nonEmpty) { buf.append('?'); buf.append(rawQuery) }
    if (fragment.nonEmpty) { buf.append('#'); buf.append(escapedFragment) }
    buf.toString
  }
}

object GoUrl {
  // escape modes (mirror of net/url's encoding enum semantics)
  sealed trait Mode
  case object EncodePath extends Mode
  case object EncodeFragment extends Mode

  /** Go `shouldEscape(c, mode)` for the path/fragment modes we need. */
  private def shouldEscape(b: Byte, mode: Mode): Boolean = {
    val c = (b & 0xff).toChar
    if (('a' <= c && c <= 'z') || ('A' <= c && c <= 'Z') || ('0' <= c && c <= '9')) return false
    c match {
      case '-' | '_' | '.' | '~' => false
      case '$' | '&' | '+' | ',' | '/' | ':' | ';' | '=' | '?' | '@' =>
        mode match {
          case EncodePath     => c == '?'
          case EncodeFragment => false
        }
      case _ => true
    }
  }

  private val hexUpper = "0123456789ABCDEF"

  /** Go `escape(s, mode)`: percent-encode UTF-8 bytes per mode. */
  def escape(s: String, mode: Mode): String = {
    val bytes = s.getBytes("UTF-8")
    if (!bytes.exists(shouldEscape(_, mode))) return s
    val buf = new StringBuilder
    bytes.foreach { b =>
      if (shouldEscape(b, mode)) {
        buf.append('%'); buf.append(hexUpper((b >> 4) & 0xf)); buf.append(hexUpper(b & 0xf))
      } else buf.append((b & 0xff).toChar)
    }
    buf.toString
  }

  private def isHex(c: Char): Boolean =
    ('0' <= c && c <= '9') || ('a' <= c && c <= 'f') || ('A' <= c && c <= 'F')
  private def unhex(c: Char): Int =
    if (c <= '9') c - '0' else if (c <= 'F') c - 'A' + 10 else c - 'a' + 10

  /** Go `unescape(s, mode)`: decode %XX; Left on malformed escape. */
  def unescape(s: String, mode: Mode): Either[String, String] = {
    if (!s.contains('%')) return Right(s)
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    val bytes = s.getBytes("UTF-8")
    while (i < bytes.length) {
      val c = (bytes(i) & 0xff).toChar
      if (c == '%') {
        if (i + 2 >= bytes.length) return Left("invalid URL escape")
        val h1 = (bytes(i + 1) & 0xff).toChar; val h2 = (bytes(i + 2) & 0xff).toChar
        if (!isHex(h1) || !isHex(h2)) return Left("invalid URL escape")
        out.write((unhex(h1) << 4) | unhex(h2))
        i += 3
      } else { out.write(bytes(i)); i += 1 }
    }
    Right(new String(out.toByteArray, "UTF-8"))
  }

  /** Is s already a valid percent-encoding (every % followed by 2 hex digits)? */
  def validEncoded(s: String, mode: Mode): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%') {
        if (i + 2 >= s.length || !isHex(s.charAt(i + 1)) || !isHex(s.charAt(i + 2))) return false
        i += 3
      } else i += 1
    }
    true
  }

  /** Go `net/url.PathUnescape` (encodePathSegment mode: '+' is literal). */
  def pathUnescape(s: String): Either[String, String] = unescape(s, EncodePath)

  private def validScheme(s: String): Boolean =
    s.nonEmpty && s.charAt(0).isLetter &&
      s.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')

  /** Go `stripPort` (used by URL.Hostname). */
  def stripPort(hostport: String): String = {
    val colon = hostport.indexOf(':')
    if (colon == -1) return hostport
    val rb = hostport.indexOf(']')
    if (rb >= 0) { // [ipv6]:port
      if (hostport.startsWith("[")) hostport.substring(1, rb) else hostport.substring(0, colon)
    } else hostport.substring(0, colon)
  }

  private def containsCtl(s: String): Boolean = s.exists(c => c < 0x20 || c == 0x7f)

  /**
   * Go `url.Parse` for the subset we need (fragment split, scheme, authority,
   * path decode with strict escape validation, raw query, fragment decode).
   * Mirrors `/root/reference` usage: `pkg/api/wbot.go:133` (`url.Parse(raw)`).
   */
  def parse(raw: String): Either[String, GoUrl] = {
    if (containsCtl(raw)) return Left("net/url: invalid control character in URL")
    // Cut fragment first (Go url.Parse)
    val hashIdx = raw.indexOf('#')
    val (noFrag, fragRaw) =
      if (hashIdx >= 0) (raw.substring(0, hashIdx), raw.substring(hashIdx + 1)) else (raw, "")
    parseNoFragment(noFrag).flatMap { u =>
      if (hashIdx < 0) Right(u)
      else unescape(fragRaw, EncodeFragment).map { f =>
        u.copy(fragment = f, rawFragment = if (escape(f, EncodeFragment) == fragRaw) "" else fragRaw)
      }
    }
  }

  private def parseNoFragment(rawURL: String): Either[String, GoUrl] = {
    if (rawURL == "") return Right(GoUrl())
    if (rawURL == "*") return Right(GoUrl(path = "*"))
    // getScheme
    var scheme = ""
    var rest = rawURL
    var i = 0
    var done = false
    while (i < rawURL.length && !done) {
      val c = rawURL.charAt(i)
      if (c.isLetter) { i += 1 }
      else if ((c.isDigit || c == '+' || c == '-' || c == '.') && i > 0) { i += 1 }
      else if (c == ':') {
        if (i == 0) return Left("missing protocol scheme")
        scheme = rawURL.substring(0, i).toLowerCase
        rest = rawURL.substring(i + 1)
        done = true
      } else { done = true } // not a scheme; whole string is the rest
    }
    var u = GoUrl(scheme = scheme)
    // query split
    var forceQuery = false
    var rawQuery = ""
    val qIdx = rest.indexOf('?')
    if (qIdx >= 0) {
      rawQuery = rest.substring(qIdx + 1)
      if (rawQuery.isEmpty) forceQuery = true
      rest = rest.substring(0, qIdx)
    }
    u = u.copy(forceQuery = forceQuery, rawQuery = rawQuery)
    if (!rest.startsWith("/")) {
      if (scheme.nonEmpty) {
        // opaque (RFC 3986 §3) — e.g. "mailto:a@b"; empty rest = scheme-only
        return Right(u.copy(opaque = rest))
      }
      if (rest.isEmpty) return Right(u)
      // reject "this:that" ambiguous first segment? Go rejects colon in first
      // path segment only for viaRequest=false when no scheme: actually Go
      // returns an error "first path segment in URL cannot contain colon".
      val seg = rest.takeWhile(c => c != '/' && c != '?' && c != '#')
      if (seg.contains(':')) return Left("first path segment in URL cannot contain colon")
    }
    var hasUser = false; var user = ""; var host = ""; var omitHost = false
    if (rest.startsWith("//")) {
      var authority = rest.substring(2)
      rest = ""
      val slash = authority.indexOf('/')
      if (slash >= 0) { rest = authority.substring(slash); authority = authority.substring(0, slash) }
      val at = authority.lastIndexOf('@')
      if (at >= 0) { user = authority.substring(0, at); hasUser = true; authority = authority.substring(at + 1) }
      if (authority.exists(c => " <>\"{}|\\^`".indexOf(c) >= 0))
        return Left("invalid character in host name")
      host = authority
    } else if (scheme.nonEmpty && rest.startsWith("/")) {
      omitHost = true
    }
    // setPath: decode with strict validation
    unescape(rest, EncodePath).map { p =>
      u.copy(
        user = user, hasUser = hasUser, host = host, omitHost = omitHost,
        path = p, rawPath = if (escape(p, EncodePath) == rest) "" else rest)
    }
  }

  /** Go `resolvePath(base, ref)` — operates on ESCAPED paths. */
  def resolvePath(base: String, ref: String): String = {
    var full = ""
    if (ref.isEmpty) full = base
    else if (ref.charAt(0) != '/') {
      val i = base.lastIndexOf('/')
      full = base.substring(0, i + 1) + ref
    } else full = ref
    if (full.isEmpty) return ""
    val dst = new StringBuilder("/")
    var first = true
    var remaining = full
    var found = true
    var last = ""
    while (found) {
      val cut = remaining.indexOf('/')
      val elem = if (cut >= 0) remaining.substring(0, cut) else remaining
      found = cut >= 0
      remaining = if (cut >= 0) remaining.substring(cut + 1) else ""
      last = elem
      if (elem == ".") { first = false }
      else if (elem == "..") {
        val str = dst.toString.substring(1)
        val index = str.lastIndexOf('/')
        dst.clear(); dst.append('/')
        if (index == -1) first = true else dst.append(str.substring(0, index))
      } else {
        if (!first) dst.append('/')
        dst.append(elem)
        first = false
      }
    }
    if (last == "." || last == "..") dst.append('/')
    var r = dst.toString
    if (r.length > 1 && r.charAt(1) == '/') r = r.substring(1)
    r
  }

  /** Go `URL.ResolveReference(ref)`. */
  def resolve(base: GoUrl, ref: GoUrl): GoUrl = {
    var url = ref
    if (ref.scheme.isEmpty) url = url.copy(scheme = base.scheme)
    if (ref.scheme.nonEmpty || ref.host.nonEmpty || ref.hasUser) {
      // absoluteURI or net_path
      return setPath(url, resolvePath(ref.escapedPath, ""))
    }
    if (ref.opaque.nonEmpty) {
      return url.copy(user = "", hasUser = false, host = "", path = "", rawPath = "")
    }
    if (ref.path.isEmpty && !ref.forceQuery && ref.rawQuery.isEmpty) {
      url = url.copy(rawQuery = base.rawQuery)
      if (ref.fragment.isEmpty)
        url = url.copy(fragment = base.fragment, rawFragment = base.rawFragment)
    }
    url = url.copy(host = base.host, user = base.user, hasUser = base.hasUser)
    setPath(url, resolvePath(base.escapedPath, ref.escapedPath))
  }

  private def setPath(u: GoUrl, escaped: String): GoUrl =
    unescape(escaped, EncodePath) match {
      case Right(p) =>
        u.copy(path = p, rawPath = if (escape(p, EncodePath) == escaped) "" else escaped)
      case Left(_) => u.copy(path = escaped, rawPath = "") // cannot happen for our inputs
    }

  /** Go `base.Parse(ref)`: parse ref then resolve against base. */
  def parseRef(base: GoUrl, ref: String): Either[String, GoUrl] =
    parse(ref).map(r => resolve(base, r))
}
