package graft.wbot

import java.security.MessageDigest

/**
 * URL validation / canonicalization / identity — the scalar-function core of
 * the engine, semantically equivalent to the reference's
 * `NewURL` / `Hostname` / `hashLink` (`/root/reference/pkg/api/wbot.go:132-238`).
 *
 * Pure Scala (no Spark) so the same code backs the Spark UDFs, the sequential
 * Oracle simulator, and the fixture generator — one implementation of URL
 * identity everywhere.
 */
object UrlFuncs {

  /** 451-entry TLD whitelist (semantics of `/root/reference/pkg/api/tlds.json`,
    * loaded at init like `wbot.go:21-35`); vendored as a line-per-TLD resource. */
  lazy val tlds: Set[String] = {
    val in = getClass.getResourceAsStream("/graft/tlds.txt")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().map(_.trim).filter(_.nonEmpty).toSet
    finally in.close()
  }

  /**
   * Minimal public-suffix rules: known multi-part suffixes, else the last
   * label is the suffix (the PSL wildcard default). Sufficient for the
   * fixture grammar and the reference's own test table
   * (`/root/reference/pkg/api/test_wbot.go:5-39`); the TLD whitelist gates
   * the final label anyway.
   */
  private val multiPartSuffixes: Set[String] = Set(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "co.in", "com.br", "com.cn", "co.nz", "com.mx", "co.za",
    "com.sg", "com.tr", "com.ar", "co.kr", "com.hk", "com.tw", "com.my")

  /**
   * Registrable domain (Go `publicsuffix.Domain(hostname)` semantics as used
   * at `wbot.go:143-146`): lowercase-normalized; error when the hostname is
   * empty, dotless, or is itself a public suffix.
   */
  def registrableDomain(hostname: String): Either[String, String] = {
    if (hostname.isEmpty) return Left("empty hostname")
    var norm = {
      // allocation-light lowercase (hot path: hosts are usually lowercase)
      var needsLower = false
      var i = 0
      while (i < hostname.length && !needsLower) {
        val c = hostname.charAt(i)
        if (c >= 'A' && c <= 'Z') needsLower = true
        i += 1
      }
      if (needsLower) hostname.toLowerCase else hostname
    }
    if (norm.endsWith(".")) norm = norm.substring(0, norm.length - 1)
    if (norm.isEmpty) return Left("empty hostname")
    if (norm.charAt(0) == '.' || norm.contains("..")) return Left("invalid hostname")
    val lastDot = norm.lastIndexOf('.')
    if (lastDot < 0) return Left(s"$norm is a suffix") // bare label = public suffix
    val prevDot = norm.lastIndexOf('.', lastDot - 1)
    val lastTwo = norm.substring(prevDot + 1)
    if (prevDot >= 0 && multiPartSuffixes.contains(lastTwo)) {
      // multi-part suffix: need one more label in front
      val prev2 = norm.lastIndexOf('.', prevDot - 1)
      if (prevDot == 0) Left(s"$norm is a suffix")
      else Right(norm.substring(prev2 + 1))
    } else {
      Right(lastTwo) // suffix = last label; domain = last two labels
    }
  }

  private val hexChars = "0123456789abcdef".toCharArray
  private val mdLocal: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("SHA-256"))

  def sha256hex(s: String): String = {
    val md = mdLocal.get()
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(2 * i) = hexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /**
   * Canonical string of a parsed URL — `hashLink`'s pre-hash transform,
   * step-for-step (`/root/reference/pkg/api/wbot.go:219-238`):
   *  1. drop scheme; 2. strip leading "www." from host[:port];
   *  3. percent-decode the (already once-decoded) path — a malformed escape
   *     surviving the first decode is an error, exactly like Go's
   *     `url.PathUnescape`; 4. Go-serialize (path is re-escaped with Go's
   *     path rules since RawPath no longer matches); 5. trim ALL trailing
   *     '/' from the serialized string; 6. trim one leading "//".
   */
  def canonical(u: GoUrl): Either[String, String] = {
    val host2 = if (u.host.startsWith("www.")) u.host.substring(4) else u.host
    GoUrl.pathUnescape(u.path).map { decoded =>
      val u2 = u.copy(scheme = "", host = host2, path = decoded)
      val s = u2.str
      var end = s.length
      while (end > 0 && s.charAt(end - 1) == '/') end -= 1
      val trimmed = s.substring(0, end)
      if (trimmed.startsWith("//")) trimmed.substring(2) else trimmed
    }
  }

  /** Parsed + validated URL: the reference's `ParsedURL` (`wbot.go:84-88`). */
  final case class Parsed(url: GoUrl, urlStr: String, canon: String, hash: String, root: String) {
    def host: String = url.host
  }

  /**
   * `NewURL(raw)` (`/root/reference/pkg/api/wbot.go:132-164`): parse; scheme
   * must be http/https; registrable domain must resolve; final TLD label must
   * be whitelisted; canonical hash must compute.
   */
  def newUrl(raw: String): Either[String, Parsed] =
    for {
      u <- GoUrl.parse(raw)
      _ <- if (u.scheme == "http" || u.scheme == "https") Right(())
           else Left(s"invalid scheme: ${u.scheme}")
      domain <- registrableDomain(u.hostnameOnly).left.map(e => s"failed to extract domain: $e")
      tld = domain.substring(domain.lastIndexOf('.') + 1)
      _ <- if (tlds.contains(tld)) Right(()) else Left(s"invalid TLD: $tld")
      canon <- canonical(u).left.map(e => s"invalid hash: $e")
    } yield Parsed(u, u.str, canon, sha256hex(canon), domain)

  /** `Hostname(link)` (`wbot.go:198-217`): registrable domain of any parseable link. */
  def hostnameRoot(link: String): Either[String, String] =
    for {
      u <- GoUrl.parse(link)
      domain <- registrableDomain(u.hostnameOnly)
      tld = domain.substring(domain.lastIndexOf('.') + 1)
      _ <- if (tlds.contains(tld)) Right(()) else Left(s"invalid TLD: $tld")
    } yield domain

  /**
   * `Request.ResolveURL(href)` (`wbot.go:110-123`): reject pure fragments,
   * resolve against the fetched page's URL, clear the fragment.
   */
  def resolveUrl(base: GoUrl, href: String): Either[String, GoUrl] = {
    if (href.startsWith("#")) Left("url is a fragment")
    else GoUrl.parseRef(base, href).map(_.copy(fragment = "", rawFragment = ""))
  }

  /**
   * Full candidate pipeline of the fetcher (`http_client.go:125-136`):
   * resolve href against parent, serialize, re-parse+validate via newUrl.
   * None = silently dropped (never reaches `Response.NextURLs`).
   *
   * The reference literally re-parses the serialized absolute URL
   * (`NewURL(absURL.String())`). For the URLs our resolver can produce —
   * absolute http(s) with a host — `parse(str(u)) == u` (round-trip
   * identity, property-tested in CandidateFastPathSpec), so the hot path
   * validates the resolved URL directly and skips the second parse. The
   * two-step version is kept as [[candidateViaReparse]] (the executable
   * reference semantics the property test checks against).
   */
  def candidate(base: GoUrl, href: String): Option[Parsed] =
    resolveUrl(base, href) match {
      case Left(_) => None
      case Right(abs) => validateResolved(abs)
    }

  /** The literal two-step reference pipeline (resolve → String → NewURL). */
  def candidateViaReparse(base: GoUrl, href: String): Option[Parsed] =
    (for {
      abs <- resolveUrl(base, href)
      parsed <- newUrl(abs.str)
    } yield parsed).toOption

  private def validateResolved(u: GoUrl): Option[Parsed] = {
    if (u.scheme != "http" && u.scheme != "https") return None
    registrableDomain(u.hostnameOnly) match {
      case Left(_) => None
      case Right(domain) =>
        val tld = domain.substring(domain.lastIndexOf('.') + 1)
        if (!tlds.contains(tld)) None
        else canonical(u) match {
          case Left(_) => None
          case Right(canon) => Some(Parsed(u, u.str, canon, sha256hex(canon), domain))
        }
    }
  }
}
