package graft.wbot

import scala.collection.mutable.ArrayBuffer

/**
 * Deterministic HTML scanning — the engine's equivalent of the reference's
 * goquery-based `FindLinks` (`/root/reference/pkg/api/wbot.go:165-197`).
 *
 * The reference runs CSS selectors over an html5-parsed tree and collects
 * attribute values in exactly this selector-group order, each group in
 * document order: `a[href]`, `link[href]`, `img[src]`, `script[src]`,
 * `iframe[src]`. We reproduce that with a single-pass tag scanner; on the
 * well-formed fixture grammar (FIXTURES.md §A.4) scanner output ≡ html5
 * parser output. Raw text inside <script>/<style> is skipped like an html5
 * parser would (RAWTEXT elements).
 */
object Html {

  final case class Tag(name: String, attrs: List[(String, String)], pos: Int) {
    def attr(key: String): Option[String] = attrs.find(_._1 == key).map(_._2)
  }

  private val rawTextTags = Set("script", "style")

  /** Decode the basic character references (named + numeric) an html5 parser
    * would decode inside attribute values and text. */
  def decodeEntities(s: String): String = {
    if (!s.contains('&')) return s
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        if (semi > i && semi - i <= 10) {
          val ent = s.substring(i + 1, semi)
          val dec: Option[String] = ent match {
            case "amp"  => Some("&")
            case "lt"   => Some("<")
            case "gt"   => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case _ if ent.startsWith("#x") || ent.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(ent.substring(2), 16))))
              catch { case _: Exception => None }
            case _ if ent.startsWith("#") =>
              try Some(new String(Character.toChars(Integer.parseInt(ent.substring(1)))))
              catch { case _: Exception => None }
            case _ => None
          }
          dec match {
            case Some(d) => out.append(d); i = semi + 1
            case None    => out.append(c); i += 1
          }
        } else { out.append(c); i += 1 }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Single-pass scan producing (tags in document order, text outside raw-text
    * elements). Comments (<!-- -->), doctype and processing instructions are
    * skipped. */
  def scan(html: String): (Vector[Tag], String) = {
    val tags = new ArrayBuffer[Tag]
    val text = new StringBuilder
    var i = 0
    val n = html.length
    var pos = 0
    var skipUntil: String = null // closing tag name when inside RAWTEXT
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (skipUntil != null) {
          // only a matching close tag ends RAWTEXT
          if (i + 1 < n && html.charAt(i + 1) == '/' &&
            html.regionMatches(true, i + 2, skipUntil, 0, skipUntil.length)) {
            i = html.indexOf('>', i) match { case -1 => n; case j => j + 1 }
            skipUntil = null
          } else i += 1
        } else if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end == -1) n else end + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          i = html.indexOf('>', i) match { case -1 => n; case j => j + 1 }
        } else if (i + 1 < n && html.charAt(i + 1) == '/') {
          i = html.indexOf('>', i) match { case -1 => n; case j => j + 1 }
        } else if (i + 1 < n && html.charAt(i + 1).isLetter) {
          // open tag
          var j = i + 1
          while (j < n && (html.charAt(j).isLetterOrDigit || html.charAt(j) == '-')) j += 1
          val name = html.substring(i + 1, j).toLowerCase
          // attributes until '>'
          val attrs = new ArrayBuffer[(String, String)]
          var k = j
          var closed = false
          while (k < n && !closed) {
            while (k < n && html.charAt(k).isWhitespace) k += 1
            if (k < n && (html.charAt(k) == '>' )) { closed = true; k += 1 }
            else if (k < n && html.charAt(k) == '/' ) { k += 1 }
            else if (k < n) {
              var a = k
              while (a < n && !html.charAt(a).isWhitespace && html.charAt(a) != '=' &&
                html.charAt(a) != '>' && html.charAt(a) != '/') a += 1
              val aname = html.substring(k, a).toLowerCase
              k = a
              while (k < n && html.charAt(k).isWhitespace) k += 1
              var avalue = ""
              if (k < n && html.charAt(k) == '=') {
                k += 1
                while (k < n && html.charAt(k).isWhitespace) k += 1
                if (k < n && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
                  val q = html.charAt(k)
                  val e = html.indexOf(q, k + 1)
                  avalue = if (e == -1) html.substring(k + 1) else html.substring(k + 1, e)
                  k = if (e == -1) n else e + 1
                } else {
                  var e = k
                  while (e < n && !html.charAt(e).isWhitespace && html.charAt(e) != '>') e += 1
                  avalue = html.substring(k, e)
                  k = e
                }
              }
              if (aname.nonEmpty) attrs += ((aname, decodeEntities(avalue)))
            }
          }
          i = k
          if (closed) { // unterminated tag at EOF → discarded (html5 eof-in-tag)
            tags += Tag(name, attrs.toList, pos)
            pos += 1
            if (rawTextTags.contains(name)) skipUntil = name
          }
        } else { if (skipUntil == null) text.append(c); i += 1 }
      } else {
        if (skipUntil == null) text.append(c)
        i += 1
      }
    }
    (tags.toVector, text.toString)
  }

  /**
   * `FindLinks(body)` equivalent (`wbot.go:165-197`): attr values in selector
   * -group order (a[href], link[href], img[src], script[src], iframe[src]),
   * each group in document order. Input is the fetched body AFTER the
   * MaxBodySize truncation (`http_client.go:117-119`).
   */
  def findLinks(html: String): Vector[String] = {
    val (tags, _) = scan(html)
    val groups = Vector(("a", "href"), ("link", "href"), ("img", "src"),
      ("script", "src"), ("iframe", "src"))
    groups.flatMap { case (tag, attr) =>
      tags.filter(_.name == tag).flatMap(_.attr(attr))
    }
  }

  def findLinksBytes(body: Array[Byte], maxBodySize: Long): Vector[String] = {
    val truncated =
      if (body.length > maxBodySize) java.util.Arrays.copyOfRange(body, 0, maxBodySize.toInt)
      else body
    findLinks(new String(truncated, "UTF-8"))
  }

  /**
   * Deterministic text extraction — the per-row invariant of the input
   * contract: `extractText(html) == text` byte-identically for every fixture
   * page. Rule: concatenate text nodes outside <script>/<style>, decode
   * entities, collapse whitespace runs to a single space, trim.
   */
  def extractText(html: String): String = {
    val (_, raw) = scan(html)
    val decoded = decodeEntities(raw)
    val collapsed = new StringBuilder
    var lastWs = true
    decoded.foreach { c =>
      if (c.isWhitespace) { if (!lastWs) collapsed.append(' '); lastWs = true }
      else { collapsed.append(c); lastWs = false }
    }
    val s = collapsed.toString
    if (s.endsWith(" ")) s.dropRight(1) else s
  }

  def extractTextBytes(body: Array[Byte]): String = extractText(new String(body, "UTF-8"))
}
