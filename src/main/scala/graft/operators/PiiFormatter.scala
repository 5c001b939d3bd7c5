package graft.operators

import java.util.regex.Pattern

/** PII scrub ported from formatters/pii.py:9-94.
  *
  * Replacement rotation is stateful across documents within one replacer
  * instance (pii.py:20,28-30 — `_replace_i` persists). In Spark we
  * instantiate one PiiScrubber per partition inside mapPartitions, which
  * reproduces the reference's per-task rotation when partitioning mirrors
  * the reference's rank→file mapping (SURVEY.md §7.3).
  */
object PiiFormatter {
  // formatters/pii.py:77-79 — email pattern (RFC-ish, incl. [ip] domains)
  val EmailRegex: Pattern = Pattern.compile(
    "\\b[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+(?:\\.[A-Za-z0-9!#$%&'*+/=?^_`{|}~-]+)*@" +
    "(?:(?:[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?\\.)+[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?" +
    "|\\[(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}" +
    "(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?|[A-Za-z0-9-]*[A-Za-z0-9]:)])")

  // formatters/pii.py:84 — dotted-quad IPv4
  val IpRegex: Pattern = Pattern.compile(
    "(?:(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)\\.){3}(?:25[0-5]|2[0-4][0-9]|[01]?[0-9][0-9]?)")

  val DefaultEmailReplacements: IndexedSeq[String] =
    IndexedSeq("email@example.com", "firstname.lastname@example.org")

  // pii.py:63-70 — fixed fake-IP rotation list
  val DefaultIpReplacements: IndexedSeq[String] = IndexedSeq(
    "22.214.171.124", "126.96.36.199", "188.8.131.52",
    "184.108.40.206", "220.127.116.11", "18.104.22.168")

  /** CPython ipaddress.ip_address parse: dotted quad, octets 0-255, leading
    * zeros rejected (ValueError). Returns None on parse failure. */
  def parseIp(ip: String): Option[Long] = {
    val parts = ip.split("\\.", -1)
    if (parts.length != 4) return None
    var addr = 0L
    for (p <- parts) {
      if (p.isEmpty || (p.length > 1 && p.charAt(0) == '0')) return None
      val v = try p.toInt catch { case _: NumberFormatException => return None }
      if (v < 0 || v > 255) return None
      addr = (addr << 8) | v
    }
    Some(addr)
  }

  /** CPython ipaddress: IPv4Address.is_global = not in 100.64.0.0/10 and not
    * is_private; is_private per the IANA special-purpose registry table. */
  def isGlobal(addr: Long): Boolean = {
    def in(net: Long, bits: Int): Boolean = (addr >>> (32 - bits)) == (net >>> (32 - bits))
    def ip4(a: Int, b: Int, c: Int, d: Int): Long =
      (a.toLong << 24) | (b.toLong << 16) | (c.toLong << 8) | d.toLong
    val isPrivate =
      in(ip4(0, 0, 0, 0), 8) || in(ip4(10, 0, 0, 0), 8) || in(ip4(127, 0, 0, 0), 8) ||
      in(ip4(169, 254, 0, 0), 16) || in(ip4(172, 16, 0, 0), 12) ||
      in(ip4(192, 0, 0, 0), 29) || in(ip4(192, 0, 0, 170), 31) ||
      in(ip4(192, 0, 2, 0), 24) || in(ip4(192, 168, 0, 0), 16) ||
      in(ip4(198, 18, 0, 0), 15) || in(ip4(198, 51, 100, 0), 24) ||
      in(ip4(203, 0, 113, 0), 24) || in(ip4(240, 0, 0, 0), 4) ||
      addr == ip4(255, 255, 255, 255)
    val isSharedCgn = in(ip4(100, 64, 0, 0), 10)
    !isPrivate && !isSharedCgn
  }

  /** public_ip_validator (pii.py:34-39): parse failure → false; otherwise
    * is_global when publicOnly, else any parseable IP. */
  def validIp(ip: String, publicOnly: Boolean): Boolean =
    parseIp(ip).exists(addr => !publicOnly || isGlobal(addr))
}

/** Stateful scrubber — one instance per partition (or per doc for
  * order-independent scrubbing; `resetPerDoc` controls this). */
final class PiiScrubber(
    removeEmails: Boolean = true,
    removeIps: Boolean = true,
    onlyRemovePublicIps: Boolean = true,
    emailReplacements: IndexedSeq[String] = PiiFormatter.DefaultEmailReplacements,
    ipReplacements: IndexedSeq[String] = PiiFormatter.DefaultIpReplacements,
    resetPerDoc: Boolean = false)
    extends Serializable {

  private var emailI = 0
  private var ipI = 0

  def scrub(text0: String): String = {
    if (resetPerDoc) { emailI = 0; ipI = 0 }
    var text = text0
    // cheap exact prechecks: the email pattern requires a literal '@', the
    // IP pattern an ASCII digit — most clean docs skip both regex scans
    val hasAt = text0.indexOf('@') >= 0
    var hasDigit = false
    var ci = 0
    while (!hasDigit && ci < text0.length) {
      val c = text0.charAt(ci)
      if (c >= '0' && c <= '9') hasDigit = true
      ci += 1
    }
    if (removeEmails && hasAt) {
      val m = PiiFormatter.EmailRegex.matcher(text)
      val sb = new java.lang.StringBuilder()
      while (m.find()) {
        val r = emailReplacements(emailI)
        emailI = (emailI + 1) % emailReplacements.length
        m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(r))
      }
      m.appendTail(sb)
      text = sb.toString
    }
    if (removeIps && hasDigit) {
      val m = PiiFormatter.IpRegex.matcher(text)
      val sb = new java.lang.StringBuilder()
      while (m.find()) {
        val valid = PiiFormatter.validIp(m.group(0), onlyRemovePublicIps)
        val r =
          if (!valid) m.group(0) // invalid/non-public: replaced with itself, no rotation
          else {
            val rep = ipReplacements(ipI)
            ipI = (ipI + 1) % ipReplacements.length
            rep
          }
        m.appendReplacement(sb, java.util.regex.Matcher.quoteReplacement(r))
      }
      m.appendTail(sb)
      text = sb.toString
    }
    text
  }
}
