package graft.security

/** Secret masking for log/error text (ref: src/marketpipe/security/mask.py
  * safe_for_log): every occurrence of each secret is replaced by
  * `********` + its last 4 chars (fully masked when shorter than 8).
  */
object Mask {
  def safeForLog(msg: String, secrets: String*): String =
    secrets.filter(s => s != null && s.nonEmpty).foldLeft(msg) { (m, s) =>
      val masked = if (s.length >= 8) "********" + s.takeRight(4) else "********"
      m.replace(s, masked)
    }
}
