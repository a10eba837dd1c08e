package graft

/** Tiny hashing helpers shared by path-keyed staging/catalog naming. */
object Digest {

  /** Lowercase hex md5 of a UTF-8 string, optionally truncated to the
    * first `bytes` digest bytes.
    */
  def md5Hex(s: String, bytes: Int = 16): String =
    java.security.MessageDigest
      .getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .take(bytes)
      .map("%02x".format(_))
      .mkString
}
