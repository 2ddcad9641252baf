package graft

/** One digest→lowercase-hex helper. Three independent copies of this
  * had grown in Multimodal / RdfFormats / CmsSketch — keep the
  * encoding in one place so it cannot drift again. */
object Hex {
  /** Lowercase hex of `algo` over `bytes` (full digest length). */
  def digest(algo: String, bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance(algo).digest(bytes)
    val sb = new java.lang.StringBuilder(d.length * 2)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }
}
