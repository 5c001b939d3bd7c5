package graft.text

/** Shared classpath-resource reader (the repeated getResourceAsStream +
  * readAllBytes + UTF-8 pattern used by the BPE/ARPA/WARC/zh fixtures). */
object Resources {
  def readUtf8(name: String): String = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"resource $name missing from classpath")
    val bytes = try in.readAllBytes() finally in.close()
    new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
  }

  def readBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    require(in != null, s"resource $name missing from classpath")
    try in.readAllBytes() finally in.close()
  }
}
