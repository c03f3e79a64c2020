package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Standalone object so scalac emits a `SimHashUtil` class with static
  * forwarders — callable from Janino-generated code as
  * `graft.functions.SimHashUtil.fnv1a64(s)`.
  */
object SimHashUtil {
  /** FNV-1a 64-bit over UTF-8 bytes — deterministic, engine-independent. */
  def fnv1a64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a64(s: String): Long = fnv1a64(UTF8String.fromString(s))

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
