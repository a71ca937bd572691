package graft.util

import java.nio.ByteBuffer
import java.security.MessageDigest
import java.util.UUID

/** UUID byte-level utilities — the engine's form of the reference's
  * UuidUtils (util/UuidUtils.scala:6-46): the RFC 4122 name-space constants,
  * uuid ↔ 16-byte round-trips (what Id64 consumes), plus a version-5
  * (SHA-1 name-based, RFC 4122 §4.3) generator — the standard deterministic
  * id for "same name ⇒ same uuid" keying of external entities.
  */
object UuidUtils {

  /** RFC 4122 Appendix C name-space IDs. */
  val NameSpaceDns: UUID = new UUID(0x6ba7b8109dad11d1L, 0x80b400c04fd430c8L)
  val NameSpaceUrl: UUID = new UUID(0x6ba7b8119dad11d1L, 0x80b400c04fd430c8L)
  val NameSpaceOid: UUID = new UUID(0x6ba7b8129dad11d1L, 0x80b400c04fd430c8L)
  val NameSpaceX500: UUID = new UUID(0x6ba7b8149dad11d1L, 0x80b400c04fd430c8L)

  /** Big-endian 16-byte form (MSB first — the RFC wire order). */
  def bytes(uuid: UUID): Array[Byte] = {
    val buffer = ByteBuffer.allocate(16)
    buffer.putLong(uuid.getMostSignificantBits)
    buffer.putLong(uuid.getLeastSignificantBits)
    buffer.array()
  }

  def fromBytes(b: Array[Byte]): UUID = {
    require(b.length == 16, s"uuid needs 16 bytes, got ${b.length}")
    val buffer = ByteBuffer.wrap(b)
    new UUID(buffer.getLong, buffer.getLong)
  }

  /** RFC 4122 version-5 UUID: SHA-1 over namespace bytes ++ UTF-8 name,
    * truncated to 128 bits with version/variant bits forced. */
  def v5(namespace: UUID, name: String): UUID = {
    val md = MessageDigest.getInstance("SHA-1")
    md.update(bytes(namespace))
    md.update(name.getBytes("UTF-8"))
    val h = md.digest()
    h(6) = ((h(6) & 0x0f) | 0x50).toByte // version 5
    h(8) = ((h(8) & 0x3f) | 0x80).toByte // RFC 4122 variant
    fromBytes(java.util.Arrays.copyOf(h, 16))
  }
}
