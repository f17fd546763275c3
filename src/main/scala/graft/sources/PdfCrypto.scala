package graft.sources

import java.security.MessageDigest

/**
 * Standard security handler for the PDF route (round 6) — decrypts the
 * dominant class of "encrypted" PDFs in a crawl: documents whose USER
 * password is empty (owner-password-only permission restrictions), per the
 * public ISO 32000 §7.6 algorithms. ZERO external libraries: MD5/SHA-2 via
 * `java.security.MessageDigest`, AES-CBC via `javax.crypto`, RC4
 * implemented inline (15 lines of public pseudocode; avoids provider
 * availability questions).
 *
 * Supported: /Filter /Standard with
 *  - R2 (V1, RC4-40), R3 (V2, RC4 40-128), R4 (V4, crypt filters /V2 = RC4
 *    or /AESV2 = AES-128-CBC, /Identity passthrough),
 *  - R6 (V5, /AESV3 = AES-256-CBC, the PDF 2.0 scheme) via Algorithm 2.B
 *    iterated hashing.
 * Authentication tries the empty USER password first, then the empty OWNER
 * password (Algorithm 7 recovers the user key). A document whose passwords
 * are both non-empty stays `encrypted` — reporting, not guessing.
 */
object PdfCrypto {

  /** The 32-byte standard padding string (ISO 32000-1 Table 20 context). */
  val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  /** RC4 (public pseudocode; symmetric). */
  def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (key.isEmpty) return data
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + (s(i) & 0xff) + (key(i % key.length) & 0xff)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0; var y = 0
    var k = 0
    while (k < data.length) {
      x = (x + 1) & 0xff
      y = (y + (s(x) & 0xff)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(k) = (data(k) ^ s((s(x) & 0xff) + (s(y) & 0xff) & 0xff)).toByte
      k += 1
    }
    out
  }

  private def aesCbc(encrypt: Boolean, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte], padding: String): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance(s"AES/CBC/$padding")
    c.init(
      if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** Decrypt IV-prefixed AES-CBC content (strings/streams). Damaged
    * padding degrades to a NoPadding decrypt (salvage) rather than a throw. */
  private def aesDecryptIvPrefixed(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.length < 16) return Array.emptyByteArray
    val iv = java.util.Arrays.copyOfRange(data, 0, 16)
    val body = java.util.Arrays.copyOfRange(data, 16, data.length - (data.length % 16))
    if (body.isEmpty) return Array.emptyByteArray
    try aesCbc(encrypt = false, key, iv, body, "PKCS5Padding")
    catch {
      case _: Exception =>
        try aesCbc(encrypt = false, key, iv, body, "NoPadding")
        catch { case _: Exception => Array.emptyByteArray }
    }
  }

  private def pad(pwd: Array[Byte]): Array[Byte] =
    (pwd.take(32) ++ Pad).take(32)

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Encryption parameters lifted from the /Encrypt dict by the caller. */
  final case class Params(
      v: Int, r: Int, lengthBits: Int, p: Int,
      o: Array[Byte], u: Array[Byte],
      oe: Array[Byte], ue: Array[Byte],          // V5 only (may be empty)
      cfm: String,                               // V4 crypt-filter method: V2 | AESV2 | Identity (ignored otherwise)
      encryptMetadata: Boolean,
      id0: Array[Byte])

  sealed trait Method
  case object MethodRc4 extends Method
  case object MethodAes extends Method       // AESV2 — per-object key
  case object MethodAes256 extends Method    // AESV3 — file key directly
  case object MethodIdentity extends Method

  /** A ready-to-use decryptor: per-object-key RC4/AES for V≤4, direct file
    * key for V5. */
  final class Decryptor(fileKey: Array[Byte], method: Method) {
    def decrypt(data: Array[Byte], num: Int, gen: Int): Array[Byte] = method match {
      case MethodIdentity => data
      case MethodAes256 => aesDecryptIvPrefixed(fileKey, data)
      case MethodRc4 | MethodAes =>
        // Algorithm 1: per-object key = MD5(fileKey + num_le24 + gen_le16
        // [+ sAlT for AES]), truncated to min(keyLen+5, 16)
        val ext = Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte, ((num >> 16) & 0xff).toByte,
          (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte)
        val salted =
          if (method == MethodAes) md5(fileKey, ext, Array(0x73, 0x41, 0x6c, 0x54).map(_.toByte))
          else md5(fileKey, ext)
        val objKey = salted.take(math.min(fileKey.length + 5, 16))
        if (method == MethodAes) aesDecryptIvPrefixed(objKey, data)
        else rc4(objKey, data)
    }
  }

  /** Algorithm 2 (R2–R4): file key from a PADDED user password. */
  private def fileKeyR234(paddedPwd: Array[Byte], p: Params): Array[Byte] = {
    val n = math.max(5, math.min(16, p.lengthBits / 8))
    val metaExt =
      if (p.r >= 4 && !p.encryptMetadata) Array(0xff, 0xff, 0xff, 0xff).map(_.toByte)
      else Array.emptyByteArray
    var key = md5(paddedPwd, p.o.take(32), le32(p.p), p.id0, metaExt)
    if (p.r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key.take(n)); i += 1 }
    }
    key.take(n)
  }

  /** Algorithms 4/5: does `fileKey` authenticate against /U? */
  private def userKeyMatches(key: Array[Byte], p: Params): Boolean = {
    if (p.u.length < 16) return false
    if (p.r == 2) {
      java.util.Arrays.equals(rc4(key, Pad), p.u.take(32))
    } else {
      var e = rc4(key, md5(Pad, p.id0))
      var i = 1
      while (i <= 19) {
        e = rc4(key.map(b => (b ^ i).toByte), e)
        i += 1
      }
      java.util.Arrays.equals(e.take(16), p.u.take(16))
    }
  }

  /** Algorithm 7 precursor: the RC4 key derived from the OWNER password
    * (Algorithm 3 steps a–d). */
  private def ownerRc4Key(ownerPwd: Array[Byte], p: Params): Array[Byte] = {
    val n = math.max(5, math.min(16, p.lengthBits / 8))
    var key = md5(pad(ownerPwd))
    if (p.r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key.take(n)); i += 1 }
    }
    key.take(n)
  }

  /** Algorithm 2.B (R6): the iterated SHA-2 / AES password hash. */
  private def hash2B(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    var k = sha("SHA-256", pwd, salt, udata)
    var round = 0
    var done = false
    var out = k
    while (!done) {
      val block = pwd ++ k ++ udata
      val k1 = new Array[Byte](block.length * 64)
      var i = 0
      while (i < 64) { System.arraycopy(block, 0, k1, i * block.length, block.length); i += 1 }
      val e = aesCbc(encrypt = true, k.take(16), k.slice(16, 32), k1, "NoPadding")
      val mod = e.take(16).map(_ & 0xff).sum % 3
      k = mod match {
        case 0 => sha("SHA-256", e)
        case 1 => sha("SHA-384", e)
        case _ => sha("SHA-512", e)
      }
      round += 1
      if (round >= 64 && (e(e.length - 1) & 0xff) <= round - 32) { done = true; out = k }
      if (round > 512) { done = true; out = k } // spec-impossible backstop
    }
    out.take(32)
  }

  /** Build a decryptor by authenticating the EMPTY user password, falling
    * back to the empty owner password. None → genuinely password-protected
    * (or an unsupported scheme) — the caller reports `encrypted`. */
  def build(p: Params): Option[Decryptor] = {
    try {
      val empty = Array.emptyByteArray
      if (p.v == 5 && (p.r == 5 || p.r == 6)) {
        // R5 (pre-ISO Adobe 9 AESV3) uses a single SHA-256 where R6 runs
        // the Algorithm-2.B iteration; everything else is identical
        def pwdHash(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] =
          if (p.r == 5) sha("SHA-256", pwd, salt, udata) else hash2B(pwd, salt, udata)
        if (p.u.length < 48) return None
        val uHash = p.u.take(32)
        val valSalt = p.u.slice(32, 40)
        val keySalt = p.u.slice(40, 48)
        if (java.util.Arrays.equals(pwdHash(empty, valSalt, empty), uHash)) {
          if (p.ue.length < 32) return None
          val ik = pwdHash(empty, keySalt, empty)
          val fileKey = aesCbc(encrypt = false, ik, new Array[Byte](16), p.ue.take(32), "NoPadding")
          Some(new Decryptor(fileKey, MethodAes256))
        } else if (p.o.length >= 48 && p.oe.length >= 32) {
          // empty OWNER password path (udata = the full 48-byte /U)
          val u48 = p.u.take(48)
          val oHash = p.o.take(32)
          val oValSalt = p.o.slice(32, 40)
          val oKeySalt = p.o.slice(40, 48)
          if (java.util.Arrays.equals(pwdHash(empty, oValSalt, u48), oHash)) {
            val ik = pwdHash(empty, oKeySalt, u48)
            val fileKey = aesCbc(encrypt = false, ik, new Array[Byte](16), p.oe.take(32), "NoPadding")
            Some(new Decryptor(fileKey, MethodAes256))
          } else None
        } else None
      } else if (p.r >= 2 && p.r <= 4) {
        val method: Method =
          if (p.v == 4) p.cfm match {
            case "AESV2" => MethodAes
            case "V2" => MethodRc4
            case "Identity" | "" => MethodIdentity
            case _ => return None
          }
          else MethodRc4
        // empty USER password
        val uKey = fileKeyR234(pad(empty), p)
        if (userKeyMatches(uKey, p)) Some(new Decryptor(uKey, method))
        else {
          // empty OWNER password (Algorithm 7): recover the padded user
          // password from /O, re-derive, re-authenticate
          val oKey = ownerRc4Key(empty, p)
          var d = p.o.take(32)
          if (p.r == 2) d = rc4(oKey, d)
          else {
            var i = 19
            while (i >= 0) {
              d = rc4(oKey.map(b => (b ^ i).toByte), d)
              i -= 1
            }
          }
          val recovered = fileKeyR234(d, p)
          if (userKeyMatches(recovered, p)) Some(new Decryptor(recovered, method))
          else None
        }
      } else None
    } catch {
      case _: Exception => None // unsupported/odd scheme → report encrypted
    }
  }
}
