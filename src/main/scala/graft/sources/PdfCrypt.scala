package graft.sources

import java.security.MessageDigest

/** PDF standard security handler (PDF 32000 §7.6.3) — empty-user-password
  * decryption, the dominant "encrypted" corpus shape: owner-restricted
  * files (printing/copy disabled) that every viewer opens without a
  * prompt. The reference ingests these transparently because PyMuPDF
  * authenticates the empty password and decrypts on load; a byte-level
  * extractor must do the same or the whole document is noise.
  *
  * Implemented: /Filter /Standard, revisions 2/3/4 — RC4 (40–128 bit,
  * /V 1/2) and AES-128-CBC (/V 4 crypt filters, /CFM /AESV2), the two
  * encryption modes PDF 1.4–1.7 producers actually emit. The file key is
  * Algorithm 2 over the EMPTY user password; /U verification (Algorithms
  * 4/5) is exposed so callers can distinguish "empty password works" from
  * "genuinely password-protected" (the latter degrades to no text, like
  * the reference when authentication fails).
  *
  * RC4 is implemented inline (the JDK ships no RC4 provider by default);
  * AES-CBC rides `javax.crypto`. All derivations are pure functions of
  * (encrypt dict, /ID, object number) — no state, safe under Spark task
  * parallelism.
  */
object PdfCrypt {

  /** The 32-byte padding string of Algorithm 2 (PDF 32000 Table 21 note —
    * a fixed public constant). */
  private[sources] val Pad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
    0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
    0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private def md5(parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** Pad/truncate a password to exactly 32 bytes per Algorithm 2 step a. */
  private def padded(pwd: Array[Byte]): Array[Byte] =
    (pwd.take(32) ++ Pad).take(32)

  /** RC4 (symmetric: encrypt == decrypt). */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val s = Array.tabulate(256)(_.toByte)
    var j = 0
    var i = 0
    while (i < 256) {
      j = (j + s(i) + key(i % key.length)) & 0xff
      val t = s(i); s(i) = s(j); s(j) = t
      i += 1
    }
    val out = new Array[Byte](data.length)
    var x = 0
    var y = 0
    i = 0
    while (i < data.length) {
      x = (x + 1) & 0xff
      y = (y + s(x)) & 0xff
      val t = s(x); s(x) = s(y); s(y) = t
      out(i) = (data(i) ^ s((s(x) + s(y)) & 0xff)).toByte
      i += 1
    }
    out
  }

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** Algorithm 2: the file encryption key from a user password.
    * @param n key length in BYTES (Length/8; 5 for revision 2)
    */
  def fileKey(userPwd: Array[Byte], o: Array[Byte], p: Int, id0: Array[Byte],
      n: Int, r: Int, encryptMetadata: Boolean = true): Array[Byte] = {
    val extra =
      if (r >= 4 && !encryptMetadata) le32(0xffffffff) else Array.emptyByteArray
    var key = md5(padded(userPwd), o.take(32), le32(p), id0, extra)
    if (r >= 3) {
      var i = 0
      while (i < 50) { key = md5(key.take(n)); i += 1 }
    }
    key.take(n)
  }

  /** Algorithm 3: the /O entry (the user password RC4-encrypted under a
    * key derived from the owner password — with both empty, O still
    * comes out non-trivial because the padding constant feeds the
    * digest). */
  def computeO(ownerPwd: Array[Byte], userPwd: Array[Byte], n: Int, r: Int)
      : Array[Byte] = {
    var key = md5(padded(ownerPwd))
    if (r >= 3) {
      // step (c): each round re-hashes only the first n bytes (as in
      // Algorithm 2 step h) — for n=16 the distinction vanishes, but a
      // 40-bit caller must match what conforming readers compute
      var i = 0
      while (i < 50) { key = md5(key.take(n)); i += 1 }
    }
    val rc4Key = key.take(n)
    var out = rc4(rc4Key, padded(userPwd))
    if (r >= 3) {
      var i = 1
      while (i <= 19) {
        out = rc4(rc4Key.map(b => (b ^ i).toByte), out)
        i += 1
      }
    }
    out
  }

  /** Algorithms 4 (r2) / 5 (r≥3): the /U entry for a file key. */
  def computeU(key: Array[Byte], id0: Array[Byte], r: Int): Array[Byte] =
    if (r == 2) rc4(key, Pad)
    else {
      var out = rc4(key, md5(Pad, id0))
      var i = 1
      while (i <= 19) {
        out = rc4(key.map(b => (b ^ i).toByte), out)
        i += 1
      }
      out ++ new Array[Byte](16) // 16 bytes of arbitrary padding
    }

  /** Algorithm 6: does the EMPTY user password open this file? (r≥3
    * compares only the first 16 bytes of /U, per spec.) */
  def emptyPasswordWorks(o: Array[Byte], u: Array[Byte], p: Int,
      id0: Array[Byte], n: Int, r: Int,
      encryptMetadata: Boolean): Boolean = {
    val key = fileKey(Array.emptyByteArray, o, p, id0, n, r, encryptMetadata)
    val expect = computeU(key, id0, r)
    val cmp = if (r == 2) 32 else 16
    u.length >= cmp && java.util.Arrays.equals(
      expect.take(cmp), u.take(cmp))
  }

  /** Algorithm 1 per-object key: md5(fileKey + objnum LE24 + gen LE16
    * [+ sAlT for AES]), truncated to min(n+5, 16). */
  def objectKey(key: Array[Byte], num: Int, gen: Int, aes: Boolean)
      : Array[Byte] = {
    val salt =
      if (aes) Array[Byte](0x73, 0x41, 0x6c, 0x54) else Array.emptyByteArray
    md5(key,
      Array((num & 0xff).toByte, ((num >> 8) & 0xff).toByte,
        ((num >> 16) & 0xff).toByte,
        (gen & 0xff).toByte, ((gen >> 8) & 0xff).toByte),
      salt).take(math.min(key.length + 5, 16))
  }

  private def aesCipher(mode: Int, key: Array[Byte], iv: Array[Byte]) = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/PKCS5Padding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c
  }

  /** Decrypt one object's stream/string bytes with its object key. AES
    * data carries its 16-byte IV prefix (§7.6.2); malformed ciphertext
    * yields empty rather than throwing (fuzz posture of the codec). */
  def decrypt(objKey: Array[Byte], data: Array[Byte], aes: Boolean)
      : Array[Byte] =
    if (!aes) rc4(objKey, data)
    else if (data.length < 32 || data.length % 16 != 0) Array.emptyByteArray
    else
      try aesCipher(javax.crypto.Cipher.DECRYPT_MODE, objKey, data.take(16))
        .doFinal(data.drop(16))
      catch { case _: java.security.GeneralSecurityException => Array.emptyByteArray }

  /** Encrypt (writer side). The AES IV is derived deterministically from
    * the object number so fixture bytes are reproducible — IVs need
    * uniqueness per object, not secrecy. */
  def encrypt(objKey: Array[Byte], data: Array[Byte], aes: Boolean, num: Int)
      : Array[Byte] =
    if (!aes) rc4(objKey, data)
    else {
      val iv = md5(s"iv:$num".getBytes("ISO-8859-1")).take(16)
      iv ++ aesCipher(javax.crypto.Cipher.ENCRYPT_MODE, objKey, iv)
        .doFinal(data)
    }
}
