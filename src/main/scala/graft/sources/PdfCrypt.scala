package graft.sources

import java.security.MessageDigest

/** PDF standard security handler (PDF 32000 §7.6.3) — empty-user-password
  * decryption, the dominant "encrypted" corpus shape: owner-restricted
  * files (printing/copy disabled) that every viewer opens without a
  * prompt. The reference ingests these transparently because PyMuPDF
  * authenticates the empty password and decrypts on load; a byte-level
  * extractor must do the same or the whole document is noise.
  *
  * Implemented: /Filter /Standard, revisions 2/3/4/5/6 — RC4 (40–128
  * bit, /V 1/2), AES-128-CBC (/V 4 crypt filters, /CFM /AESV2), and
  * AES-256-CBC (/V 5 /CFM /AESV3, revisions 5 and 6 — the PDF-2.0
  * handler, Acrobat's default since X, so a modern encrypted corpus is
  * mostly this). Legacy file keys are Algorithm 2 over the EMPTY user
  * password; V5 keys validate via the SHA-2 hashes (Algorithm 2.B's
  * hardened iteration for /R 6) and unwrap from /UE. /U verification is
  * exposed so callers can distinguish "empty password works" from
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

  // ------------- /V 5 — AES-256 (ISO 32000-2 §7.6.4, /R 5 and /R 6) ----
  // The PDF-2.0 handler (Acrobat default since X): SHA-2-based key
  // derivation replaces MD5/RC4 entirely, the 256-bit FILE key encrypts
  // every object directly (no per-object key derivation), and /U //O
  // grow to 48 bytes (32-byte verification hash + 8-byte validation salt
  // + 8-byte key salt) with the file key itself carried AES-wrapped in
  // /UE //OE.

  private def sha(alg: String, parts: Array[Byte]*): Array[Byte] = {
    val d = MessageDigest.getInstance(alg)
    parts.foreach(d.update)
    d.digest()
  }

  private val ZeroIv = new Array[Byte](16)

  private def aesNoPad(mode: Int, key: Array[Byte], iv: Array[Byte],
      data: Array[Byte]): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    c.init(mode, new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    c.doFinal(data)
  }

  /** The /V 5 password hash: plain SHA-256(pwd‖salt‖udata) for /R 5;
    * Algorithm 2.B's hardened iteration for /R 6 — ≥64 rounds of
    * "AES-128-CBC-encrypt 64 copies of (pwd‖K‖udata) under K's first 32
    * bytes, then SHA-256/384/512 chosen by the ciphertext's first 16
    * bytes mod 3", continuing until the last ciphertext byte ≤
    * rounds−32. Always returns 32 bytes.
    */
  def hash2b(pwd: Array[Byte], salt: Array[Byte], udata: Array[Byte],
      r: Int): Array[Byte] = {
    var k = sha("SHA-256", pwd, salt, udata)
    if (r < 6) return k
    // ONE cipher instance re-init'd per round: Cipher.getInstance is a
    // provider lookup and dominated the (deliberately expensive) hash —
    // measured 6.7 s → ~2 s on the 167-doc AES-256 fixture slice.
    // r16, same class of fix for the remaining per-round overheads:
    // the three MessageDigest instances construct once per call (not a
    // provider lookup per round), and the 64-copy block + ciphertext
    // reuse two max-size buffers across rounds (k grows 32→48→64 as the
    // SHA variant flips, so the per-round slice length varies while the
    // buffers do not). Arithmetic unchanged — rounds, copy layout, mod-3
    // digest pick and termination byte are byte-identical.
    val cipher = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
    val digests = Array(
      MessageDigest.getInstance("SHA-256"),
      MessageDigest.getInstance("SHA-384"),
      MessageDigest.getInstance("SHA-512"))
    val maxBlock = pwd.length + 64 + udata.length
    val k1 = new Array[Byte](maxBlock * 64)
    val enc = new Array[Byte](maxBlock * 64)
    var eLen = 0
    var eLast = 0
    var i = 0
    while (i < 64 || eLast > i - 32) {
      val blockLen = pwd.length + k.length + udata.length
      System.arraycopy(pwd, 0, k1, 0, pwd.length)
      System.arraycopy(k, 0, k1, pwd.length, k.length)
      System.arraycopy(udata, 0, k1, pwd.length + k.length, udata.length)
      var j = 1
      while (j < 64) {
        System.arraycopy(k1, 0, k1, j * blockLen, blockLen)
        j += 1
      }
      cipher.init(javax.crypto.Cipher.ENCRYPT_MODE,
        new javax.crypto.spec.SecretKeySpec(k.take(16), "AES"),
        new javax.crypto.spec.IvParameterSpec(k.slice(16, 32)))
      eLen = cipher.doFinal(k1, 0, blockLen * 64, enc, 0)
      eLast = enc(eLen - 1) & 0xff
      var sum16 = 0
      var t = 0
      while (t < 16) { sum16 += enc(t) & 0xff; t += 1 }
      val d = digests(sum16 % 3)
      d.update(enc, 0, eLen)
      k = d.digest() // digest() resets the instance for the next round
      i += 1
    }
    k.take(32)
  }

  /** /V 5 Algorithm 11: does the EMPTY user password validate against
    * the 48-byte /U? */
  def v5EmptyPasswordWorks(u: Array[Byte], r: Int): Boolean =
    u.length >= 48 && java.util.Arrays.equals(
      hash2b(Array.emptyByteArray, u.slice(32, 40), Array.emptyByteArray, r),
      u.take(32))

  /** /V 5 Algorithm 2.A (user-password branch, empty password): the
    * 32-byte file key, unwrapped from /UE with the intermediate user key
    * (hash over the key salt), AES-256-CBC, zero IV, no padding. */
  def v5FileKey(u: Array[Byte], ue: Array[Byte], r: Int): Array[Byte] = {
    val ik = hash2b(Array.emptyByteArray, u.slice(40, 48),
      Array.emptyByteArray, r)
    aesNoPad(javax.crypto.Cipher.DECRYPT_MODE, ik, ZeroIv, ue.take(32))
  }

  /** Writer side: the full /V 5 entry set for an empty user AND owner
    * password, deterministic in `seed` (fixture bytes must be
    * reproducible — salts need uniqueness, not secrecy).
    * @return (U, UE, O, OE, Perms), lengths 48/32/48/32/16
    */
  def v5Entries(fileKey: Array[Byte], p: Int, seed: Array[Byte],
      r: Int = 6, encryptMetadata: Boolean = true)
      : (Array[Byte], Array[Byte], Array[Byte], Array[Byte], Array[Byte]) = {
    require(fileKey.length == 32, "V5 file key must be 32 bytes")
    def salt(tag: Int): Array[Byte] =
      md5(seed, Array(tag.toByte)).take(8)
    val none = Array.emptyByteArray
    val (vs, ks, ovs, oks) = (salt(1), salt(2), salt(3), salt(4))
    val u48 = hash2b(none, vs, none, r) ++ vs ++ ks
    val ue = aesNoPad(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2b(none, ks, none, r), ZeroIv, fileKey)
    val o48 = hash2b(none, ovs, u48, r) ++ ovs ++ oks
    val oe = aesNoPad(javax.crypto.Cipher.ENCRYPT_MODE,
      hash2b(none, oks, u48, r), ZeroIv, fileKey)
    // Algorithm 10: the /Perms block — P (LE32), 0xFFFFFFFF, the
    // EncryptMetadata flag, 'adb', 4 seed bytes — AES-ECB'd under the
    // file key
    val block = le32(p) ++ Array(0xff, 0xff, 0xff, 0xff).map(_.toByte) ++
      Array((if (encryptMetadata) 'T' else 'F').toByte) ++
      "adb".getBytes("ISO-8859-1") ++ md5(seed, Array(5.toByte)).take(4)
    val ecb = javax.crypto.Cipher.getInstance("AES/ECB/NoPadding")
    ecb.init(javax.crypto.Cipher.ENCRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(fileKey, "AES"))
    (u48, ue, o48, oe, ecb.doFinal(block))
  }
}
