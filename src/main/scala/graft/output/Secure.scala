package graft.output

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.security.SecureRandom
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import javax.crypto.{Cipher, SecretKeyFactory}
import javax.crypto.spec.{GCMParameterSpec, PBEKeySpec, SecretKeySpec}

/** Secure artifact output — the reference's `--compress` / `--encrypt`
  * flags (dbsurveyor-collect: zstd compression producing
  * `.dbsurveyor.json.zst`, AES-GCM with Argon2id KDF).
  *
  * Compression: REAL zstd via zstd-jni (the same public native codec
  * Spark itself ships for shuffle/parquet — already on the classpath),
  * byte-compatible with the reference's `.zst` artifacts; GZIP remains
  * as the zero-dependency JDK fallback. Encryption: AES-256-GCM with
  * PBKDF2-HMAC-SHA256 — the ONE declared substitution left (the JVM has
  * no Argon2id): the container format and security properties
  * (authenticated encryption, random salt + nonce per file, no
  * credentials in output) are preserved; only the KDF hardness profile
  * differs (PBKDF2@120k iterations is compute-hard but not memory-hard).
  *
  * File layout: magic "GRFT1" | 16-byte salt | 12-byte nonce | GCM
  * ciphertext(+tag). Compression is applied before encryption when both
  * are requested, like the reference.
  */
object Secure {

  private val Magic = "GRFT1".getBytes("UTF-8")
  private val Iterations = 120000
  private val KeyBits = 256

  def gzip(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(data); gz.close()
    bos.toByteArray
  }

  def gunzip(data: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(data))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  /** Real zstd (reference main.rs:44 writes `.dbsurveyor.json.zst`):
    * standard zstd frames via zstd-jni's streaming API — readable by any
    * zstd tool, and any `.zst` artifact the reference wrote reads back.
    */
  def zstd(data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zs = new com.github.luben.zstd.ZstdOutputStream(bos, 3)
    zs.write(data); zs.close()
    bos.toByteArray
  }

  def unzstd(data: Array[Byte]): Array[Byte] = {
    val in = new com.github.luben.zstd.ZstdInputStream(new ByteArrayInputStream(data))
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    out.toByteArray
  }

  private def deriveKey(password: Array[Char], salt: Array[Byte]): SecretKeySpec = {
    val skf = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
    val key = skf.generateSecret(new PBEKeySpec(password, salt, Iterations, KeyBits))
    new SecretKeySpec(key.getEncoded, "AES")
  }

  def encrypt(data: Array[Byte], password: String): Array[Byte] = {
    val rnd = new SecureRandom()
    val salt = new Array[Byte](16); rnd.nextBytes(salt)
    val nonce = new Array[Byte](12); rnd.nextBytes(nonce)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.ENCRYPT_MODE, deriveKey(password.toCharArray, salt),
      new GCMParameterSpec(128, nonce))
    val ct = cipher.doFinal(data)
    val out = new ByteArrayOutputStream()
    out.write(Magic); out.write(salt); out.write(nonce); out.write(ct)
    out.toByteArray
  }

  def decrypt(blob: Array[Byte], password: String): Array[Byte] = {
    require(blob.length > Magic.length + 16 + 12, "truncated artifact")
    require(blob.take(Magic.length).sameElements(Magic), "not a GRFT1 artifact")
    val salt = blob.slice(Magic.length, Magic.length + 16)
    val nonce = blob.slice(Magic.length + 16, Magic.length + 28)
    val ct = blob.drop(Magic.length + 28)
    val cipher = Cipher.getInstance("AES/GCM/NoPadding")
    cipher.init(Cipher.DECRYPT_MODE, deriveKey(password.toCharArray, salt),
      new GCMParameterSpec(128, nonce))
    cipher.doFinal(ct)  // throws AEADBadTagException on wrong password/tamper
  }
}
