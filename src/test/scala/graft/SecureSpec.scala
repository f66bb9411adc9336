package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.output.Secure

class SecureSpec extends AnyFunSuite {
  val payload: Array[Byte] =
    ("{\"format_version\": \"1.0\", \"tables\": []}" * 50).getBytes("UTF-8")

  test("gzip round-trips and actually compresses repetitive json") {
    val gz = Secure.gzip(payload)
    assert(gz.length < payload.length / 2)
    assert(Secure.gunzip(gz).sameElements(payload))
  }

  test("zstd round-trips, compresses, and emits standard zstd frames (r6)") {
    val z = Secure.zstd(payload)
    assert(z.length < payload.length / 2)
    assert(Secure.unzstd(z).sameElements(payload))
    // the 4-byte zstd frame magic (RFC 8878: 0xFD2FB528 little-endian) —
    // the blob IS a .zst any external zstd tool can read
    assert((z(0) & 0xff) == 0x28 && (z(1) & 0xff) == 0xb5 &&
      (z(2) & 0xff) == 0x2f && (z(3) & 0xff) == 0xfd)
  }

  test("zstd-then-encrypt chain round-trips (the reference's .json.zst path)") {
    val blob = Secure.encrypt(Secure.zstd(payload), "pw")
    assert(Secure.unzstd(Secure.decrypt(blob, "pw")).sameElements(payload))
  }

  test("encrypt round-trips with the right password") {
    val enc = Secure.encrypt(payload, "hunter2")
    assert(!new String(enc, "ISO-8859-1").contains("format_version"))
    assert(Secure.decrypt(enc, "hunter2").sameElements(payload))
  }

  test("wrong password and tampering are rejected (GCM auth)") {
    val enc = Secure.encrypt(payload, "hunter2")
    intercept[Exception](Secure.decrypt(enc, "wrong"))
    val tampered = enc.clone(); tampered(enc.length - 1) = (tampered(enc.length - 1) ^ 1).toByte
    intercept[Exception](Secure.decrypt(tampered, "hunter2"))
  }

  test("compress-then-encrypt chain round-trips") {
    val blob = Secure.encrypt(Secure.gzip(payload), "pw")
    assert(Secure.gunzip(Secure.decrypt(blob, "pw")).sameElements(payload))
  }

  test("two encryptions of the same payload differ (fresh salt + nonce)") {
    val a = Secure.encrypt(payload, "pw")
    val b = Secure.encrypt(payload, "pw")
    assert(!a.sameElements(b))
  }
}
