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
