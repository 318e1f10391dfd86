package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import org.scalatest.funsuite.AnyFunSuite
import TfRecordCodec._

/** From-scratch TFRecord/tf.Example codec: framing CRCs, wire-format
  * round trips, and tolerance for foreign encodings. */
class TfRecordSpec extends AnyFunSuite {

  test("CRC-32C check value and TF masking round-trip") {
    // published CRC-32C check value: crc of ASCII "123456789"
    val check = "123456789".getBytes("US-ASCII")
    assert(TfRecordCodec.crc32c(check, 0, check.length) == 0xe3069283)
    for (crc <- Seq(0, 1, -1, 0xe3069283, 0x12345678))
      assert(unmask(mask(crc)) == crc)
    // masking must MOVE the value (its whole point): no fixed point here
    assert(mask(0xe3069283) != 0xe3069283)
  }

  test("framing round-trips records and rejects corruption/truncation") {
    val payloads = Seq(
      Array[Byte](),
      "hello".getBytes("UTF-8"),
      Array.tabulate(1000)(i => (i % 251).toByte))
    val stream = encodeRecords(payloads.iterator)
    val back = decodeRecords(stream).toSeq
    assert(back.map(_.toSeq) == payloads.map(_.toSeq))

    // flip one payload byte -> data CRC mismatch, loud
    val corrupt = stream.clone()
    corrupt(16 + 12) = (corrupt(16 + 12) ^ 0x01).toByte // first byte of "hello"
    val e1 = intercept[IllegalArgumentException] {
      decodeRecords(corrupt).toSeq
    }
    assert(e1.getMessage.contains("data CRC"))

    // flip a length byte -> length CRC mismatch before any read
    val badLen = stream.clone()
    badLen(0) = (badLen(0) ^ 0x01).toByte
    val e2 = intercept[IllegalArgumentException] { decodeRecords(badLen).toSeq }
    assert(e2.getMessage.contains("length CRC"))

    // truncated tail -> loud, not a silent short read
    val trunc = stream.dropRight(3)
    val e3 = intercept[IllegalArgumentException] { decodeRecords(trunc).toSeq }
    assert(e3.getMessage.contains("truncated"))
  }

  test("tf.Example encode/decode round-trips all three feature kinds") {
    val ex = Map[String, Feature](
      "doc_id"  -> Int64List(Seq(0L, 1L, 300L, Long.MaxValue, -1L)),
      "scores"  -> FloatList(Seq(0f, 1.5f, -2.25f, Float.MinPositiveValue)),
      "text"    -> BytesList(Seq("café 中文".getBytes("UTF-8"),
        Array[Byte](), Array[Byte](0x7f, 0x00, -1))),
      "empty"   -> Int64List(Seq()))
    val back = decodeExample(encodeExample(ex))
    assert(back.keySet == ex.keySet)
    assert(back("doc_id").asInstanceOf[Int64List].values ==
      ex("doc_id").asInstanceOf[Int64List].values)
    assert(back("scores").asInstanceOf[FloatList].values ==
      ex("scores").asInstanceOf[FloatList].values)
    assert(back("text").asInstanceOf[BytesList].values.map(_.toSeq) ==
      ex("text").asInstanceOf[BytesList].values.map(_.toSeq))
    assert(back("empty").asInstanceOf[Int64List].values.isEmpty)
  }

  test("encoder bytes are deterministic (sorted map keys)") {
    val a = encodeExample(Map("b" -> Int64List(Seq(2L)), "a" -> Int64List(Seq(1L))))
    val b = encodeExample(Map("a" -> Int64List(Seq(1L)), "b" -> Int64List(Seq(2L))))
    assert(a.toSeq == b.toSeq)
  }

  test("decoder accepts foreign encodings: unpacked lists + unknown fields") {
    // Hand-encode an Example the way proto2 writers (no packed default)
    // would: Int64List as repeated wire-0 varints, FloatList as repeated
    // wire-5 fixed32, plus an unknown field 99 the decoder must skip.
    def varint(out: ByteArrayOutputStream, v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0L) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def lenDelim(out: ByteArrayOutputStream, field: Int, p: Array[Byte]): Unit = {
      varint(out, (field << 3) | 2L); varint(out, p.length.toLong)
      out.write(p, 0, p.length)
    }
    // Int64List { value: 7, value: 300 } unpacked
    val i64 = new ByteArrayOutputStream()
    varint(i64, (1 << 3) | 0L); varint(i64, 7L)
    varint(i64, (1 << 3) | 0L); varint(i64, 300L)
    // FloatList { value: 1.5f } unpacked (wire 5)
    val f32 = new ByteArrayOutputStream()
    varint(f32, (1 << 3) | 5L)
    val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putFloat(1.5f)
    f32.write(bb.array(), 0, 4)
    def feature(kindField: Int, list: Array[Byte]): Array[Byte] = {
      val f = new ByteArrayOutputStream(); lenDelim(f, kindField, list); f.toByteArray
    }
    def entry(key: String, feat: Array[Byte]): Array[Byte] = {
      val e = new ByteArrayOutputStream()
      lenDelim(e, 1, key.getBytes("UTF-8")); lenDelim(e, 2, feat)
      e.toByteArray
    }
    val features = new ByteArrayOutputStream()
    lenDelim(features, 1, entry("n", feature(3, i64.toByteArray)))
    lenDelim(features, 1, entry("x", feature(2, f32.toByteArray)))
    val example = new ByteArrayOutputStream()
    lenDelim(example, 1, features.toByteArray)
    varint(example, (99 << 3) | 0L); varint(example, 42L) // unknown field
    val back = decodeExample(example.toByteArray)
    assert(back("n").asInstanceOf[Int64List].values == Seq(7L, 300L))
    assert(back("x").asInstanceOf[FloatList].values == Seq(1.5f))
  }

  test("negative int64 survives the 10-byte varint path") {
    val back = decodeExample(encodeExample(
      Map("v" -> Int64List(Seq(Long.MinValue, -42L)))))
    assert(back("v").asInstanceOf[Int64List].values == Seq(Long.MinValue, -42L))
  }
}
