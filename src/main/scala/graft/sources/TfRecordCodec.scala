package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32C

/** From-scratch TFRecord + `tf.train.Example` codec — the canonical
  * container of ML training corpora (TFDS, T5/C4, PaLM-era pipelines
  * all shipped shards of tf.Example TFRecords). Both layers are
  * implemented from the PUBLIC on-disk specs, no TensorFlow anywhere:
  *
  * TFRecord framing (tensorflow/core/lib/io/record_writer.cc,
  * public source):
  * {{{
  *   uint64 length (LE) | uint32 masked_crc32c(length bytes) (LE)
  *   | data[length]     | uint32 masked_crc32c(data) (LE)
  * }}}
  * where `masked = rotl(crc32c(x), 15) + 0xa282ead8` — the mask
  * exists so a CRC stored alongside the data it covers can't be
  * mistaken for data. Both CRCs are VERIFIED on read; corruption
  * fails loudly, never yields a garbage record.
  *
  * tf.Example wire format (protobuf encoding spec +
  * tensorflow/core/example/example.proto, feature.proto):
  * {{{
  *   Example  { Features features = 1; }
  *   Features { map<string, Feature> feature = 1; }    // repeated entry msg
  *   Feature  { oneof { BytesList=1 FloatList=2 Int64List=3 } }
  *   BytesList{ repeated bytes value = 1; }
  *   FloatList{ repeated float value = 1 [packed]; }
  *   Int64List{ repeated int64 value = 1 [packed]; }
  * }}}
  * The encoder emits map entries in sorted-key order (deterministic
  * bytes for a given row — protobuf map order is unspecified, so we
  * pin it); the decoder is a general wire-format walk: it accepts any
  * field order, packed OR unpacked scalar lists, and skips unknown
  * fields by wire type, so foreign TFRecords decode too.
  *
  * Reference scope: extension surface — the reference framework
  * (EECS 485 MapReduce) streams newline text; TFRecord is the
  * containerized equivalent its Hadoop-Streaming lineage grew into
  * for training data.
  */
object TfRecordCodec {

  sealed trait Feature
  final case class BytesList(values: Seq[Array[Byte]]) extends Feature
  final case class FloatList(values: Seq[Float]) extends Feature
  final case class Int64List(values: Seq[Long]) extends Feature

  // ---- CRC32C masking (record_writer.cc) -------------------------------

  private val MaskDelta = 0xa282ead8

  private[sources] def crc32c(bytes: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C
    c.update(bytes, off, len)
    c.getValue.toInt
  }

  private[sources] def mask(crc: Int): Int =
    (Integer.rotateLeft(crc, 17)) + MaskDelta // rotl17 == (crc>>15)|(crc<<17) on uint32

  private[sources] def unmask(masked: Int): Int =
    Integer.rotateRight(masked - MaskDelta, 17)

  // ---- framing ---------------------------------------------------------

  /** Frame `payloads` into one TFRecord stream. */
  def encodeRecords(payloads: Iterator[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val hdr = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    val ftr = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
    payloads.foreach { p =>
      hdr.clear()
      hdr.putLong(p.length.toLong)
      hdr.putInt(mask(crc32c(hdr.array(), 0, 8)))
      out.write(hdr.array(), 0, 12)
      out.write(p)
      ftr.clear()
      ftr.putInt(mask(crc32c(p, 0, p.length)))
      out.write(ftr.array(), 0, 4)
    }
    out.toByteArray
  }

  /** Walk a TFRecord stream, verifying BOTH masked CRCs per record.
    * Truncation or bit-rot throws — a corrupt shard must never
    * silently contribute garbage rows to a training run. */
  def decodeRecords(bytes: Array[Byte]): Iterator[Array[Byte]] =
    new Iterator[Array[Byte]] {
      private var pos = 0
      override def hasNext: Boolean = {
        if (pos == bytes.length) false
        else if (bytes.length - pos < 16)
          throw new IllegalArgumentException(
            s"tfrecord: truncated header at offset $pos (${bytes.length - pos} bytes left)")
        else true
      }
      override def next(): Array[Byte] = {
        if (!hasNext) throw new NoSuchElementException
        val bb = ByteBuffer.wrap(bytes, pos, 12).order(ByteOrder.LITTLE_ENDIAN)
        val len64 = bb.getLong
        val lenCrc = bb.getInt
        require(unmask(lenCrc) == crc32c(bytes, pos, 8),
          s"tfrecord: length CRC mismatch at offset $pos")
        require(len64 >= 0 && len64 <= Int.MaxValue - 16 &&
          pos + 16 + len64 <= bytes.length,
          s"tfrecord: bad/truncated record length $len64 at offset $pos")
        val len = len64.toInt
        val data = java.util.Arrays.copyOfRange(bytes, pos + 12, pos + 12 + len)
        val dataCrc = ByteBuffer.wrap(bytes, pos + 12 + len, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt
        require(unmask(dataCrc) == crc32c(data, 0, len),
          s"tfrecord: data CRC mismatch at offset $pos")
        pos += 16 + len
        data
      }
    }

  // ---- protobuf primitives --------------------------------------------

  private def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  private def writeTag(out: ByteArrayOutputStream, field: Int, wire: Int): Unit =
    writeVarint(out, ((field << 3) | wire).toLong)

  private def writeLenDelim(out: ByteArrayOutputStream, field: Int,
      payload: Array[Byte]): Unit = {
    writeTag(out, field, 2)
    writeVarint(out, payload.length.toLong)
    out.write(payload, 0, payload.length)
  }

  private final class Reader(bytes: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        require(pos < end && shift < 64, s"protobuf: varint overruns at $pos")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        shift += 7
        more = (b & 0x80) != 0
      }
      v
    }
    def fixed32(): Int = {
      require(pos + 4 <= end, s"protobuf: fixed32 overruns at $pos")
      val v = ByteBuffer.wrap(bytes, pos, 4).order(ByteOrder.LITTLE_ENDIAN).getInt
      pos += 4; v
    }
    def lenDelim(): Reader = {
      val n = varint()
      require(n >= 0 && pos + n <= end, s"protobuf: length $n overruns at $pos")
      val r = new Reader(bytes, pos, pos + n.toInt)
      pos += n.toInt
      r
    }
    def lenDelimBytes(): Array[Byte] = {
      val r = lenDelim()
      java.util.Arrays.copyOfRange(bytes, r.pos, r.end)
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint(); ()
      case 1 => require(pos + 8 <= end); pos += 8
      case 2 => lenDelim(); ()
      case 5 => require(pos + 4 <= end); pos += 4
      case w => throw new IllegalArgumentException(s"protobuf: wire type $w")
    }
  }

  // ---- tf.Example ------------------------------------------------------

  private def encodeFeature(f: Feature): Array[Byte] = {
    val list = new ByteArrayOutputStream()
    f match {
      case BytesList(vs) =>
        vs.foreach(v => writeLenDelim(list, 1, v))
      case FloatList(vs) => // packed: field 1, wire 2, 4-byte LE floats
        val packed = ByteBuffer.allocate(4 * vs.length).order(ByteOrder.LITTLE_ENDIAN)
        vs.foreach(packed.putFloat)
        writeLenDelim(list, 1, packed.array())
      case Int64List(vs) => // packed varints
        val packed = new ByteArrayOutputStream()
        vs.foreach(writeVarint(packed, _))
        writeLenDelim(list, 1, packed.toByteArray)
    }
    val feature = new ByteArrayOutputStream()
    val fieldNo = f match {
      case _: BytesList => 1
      case _: FloatList => 2
      case _: Int64List => 3
    }
    writeLenDelim(feature, fieldNo, list.toByteArray)
    feature.toByteArray
  }

  /** Encode one Example; map entries in sorted-key order so the bytes
    * for a given logical row are deterministic across runs/retries. */
  def encodeExample(features: Map[String, Feature]): Array[Byte] = {
    val featuresMsg = new ByteArrayOutputStream()
    features.toSeq.sortBy(_._1).foreach { case (k, f) =>
      val entry = new ByteArrayOutputStream()
      writeLenDelim(entry, 1, k.getBytes("UTF-8"))
      writeLenDelim(entry, 2, encodeFeature(f))
      writeLenDelim(featuresMsg, 1, entry.toByteArray)
    }
    val example = new ByteArrayOutputStream()
    writeLenDelim(example, 1, featuresMsg.toByteArray)
    example.toByteArray
  }

  private def decodeFeature(r: Reader): Feature = {
    var result: Feature = null
    while (r.hasMore) {
      val tag = r.varint()
      val field = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      (field, wire) match {
        case (1, 2) => // BytesList message
          val lr = r.lenDelim()
          val vs = Seq.newBuilder[Array[Byte]]
          while (lr.hasMore) {
            val t = lr.varint()
            if ((t >>> 3) == 1 && (t & 7) == 2) vs += lr.lenDelimBytes()
            else lr.skip((t & 7).toInt)
          }
          result = BytesList(vs.result())
        case (2, 2) => // FloatList message: packed (wire 2) or unpacked (wire 5)
          val lr = r.lenDelim()
          val vs = Seq.newBuilder[Float]
          while (lr.hasMore) {
            val t = lr.varint()
            ((t >>> 3).toInt, (t & 7).toInt) match {
              case (1, 2) =>
                val pr = lr.lenDelim()
                while (pr.hasMore) vs += java.lang.Float.intBitsToFloat(pr.fixed32())
              case (1, 5) => vs += java.lang.Float.intBitsToFloat(lr.fixed32())
              case (_, w) => lr.skip(w)
            }
          }
          result = FloatList(vs.result())
        case (3, 2) => // Int64List message: packed (wire 2) or unpacked (wire 0)
          val lr = r.lenDelim()
          val vs = Seq.newBuilder[Long]
          while (lr.hasMore) {
            val t = lr.varint()
            ((t >>> 3).toInt, (t & 7).toInt) match {
              case (1, 2) =>
                val pr = lr.lenDelim()
                while (pr.hasMore) vs += pr.varint()
              case (1, 0) => vs += lr.varint()
              case (_, w) => lr.skip(w)
            }
          }
          result = Int64List(vs.result())
        case (_, w) => r.skip(w)
      }
    }
    require(result != null, "tf.Feature: no kind set")
    result
  }

  /** Decode one Example payload to its feature map. */
  def decodeExample(bytes: Array[Byte]): Map[String, Feature] = {
    val r = new Reader(bytes, 0, bytes.length)
    val out = Map.newBuilder[String, Feature]
    while (r.hasMore) {
      val tag = r.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => // Features
          val fr = r.lenDelim()
          while (fr.hasMore) {
            val ft = fr.varint()
            if ((ft >>> 3) == 1 && (ft & 7) == 2) { // map entry
              val er = fr.lenDelim()
              var key: String = null
              var value: Feature = null
              while (er.hasMore) {
                val et = er.varint()
                ((et >>> 3).toInt, (et & 7).toInt) match {
                  case (1, 2) => key = new String(er.lenDelimBytes(), "UTF-8")
                  case (2, 2) => value = decodeFeature(er.lenDelim())
                  case (_, w) => er.skip(w)
                }
              }
              require(key != null && value != null, "tf.Features: bad map entry")
              out += key -> value
            } else fr.skip((ft & 7).toInt)
          }
        case (_, w) => r.skip(w)
      }
    }
    out.result()
  }
}
