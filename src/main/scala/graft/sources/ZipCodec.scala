package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** One decoded ZIP entry: name, payload, and the CRC the archive
  * claimed (already verified against the payload by [[ZipCodec.decode]]). */
final case class ZipEntry(name: String, data: Array[Byte], crc: Long)

/** Pure-JVM ZIP (PKWARE) codec — the archive container data actually
  * arrives in: local file headers, a central directory, and an
  * end-of-central-directory record found by scanning BACKWARD from
  * EOF (the defining quirk of the format: a ZIP is read from its
  * tail). STORED entries only (method 0) — the container walk, not
  * DEFLATE, is the operator. The decoder trusts the CENTRAL directory
  * (as spec'd), cross-checks each local header against it, verifies
  * every payload's CRC-32, and fails loudly on any disagreement —
  * truncated archives, wrong offsets, and bit-rot all surface as
  * IllegalArgumentException, never as silently-short data. All
  * offset/size arithmetic is done in Long before bounds checks (the
  * TiffCodec hardening stance). */
object ZipCodec {

  private val LocalSig = 0x04034b50
  private val CentralSig = 0x02014b50
  private val EocdSig = 0x06054b50

  private def crc32(data: Array[Byte]): Long = {
    val c = new java.util.zip.CRC32()
    c.update(data)
    c.getValue
  }

  /** Canonical STORED archive with the given entries.
    *
    * Fail-loudly bounds (r13 advice): the EOCD entry count is a
    * 16-bit field and every offset/size a 32-bit one — exceeding
    * either would silently truncate mod 2^16 / wrap past 2 GiB, so
    * both are hard `require`s at write time. All offset arithmetic is
    * Long until the final bounded cast. Assembly is single-allocation
    * (sizes are closed-form), O(total) bytes — not `reduce(_ ++ _)`. */
  def encode(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    require(entries.nonEmpty, "empty archive")
    require(entries.size <= 0xFFFF,
      s"${entries.size} entries exceed the ZIP EOCD 16-bit count — split the partition")
    val names = entries.map(_._1.getBytes("UTF-8"))
    val crcs = entries.map { case (_, data) => crc32(data) }
    val cdOff = entries.zip(names).foldLeft(0L) { case (acc, ((_, data), name)) =>
      acc + 30L + name.length + data.length
    }
    val cdSize = names.foldLeft(0L)(_ + 46L + _.length)
    val total = cdOff + cdSize + 22L
    require(total <= Int.MaxValue,
      s"archive would be $total bytes — exceeds the 32-bit ZIP offset space (no ZIP64)")
    val buf = ByteBuffer.allocate(total.toInt).order(ByteOrder.LITTLE_ENDIAN)
    val offsets = new Array[Long](entries.size)
    entries.zip(names).zip(crcs).zipWithIndex.foreach {
      case ((((_, data), name), crc), i) =>
        offsets(i) = buf.position().toLong
        buf.putInt(LocalSig).putShort(20).putShort(0).putShort(0)
        buf.putShort(0).putShort(0) // time, date
        buf.putInt(crc.toInt)
        buf.putInt(data.length).putInt(data.length)
        buf.putShort(name.length.toShort).putShort(0)
        buf.put(name).put(data)
    }
    entries.zip(names).zip(crcs).zipWithIndex.foreach {
      case ((((_, data), name), crc), i) =>
        buf.putInt(CentralSig).putShort(20).putShort(20).putShort(0).putShort(0)
        buf.putShort(0).putShort(0)
        buf.putInt(crc.toInt)
        buf.putInt(data.length).putInt(data.length)
        buf.putShort(name.length.toShort).putShort(0).putShort(0)
        buf.putShort(0).putShort(0).putInt(0)
        buf.putInt(offsets(i).toInt)
        buf.put(name)
    }
    val eocd = buf
    eocd.putInt(EocdSig).putShort(0).putShort(0)
    eocd.putShort(entries.size.toShort).putShort(entries.size.toShort)
    eocd.putInt(cdSize.toInt).putInt(cdOff.toInt).putShort(0)
    require(buf.position() == total.toInt, s"assembly bug: ${buf.position()} != $total")
    buf.array()
  }

  /** Walk the archive tail-first and return every entry, CRC-verified. */
  def decode(bytes: Array[Byte]): Seq[ZipEntry] = {
    require(bytes.length >= 22, s"too short for a ZIP: ${bytes.length}")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    // EOCD: last occurrence of the signature within the trailing 64 KiB
    // + 22 window (a ZIP comment may follow it)
    var eocd = -1
    var p = bytes.length - 22
    val floor = math.max(0, bytes.length - 22 - 0xFFFF)
    while (eocd < 0 && p >= floor) {
      if (buf.getInt(p) == EocdSig) eocd = p else p -= 1
    }
    require(eocd >= 0, "no end-of-central-directory record")
    val n = buf.getShort(eocd + 10) & 0xFFFF
    val cdSize = buf.getInt(eocd + 12).toLong & 0xFFFFFFFFL
    val cdOff = buf.getInt(eocd + 16).toLong & 0xFFFFFFFFL
    require(cdOff + cdSize <= eocd,
      s"central directory ($cdOff+$cdSize) overruns EOCD at $eocd")
    var c = cdOff
    (0 until n).map { i =>
      require(c + 46 <= cdOff + cdSize, s"central entry $i overruns the directory")
      require(buf.getInt(c.toInt) == CentralSig, s"bad central signature at $c")
      val crc = buf.getInt(c.toInt + 16).toLong & 0xFFFFFFFFL
      val csize = buf.getInt(c.toInt + 20).toLong & 0xFFFFFFFFL
      val usize = buf.getInt(c.toInt + 24).toLong & 0xFFFFFFFFL
      require(csize == usize, s"entry $i not STORED (sizes $csize/$usize differ)")
      val nameLen = buf.getShort(c.toInt + 28) & 0xFFFF
      val extraLen = buf.getShort(c.toInt + 30) & 0xFFFF
      val commentLen = buf.getShort(c.toInt + 32) & 0xFFFF
      val localOff = buf.getInt(c.toInt + 42).toLong & 0xFFFFFFFFL
      val name = new String(bytes, c.toInt + 46, nameLen, "UTF-8")
      // cross-check the local header the central entry points at
      require(localOff + 30 <= bytes.length, s"local header of '$name' outside file")
      require(buf.getInt(localOff.toInt) == LocalSig, s"bad local signature for '$name'")
      val lNameLen = buf.getShort(localOff.toInt + 26) & 0xFFFF
      val lExtraLen = buf.getShort(localOff.toInt + 28) & 0xFFFF
      val dataOff = localOff + 30 + lNameLen + lExtraLen
      require(dataOff + usize <= bytes.length, s"payload of '$name' overruns file")
      val data = java.util.Arrays.copyOfRange(bytes, dataOff.toInt, (dataOff + usize).toInt)
      require(crc32(data) == crc,
        s"CRC mismatch on '$name': archive claims $crc, payload hashes ${crc32(data)}")
      c += 46 + nameLen + extraLen + commentLen
      ZipEntry(name, data, crc)
    }
  }
}
