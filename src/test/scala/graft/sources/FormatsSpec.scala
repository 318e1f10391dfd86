package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkTestSession, Tables}

/** Round-trips through every supported format preserve values. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def orders = Tables.orders(spark, sf)

  test("CSV round-trip preserves orders") {
    val dir = Files.createTempDirectory("graft-csv").toString
    Formats.writeCsv(orders, dir)
    val back = Formats.readCsv(spark, dir, orders.schema)
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }

  test("fixed-width round-trip preserves documents incl. edge texts; overflow fails loudly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain text", "en", "src1", 10L),
      (2L, "  leading and trailing  ", "de", "src2", 24L),  // tail field keeps spaces
      (3L, "", "fr", "src3", 0L),                           // empty text
      (4L, "ends with pad-char   ", "zh", "src4", 21L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-fw").toString
    SourceQueries.writeFixedWidth(docs, dir)
    val back = SourceQueries.readFixedWidth(spark, dir)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // a value wider than its declared column must fail, never truncate
    val wide = Seq((5L, "t", "en", "a-source-name-longer-than-sixteen", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir2 = Files.createTempDirectory("graft-fw2").toString
    val ex = intercept[Exception] { SourceQueries.writeFixedWidth(wide, dir2) }
    val msgs = Iterator.iterate[Throwable](ex)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("|")
    assert(msgs.contains("overflow"), msgs.take(500))
  }

  test("SequenceFile round-trip preserves documents; record compression is real zlib") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain text", "en", "src1", 10L),
      (2L, "tabs\tand\nnewlines", "de", "src2", 17L),
      (3L, "", "fr", "src3", 0L), // empty text
      (4L, "unicode: café 中文", "zh", "src4", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val want = docs.select(lit("x").as("layout"), col("doc_id"), col("text"),
      col("lang"), col("source"), col("n_chars"))
    for (compress <- Seq(false, true)) {
      val dir = Files.createTempDirectory(s"graft-seq-$compress").toString
      SourceQueries.writeSeq(compress)(docs, dir)
      val back = SourceQueries.readSeq(spark, dir, "x")
      assert(back.exceptAll(want).isEmpty && want.exceptAll(back).isEmpty,
        s"compress=$compress")
      // prove the on-disk layout, not just the read-back: header says
      // RECORD-compressed DefaultCodec (pure-java zlib) when asked,
      // uncompressed otherwise — and never BLOCK
      val part = new java.io.File(s"$dir/data").listFiles()
        .filter(_.getName.startsWith("part-")).head
      val conf = spark.sparkContext.hadoopConfiguration
      val reader = new org.apache.hadoop.io.SequenceFile.Reader(conf,
        org.apache.hadoop.io.SequenceFile.Reader.file(
          new org.apache.hadoop.fs.Path(part.getAbsolutePath)))
      try {
        assert(reader.isCompressed === compress)
        assert(!reader.isBlockCompressed)
        if (compress)
          assert(reader.getCompressionCodec.getClass.getSimpleName === "DefaultCodec")
        assert(reader.getKeyClassName.endsWith("Text")
          && reader.getValueClassName.endsWith("Text"))
      } finally reader.close()
    }
  }

  test("XML round-trip preserves documents incl. entities, quotes, and newlines") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain text", "en", "src1", 10L),
      (2L, "a & b < c > \"d\"", "de", "src2", 15L),      // every XML metachar
      (3L, "line one\nline two", "fr", "src3", 17L),     // embedded newline
      (4L, "already &amp; &#10; escaped-looking", "zh", "src4", 35L), // literal entities
      (5L, "", "en", "src5", 0L))                        // empty text
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-xml").toString
    SourceQueries.writeXml(docs, dir)
    val back = SourceQueries.readXml(spark, dir)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // the staged form really is one element per line (splittable)
    val lines = spark.read.text(dir).collect().map(_.getString(0))
    assert(lines.length === 5 &&
      lines.forall(l => l.startsWith("<doc ") && l.endsWith("/>")))
  }

  test("JSON-array round-trip preserves documents; each file is valid JSON") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain", "en", "src1", 5L),
      (2L, "quotes \" and \\ backslash", "de", "src2", 24L),
      (3L, "newline\nhere", "fr", "src3", 12L))
      .toDF("doc_id", "text", "lang", "source", "n_chars").repartition(2)
    val dir = Files.createTempDirectory("graft-jsonarr").toString
    SourceQueries.writeJsonArray(docs, dir)
    val back = spark.read.option("multiLine", "true")
      .schema(SourceQueries.docSchema).json(dir)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // every staged part file parses standalone as a JSON array
    import java.nio.file.{Files => JF, Paths}
    import scala.jdk.CollectionConverters._
    JF.list(Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-")).foreach { p =>
        val s = new String(JF.readAllBytes(p), "UTF-8").trim
        assert(s.startsWith("[") && s.endsWith("]"), s"$p not array-framed")
      }
  }

  test("PERMISSIVE CSV ingestion corrupt-marks planted bad rows, keeps good ones whole") {
    val out = SourceQueries.csvCorruptStats(spark, sf).collect()(0)
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val bad = docs.count(_._1 % 97 == 0)
    assert(out.getLong(0) === docs.length.toLong, "no row vanishes")
    assert(out.getLong(2) === bad.toLong, "every planted row is corrupt-marked")
    assert(out.getLong(1) === (docs.length - bad).toLong)
    assert(out.getLong(3) === docs.filter(_._1 % 97 != 0).map(_._1).sum)
    assert(out.getLong(4) === docs.filter(_._1 % 97 != 0).map(_._2).sum)
  }

  test("ZIP round-trip preserves entries; tampered payloads and truncation fail loudly") {
    val entries = Seq(
      ("doc_1.txt", "hello world".getBytes("UTF-8")),
      ("doc_2.txt", Array.empty[Byte]),
      ("nested/doc_3.txt", Array.tabulate[Byte](5000)(i => (i * 31).toByte)))
    val zip = ZipCodec.encode(entries)
    val back = ZipCodec.decode(zip)
    assert(back.map(_.name) === entries.map(_._1))
    back.zip(entries).foreach { case (got, (_, want)) =>
      assert(java.util.Arrays.equals(got.data, want))
    }
    // a flipped payload byte must trip the CRC check (offset 30+name
    // of the first local header = inside "hello world")
    val tampered = zip.clone()
    tampered(30 + "doc_1.txt".length + 2) = 'X'.toByte
    intercept[IllegalArgumentException] { ZipCodec.decode(tampered) }
    // truncating the tail removes the EOCD entirely
    intercept[IllegalArgumentException] { ZipCodec.decode(zip.dropRight(30)) }
    // a comment AFTER the EOCD must not hide it
    assert(ZipCodec.decode(zip ++ "trailing comment".getBytes).map(_.name) ===
      entries.map(_._1))
  }

  test("bzip2 splits a single compressed file across tasks; gzip cannot (the stance, proven)") {
    // One physical file each, same JSONL content, read under a small
    // split size: gzip's stream has no entry points, so Spark must
    // give the whole file to one task; bzip2's block magic lets
    // TextInputFormat start mid-file. This is the mechanical basis
    // for the src_jsonl_gz / src_jsonl_bz2 declaration-site stances.
    // sf0.1 (5000 docs): the single bz2 member must exceed the split
    // size below by a wide margin — tiny sf0.001 compresses under one
    // bzip2 block and would trivially be one split anyway
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val base = java.nio.file.Files.createTempDirectory("graft-split").toString
    Formats.writeJsonlGz(docs.coalesce(1), s"$base/gz")
    Formats.writeJsonlBz2(docs.coalesce(1), s"$base/bz2")
    val restore = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", (32 * 1024).toString)
      val gz = Formats.readJsonl(spark, s"$base/gz", SourceQueries.docSchema)
      val bz = Formats.readJsonl(spark, s"$base/bz2", SourceQueries.docSchema)
      val nDocs = docs.count()
      assert(gz.count() === nDocs && bz.count() === nDocs)
      val gzParts = gz.rdd.getNumPartitions
      val bzParts = bz.rdd.getNumPartitions
      info(s"gzip partitions: $gzParts, bzip2 partitions: $bzParts")
      assert(gzParts === 1, s"gzip must be one split, got $gzParts")
      assert(bzParts > 1, s"bzip2 should split under a 64 KiB split size, got $bzParts")
    } finally restore match {
      case Some(v) => spark.conf.set("spark.sql.files.maxPartitionBytes", v)
      case None => spark.conf.unset("spark.sql.files.maxPartitionBytes")
    }
  }

  test("ZIP encode fails loudly past the 16-bit EOCD entry count (no silent mod-65536 wrap)") {
    val tooMany = (0 to 0xFFFF).map(i => (s"d$i", Array.empty[Byte]))
    val e = intercept[IllegalArgumentException] { ZipCodec.encode(tooMany) }
    assert(e.getMessage.contains("16-bit"))
    // exactly 65535 is legal and round-trips with the full count intact
    val atCap = (1 to 0xFFFF).map(i => (s"d$i", Array.empty[Byte]))
    assert(ZipCodec.decode(ZipCodec.encode(atCap)).size === 0xFFFF)
  }

  test("tar streaming decode yields entries lazily and trips on truncation mid-stream") {
    val entries = Seq(
      ("a.txt", "alpha".getBytes("UTF-8")),
      ("b.txt", Array.tabulate[Byte](1000)(_.toByte)))
    val tar = TarCodec.encode(entries)
    val it = TarCodec.decodeStream(new java.io.ByteArrayInputStream(tar))
    assert(it.next().name === "a.txt")
    assert(java.util.Arrays.equals(it.next().data, entries(1)._2))
    assert(!it.hasNext)
    // cut the stream inside the second payload: the error surfaces at
    // the pull that needs those bytes, not before (head-first contract)
    val cut = TarCodec.decodeStream(
      new java.io.ByteArrayInputStream(tar.take(512 + 512 + 512 + 100)))
    assert(cut.next().name === "a.txt")
    intercept[IllegalArgumentException] { cut.next() }
  }

  test("src_zip fingerprint equals the raw-table arithmetic") {
    val out = SourceQueries.zipDocStats(spark, sf).collect()(0)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.getLong(0) === docs.length.toLong)
    assert(out.getLong(1) === docs.map(_._1).sum)
    assert(out.getLong(2) === docs.map(_._2.getBytes("UTF-8").length.toLong).sum)
    assert(out.getLong(3) === docs.map(_._2.length.toLong).sum)
  }

  test("tar round-trip preserves entries; checksum damage and bad magic fail loudly") {
    val entries = Seq(
      ("doc_1.txt", "hello tar".getBytes("UTF-8")),
      ("doc_2.txt", Array.empty[Byte]),
      ("doc_3.txt", Array.tabulate[Byte](513)(i => (i * 13).toByte))) // crosses a block
    val tar = TarCodec.encode(entries)
    assert(tar.length % 512 === 0)
    val back = TarCodec.decode(tar)
    assert(back.map(_.name) === entries.map(_._1))
    back.zip(entries).foreach { case (got, (_, want)) =>
      assert(java.util.Arrays.equals(got.data, want))
    }
    // flip a byte inside the first NAME field: the checksum must trip
    val tampered = tar.clone(); tampered(2) = 'X'.toByte
    intercept[IllegalArgumentException] { TarCodec.decode(tampered) }
    val badMagic = tar.clone(); badMagic(257) = 'V'.toByte
    intercept[IllegalArgumentException] { TarCodec.decode(badMagic) }
  }

  test("src_tar fingerprint equals the raw-table arithmetic") {
    val out = SourceQueries.tarDocStats(spark, sf).collect()(0)
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.getLong(0) === docs.length.toLong)
    assert(out.getLong(1) === docs.map(_._1).sum)
    assert(out.getLong(2) === docs.map(_._2.getBytes("UTF-8").length.toLong).sum)
  }

  test("JSONL round-trip preserves orders") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    Formats.writeJsonl(orders, dir)
    val back = Formats.readJsonl(spark, dir, orders.schema)
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }

  test("ORC round-trip preserves orders") {
    val dir = Files.createTempDirectory("graft-orc").toString
    Formats.writeOrc(orders, dir)
    val back = Formats.readOrc(spark, dir)
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }

  test("WARC round-trip preserves documents, incl. a payload containing record framing") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-warc").toString
    // adversarial payload: contains the WARC magic AND the CRLFCRLF
    // frame closer — Content-Length framing must carry it untouched
    val evil = "x\r\n\r\nWARC/1.0\r\nWARC-Type: resource\r\n\r\nend"
    val docs = Tables.documents(spark, sf)
      .union(Seq((999999L, evil, "xx", "crafted", evil.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    WarcFormat.writeWarc(docs, s"$dir/data")
    val back = WarcFormat.readWarc(spark, s"$dir/data")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
  }

  test("WARC parser fails loudly on alien and truncated bytes") {
    intercept[IllegalArgumentException](
      WarcFormat.parseRecords("HTTP/1.1 200 OK\r\n\r\n".getBytes).toList)
    val dir = Files.createTempDirectory("graft-warc2").toString
    WarcFormat.writeWarc(Tables.documents(spark, sf).limit(3), s"$dir/data")
    val f = new java.io.File(s"$dir/data").listFiles()
      .filter(_.getName.endsWith(".warc")).minBy(_.getName)
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    intercept[Exception](
      WarcFormat.parseRecords(bytes.dropRight(6)).toList) // broken framing
  }

  test(".warc.gz round-trips and each gzip member is an independent entry point") {
    val dir = Files.createTempDirectory("graft-warcgz").toString
    val docs = Tables.documents(spark, sf)
    WarcFormat.writeWarcGz(docs, s"$dir/data")
    val back = WarcFormat.readWarcGz(spark, s"$dir/data")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // the property the layout exists for: ONE member decodes alone —
    // a reader given any member offset needs nothing before it
    val one = WarcFormat.gzipMember(
      WarcFormat.resourceRecord(7L, "solo body", "en", "crafted", 9L))
    val rows = WarcFormat.parseRecords(WarcFormat.gunzipAll(one)).toList
    assert(rows.size === 1 && rows.head.getLong(0) === 7L
      && rows.head.getString(1) === "solo body")
  }

  test("Avro round-trip preserves documents (container files via avro-mapred)") {
    val dir = Files.createTempDirectory("graft-avro").toString
    val docs = Tables.documents(spark, sf)
    AvroFormat.writeAvro(docs, s"$dir/data")
    val back = AvroFormat.readAvro(spark, s"$dir/data", docs.schema)
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // one container file per input partition, written executor-side
    assert(new java.io.File(s"$dir/data").listFiles().exists(_.getName.endsWith(".avro")))
  }

  test("Avro round-trip preserves nulls, unicode, binary, and every primitive type") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-avro-edge").toString
    val df = Seq(
      (1L, Option("héllo 世界\n tab\t end"), Option(1.5), Option(true),
        Option("ab".getBytes("UTF-8"))),
      (2L, None, None, None, None),
      (3L, Option(""), Option(-0.0), Option(false), Option(Array.emptyByteArray)))
      .toDF("id", "s", "d", "b", "bin")
    AvroFormat.writeAvro(df, s"$dir/data")
    val back = AvroFormat.readAvro(spark, s"$dir/data", df.schema)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // empty string and null are DISTINCT after the round trip (the
    // union-typed schema exists for exactly this)
    val byId = back.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(2L).isNullAt(1) && !byId(3L).isNullAt(1))
  }

  test("Avro round-trip preserves 500 seeded-random rows across all primitive types") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    // deterministic generator (fixed seed): wide value coverage —
    // extreme longs/doubles (incl. -0.0 and subnormals), control and
    // multi-byte chars, empty/null everything — without flaky inputs
    val rnd = new scala.util.Random(0xA5E0)
    def maybeNull[A](v: => A): Any = if (rnd.nextInt(5) == 0) null else v
    val rows = (1 to 500).map { i =>
      Row(
        i.toLong,
        maybeNull(rnd.nextLong()),
        maybeNull(rnd.nextInt()),
        maybeNull(rnd.nextInt(4) match {
          case 0 => rnd.nextDouble() * math.pow(10, rnd.nextInt(300) - 150)
          case 1 => -0.0
          case 2 => java.lang.Double.MIN_VALUE
          case _ => rnd.nextDouble()
        }),
        maybeNull(rnd.nextFloat()),
        maybeNull(new String(Array.fill(rnd.nextInt(40))(
          (rnd.nextInt(0xD7FF) + 1).toChar))),
        maybeNull(rnd.nextBoolean()),
        maybeNull(Array.fill(rnd.nextInt(20))(rnd.nextInt().toByte)))
    }
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("l", LongType), StructField("i", IntegerType),
      StructField("d", DoubleType), StructField("f", FloatType),
      StructField("s", StringType), StructField("b", BooleanType),
      StructField("bin", BinaryType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), schema)
    val dir = Files.createTempDirectory("graft-avro-rand").toString
    AvroFormat.writeAvro(df, s"$dir/data")
    val back = AvroFormat.readAvro(spark, s"$dir/data", schema)
    assert(back.count() === 500)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("zstd parquet round-trip preserves lineitem") {
    val dir = Files.createTempDirectory("graft-zstd").toString
    val li = graft.Tables.lineitem(spark, sf)
    Formats.writeParquet(li, dir, "zstd")
    val back = spark.read.parquet(dir)
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("text round-trip preserves document texts") {
    val dir = Files.createTempDirectory("graft-text").toString
    val texts = Tables.documents(spark, sf).select(col("text"))
    Formats.writeText(texts, dir)
    val back = Formats.readText(spark, dir).withColumnRenamed("value", "text")
    assert(back.exceptAll(texts).isEmpty && texts.exceptAll(back).isEmpty)
  }
}
