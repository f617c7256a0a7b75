package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSessionTestWrapper
import java.nio.file.Files
import scala.util.Random

class IndexedFastaSpec extends AnyFunSuite with SparkSessionTestWrapper {

  val rng = new Random(29)
  def randomDna(n: Int): String = Array.fill(n)("ACGT"(rng.nextInt(4))).mkString

  /** Write a FASTA file with fixed line width and its .fai (offsets computed
    * independently of the reader under test). */
  def writeFasta(seqs: Seq[(String, String)], lineBases: Int): String = {
    val dir = Files.createTempDirectory("graft-fai")
    val fa = new StringBuilder
    val fai = new StringBuilder
    for ((name, seq) <- seqs) {
      fa.append('>').append(name).append('\n')
      val offset = fa.length
      for (chunk <- seq.grouped(lineBases)) fa.append(chunk).append('\n')
      fai.append(s"$name\t${seq.length}\t$offset\t$lineBases\t${lineBases + 1}\n")
    }
    val faPath = dir.resolve("test.fna")
    Files.writeString(faPath, fa.toString)
    Files.writeString(dir.resolve("test.fna.fai"), fai.toString)
    faPath.toString
  }

  test("V2 connector: short name loads, schema matches InputFragment, " +
      "splits bin-pack round-robin") {
    import spark.implicits._
    val seqs = Seq("c1" -> randomDna(1200), "c2" -> randomDna(800))
    val fa = writeFasta(seqs, lineBases = 60)
    val df = spark.read.format("indexed-fasta")
      .option("k", 35).option("maxFragment", 500).load(fa)
    assert(df.schema.fieldNames.toSeq ==
      Seq("header", "location", "nucleotides", "nucleotides2"))
    // typed round trip straight off the connector
    val frags = df.as[InputFragment].collect().sortBy(f => (f.header, f.location))
    assert(frags.length > 2)
    for (f <- frags) {
      val src = seqs.toMap.apply(f.header)
      assert(src.substring(f.location.toInt,
        f.location.toInt + f.nucleotides.length) == f.nucleotides)
    }
    // the scan reports itself with its pruned column set in the plan
    val pruned = df.select("header", "location")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scan.isDefined, "expected a BatchScanExec (DataSource V2 path)")
    assert(scan.get.scan.readSchema().fieldNames.toSeq == Seq("header", "location"))
  }

  test("V2 connector: column pruning skips the genome byte reads entirely") {
    import spark.implicits._
    // a .fai with NO backing fasta: metadata-only queries must still run —
    // proof the pruned reader never opens the genome file
    val dir = Files.createTempDirectory("graft-fai-only")
    val faPath = dir.resolve("ghost.fna")
    Files.writeString(dir.resolve("ghost.fna.fai"),
      "chrG\t5000\t6\t60\t61\n")
    val df = spark.read.format("indexed-fasta")
      .option("k", 35).option("maxFragment", 1000).load(faPath.toString)
    val got = df.select($"header", $"location").as[(String, Long)]
      .collect().sortBy(_._2)
    assert(got.length > 1 && got.forall(_._1 == "chrG"))
    // k-1 overlap in the PLANNED locations: each next fragment starts
    // maxFragment - (k-1) after the previous
    assert(got.map(_._2).sliding(2).forall { case Array(a, b) => b - a == 966 })
    // the same query WITH nucleotides must fail — the file truly is absent
    intercept[org.apache.spark.SparkException] {
      df.as[InputFragment].collect()
    }
  }

  test("ranged reads reconstruct sequences exactly (multi-line, multi-seq)") {
    val seqs = Seq("chr1" -> randomDna(3023), "chr2" -> randomDna(517),
      "chr3" -> randomDna(70))
    val fa = writeFasta(seqs, lineBases = 70)
    // large maxFragment: one fragment per sequence
    val frags = IndexedFasta.fragments(spark, fa, k = 35, maxFragment = 10000)
      .collect().map(f => f.header -> f.nucleotides).toMap
    assert(frags == seqs.toMap)
  }

  test("bounded fragments overlap by k-1 and cover every k-mer exactly once") {
    val k = 35
    val seq = randomDna(2600)
    val fa = writeFasta(Seq("big" -> seq), lineBases = 60)
    val frags = IndexedFasta.fragments(spark, fa, k = k, maxFragment = 500)
      .collect().sortBy(_.location)
    assert(frags.length > 1)
    // fragment content matches the source at its location
    for (f <- frags)
      assert(seq.substring(f.location.toInt,
        f.location.toInt + f.nucleotides.length) == f.nucleotides)
    // k-mer multiset equals the unsplit k-mer multiset
    def kmers(s: String): Seq[String] = (0 to s.length - k).map(i => s.substring(i, i + k))
    val fromFrags = frags.flatMap(f => kmers(f.nucleotides)).sorted.toSeq
    assert(fromFrags == kmers(seq).sorted)
  }

  test("odd line widths and fragment boundaries inside lines") {
    val seq = randomDna(997)
    val fa = writeFasta(Seq("odd" -> seq), lineBases = 13)
    val frags = IndexedFasta.fragments(spark, fa, k = 10, maxFragment = 100)
      .collect().sortBy(_.location)
    for (f <- frags)
      assert(seq.substring(f.location.toInt,
        f.location.toInt + f.nucleotides.length) == f.nucleotides)
    // union of [start, start+len) covers [0, 997)
    val covered = frags.map(f => (f.location, f.location + f.nucleotides.length))
    assert(covered.head._1 == 0 && covered.last._2 == 997)
    for (w <- covered.sliding(2) if covered.size > 1)
      assert(w(1)._1 <= w(0)._2) // overlap, no gap
  }
}

class MultimodalSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import graft.functions.Multimodal

  val rng = new Random(31)

  def fakeMedia(n: Int): Seq[(Long, Array[Byte])] = (0 until n).map { i =>
    val body = Array.fill(200 + i * 37)((rng.nextInt(256) - 128).toByte)
    // give some rows real magic bytes
    val withMagic = i % 3 match {
      case 0 => Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47) ++ body
      case 1 => Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte) ++ body
      case _ => body
    }
    (i.toLong, withMagic)
  }

  test("format sniffing reads magic bytes") {
    assert(Multimodal.sniffFormat(Array(0x89.toByte, 0x50, 0x4e, 0x47, 0, 0)) == "png")
    assert(Multimodal.sniffFormat(Array(0xff.toByte, 0xd8.toByte, 0xff.toByte, 1)) == "jpeg")
    assert(Multimodal.sniffFormat("RIFFxxxx".getBytes) == "riff")
    assert(Multimodal.sniffFormat("RIFFxxxxWAVEfmt ".getBytes) == "wav")
    assert(Multimodal.sniffFormat("FORMxxxxAIFF".getBytes) == "aiff")
    assert(Multimodal.sniffFormat(Array[Byte](0, 0, 0, 0x18, 'f', 't', 'y', 'p', 'm', 'p', '4', '2')) == "mp4")
    assert(Multimodal.sniffFormat(Array[Byte](1, 2, 3)) == "unknown")
  }

  /** A real WAV: 16-bit mono PCM through javax.sound.sampled. */
  def realWav(samples: Array[Float], sampleRate: Float = 8000f): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, sampleRate,
      16, 1, 2, sampleRate, false)
    val raw = new Array[Byte](2 * samples.length)
    for (i <- samples.indices) {
      val s = math.max(-32768, math.min(32767, (samples(i) * 32767).round))
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val in = new AudioInputStream(
      new java.io.ByteArrayInputStream(raw), fmt, samples.length)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(in, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("real WAV decode: header info, samples, RMS energy envelope") {
    // first half silence, second half a full-scale 440 Hz sine
    val n = 8000
    val samples = Array.tabulate(n)(i =>
      if (i < n / 2) 0f
      else math.sin(2 * math.Pi * 440 * i / 8000).toFloat)
    val wav = realWav(samples)
    assert(Multimodal.sniffFormat(wav) == "wav")

    val (rate, decoded) = Multimodal.AudioCodecs.decode(wav).get
    assert(rate == 8000f && decoded.length == n)
    assert(math.abs(decoded(n / 4)) < 1e-3) // silent half round-trips
    // envelope: silent windows ~0, sine windows ~1/sqrt(2)
    val env = Multimodal.AudioCodecs.features(wav, dim = 8).get
    assert(env.length == 8)
    for (w <- 0 until 4) assert(env(w) < 0.01f, s"window $w")
    for (w <- 4 until 8) assert(math.abs(env(w) - 0.7071f) < 0.02f, s"window $w")

    val info = Multimodal.AudioCodecs.info(wav).get
    assert(info == ((8000f, 1, n.toLong)))
  }

  test("audio round-trip: random PCM survives WAV encode/decode within quantization") {
    val rng = new scala.util.Random(97)
    for (_ <- 0 until 5) {
      val samples = Array.fill(1000)((rng.nextFloat() * 2 - 1) * 0.99f)
      val (rate, back) = Multimodal.AudioCodecs.decode(realWav(samples)).get
      assert(rate == 8000f && back.length == samples.length)
      // 16-bit quantization: max error 1/32768 plus rounding
      for (i <- samples.indices)
        assert(math.abs(back(i) - samples(i)) < 1.5f / 32768f,
          s"sample $i: ${samples(i)} -> ${back(i)}")
    }
  }

  test("audio dispatch: describeAudio metadata and withFeatures envelopes") {
    import spark.implicits._
    val wav = realWav(Array.fill(4000)(0.5f))
    val junk = Array.tabulate[Byte](100)(_.toByte)
    val df = spark.createDataset(Seq((1L, wav), (2L, junk))).toDF("id", "data")

    val desc = Multimodal.describeAudio(df, "id", "data").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(desc(1L).getString(1) == "wav")
    assert(desc(1L).getDouble(3) == 8000.0 && desc(1L).getInt(4) == 1)
    assert(math.abs(desc(1L).getDouble(6) - 0.5) < 1e-9) // 4000 frames @ 8 kHz
    assert(desc(2L).isNullAt(3) && desc(2L).isNullAt(6)) // schema-stable nulls

    // withFeatures routes wav rows through the real audio kernel
    val feats = Multimodal.withFeatures(df, "id", "data", dim = 4).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).forall(v => math.abs(v - 0.5f) < 0.01f))
    assert(feats(2L) == Multimodal.StubCodecs.extractFeatures(junk, 4).toSeq)
  }

  test("describe: schema + deterministic metadata over binary columns") {
    import spark.implicits._
    val df = spark.createDataset(fakeMedia(9)).toDF("id", "data")
    val desc = Multimodal.describe(df, "id", "data").collect()
    assert(desc.length == 9)
    val byId = desc.map(r => r.getLong(0) -> r).toMap
    assert(byId(0L).getString(2) == "png" && byId(1L).getString(2) == "jpeg")
    // deterministic: same input -> same dims
    val again = Multimodal.describe(df, "id", "data").collect()
      .map(r => r.getLong(0) -> (r.getInt(4), r.getInt(5))).toMap
    assert(desc.map(r => r.getLong(0) -> (r.getInt(4), r.getInt(5))).toMap == again)
  }

  test("feature extraction: fixed dim, size-balanced partitioning") {
    import spark.implicits._
    val df = spark.createDataset(fakeMedia(20)).toDF("id", "data")
    val feats = Multimodal.withFeatures(df, "id", "data", dim = 16,
      sizePartitions = 4).collect()
    assert(feats.length == 20)
    for (r <- feats) assert(r.getSeq[Float](1).length == 16)
  }

  /** A real PNG: width x height gradient, encoded through javax.imageio. */
  def realPng(width: Int, height: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until height; x <- 0 until width)
      img.setRGB(x, y, ((x * 255 / math.max(1, width - 1)) << 16) |
        ((y * 255 / math.max(1, height - 1)) << 8))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG decode: true dimensions, grid features, resize roundtrip") {
    import spark.implicits._
    val png = realPng(40, 24)
    assert(Multimodal.sniffFormat(png) == "png")
    // describe reports the TRUE pixel dimensions via javax.imageio
    val df = spark.createDataset(Seq((7L, png))).toDF("id", "data")
    val desc = Multimodal.describe(df, "id", "data").collect().head
    assert(desc.getInt(4) == 40 && desc.getInt(5) == 24)
    // grid features: 16 floats in [0,1]; left-to-right red gradient means
    // rightmost column cells are brighter than leftmost
    val f = Multimodal.ImageCodecs.features(png, 4, 4).get
    assert(f.length == 16 && f.forall(v => v >= 0f && v <= 1f))
    assert(f(3) > f(0))
    // withFeatures dispatches images to the real codec (deterministic)
    val feats = Multimodal.withFeatures(df, "id", "data", dim = 16).collect().head
    assert(feats.getSeq[Float](1) == f.toSeq)
    // resize re-encodes a decodable PNG at the target size
    val small = Multimodal.ImageCodecs.resize(png, 10, 6).get
    assert(Multimodal.ImageCodecs.dims(small).contains((10, 6)))
  }

  test("non-square feature dim keeps every position a real grid cell") {
    import spark.implicits._
    val png = realPng(32, 32) // gradient: no region is pure black
    val df = spark.createDataset(Seq((1L, png))).toDF("id", "data")
    val f = Multimodal.withFeatures(df, "id", "data", dim = 8)
      .collect().head.getSeq[Float](1)
    assert(f.length == 8)
    // gridW=3, gridH=3 -> 9 real cells truncated to 8; a zero tail would
    // mean padding (the gradient image has no fully-black cells)
    assert(f.count(_ > 0f) == 8)
  }

  test("BMP sniffs as an image and decodes through imageio") {
    val img = new java.awt.image.BufferedImage(10, 6,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(5, 3, 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val bmp = bos.toByteArray
    assert(Multimodal.sniffFormat(bmp) == "bmp")
    assert(Multimodal.ImageCodecs.dims(bmp).contains((10, 6)))
  }

  test("undecodable bytes with an image magic fall back to the stub") {
    val junk = Array[Byte](0x89.toByte, 0x50, 0x4e, 0x47) ++
      Array.fill(64)(7.toByte)
    assert(Multimodal.ImageCodecs.dims(junk).isEmpty)
    import spark.implicits._
    val df = spark.createDataset(Seq((1L, junk))).toDF("id", "data")
    val desc = Multimodal.describe(df, "id", "data").collect().head
    assert(desc.getInt(4) > 0 && desc.getInt(5) > 0) // stub dims, no crash
  }

  test("resize stub decimates deterministically, preserves small inputs") {
    val big = Array.tabulate[Byte](1000)(_.toByte)
    val small = Array.tabulate[Byte](50)(_.toByte)
    val r1 = Multimodal.StubCodecs.resize(big, 100)
    assert(r1.length == 100)
    assert(r1.toSeq == Multimodal.StubCodecs.resize(big, 100).toSeq) // deterministic
    assert(Multimodal.StubCodecs.resize(small, 100).toSeq == small.toSeq)
  }

  test("frame sampling yields every-nth bounded chunks") {
    import spark.implicits._
    val media = Seq((1L, Array.tabulate[Byte](1000)(_.toByte)))
    val df = spark.createDataset(media).toDF("id", "data")
    val frames = Multimodal.sampleFrames(df, "id", "data",
      frameBytes = 100, everyNth = 2).collect()
    assert(frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 2, 4, 6, 8))
    assert(frames.forall(_.getAs[Array[Byte]](2).length == 100))
  }
}
