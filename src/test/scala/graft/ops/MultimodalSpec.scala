package graft.ops

import graft.TestSpark
import graft.functions.MinHashAgg
import graft.sources.Formats
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("blob ingest keeps binary + typed metadata schema") {
    val blobs = Multimodal.withBlobs(spark, TestSpark.sf0001)
    val schema = blobs.schema
    assert(schema("blob").dataType.typeName == "binary")
    assert(schema("width").dataType.typeName == "integer")
    val first = blobs.orderBy("doc_id").head()
    assert(first.blob.nonEmpty && first.format == "fake/raw")
  }

  test("mapPartitions decode produces one feature row per blob") {
    val feats = Multimodal.e5BlobFeatures(spark, TestSpark.sf0001)
    val docs = graft.Tables.documents(spark, TestSpark.sf0001).count()
    assert(feats.count() == docs)
    val r = feats.head()
    assert(r.getAs[Double]("mean_pixel") > 0 && r.getAs[Double]("mean_pixel") < 1)
  }

  test("e5_image_neardup always pairs identical payloads, never crosses cells") {
    // identical blobs → identical band vectors → identical IVF cell →
    // guaranteed pair at rounded sim 1.0 (the recall floor of the index:
    // exact duplicates can never be missed); distinct fillers should not
    // pair with them at the 0.9999 threshold
    val dir = TestSpark.tmpDir("neardup")
    val mk = (0 until 30).map { i =>
      val text =
        if (i == 7 || i == 19) "alpha beta gamma delta epsilon zeta eta theta"
        else s"doc $i ${"xyz" * (i % 5 + 1)} filler ${(i * 37) % 91} tail${i}"
      (i.toLong, text, "en", s"src${i % 3}", text.length.toLong)
    }
    mk.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = Multimodal.e5ImageNeardup(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 7L && p._2 == 19L && p._3 == 1.0),
      s"identical payloads 7/19 not paired: ${pairs.toSeq}")
    // every reported pair clears the threshold
    pairs.foreach(p => assert(p._3 >= Multimodal.NeardupSimThreshold))
  }

  /** Synthesize a solid-color PNG in memory; gray in [0,255]. */
  private def pngBytes(w: Int, h: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("RealCodec decodes PNG bytes: mean pixel matches the painted gray") {
    val bytes = pngBytes(8, 4, 51) // 51/255 = 0.2 exactly
    val m = Multimodal.RealCodec.decode(bytes)
    assert(m.nBytes == bytes.length)
    assert(math.abs(m.meanPixel - 0.2) < 1e-9)
    // undecodable payloads fail fast, not silently
    assertThrows[IllegalArgumentException](
      Multimodal.RealCodec.decode(Array[Byte](1, 2, 3)))
  }

  /** Synthesize an in-memory 16-bit mono little-endian PCM WAV whose every
    * sample is `amp` (signed). */
  private def wavBytes(amp: Short, nFrames: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val pcm = new Array[Byte](nFrames * 2)
    var i = 0
    while (i < nFrames) {
      pcm(i * 2) = (amp & 0xff).toByte
      pcm(i * 2 + 1) = ((amp >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("RealAudioCodec decodes WAV bytes: mean amplitude matches the synthesized tone") {
    val half = wavBytes(16384, 64) // |16384|/32768 = 0.5 exactly
    val m = Multimodal.RealAudioCodec.decode(half)
    assert(m.nBytes == half.length)
    assert(math.abs(m.meanPixel - 0.5) < 1e-9)
    val silent = Multimodal.RealAudioCodec.decode(wavBytes(0, 32))
    assert(silent.meanPixel == 0.0)
    // undecodable payloads fail fast, not silently
    assertThrows[IllegalArgumentException](
      Multimodal.RealAudioCodec.decode(Array[Byte](9, 9, 9)))
  }

  test("RealAudioCodec runs end-to-end through the mapPartitions plumbing") {
    val blobs = Seq(
      Multimodal.BlobRow(1L, wavBytes(0, 16), 0, 0, "audio/wav"),
      Multimodal.BlobRow(2L, wavBytes(-16384, 32), 0, 0, "audio/wav"), // 0.5
      Multimodal.BlobRow(3L, wavBytes(8192, 8), 0, 0, "audio/wav"), // 0.25
    ).toDS().repartition(2)
    val feats = Multimodal.blobFeatures(blobs, Multimodal.RealAudioCodec)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_pixel"))
      .toMap
    assert(feats(1L) == 0.0)
    assert(math.abs(feats(2L) - 0.5) < 1e-9)
    assert(math.abs(feats(3L) - 0.25) < 1e-9)
  }

  test("RealCodec runs end-to-end through the mapPartitions plumbing") {
    val blobs = Seq(
      Multimodal.BlobRow(1L, pngBytes(8, 8, 0), 8, 8, "image/png"),
      Multimodal.BlobRow(2L, pngBytes(16, 4, 255), 16, 4, "image/png"),
      Multimodal.BlobRow(3L, pngBytes(4, 4, 102), 4, 4, "image/png"), // 0.4
    ).toDS().repartition(2)
    val feats = Multimodal.blobFeatures(blobs, Multimodal.RealCodec)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("mean_pixel"))
      .toMap
    assert(feats(1L) == 0.0)
    assert(feats(2L) == 1.0)
    assert(math.abs(feats(3L) - 0.4) < 1e-4)
  }

  test("MinHash Aggregator estimates Jaccard within tolerance") {
    val agg = new MinHashAgg(128).toColumn
    def shingles(text: String): Seq[String] = {
      val t = text.split(' '); t.sliding(3).map(_.mkString(" ")).toSeq
    }
    val a = "the quick brown fox jumps over the lazy dog and runs far away home"
    val b = "the quick brown fox jumps over the lazy dog and walks far away home"
    val sa = shingles(a).toDS().select(agg).as[Array[Long]].head()
    val sb = shingles(b).toDS().select(agg).as[Array[Long]].head()
    val setA = shingles(a).toSet
    val setB = shingles(b).toSet
    val trueJ = setA.intersect(setB).size.toDouble / setA.union(setB).size
    val estJ = MinHashAgg.estimateJaccard(sa, sb)
    assert(math.abs(trueJ - estJ) < 0.2, s"true=$trueJ est=$estJ")
    // identical inputs → identical signatures
    val sa2 = shingles(a).toDS().select(agg).as[Array[Long]].head()
    assert(sa.sameElements(sa2))
  }

  test("csv/json/orc roundtrip preserves schema and values") {
    val df = graft.Tables.orders(spark, TestSpark.sf0001)
      .select($"o_orderkey", $"o_totalprice", $"o_orderstatus", $"o_orderdate")
      .orderBy("o_orderkey").limit(100)
    val base = TestSpark.tmpDir("formats")
    Formats.writeCsv(df, s"$base/csv")
    Formats.writeJson(df, s"$base/json")
    Formats.writeOrc(df, s"$base/orc")
    val expected = df.collect().map(_.toSeq).toSeq
    val fromCsv = Formats.readCsv(spark, s"$base/csv", df.schema)
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val fromJson = Formats.readJson(spark, s"$base/json", df.schema)
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    val fromOrc = Formats.readOrc(spark, s"$base/orc")
      .orderBy("o_orderkey").collect().map(_.toSeq).toSeq
    assert(fromCsv == expected)
    assert(fromJson == expected)
    assert(fromOrc == expected)
  }

  test("e5_blob_dedup: duplicated blobs collapse to the min-id keeper with exact bytes_saved") {
    val dir = TestSpark.tmpDir("blobdedup")
    // 7=copy of 3, 9+10=copies of 5; 4 unique
    Seq((3L, "alpha beta gamma"), (4L, "delta"), (5L, "epsilon zeta"),
      (7L, "alpha beta gamma"), (9L, "epsilon zeta"), (10L, "epsilon zeta"))
      .map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.e5BlobDedup(spark, dir).collect()
      .map(r => r.getAs[Long]("keeper_doc_id") ->
        ((r.getAs[Long]("n_copies"), r.getAs[Long]("n_bytes"),
          r.getAs[Long]("bytes_saved")))).toMap
    assert(got == Map(
      3L -> ((2L, 16L, 16L)),   // one 16-byte copy dropped
      4L -> ((1L, 5L, 0L)),
      5L -> ((3L, 12L, 24L))))  // two 12-byte copies dropped
  }

  test("audio segments: window accounting and run bounds reconcile") {
    val rows = Multimodal.e5AudioSegments(spark, graft.TestSpark.sf0001)
      .collect()
    assert(rows.nonEmpty)
    var anySilent = false; var anySeg = false
    rows.foreach { r =>
      val (nw, ns, nseg, maxSeg) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      val voiced = nw - ns
      assert(ns >= 0 && ns <= nw)
      assert(nseg <= voiced, "more segments than voiced windows")
      assert(maxSeg <= voiced && (nseg == 0) == (maxSeg == 0))
      // the longest run plus one window for each OTHER segment must fit
      // in the voiced-window budget (every segment has >= 1 window)
      if (nseg > 0) assert(maxSeg + (nseg - 1) <= voiced,
        s"longest run $maxSeg + ${nseg - 1} other segments exceeds $voiced voiced windows")
      anySilent ||= ns > 0; anySeg ||= nseg > 0
    }
    assert(anySilent, "threshold should mark some windows silent")
    assert(anySeg, "threshold should leave some voiced segments")
  }
}
