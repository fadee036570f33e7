package graft

import org.apache.spark.sql.functions._

import graft.ops.Multimodal
import graft.sources.Tables

class MultimodalSpec extends SparkTestBase {

  private def blobs = Multimodal.asBlobTable(Tables.documents(spark, sfDir))

  test("blobMetadata: byte lengths and checksums match source text") {
    val meta = Multimodal.blobMetadata(blobs)
    val src = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long").as("src_len"),
        md5(col("text")).as("src_md5"))
    val joined = meta.join(src, "doc_id").cache()
    // ASCII corpus: byte length == char length; md5(bytes) == md5(text)
    assert(joined.filter(col("byte_len") =!= col("src_len")).count() === 0)
    assert(joined.filter(col("checksum") =!= col("src_md5")).count() === 0)
    assert(joined.filter(col("width") < 64 || col("height") < 48).count() === 0)
  }

  test("metadata-only plan prunes unused document columns from the scan") {
    val plan = Multimodal.blobMetadata(blobs).queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("lang"), "lang column must be pruned from the parquet scan")
  }

  test("sampleFrames: n frames per blob, bounded frame size, in-range slices") {
    val frames = Multimodal.sampleFrames(blobs, n = 4, frameSize = 16).cache()
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"))
    assert(perDoc.filter(col("n") =!= 4).count() === 0)
    assert(frames.filter(length(col("frame_bytes")) > 16).count() === 0)
    assert(frames.filter(length(col("frame_bytes")) === 0).count() === 0)
  }

  test("downsampleBytes: every stride-th byte, exact output length") {
    val out = Multimodal.downsampleBytes(blobs, stride = 4).cache()
    assert(out.filter(col("ds_len") =!= ceil(col("byte_len") / lit(4.0)).cast("long")).count() === 0)
    // spot-check content against a driver-side reference
    val row = out.join(Tables.documents(spark, sfDir).select("doc_id", "text"), "doc_id")
      .orderBy("doc_id").limit(1).collect()(0)
    val text = row.getAs[String]("text").getBytes("UTF-8")
    val expected = text.indices.collect { case i if i % 4 == 0 => text(i) }.toArray
    assert(row.getAs[Array[Byte]]("ds_bytes").toSeq === expected.toSeq)
  }

  test("synthesizePng emits real PNGs; decodePng round-trips the generating formula") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val png = Multimodal.synthesizePng(docs).cache()
    // real PNG payloads: magic bytes \x89PNG
    val magic = png.select(col("doc_id"), hex(substring(col("bytes"), 1, 4)).as("m"))
    assert(magic.filter(col("m") =!= "89504E47").count() === 0)
    val out = Multimodal.decodePng(png).cache()
    assert(out.schema === Multimodal.decodedPngSchema)
    assert(out.count() === docs.count())
    // driver-side replay of the generating formula for a handful of docs
    out.orderBy("doc_id").limit(5).collect().foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((id % 16 + 8).toInt, (id % 12 + 8).toInt)
      val pix = for (y <- 0 until h; x <- 0 until w)
        yield ((id * 31 + x * 7 + y * 13 + (id % 9 + 1) * x * y) % 256).toInt
      assert(r.getLong(1) === w.toLong && r.getLong(2) === h.toLong)
      assert(r.getDouble(3) === pix.map(_.toLong).sum.toDouble / pix.size,
        s"mean pixel mismatch for doc $id — PNG round trip must be lossless")
      assert(r.getLong(4) === pix.min.toLong && r.getLong(5) === pix.max.toLong)
    }
  }

  test("synthesizeWav emits real WAVs; decodeWav round-trips the generating formula") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val wav = Multimodal.synthesizeWav(docs).cache()
    // real RIFF/WAVE containers: magic bytes "RIFF" then "WAVE" at offset 8
    val magic = wav.select(col("doc_id"),
      hex(substring(col("bytes"), 1, 4)).as("riff"),
      hex(substring(col("bytes"), 9, 4)).as("wave"))
    assert(magic.filter(col("riff") =!= "52494646" || col("wave") =!= "57415645")
      .count() === 0)
    val out = Multimodal.decodeWav(wav).cache()
    assert(out.schema === Multimodal.decodedWavSchema)
    assert(out.count() === docs.count())
    // driver-side replay of the generating formula for a handful of docs
    out.orderBy("doc_id").limit(5).collect().foreach { r =>
      val id = r.getLong(0)
      val n = (id % 400 + 100).toInt
      val smp = (0 until n).map(i =>
        ((id * 37 + i.toLong * i * 17 + (id % 13 + 1) * i) % 65536 - 32768).toInt)
      assert(r.getLong(1) === n.toLong && r.getLong(2) === 8000L)
      assert(r.getDouble(3) === smp.map(_.toLong).sum.toDouble / n,
        s"mean sample mismatch for doc $id — PCM round trip must be lossless")
      assert(r.getLong(4) === smp.min.toLong && r.getLong(5) === smp.max.toLong)
    }
  }

  test("dHash matches a driver replay of the sampled-pixel formula") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val codes = Multimodal.dHash(Multimodal.synthesizePng(docs))
    codes.orderBy("doc_id").limit(10).collect().foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (id % 16 + 8, id % 12 + 8)
      def v(x: Long, y: Long) = (id * 31 + x * 7 + y * 13 + (id % 9 + 1) * x * y) % 256
      var expected = 0L
      for (gy <- 0 until 8; gx <- 0 until 7) {
        val sy = gy * h / 8
        if (v((gx + 1) * w / 8, sy) > v(gx * w / 8, sy))
          expected |= 1L << (gy * 7 + gx)
      }
      assert(r.getLong(1) === expected, s"dHash mismatch for doc $id")
    }
  }

  test("pHashPairs mines crafted near-identical images, not distinct ones") {
    // three hand-built 16×16 grayscale PNGs: B is A with ONE pixel nudged
    // (perceptually identical), C is an unrelated checkerboard
    def pngOf(f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 16; x <- 0 until 16)
        img.getRaster.setSample(x, y, 0, f(x, y) & 0xFF)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val a = pngOf((x, y) => x * 13 + y * 29)
    val b = pngOf((x, y) => if (x == 5 && y == 5) 0 else x * 13 + y * 29)
    val c = pngOf((x, y) => if ((x + y) % 2 == 0) 255 else 0)
    import spark.implicits._
    val blobs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "bytes")
    val pairs = Multimodal.pHashPairs(blobs).collect()
    // the near-identical pair is found (one nudged pixel flips ≤3 of the
    // 56 comparisons), and the checkerboard pairs with neither
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(1) == 3L || r.getLong(0) == 3L))
  }

  test("aHash matches a driver replay; near-identical clips pair, unrelated don't") {
    val docs = Tables.documents(spark, sfDir).limit(50)
    val codes = Multimodal.aHash(Multimodal.synthesizeWav(docs))
    codes.orderBy("doc_id").limit(10).collect().foreach { r =>
      val id = r.getLong(0)
      val n = (id % 400 + 100).toInt
      val sums = new Array[Long](33); val cnts = new Array[Long](33)
      for (i <- 0 until n) {
        val v = ((id * 37 + i.toLong * i * 17 + (id % 13 + 1) * i) % 65536 - 32768).toInt
        val w = (i.toLong * 33 / n).toInt
        sums(w) += v; cnts(w) += 1
      }
      var expected = 0L
      for (w <- 0 until 32)
        if (sums(w + 1) * cnts(w) > sums(w) * cnts(w + 1)) expected |= 1L << w
      assert(r.getLong(1) === expected, s"aHash mismatch for doc $id")
    }
    // crafted clips: B is A with one sample nudged (flips <= 3 window
    // comparisons), C is an unrelated alternating buzz
    def wavOf(f: Int => Int, n: Int): Array[Byte] = {
      val data = new Array[Byte](n * 2)
      for (i <- 0 until n) {
        val s = f(i).toShort
        data(2 * i) = (s & 0xFF).toByte
        data(2 * i + 1) = ((s >> 8) & 0xFF).toByte
      }
      val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
      val ais = new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(data), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      javax.sound.sampled.AudioSystem.write(
        ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    def ramp(i: Int): Int = ((i * i * 13 + i * 7) % 60000) - 30000
    val a = wavOf(ramp, 200)
    val b = wavOf(i => if (i == 100) 0 else ramp(i), 200)
    val c = wavOf(i => if (i % 2 == 0) 20000 else -20000, 200)
    import spark.implicits._
    val blobs = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "bytes")
    val pairs = Multimodal.aHashPairs(blobs).collect()
    assert(pairs.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!pairs.exists(r => r.getLong(0) == 3L || r.getLong(1) == 3L))
  }

  test("phash index: append equals one-shot build; indexed probe equals direct cross pairs") {
    val blobs = Multimodal.synthesizePng(Tables.documents(spark, sfDir)).cache()
    val corpus = blobs.filter(col("doc_id") % 3 =!= 0)
    val batch = blobs.filter(col("doc_id") % 3 === 0)
    def rows(t: String): Seq[String] =
      spark.table(t).collect().map(_.toString).toSeq.sorted
    def drop(ts: String*): Unit = ts.foreach { t =>
      Seq(t, t + "_codes", t + "_meta").foreach(x =>
        spark.sql(s"DROP TABLE IF EXISTS $x"))
    }
    try {
      Multimodal.buildPhashIndex(corpus, "t_ph_one")
      Multimodal.buildPhashIndex(corpus.filter(col("doc_id") % 2 === 0), "t_ph_incr")
      Multimodal.appendToPhashIndex(corpus.filter(col("doc_id") % 2 =!= 0), "t_ph_incr")
      // dHash is per-image: the two-batch index is bit-identical
      assert(rows("t_ph_one") === rows("t_ph_incr"))
      assert(rows("t_ph_one_codes") === rows("t_ph_incr_codes"))
      // indexed probe == a direct cross mining of the same sides: every
      // (corpus, batch) band collision at Hamming <= 3, nothing else
      val indexed = Multimodal.phashPairsIndexed(spark, "t_ph_one", batch)
        .collect().map(_.toString).sorted.toSeq
      val codesAll = Multimodal.dHash(blobs)
      val ca = codesAll.filter(col("doc_id") % 3 =!= 0)
        .select(col("doc_id").as("doc_a"), col("phash").as("ph_a"))
      val cb = codesAll.filter(col("doc_id") % 3 === 0)
        .select(col("doc_id").as("doc_b"), col("phash").as("ph_b"))
      // small corpus: exact reference via full cross product (test-only)
      val direct = ca.crossJoin(cb)
        .select(col("doc_a"), col("doc_b"),
          bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("long").as("hamming"))
        .filter(col("hamming") <= 3)
        .collect().map(_.toString).sorted.toSeq
      assert(indexed === direct) // banding is pigeonhole-lossless at radius 3
    } finally {
      drop("t_ph_one", "t_ph_incr")
      blobs.unpersist()
    }
  }

  test("classPairs shards a mega-class: exactly-once pairs, no single-task quadratic stream") {
    import spark.implicits._
    // one saturated code (300 members) far above the test block size, two
    // small classes at Hamming 1 of each other (cross-class pair), one
    // unrelated distant code
    val hot = (0L until 300L).map(id => (id, 0xF0F0F0F0F0F0FFL))
    val sA = Seq((1000L, 0x0F0F0F0F0F0F0FL), (1001L, 0x0F0F0F0F0F0F0FL))
    val sB = Seq((1002L, 0x0F0F0F0F0F0F0EL)) // Hamming 1 from sA's code
    val far = Seq((2000L, 0x123456789ABCDL))
    val codes = (hot ++ sA ++ sB ++ far).toDF("doc_id", "phash")
    val pairs = Multimodal.classPairs(codes, "phash", Multimodal.phashBands,
      maxHamming = 3, blockSize = 64).cache()
    // exactly-once enumeration: every intra-pair of the hot class once,
    // the small intra pair once, the cross-class pair once
    val expectedIntraHot = 300L * 299L / 2
    assert(pairs.filter(col("hamming") === 0).count() === expectedIntraHot + 1)
    assert(pairs.count() === pairs.dropDuplicates("doc_a", "doc_b").count(),
      "no pair may be enumerated twice")
    assert(pairs.filter(col("doc_a") === 1000L && col("doc_b") === 1002L)
      .count() === 1, "cross-class Hamming-1 pair must survive")
    assert(pairs.filter(col("doc_a") >= col("doc_b")).count() === 0)
    // per-task bound: the hot class's quadratic stream must NOT serialize
    // through one task — with blockSize 64 the 300-member class splits
    // into 5 blocks (5 same-block + 10 cross-block shards), so no
    // explode-stage partition may hold more than ~blockSize² pairs, far
    // under the class's 44850 (measured on the pre-sort intra stream —
    // the miner's final orderBy would re-range the rows and hide this)
    val perPartition = Multimodal.intraClassPairs(
        Multimodal.codeClasses(codes, "phash"), "phash", blockSize = 64)
      .rdd.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(perPartition.count(_ > 0) > 1,
      "hot-class pairs must spread across multiple tasks")
    // a shard is one same-block row (≤ B(B-1)/2 pairs) or one cross-block
    // row (B² pairs); hash placement may co-locate a few shards on one
    // task but never the whole class — allow 4 colliding shards of slack
    assert(perPartition.max <= 4 * 64 * 64,
      s"one task streamed ${perPartition.max} of ${expectedIntraHot} pairs — " +
        "the block decomposition is not spreading")
    pairs.unpersist()
  }

  test("decodeFeatures: real PNG/WAV moments, mime dispatch, loud unknown kind") {
    import spark.implicits._
    val docs = spark.range(1, 21).select(col("id").as("doc_id"))
    val png = Multimodal.synthesizePng(docs.toDF())
      .select(col("doc_id"), col("bytes"), lit("image/png").as("mime"))
    val wav = Multimodal.synthesizeWav(docs.toDF())
      .select(col("doc_id"), col("bytes"), lit("audio/wav").as("mime"))
    val out = Multimodal.decodeFeatures(png.unionByName(wav)).cache()
    assert(out.schema === Multimodal.featureSchema)
    assert(out.count() === 40)
    assert(out.filter(size(col("feature")) =!= 5).count() === 0)
    // the image moments must agree with the independent decodePng stats
    val pngStats = Multimodal.decodePng(png)
      .select(col("doc_id"), (col("width") * col("height")).cast("double").as("e_n"),
        col("min_px").cast("double").as("e_min"),
        col("max_px").cast("double").as("e_max"), col("mean_px").as("e_mean"))
    assert(out.filter(col("mime") === "image/png")
      .select(col("doc_id"),
        element_at(col("feature"), 1).as("f_n"),
        element_at(col("feature"), 2).as("f_min"),
        element_at(col("feature"), 3).as("f_max"),
        element_at(col("feature"), 4).as("f_mean"))
      .join(pngStats, "doc_id")
      .filter(col("f_n") =!= col("e_n") || col("f_min") =!= col("e_min") ||
        col("f_max") =!= col("e_max") || col("f_mean") =!= col("e_mean"))
      .count() === 0, "PNG moments must match the standalone decoder's stats")
    // the audio moments must agree with the independent decodeWav stats
    val wavStats = Multimodal.decodeWav(wav)
      .select(col("doc_id"), col("n_samples").cast("double").as("e_n"),
        col("min_s").cast("double").as("e_min"),
        col("max_s").cast("double").as("e_max"), col("mean_s").as("e_mean"))
    assert(out.filter(col("mime") === "audio/wav")
      .select(col("doc_id"),
        element_at(col("feature"), 1).as("f_n"),
        element_at(col("feature"), 2).as("f_min"),
        element_at(col("feature"), 3).as("f_max"),
        element_at(col("feature"), 4).as("f_mean"))
      .join(wavStats, "doc_id")
      .filter(col("f_n") =!= col("e_n") || col("f_min") =!= col("e_min") ||
        col("f_max") =!= col("e_max") || col("f_mean") =!= col("e_mean"))
      .count() === 0, "WAV moments must match the standalone decoder's stats")
    // energy is the exact second moment: Σv² / n ≥ mean² (Jensen), and
    // determinism across runs
    assert(out.filter(element_at(col("feature"), 5) <
      element_at(col("feature"), 4) * element_at(col("feature"), 4)).count() === 0)
    val again = Multimodal.decodeFeatures(png.unionByName(wav))
    assert(out.select("doc_id", "mime", "feature")
      .except(again.select("doc_id", "mime", "feature")).count() === 0)
    // an unrecognized kind fails loudly instead of silently skipping
    val ex = intercept[Exception] {
      Multimodal.decodeFeatures(
        png.limit(1).withColumn("mime", lit("video/mp4"))).collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("; ")
    assert(msgs.contains("unsupported media kind"), msgs)
    out.unpersist()
  }

  test("framePairs: crafted shared-keyframe clips pair; the df cap kills a hot frame") {
    import spark.implicits._
    // 64-byte payloads, frames sampled at offsets 0/16/32/48 with len 16:
    // clips 1 and 2 share frames 2 and 3 byte-identically; clip 3 shares
    // nothing; clips 4..9 all share one ubiquitous "black" frame
    val a = "A" * 16; val b = "B" * 16; val c = "C" * 16; val d = "D" * 16
    val black = "0" * 16
    val base = Seq(
      (1L, a + b + c + d), (2L, ("X" * 16) + ("Y" * 16) + c + d),
      (3L, "Z" * 64)) ++ (4L to 9L).map(i => (i, black + s"u$i" * 8 + ("v" + i) * 5))
    val blobs = base.toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
    val pairs = Multimodal.framePairs(blobs).cache()
    val m = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m((1L, 2L)) === 2L, "clips sharing two keyframes pair with n_shared = 2")
    assert(!m.keySet.exists(p => p._1 === 3L || p._2 === 3L), "unrelated clip stays unpaired")
    // the ubiquitous frame pairs all 6 sharers without the cap...
    assert((4L to 9L).combinations(2).forall { case Seq(x, y) => m.contains((x, y)) })
    // ...and a tight cap removes exactly those candidate pairs (skew guard)
    val capped = Multimodal.framePairs(blobs, maxDf = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((1L, 2L)), s"cap left $capped")
  }

  test("crossModalPairs aligns both miners without inventing or losing pairs") {
    val docs = Tables.documents(spark, sfDir)
    val png = Multimodal.synthesizePng(docs)
    val out = Multimodal.crossModalPairs(png, docs).cache()
    val img = Multimodal.pHashPairs(png).cache()
    val txt = graft.ops.Dedup.simHashPairs(docs).cache()
    // the pair-key set is exactly the union of the two modalities
    assert(out.count() === img.select("doc_a", "doc_b")
      .unionAll(txt.select("doc_a", "doc_b")).distinct().count())
    // each side's distance column is the miner's own, verbatim
    assert(out.filter(col("image_hamming").isNotNull)
      .select(col("doc_a"), col("doc_b"), col("image_hamming").as("hamming"))
      .exceptAll(img.select("doc_a", "doc_b", "hamming")).count() === 0)
    assert(out.filter(col("text_hamming").isNotNull)
      .select(col("doc_a"), col("doc_b"), col("text_hamming").as("hamming"))
      .exceptAll(txt.select("doc_a", "doc_b", "hamming")).count() === 0)
    // the verdict is the conjunction, never a third signal
    assert(out.filter(col("both_modalities") =!=
      (col("image_hamming").isNotNull && col("text_hamming").isNotNull)).count() === 0)
  }
}
