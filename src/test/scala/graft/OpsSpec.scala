package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops._

/** Extension-operator checks: planted near-dups, LSH recall vs exact,
  * sessionization gap semantics, langid, multimodal plumbing. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "lang")

  private val base =
    "the quick brown fox jumps over the lazy dog near the old river bank today"
  private val nearDup =
    "the quick brown fox jumps over the lazy dog near the old river bank tonight"
  private val other =
    "completely different words about spark catalyst plans and shuffle exchanges here"

  private lazy val planted = docsDf(Seq(
    (1L, base, "en"), (2L, nearDup, "en"), (3L, other, "en"),
    (4L, base, "en"), // exact duplicate of 1
    (5L, "short text only", "en")))

  test("exact dedup collapses identical normalized docs") {
    val groups = Dedup.exactGroups(planted)
    assert(groups.count() == 4) // 1&4 share a fingerprint
    val kept = Dedup.exactDedup(planted).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 2L, 3L, 5L)))
  }

  test("minhash LSH finds planted near-dup and exact-dup pairs") {
    val pairs = Dedup.minhashNearDupPairs(planted, tau = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L))) // near dup
    assert(pairs.contains((1L, 4L))) // exact dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhash LSH agrees with exact blocked jaccard on planted set") {
    val lsh = Dedup.minhashNearDupPairs(planted, tau = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Dedup.ngramJaccardPairs(planted, tau = 0.5, blockCol = "lang")
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH at 16 bands / r=2 has >99% recall at j>=0.5 — on this tiny
    // planted set it must find everything the exact pass finds.
    assert(lsh == exact)
  }

  test("df-capped jaccard == full inverted index at an infinite cap") {
    // with no shingle dropped, the capped operator must be the
    // identical exact join (sets, sizes, and jaccard values)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val full = canon(Dedup.ngramJaccardPairs(docs, tau = 0.5, blockCol = "lang"))
    val capped = canon(Dedup.ngramJaccardPairsCapped(docs, tau = 0.5,
      dfCap = Long.MaxValue, blockCol = "lang"))
    assert(capped == full)
    assert(full.nonEmpty)
  }

  test("df cap drops stopword-shingle pairs, keeps rare-shingle pairs") {
    // 30 docs share ONE ubiquitous shingle ("alpha beta gamma") plus
    // unique filler; docs 101/102 additionally share rare content.
    // At dfCap=10 the ubiquitous shingle (df=32 > 10) is dropped from
    // every set, so only the rare-content pair survives.
    val stop = "alpha beta gamma"
    val crowd = (1L to 30L).map(i =>
      (i, s"$stop filler$i word$i token$i extra$i", "en"))
    val nd = Seq(
      (101L, s"$stop rare shared content lives here exactly", "en"),
      (102L, s"$stop rare shared content lives here tonight", "en"))
    val docs = docsDf(crowd ++ nd)
    val pairs = Dedup.ngramJaccardPairsCapped(docs, tau = 0.3,
        dfCap = 10L, blockCol = "lang")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((101L, 102L)),
      s"expected only the rare-content pair, got $pairs")
  }

  test("PPJoin prefix filter finds exactly the inverted-index pairs") {
    // the prefix filter is a pure candidate-space reduction: on real
    // sf0.001 documents the verified pairs (ids AND jaccard values)
    // must be identical to the full inverted index's
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val full = canon(Dedup.ngramJaccardPairs(docs, tau = 0.5, blockCol = "lang"))
    val pref = canon(Dedup.ngramJaccardPairsPrefix(docs, tau = 0.5, blockCol = "lang"))
    assert(pref == full)
    assert(full.nonEmpty) // fixture actually contains near-dup pairs
  }

  test("poly (md5) near-dup twins find the planted pairs like production") {
    // production xxhash64 and oracle-expressible md5 paths share the
    // operator shape; on the planted set both must recover the exact
    // dup (1,4) and the near dup (1,2)/(2,4)
    val polyM = Dedup.minhashNearDupPairsPoly(planted, tau = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(polyM.contains((1L, 4L)), s"exact dup missed: $polyM")
    assert(polyM.contains((1L, 2L)) || polyM.contains((2L, 4L)),
      s"near dup missed: $polyM")
    // every emitted pair passes the exact tau (precision is exact)
    Dedup.minhashNearDupPairsPoly(planted, tau = 0.5).collect()
      .foreach(r => assert(r.getDouble(2) >= 0.5))

    val polyS = Dedup.simhashNearDupPairsPoly(planted, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(polyS.exists(p => p._1 == 1L && p._2 == 4L && p._3 == 0),
      s"exact dup must be hamming 0: ${polyS.toSeq}")
    polyS.foreach(p => assert(p._3 <= 3))
  }

  test("minhashDedup drops the higher-id near-duplicates") {
    val kept = Dedup.minhashDedup(planted, tau = 0.5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.sameElements(Array(1L, 3L, 5L)))
  }

  test("incremental minhash == full pair set restricted to the batch") {
    // same signatures + banding => the index probe must emit exactly
    // the full run's pairs that touch a batch id, values included
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val corpus = docs.filter(col("doc_id") % 10 < 8)
    val batch = docs.filter(col("doc_id") % 10 >= 8)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val incr = Dedup.minhashNearDupPairsIncremental(batch,
      Dedup.minhashIndex(corpus)).collect().map(key).toSet
    val full = Dedup.minhashNearDupPairs(docs)
      .filter(col("id_a") % 10 >= 8 || col("id_b") % 10 >= 8)
      .collect().map(key).toSet
    assert(incr == full && incr.nonEmpty)
  }

  test("containment catches subset pairs that jaccard misses") {
    val words = (1 to 40).map(i => s"w$i")
    val article = words.mkString(" ")
    val quote = words.slice(10, 18).mkString(" ") // 8 words -> 6 shingles, all in article
    val docs = docsDf(Seq((1L, article, "en"), (2L, quote, "en")))
    val cont = Dedup.containmentPairs(docs, tau = 0.9, dfCap = 1000L,
      blockCol = "lang").collect()
    assert(cont.length == 1)
    val r = cont.head
    assert(r.getLong(1) == 1L && r.getLong(2) == 2L)
    assert(r.getDouble(4) == 1.0) // cont_b: quote fully inside article
    assert(r.getDouble(3) < 0.2)  // cont_a: article barely covered
    // symmetric jaccard (6 shared / 38 union ~ 0.16) never fires
    val jac = Dedup.ngramJaccardPairs(docs, tau = 0.5, blockCol = "lang")
    assert(jac.count() == 0)
  }

  test("batch transformWithState dedup keeps the min doc_id per key") {
    import graft.streaming.StatefulDedup
    val docs = Seq(
      StatefulDedup.Doc("k1", 5L, "x"), StatefulDedup.Doc("k1", 2L, "x"),
      StatefulDedup.Doc("k2", 7L, "y"), StatefulDedup.Doc("k1", 9L, "x"))
      .toDS()
    val out = StatefulDedup.dedup(docs, java.time.Duration.ZERO)
      .collect().map(dd => dd.key -> dd.doc_id).toMap
    assert(out == Map("k1" -> 2L, "k2" -> 7L))
  }

  test("simhash: near-dups within hamming 3, unrelated docs far") {
    val sigs = planted.select(col("doc_id"),
      Dedup.simhash(col("text")).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1L) == sigs(4L)) // identical text -> identical simhash
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(2L)) <= 3)
    assert(java.lang.Long.bitCount(sigs(1L) ^ sigs(3L)) > 10)
    val pairs = Dedup.simhashNearDupPairs(planted, maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 4L)))
  }

  test("simhash chunk join is COMPLETE: equals the all-pairs Hamming<=3 scan at sf0.01") {
    // the 16-bit-chunk pigeonhole must lose NOTHING vs brute force —
    // a shift/mask bug in the chunk extraction would silently drop
    // pairs; this pins the candidate generator against the O(n²)
    // scan on the gate corpus (the harness row is rows-only since
    // Hamming-ball membership isn't expressible without xxhash).
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val sigs = Dedup.simhashSignatures(docs)
    val brute = sigs.select(col("id").as("id_a"), col("sig").as("sa"))
      .crossJoin(sigs.select(col("id").as("id_b"), col("sig").as("sb")))
      .filter(col("id_a") < col("id_b") &&
        bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Dedup.simhashNearDupPairs(docs, maxHamming = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked == brute,
      s"chunk join missed ${(brute -- blocked).size} / leaked ${(blocked -- brute).size} pairs")
  }

  test("langId picks marker language; defaults en") {
    val df = docsDf(Seq(
      (1L, "le chat est sur la table et les livres", "fr"),
      (2L, "el gato y los perros es bueno", "es"),
      (3L, "der hund und die katze ist gut", "de"),
      (4L, "the cat and the dog is good with food", "en"),
      (5L, "zzz qqq xxx", "en")))
    val got = df.select(col("doc_id"), TextOps.langId(col("text")).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "fr", 2L -> "es", 3L -> "de", 4L -> "en", 5L -> "en"))
  }

  test("native langId == HOF formulation on the real corpus AND on " +
      "adversarial edges (CJK, ties, mixed case, weird whitespace)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
        TextOps.langId(col("text")).as("native"),
        TextOps.langIdHof(col("text")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(diff == 0, s"$diff corpus docs classified differently")
    val edges = docsDf(Seq(
      (1L, "汉字 in the middle of the text 汉字汉", "zh"),
      (2L, "le the", "tie"),                 // 1 fr vs 1 en -> en first
      (3L, "", "empty"),
      (4L, "THE AND OF", "upper"),
      (5L, "a\tb\nthe\r\nund und", "ws"),
      (6L, "y", "single"),
      (7L, "   ", "blank")))
    val e = edges.select(col("doc_id"),
        TextOps.langId(col("text")).as("native"),
        TextOps.langIdHof(col("text")).as("hof")).collect()
    e.foreach(r => assert(r.getString(1) == r.getString(2),
      s"edge doc ${r.getLong(0)}: native=${r.getString(1)} hof=${r.getString(2)}"))
  }

  test("ann LSH candidates rank by exact cosine and overlap brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ann = Similarity.annTopK(emb, emb.filter(col("vec_id") === 0), dim = 64,
      k = 10, nBits = 4)
    val annIds = ann.select("id").collect().map(_.getLong(0)).toSet
    assert(annIds.nonEmpty && annIds.size <= 10)
    // every ANN hit must carry the same cosine the brute-force path computes
    val brute = Similarity.knnBruteForce(emb, 0L, k = 500)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    ann.collect().foreach { r =>
      assert(math.abs(brute(r.getAs[Long]("id")) -
        r.getAs[Double]("cosine_sim")) < 1e-12)
    }
  }

  test("ivf ANN returns exact cosines and overlaps brute force") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val ivf = Similarity.ivfTopK(emb, emb.filter(col("vec_id") === 0),
      k = 10, nLists = 8, nProbe = 8) // nProbe = nLists -> exhaustive
    val brute = Similarity.knnBruteForce(emb, 0L, k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val got = ivf.collect().map(r =>
      r.getAs[Long]("id") -> r.getAs[Double]("cosine_sim")).toMap
    // probing every list makes IVF exhaustive -> must equal brute force
    assert(got.keySet == brute.keySet)
    got.foreach { case (id, c) => assert(c == brute(id)) }
  }

  test("sessionize splits exactly at the gap threshold") {
    val gap = 30L * 60 * 1000000 // 30 min in us
    val t0 = 1700000000000000000L // ns
    val ev = Seq(
      // user 1: two events 29m59s apart -> one session
      (1L, 1L, t0),
      (2L, 1L, t0 + (gap - 1000000L) * 1000L),
      // user 2: two events exactly 30m apart -> still one session (gap > not >=)
      (3L, 2L, t0),
      (4L, 2L, t0 + gap * 1000L),
      // user 3: 30m + 1s apart -> two sessions
      (5L, 3L, t0),
      (6L, 3L, t0 + (gap + 1000000L) * 1000L)
    ).toDF("event_id", "user_id", "ts").withColumn("value", lit(1.0))
    val sessions = Sessionize.sessionize(ev)
    val byUser = sessions.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byUser == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("multimodal: per-partition feature extraction preserves ids and shape") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val media = Multimodal.fromText(docs)
    assert(media.schema.fieldNames.sameElements(
      Multimodal.mediaSchema.fieldNames))
    val feats = Multimodal.extractFeatures(spark, media, dim = 8).collect()
    assert(feats.length == 50)
    assert(feats.forall(_.feature.length == 8))
    assert(feats.forall(f => f.n_bytes > 0))
    // deterministic
    val again = Multimodal.extractFeatures(spark, media, dim = 8)
      .collect().map(f => f.media_id -> f.feature.toSeq).toMap
    feats.foreach(f => assert(again(f.media_id) == f.feature.toSeq))
  }

  test("VideoDecoder seam: an injected fake-codec binding drives " +
      "decodeFrameStats and decodeVideoFp end-to-end; the default " +
      "AVI binding refuses the fake container (and vice versa)") {
    import spark.implicits._
    // fake container format: "FAKE" magic + one frame-count byte;
    // frame j renders as a 2x2 image whose pixels are (id-free)
    // j-arithmetic — the stand-in for an H.264 binding over JNI
    object FakeCodec extends Multimodal.VideoDecoder {
      def frames(payload: Array[Byte])
          : Option[Seq[Option[java.awt.image.BufferedImage]]] = {
        if (payload.length < 5 ||
          new String(payload.take(4), "US-ASCII") != "FAKE") return None
        val n = payload(4).toInt
        Some((0 until n).map { j =>
          val img = new java.awt.image.BufferedImage(2, 2,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          for (y <- 0 until 2; x <- 0 until 2)
            img.getRaster.setSample(x, y, 0, (j * 10 + x + y) % 256)
          Some(img): Option[java.awt.image.BufferedImage]
        })
      }
    }
    val payload = "FAKE".getBytes("US-ASCII") :+ 3.toByte
    val media = Seq((7L, payload)).toDF("media_id", "payload")
    val stats = Multimodal.decodeFrameStats(spark, media, FakeCodec)
      .collect().map(s => (s.frame_idx, s.lum_sum)).toSet
    // frame j luminance = sum of (j*10 + x + y) over the 2x2 raster
    assert(stats == Set((0, 4L), (1, 44L), (2, 84L)), s"got $stats")
    val fp = Multimodal.decodeVideoFp(spark, media, FakeCodec).collect()
    assert(fp.length == 1 && fp.head.getLong(0) == 7L)
    // container filters: each binding refuses the other's payloads
    assert(Multimodal.decodeFrameStats(spark, media).isEmpty,
      "default AVI binding must refuse the fake container")
    val avi = Seq((8L, Multimodal.encodeVideo(8L)))
      .toDF("media_id", "payload")
    assert(Multimodal.decodeFrameStats(spark, avi, FakeCodec).isEmpty,
      "fake binding must refuse a real AVI")
    assert(Multimodal.decodeFrameStats(spark, avi).count() > 0,
      "default binding must decode its own AVI")
  }

  test("PNG encode/decode roundtrips raster samples bit-exact") {
    val bytes = Multimodal.encodeGrayPng(5, 3, (x, y) => (x * 50 + y * 17) % 256)
    val img = Multimodal.decodeImage(bytes).get
    assert(img.getWidth == 5 && img.getHeight == 3)
    for (y <- 0 until 3; x <- 0 until 5)
      assert(img.getRaster.getSample(x, y, 0) == (x * 50 + y * 17) % 256,
        s"($x,$y)")
    // non-image bytes decode to None, not an exception
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
  }

  test("decodeStats over synthImages matches the pixel arithmetic") {
    val ids = Seq(0L, 1L, 7L, 12L, 123L).toDF("doc_id")
    val media = Multimodal.synthImages(spark, ids)
    val stats = Multimodal.decodeStats(spark, media)
      .collect().map(s => s.media_id -> s).toMap
    assert(stats.size == 5)
    for (id <- Seq(0L, 1L, 7L, 12L, 123L)) {
      val (w, h) = Multimodal.synthDims(id)
      var lum = 0L; var q00 = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val v = Multimodal.synthPixel(id, x, y).toLong
        lum += v
        if (x < w / 2 && y < h / 2) q00 += v
      }
      val s = stats(id)
      assert(s.width == w && s.height == h)
      assert(s.lum_sum == lum && s.q00 == q00, s"id=$id")
      assert(s.q00 + s.q01 + s.q10 + s.q11 == lum)
    }
  }

  test("resizeImages halves dims through the real codec, exact averages") {
    val ids = Seq(3L, 9L).toDF("doc_id") // 9 -> w=12,h=6; 3 -> w=11,h=6
    val resized = Multimodal.resizeImages(spark,
      Multimodal.synthImages(spark, ids), factor = 2)
    val stats = Multimodal.decodeStats(spark, resized)
      .collect().map(s => s.media_id -> s).toMap
    for (id <- Seq(3L, 9L)) {
      val (w, h) = Multimodal.synthDims(id)
      val (nw, nh) = (w / 2, h / 2)
      var lum = 0L
      for (by <- 0 until nh; bx <- 0 until nw) {
        var s = 0L
        for (dy <- 0 until 2; dx <- 0 until 2)
          s += Multimodal.synthPixel(id, bx * 2 + dx, by * 2 + dy)
        lum += s / 4
      }
      assert(stats(id).width == nw && stats(id).height == nh)
      assert(stats(id).lum_sum == lum, s"id=$id")
    }
  }

  test("extractFeatures decodes real images; opaque payloads fall back") {
    val ids = Seq(4L).toDF("doc_id")
    val media = Multimodal.synthImages(spark, ids)
    val feat = Multimodal.extractFeatures(spark, media, dim = 4)
      .collect().head
    val (w, h) = Multimodal.synthDims(4L)
    // expected strip means from the arithmetic
    val sums = new Array[Long](4); val counts = new Array[Long](4)
    for (y <- 0 until h; x <- 0 until w) {
      val strip = math.min(3, x * 4 / w)
      sums(strip) += Multimodal.synthPixel(4L, x, y); counts(strip) += 1
    }
    val expect = (0 until 4).map(i =>
      (sums(i).toDouble / counts(i) / 255.0).toFloat)
    assert(feat.feature.toSeq == expect)
    // text payload -> byte-fold fallback, unchanged contract
    val textMedia = Multimodal.fromText(docsDf(Seq((1L, base, "en"))))
    val tf = Multimodal.extractFeatures(spark, textMedia, dim = 4)
      .collect().head
    assert(tf.feature.toSeq ==
      Multimodal.byteFoldFeature(base.getBytes, 4).toSeq)
  }

  test("resize stub downsamples payloads deterministically") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(10)
    val media = Multimodal.fromText(docs)
    val resized = Multimodal.resizeStub(spark, media, factor = 4)
    val before = media.select("media_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    resized.select("media_id", "payload").collect().foreach { r =>
      val orig = before(r.getLong(0))
      val got = r.getAs[Array[Byte]](1)
      assert(got.length == (orig.length + 3) / 4)
      assert(got.toSeq == orig.grouped(4).map(_.head).toSeq)
    }
  }

  test("frame sampling emits ceil(len/stride) frames per payload") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(5)
    val media = Multimodal.fromText(docs)
    val frames = Multimodal.sampleFrames(spark, media, stride = 64)
    val lens = docs.select(length(col("text"))).collect().map(_.getInt(0))
    val expected = lens.map(l => (l + 63) / 64).sum
    assert(frames.count() == expected)
  }

  test("connected components: chains collapse transitively, singletons stay") {
    import spark.implicits._
    // two components: {1,2,3,4} via a chain, {10,11}; 99 isolated
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
      .toDF("id_a", "id_b")
    val comp = ops.Connect.connectedComponents(edges, "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L))
  }

  test("large-star CC == min-label CC on random graphs and chains") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val cases: Seq[Seq[(Long, Long)]] =
      // random graphs at three densities over 30 nodes
      Seq(15, 30, 60).map(m => Seq.fill(m)(
        (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))) ++ Seq(
        // deep chain, a triangle + pendant, self-loops, one edge
        (1L to 49L).map(i => (i, i + 1)),
        Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (9L, 9L)),
        Seq((5L, 5L)), Seq((7L, 3L)))
    for ((es, ci) <- cases.zipWithIndex) {
      val edges = es.toDF("s", "t")
      // maxIter must cover the 50-chain's diameter for the min-label
      // reference (it warns + returns partial labels past the cap)
      val a = ops.Connect.connectedComponents(edges, "s", "t", maxIter = 60)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val b = ops.Connect.connectedComponentsLargeStar(edges, "s", "t")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(a == b, s"case $ci: minLabel=$a largeStar=$b")
    }
  }

  test("large-star converges in ~log rounds on a deep chain") {
    import spark.implicits._
    val chain = (1L to 64L).map(i => (i, i + 1)).toDF("s", "t")
    val (ml, mlRounds) = ops.Connect.minLabelRounds(chain, "s", "t",
      maxIter = 80)
    val (lsDf, lsRounds) = ops.Connect.largeStarRounds(chain, "s", "t")
    assert(ml.collect().forall(_.getLong(1) == 1L))
    assert(lsDf.collect().forall(_.getLong(1) == 1L))
    // min-label walks the diameter; star contraction is logarithmic
    assert(mlRounds > 30, s"minLabel rounds=$mlRounds")
    assert(lsRounds <= 10, s"largeStar rounds=$lsRounds")
  }

  test("iterative ops run identically under reliable checkpointing") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt")
      .toString
    try {
      val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L))
        .toDF("id_a", "id_b")
      val local = ops.Connect.connectedComponents(edges, "id_a", "id_b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val reliable = ops.Connect.connectedComponents(edges, "id_a", "id_b",
        checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local)
      val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      val cLocal = Similarity.kmeansCentroids(emb, k = 4, iters = 2)
        .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
      val cRel = Similarity.kmeansCentroids(emb, k = 4, iters = 2,
        checkpointDir = Some(dir))
        .collect().map(r => r.getInt(0) -> r.getSeq[Float](1)).toMap
      assert(cRel == cLocal)
      // the reliable mode really wrote checkpoint data
      assert(java.nio.file.Files.list(java.nio.file.Paths.get(dir))
        .count() > 0)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("native DotLongs expression == HOF fallback dot product") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val both = emb.select(col("vec_id"),
      Similarity.dotScaled(col("q"), col("q")).as("native"),
      Similarity.dotScaledHof(col("q"), col("q")).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), s"vec ${r.getLong(0)}"))
  }

  test("native ShingleSet expression == HOF fallback shingles") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val both = docs.select(col("doc_id"),
      TextOps.shingles(col("text")).as("native"),
      TextOps.shinglesHof(col("text")).as("hof")).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}")
    }
  }

  test("native LshBucket expression == HOF fallback buckets") {
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val both = emb.select(col("vec_id"),
      Similarity.lshBucket(col("embedding"), 64, 12).as("native"),
      Similarity.lshBucketHof(col("embedding"), 64, 12).as("hof"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getLong(1) == r.getLong(2), s"vec ${r.getLong(0)}"))
  }

  test("native SimHashSig expression == aggregate fallback signatures") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Dedup.simhashSignatures(docs, native = true).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Dedup.simhashSignatures(docs, native = false).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, sig) => assert(sig == b(id), s"doc $id") }
  }

  test("native MinHashSig expression == aggregate fallback signatures") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val a = Dedup.signatures(docs, "text", "doc_id", 3, 32, native = true)
      .drop("sh").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val b = Dedup.signatures(docs, "text", "doc_id", 3, 32, native = false)
      .drop("sh").collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(a.keySet == b.keySet)
    a.foreach { case (id, sig) => assert(sig == b(id), s"doc $id") }
  }

  test("winnowing: shared long substrings share fingerprints; disjoint texts don't") {
    val shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val df = docsDf(Seq(
      (1L, s"intro words here $shared closing words", "en"),
      (2L, s"totally other start $shared different tail tokens", "en"),
      (3L, "unrelated content with no overlap at all in any window position", "en")))
    val fps = df.select(col("doc_id"),
      TextOps.winnowingFingerprints(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert((fps(1L) & fps(2L)).nonEmpty)   // shared region -> shared prints
    assert((fps(1L) & fps(3L)).isEmpty)    // disjoint text -> none
  }

  test("approx sketches stay within tolerance of exact (X6)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"))).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.1)
  }

  test("KMV poly sketch estimates within its error bound (X6)") {
    // per-type estimates from the deterministic md5 KMV (k=64,
    // stderr ~ 1/sqrt(k-2) ~ 12.7%) vs exact distinct counts; groups
    // under k are exact by construction
    val d = "/root/testdata/sf0.001"
    val est = SparkEntry.queries("x6_kmv_poly")(spark, d)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = Tables.events(spark, d)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet)
    for ((t, (nMin, e)) <- est) {
      val x = exact(t)
      if (nMin < 64) assert(e == x.toDouble, s"$t under-k must be exact")
      else assert(math.abs(e - x) / x < 0.4,
        s"$t: est $e vs exact $x (3-sigma KMV bound)")
    }
  }

  test("Hll: per-source register sets merge to the whole-corpus sketch " +
      "(persist-then-merge contract); estimate inside the error band") {
    import graft.ops.Hll
    val d = "/root/testdata/sf0.001"
    val toks = Tables.documents(spark, d)
      .select(col("source"),
        explode(graft.ops.TextOps.tokens(lower(col("text")))).as("sval"))
    val sources = toks.select("source").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(sources.size >= 2, "need a real split to test the merge")
    val perSource = sources.map(src =>
      Hll.registers(toks.filter(col("source") === src).select("sval")))
    val merged = Hll.merge(perSource)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val global = Hll.registers(toks.select("sval"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(merged == global,
      s"merged registers (${merged.size}) != global (${global.size})")
    // the estimate over a >> 2.5m set stays inside 3 * 1.04/sqrt(m)
    val ids = Tables.events(spark, d)
      .select(col("event_id").cast("string").as("sval"))
    val est = Hll.estimate(spark, Hll.registers(ids))
      .collect()(0).getAs[Double]("est")
    val exact = ids.distinct().count().toDouble
    assert(math.abs(est - exact) / exact <= 3 * 1.04 / math.sqrt(Hll.M),
      s"HLL est $est vs exact $exact outside the 3-sigma band")
  }
}
