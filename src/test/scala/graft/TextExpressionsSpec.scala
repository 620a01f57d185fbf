package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}
import graft.plans.GraftFunctions

/** Differential tests pinning the native text-signature expressions
  * (`graft_simhash` / `graft_minhash` / `graft_stopword_hits`) to the
  * higher-order-function formulations they replaced. Signatures must be
  * BIT-identical — every LSH bucket and candidate pair downstream depends
  * on it — so these compare exact longs over the full documents fixture,
  * not rounded floats.
  */
class TextExpressionsSpec extends SparkSuite {
  import spark.implicits._

  GraftFunctions.register(spark)

  private lazy val docs = engine.Tables.load(spark, sfDir, "documents").cache()

  test("graft_simhash is bit-identical to the HOF simhash on all fixture docs") {
    val mismatches = docs.select(
        Dedup.simhash($"text").as("fast"),
        Dedup.simhashHof($"text").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
  }

  test("graft_shingles equals the HOF shingles (content AND order) on all docs") {
    val mismatches = docs.select(
        Dedup.shingles($"text").as("fast"),
        Dedup.shinglesHof($"text").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
  }

  test("graft_shingles short-text and k-edge behavior matches the HOF form") {
    val df = Seq("one", "one two", "one two three", "one two three four", " ", "a a a a")
      .toDF("text")
    Seq(1, 2, 3, 5).foreach { k =>
      val rows = df.select(
          Dedup.shingles($"text", k).as("fast"),
          Dedup.shinglesHof($"text", k).as("slow"))
        .as[(Seq[String], Seq[String])].collect()
      rows.foreach { case (f, sl) => assert(f === sl, s"k=$k") }
    }
  }

  test("graft_minhash is bit-identical to the HOF minhash on all fixture docs") {
    val sh = Dedup.shingles($"text")
    val mismatches = docs.select(
        Dedup.minhashSignature(sh, 64).as("fast"),
        Dedup.minhashSignatureHof(sh, 64).as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
  }

  test("graft_minhash honors non-default lane counts") {
    val sh = Dedup.shingles($"text")
    val row = docs.limit(1).select(
        Dedup.minhashSignature(sh, 16).as("fast"),
        Dedup.minhashSignatureHof(sh, 16).as("slow"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(row._1.length === 16)
    assert(row._1 === row._2)
  }

  test("graft_simhash_md5 is bit-identical to the portable HOF simhash on all docs") {
    val toks = org.apache.spark.sql.functions.array_remove(
      TextAnalysis.tokens(org.apache.spark.sql.functions.lower($"text")), "")
    val mismatches = docs.select(
        Dedup.simhashPortable(toks).as("fast"),
        Dedup.simhashPortableHof(toks).as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
  }

  test("graft_minhash_md5 is bit-identical to the portable HOF minhash on all docs") {
    val sh = Dedup.shingles($"text")
    val mismatches = docs.select(
        Dedup.minhashSignaturePortable(sh, 64).as("fast"),
        Dedup.minhashSignaturePortableHof(sh, 64).as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
    val short = docs.limit(1).select(
        Dedup.minhashSignaturePortable(sh, 16).as("fast"),
        Dedup.minhashSignaturePortableHof(sh, 16).as("slow"))
      .as[(Seq[Long], Seq[Long])].head()
    assert(short._1.length === 16 && short._1 === short._2)
  }

  test("md5Prefix60 equals Spark's conv(substring(md5)) construction") {
    import org.apache.spark.sql.functions._
    val rows = docs.limit(50).select(
        $"text",
        conv(substring(md5($"text"), 1, 15), 16, 10).cast("long").as("sql"))
      .as[(String, Long)].collect()
    rows.foreach { case (t, sqlV) =>
      val native = graft.functions.TextExpressions.md5Prefix60(
        org.apache.spark.unsafe.types.UTF8String.fromString(t))
      assert(native === sqlV, t.take(40))
    }
  }

  test("graft_md5_hash60 expression is bit-identical to conv(substring(md5)) per token") {
    // the codegen'd scalar twin of md5Prefix60 (doc_feature_hashing's
    // bucket hash): exact-long compare over EVERY token in the fixture,
    // both the generated-code and interpreted paths exercised by the
    // full-corpus plan
    val mismatches = docs
      .select(explode(TextAnalysis.tokens(lower($"text"))).as("w"))
      .select(
        call_function("graft_md5_hash60", $"w").as("fast"),
        conv(substring(md5($"w"), 1, 15), 16, 10).cast("long").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
  }

  test("graft_md5_hash60 property: matches the conv-chain on arbitrary unicode strings") {
    // the fixture corpus is mostly ASCII; md5 hashes UTF-8 BYTES in both
    // engines, so multi-byte code points are the divergence surface worth
    // generating (seeded ScalaCheck — the scalatest bridge is not in the
    // offline cache, same pattern as PipelinePropertySpec)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen = Gen.frequency(
      6 -> Gen.alphaNumChar,
      2 -> Gen.oneOf('é', 'ß', '中', '文', 'λ', 'Ω', ' ', '\t'),
      1 -> Gen.choose(0x20.toChar, 0x2FFF.toChar))
    val strGen = for {
      n <- Gen.chooseNum(0, 40)
      cs <- Gen.listOfN(n, charGen)
      // supplementary-plane code points (surrogate pairs in the JVM,
      // 4-byte UTF-8) can't be Char literals — splice them as strings
      tail <- Gen.oneOf("", "🙂", "𝕏🙂")
    } yield cs.mkString + tail
    val p = Gen.Parameters.default
    val strs = Iterator.iterate(Seed(97L))(_.next)
      .map(s => strGen.apply(p, s))
      .collect { case Some(a) => a }
      .take(300).toSeq
    val mismatches = strs.toDF("w")
      .select(
        call_function("graft_md5_hash60", $"w").as("fast"),
        conv(substring(md5($"w"), 1, 15), 16, 10).cast("long").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
  }

  test("graft_md5_hash60 null and empty-string behavior") {
    val rows = Seq(Some(""), Some("a"), None)
      .toDF("w")
      .select(call_function("graft_md5_hash60", $"w").as("h"))
      .as[Option[Long]].collect()
    assert(rows(0).nonEmpty && rows(1).nonEmpty) // empty string hashes
    assert(rows(2).isEmpty) // null in, null out
    // empty string md5 prefix is a fixed public constant:
    // md5("") = d41d8cd98f00b204e9800998ecf8427e → 0xd41d8cd98f00b20 >> 0
    assert(rows(0).get === java.lang.Long.parseLong("d41d8cd98f00b20", 16))
  }

  test("graft_stopword_hits matches the HOF hit count for every language dict") {
    TextAnalysis.stopwords.foreach { case (lang, words) =>
      val mismatches = docs.select(
          TextAnalysis.hitCount($"text", words).as("fast"),
          TextAnalysis.hitCountHof($"text", words).as("slow"))
        .filter($"fast" =!= $"slow")
        .count()
      assert(mismatches === 0, s"dict $lang diverged")
    }
  }

  test("edge cases: empty text, null text, empty word set") {
    val df = Seq(Some(""), Some("the the the"), None).toDF("text")
    val rows = df.select(
        Dedup.simhash($"text").as("sig"),
        TextAnalysis.hitCount($"text", TextAnalysis.stopwords.head._2).as("hits"),
        TextAnalysis.hitCount($"text", Seq.empty[String]).as("zero"))
      .collect()
    // "" tokenizes to [""], hash of "" drives the signature — just not null
    assert(!rows(0).isNullAt(0))
    assert(rows(0).getInt(1) === 0)
    assert(rows(1).getInt(1) === 3)
    assert(rows(1).getInt(2) === 0)
    // split(null) is null -> all three are null
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }

  test("native langId equals the HOF greatest-struct argmax on all docs") {
    val mismatches = docs
      .select(TextAnalysis.langId($"text").as("fast"),
        TextAnalysis.langIdHof($"text").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
  }

  test("native langId edge cases: cjk wins, ties break to earlier language, und") {
    val df = Seq(
      "数据 engine",               // cjk
      "the le data",               // 1-1 tie en/fr -> en
      "le la les bonjour",         // fr
      "zzz qqq",                   // no hits -> und
      "").toDF("text")
    val got = df.select(TextAnalysis.langId($"text").as("l")).as[String].collect()
    assert(got === Array("zh", "en", "fr", "und", "und"))
  }

  // -- winnowing ------------------------------------------------------------

  /** Independent reference implementation of robust winnowing (Schleimer
    * et al. 2003) in plain Scala, sharing nothing with the expression but
    * the two xxhash64 primitives it is specified against.
    */
  private def winnowRef(text: String, k: Int, w: Int): Seq[Long] = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val toks = text.trim.split("\\s+").toSeq.filter(_.nonEmpty)
    if (toks.isEmpty) return Seq.empty
    val th = toks.map(t => XXH64.hashUTF8String(UTF8String.fromString(t), 42L))
    val kk = math.min(k, th.length)
    val grams = th.sliding(kk, 1).map(_.foldLeft(42L)((acc, h) =>
      XXH64.hashLong(h, acc))).toVector
    val ww = math.min(w, grams.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var minPos = -1
    for (r <- 0 to grams.length - ww) {
      val last = r + ww - 1
      if (minPos < r) {
        minPos = last
        for (p <- (last - 1) to r by -1) if (grams(p) < grams(minPos)) minPos = p
        out += grams(minPos)
      } else if (grams(last) <= grams(minPos)) {
        minPos = last
        out += grams(last)
      }
    }
    out.toSeq
  }

  test("graft_winnow matches the independent reference on all fixture docs") {
    val rows = docs.select($"text",
        TextAnalysis.winnowFingerprints($"text", 4, 4).as("fp"))
      .as[(String, Seq[Long])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (text, fp) =>
      assert(fp === winnowRef(text, 4, 4), s"text=${text.take(60)}")
    }
  }

  test("graft_winnow edge cases: short, empty, and tie-heavy inputs") {
    val df = Seq("", " ", "one", "one two", "one two three",
      "a a a a a a a a", "x y x y x y x y x y").toDF("text")
    Seq((1, 1), (2, 3), (4, 4), (8, 5)).foreach { case (k, w) =>
      val rows = df.select($"text",
          TextAnalysis.winnowFingerprints($"text", k, w).as("fp"))
        .as[(String, Seq[Long])].collect()
      rows.foreach { case (text, fp) =>
        assert(fp === winnowRef(text, k, w), s"k=$k w=$w text='$text'")
      }
    }
  }

  test("winnow guarantee: a shared run of k+w-1 tokens leaves a shared fingerprint") {
    // distinct prefix/suffix noise around an identical 7-token core
    // (k=4, w=4 -> guarantee threshold k+w-1 = 7)
    val core = "alpha beta gamma delta epsilon zeta eta"
    val a = s"left0 left1 left2 $core right0 right1"
    val b = s"up0 up1 up2 up3 $core down0"
    val Seq(fa, fb) = Seq(a, b).toDF("text")
      .select(TextAnalysis.winnowFingerprints($"text", 4, 4))
      .as[Seq[Long]].collect().toSeq
    assert(fa.toSet.intersect(fb.toSet).nonEmpty)
  }

  test("graft_char_gram_hashes is bit-identical to xxhash64(substring) per position") {
    val k = 20
    val mismatches = docs.filter(length($"text") >= k).select(
        call_function("graft_char_gram_hashes", $"text", lit(k)).as("fast"),
        expr(s"transform(sequence(0, length(text) - $k), " +
          s"i -> xxhash64(substring(text, i + 1, $k)))").as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(mismatches === 0L)
    // strings shorter than k yield an EMPTY array (the query's explode
    // then emits no anchor rows for them)
    val short = Seq("tiny").toDF("text")
      .select(call_function("graft_char_gram_hashes", $"text", lit(k)).as("h"))
      .head().getSeq[Long](0)
    assert(short.isEmpty)
  }


  test("graft_word_gram_hashes is bit-identical to xxhash64 over the HOF window chain") {
    val k = 5
    val toks = TextAnalysis.tokens(lower($"text"))
    val n = size(toks)
    val windows = (1 until k).foldLeft(toks)((acc, i) =>
      zip_with(acc, slice(toks, lit(i + 1), n), (a, b) => concat_ws(" ", a, b)))
    val hof = transform(
      slice(windows, lit(1), greatest(n - (k - 1), lit(0))), w => xxhash64(w))
    val mismatches = docs.select(
        call_function("graft_word_gram_hashes", toks, lit(k)).as("fast"),
        hof.as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(mismatches === 0L)
    // shorter-than-k token arrays yield an empty array
    val short = Seq("a b").toDF("text")
      .select(call_function("graft_word_gram_hashes",
        TextAnalysis.tokens(lower($"text")), lit(k)).as("h"))
      .head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("graft_cdc_boundaries is identical to the exploded md5 chain per position") {
    // the exploded formulation doc_cdc_chunks used through r11: every
    // 1-based start in [2, len-7] whose 8-char window md5-prefix is
    // ≡ 0 (mod 64)
    val slow = expr(
      "filter(sequence(2L, greatest(length(text) - 7, 1L)), " +
        "i -> length(text) >= 9 and " +
        "graft_md5_hash60(substring(text, cast(i as int), 8)) % 64 = 0)")
    val mismatches = docs.select(
        call_function("graft_cdc_boundaries", $"text", lit(64)).as("fast"),
        when(length($"text") >= 9, slow)
          .otherwise(expr("cast(array() as array<bigint>)")).as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(mismatches === 0L)
    // multi-byte text: the window is CHAR-sliced, md5 runs over the
    // UTF-8 bytes of the slice — same as substr — and short strings
    // yield an empty array
    val edge = Seq("", "tiny", "Émile Zola était là 中文 🙂 run run run",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa")
      .toDF("text")
    val er = edge.select(
        call_function("graft_cdc_boundaries", $"text", lit(64)).as("fast"),
        when(length($"text") >= 9, slow)
          .otherwise(expr("cast(array() as array<bigint>)")).as("slow"))
      .collect()
    er.foreach(r => assert(r.getSeq[Long](0) === r.getSeq[Long](1)))
  }

  test("graft_bigram_mode_count matches the HOF bigram mode chain on all fixture docs") {
    val mismatches = docs.select(
        graft.operators.Cleanse.topBigramFraction($"text").as("fast"),
        graft.operators.Cleanse.topBigramFractionHof($"text").as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(mismatches === 0L)
    // edge cases: empty, one token, repeated bigram, null-ish whitespace
    val edge = Seq("", "one", "a b", "a b a b a", "x  y\tz x y",
      "中文 中文 中文 run").toDF("text")
    val er = edge.select(
        graft.operators.Cleanse.topBigramFraction($"text").as("fast"),
        graft.operators.Cleanse.topBigramFractionHof($"text").as("slow"))
      .collect()
    er.foreach(r => assert(r.getDouble(0) === r.getDouble(1)))
  }

  test("graft_normalize is identical to the portable regex chain on all fixture docs") {
    val mismatches = docs.select(
        Dedup.normalized($"text").as("fast"),
        Dedup.normalizedPortable($"text").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
  }

  test("graft_normalize edge cases match the regex chain exactly") {
    val cases = Seq(
      "", " ", " \t\n\f\r ", "\u000b", "...", "a", "A", "  Hello,  World! ",
      "a..b", ".a.", "tabs\tand\nnewlines", "digits123MIXED456",
      " nbsp run ", "Émile Zola", "ÉÀÜ",
      "ß sharp", "中文 words", "mixed 中ascii文 runs",
      "🙂emoji🙂run", "𝕏math𝕏",
      "ab", "under_score-dash", "1,234.56")
    val rows = cases.toDF("t").select(
        Dedup.normalized($"t").as("fast"),
        Dedup.normalizedPortable($"t").as("slow"))
      .collect()
    rows.zip(cases).foreach { case (r, c) =>
      assert(r.getString(0) === r.getString(1), s"input=<$c>") }
    // null in, null out on both forms
    val nr = Seq(Option.empty[String]).toDF("t")
      .select(Dedup.normalized($"t"), Dedup.normalizedPortable($"t"))
      .collect()(0)
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("graft_normalize property: matches the regex chain on arbitrary unicode strings") {
    // separator-run collapsing across every char class — whitespace,
    // ASCII punctuation, multi-byte code points, supplementary plane —
    // is the surface where a byte-level scan could diverge from the
    // regex composition; generate adversarial mixes (seeded ScalaCheck,
    // same offline-cache pattern as the md5 property above)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val charGen = Gen.frequency(
      5 -> Gen.alphaNumChar,
      3 -> Gen.oneOf(' ', '\t', '\n', '\u000b', '\f', '\r', '.', ',', '_', '-'),
      2 -> Gen.oneOf('é', 'ß', '中', '文', 'λ',
        'Ω', 'É', ' '),
      1 -> Gen.choose(0x20.toChar, 0x2FFF.toChar))
    val strGen = for {
      n <- Gen.chooseNum(0, 60)
      cs <- Gen.listOfN(n, charGen)
      tail <- Gen.oneOf("", "🙂", " 𝕏🙂 x ")
    } yield cs.mkString + tail
    val p = Gen.Parameters.default
    val strs = Iterator.iterate(Seed(131L))(_.next)
      .map(s => strGen.apply(p, s))
      .collect { case Some(a) => a }
      .take(500).toSeq
    val mismatches = strs.toDF("t")
      .select(
        Dedup.normalized($"t").as("fast"),
        Dedup.normalizedPortable($"t").as("slow"))
      .filter($"fast" =!= $"slow")
      .count()
    assert(mismatches === 0)
  }

  // -- graft_pii_scan vs the Java-regex chain -------------------------------

  private def piiBothSides(df: org.apache.spark.sql.DataFrame) = {
    import graft.operators.Cleanse
    df.select(
      Cleanse.piiScan($"t").as("fast"),
      Cleanse.emailCount($"t").as("se"),
      Cleanse.phoneCount($"t").as("sp"),
      Cleanse.urlCount($"t").as("su"),
      Cleanse.redact($"t").as("sr"))
  }

  private def assertPiiAgrees(df: org.apache.spark.sql.DataFrame): Unit = {
    val mismatches = piiBothSides(df).filter(
      $"fast.n_emails" =!= $"se" || $"fast.n_phones" =!= $"sp" ||
        $"fast.n_urls" =!= $"su" || $"fast.redacted" =!= $"sr")
    val bad = mismatches.limit(3).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
  }

  test("graft_pii_scan matches the regex chain on all fixture docs with synthetic PII") {
    assertPiiAgrees(graft.operators.Cleanse.withSyntheticPii(docs)
      .select($"text".as("t")))
  }

  test("graft_pii_scan edge cases match the regex chain exactly") {
    val cases = Seq(
      "", " ", "plain text, no pii at all",
      // email backtracking over the domain run
      "a@b.co", "a@b.co.uk", "a@b.c", "a@b..com", "x@y.c-m", "a@b.comX",
      "a@b.cc@d.ee", "user.name+tag%x_y@sub-domain.example.ORG",
      "@nolocal.com", "nodomain@", "a@.com", "a@x.", "a@x", "a@@b.com",
      "trailing a@b.com", "a@b.com trailing", "a@b.coma@c.de",
      // digits adjacent to emails (email-first ordering is the contract)
      "5551234567a@b.com", "555-123-4567@x.org", "a@123-456-7890.com",
      // phones: separators, overlap, truncation
      "555-123-4567", "555.123.4567", "555-123.4567", "5551234567",
      "123-456-789", "x123-456-78901-234-5678y", "99123-456-7890",
      "123-456-7890-123-456-7890",
      // URLs: greedy tails, optional s, punctuation, placeholders
      "http://x", "https://x", "http://", "https:// space", "httpx://y",
      "hhttp://x.com", "see https://a.b/c?d=e&f=g#h, end",
      "http://a http://b", "https://exämple.com/päth",
      "a@b.com inside http://url.com/a@b.com",
      "http://site.com/555-123-4567 and 555-123-4567",
      "text<EMAIL>with<PHONE>placeholders<URL>already",
      // unicode around every pattern
      "中文a@b.com中文 555-123-4567🙂 https://x.y/z🙂 end",
      "é@b.com", "a@bé.com", "a@b.cé", "🙂555-123-4567🙂",
      // whitespace classes bounding URL tails ( IS Java \s)
      "http://a\tb", "http://ab", "http://a\fb", "http://a\rb")
    val rows = piiBothSides(cases.toDF("t")).collect()
    rows.zip(cases).foreach { case (r, c) =>
      val f = r.getStruct(0)
      assert(f.getInt(0) === r.getInt(1), s"n_emails on <$c>")
      assert(f.getInt(1) === r.getInt(2), s"n_phones on <$c>")
      assert(f.getInt(2) === r.getInt(3), s"n_urls on <$c>")
      assert(f.getString(3) === r.getString(4), s"redacted on <$c>")
    }
    // null in, null out on both forms
    val nr = Seq(Option.empty[String]).toDF("t")
      .select(graft.operators.Cleanse.piiScan($"t"),
        graft.operators.Cleanse.redact($"t")).collect()(0)
    assert(nr.isNullAt(0) && nr.isNullAt(1))
  }

  test("graft_pii_scan property: matches the regex chain on adversarial fragment mixes") {
    // build strings from PII-shaped fragments so matches, near-misses and
    // pattern collisions are dense (a uniform char soup almost never
    // forms an email); same seeded-generator pattern as the normalize
    // property test
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val fragGen = Gen.frequency(
      3 -> Gen.oneOf("a", "bc", "Z9", "中", "🙂", " ", "  ", "\t", "\n"),
      3 -> Gen.oneOf("@", ".", "-", "_", "%", "+", ":", "/", "<", ">"),
      2 -> Gen.oneOf("@b.com", "a@", "x@y.", ".co", ".c", "com", "uk",
        "example.org", "sub-domain", "user+tag"),
      2 -> Gen.oneOf("555", "123-", "456-7890", "-4567", "012.345.6789",
        "99", "1234"),
      2 -> Gen.oneOf("http://", "https://", "http:/", "https", "://",
        "http://x.y/", "?q=1&r=2#f", "<EMAIL>", "<PHONE>", "<URL>"))
    val strGen = for {
      n <- Gen.chooseNum(0, 24)
      fs <- Gen.listOfN(n, fragGen)
    } yield fs.mkString
    val p = Gen.Parameters.default
    val strs = Iterator.iterate(Seed(977L))(_.next)
      .map(s => strGen.apply(p, s))
      .collect { case Some(a) => a }
      .take(800).toSeq
    assertPiiAgrees(strs.toDF("t"))
  }

  test("literal-parameter guards raise AnalysisException with a real error class") {
    // ADVICE r12: a non-literal (or NULL) scalar parameter must surface
    // as an AnalysisException on Spark's own error classes, not as a raw
    // IllegalArgumentException that reads like an internal error
    val nonLit = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(expr("graft_cdc_boundaries(text, length(text))")).collect()
    }
    assert(nonLit.getCondition === "NON_FOLDABLE_ARGUMENT", nonLit.getMessage)
    val nullLit = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(expr("graft_cdc_boundaries(text, null)")).collect()
    }
    assert(nullLit.getCondition === "INVALID_PARAMETER_VALUE.NULL",
      nullLit.getMessage)
    val morton = intercept[org.apache.spark.sql.AnalysisException] {
      docs.select(expr("graft_morton(1, 2, length(text))")).collect()
    }
    assert(morton.getCondition === "NON_FOLDABLE_ARGUMENT", morton.getMessage)
  }

  test("graft_vocab_counts matches the per-word HOF count chain on all fixture docs") {
    val ts = TextAnalysis.tokens(lower($"text"))
    val vocab = docs.select(explode(ts).as("w")).distinct()
      .orderBy("w").collect().map(_.getString(0)).toSeq
    def hof(v: Seq[String]) =
      transform(typedLit(v), w => size(filter(ts, t => t === w)).cast("double"))
    val mismatches = docs.select(
        call_function("graft_vocab_counts", ts, typedLit(vocab)).as("fast"),
        hof(vocab).as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(mismatches === 0L)
    // duplicate + unseen vocab entries count position-wise like the chain
    val dupVocab = Seq(vocab.head, "never-a-token", vocab.head)
    val dr = docs.limit(50).select(
        call_function("graft_vocab_counts", ts, typedLit(dupVocab)).as("fast"),
        hof(dupVocab).as("slow"))
      .filter($"fast" =!= $"slow").count()
    assert(dr === 0L)
    // empty tokens → all-zero vector; null tokens element matches nothing
    val edge = Seq(Seq.empty[String], Seq("a", "b", "a"), Seq("b", null, "b"))
      .toDF("toks")
    val er = edge.select(call_function("graft_vocab_counts", $"toks",
        typedLit(Seq("a", "b", "c"))).as("c")).collect()
    assert(er(0).getSeq[Double](0) === Seq(0.0, 0.0, 0.0))
    assert(er(1).getSeq[Double](0) === Seq(2.0, 1.0, 0.0))
    assert(er(2).getSeq[Double](0) === Seq(0.0, 2.0, 0.0))
  }

}
