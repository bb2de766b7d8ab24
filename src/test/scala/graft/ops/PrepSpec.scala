package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Training-data preparation operators (Prep): planted-fixture exactness for
  * redaction, deterministic stratified sampling, and sequence packing — the
  * DuckDB oracles cover the sf tables; these pin the semantics on inputs
  * designed to hit the edges (multiple PII hits, rate boundaries, empty and
  * boundary-straddling documents).
  */
class PrepSpec extends SparkSpec {
  import spark.implicits._

  private def write(dir: String, rows: Seq[(Long, String, String)]): Unit =
    rows.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("redactPii: planted emails and phones are counted and rewritten exactly") {
    val tmp = java.nio.file.Files.createTempDirectory("prep_pii").toString
    val text = "reach alice@example.edu or bob.smith@lab.uni-x.org " +
      "phone 555-123-4567 or +01 555 987 6543 end"
    write(tmp, Seq((0L, text, "en"), (1L, "no pii here", "en")))
    val got = Prep.redactPii(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_emails"), r.getAs[Long]("n_phones"),
          r.getAs[String]("redacted_md5"))).toMap
    assert(got(0L)._1 === 2L)
    assert(got(0L)._2 === 2L) // "555-123-4567" and "555 987 6543"
    val expected = "reach <EMAIL> or <EMAIL> phone <PHONE> or +01 <PHONE> end"
    assert(got(0L)._3 === md5hex(expected), "redacted text must match exactly")
    assert(got(1L) === ((0L, 0L, md5hex("no pii here"))))
  }

  test("sampleStratified: deterministic, rate-bounded per stratum, default keeps all") {
    val tmp = java.nio.file.Files.createTempDirectory("prep_sample").toString
    val langs = Seq("en", "de", "fr")
    write(tmp, (0L until 600L).map(i => (i, s"doc $i", langs((i % 3).toInt))))
    def runOnce() = Prep.sampleStratified(spark, tmp).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"), r.getAs[Long]("sample_key")))
    val a = runOnce().sortBy(_._1)
    val b = runOnce().sortBy(_._1)
    assert(a.toSeq === b.toSeq, "sampling must be deterministic")
    a.foreach { case (_, lang, z) =>
      val bound = Prep.SampleRatesBp.getOrElse(lang, Prep.SampleDefaultBp)
      assert(z < bound, s"$lang row kept with key $z >= $bound")
    }
    // default stratum (fr): nothing dropped; en/de: roughly rate-proportional
    assert(a.count(_._2 == "fr") === 200)
    val en = a.count(_._2 == "en")
    val de = a.count(_._2 == "de")
    assert(en > 60 && en < 140, s"en kept $en of 200 at 50%")
    assert(de > 20 && de < 80, s"de kept $de of 200 at 25%")
  }

  test("packSequences: concat-and-slice spans match the sequential oracle") {
    val tmp = java.nio.file.Files.createTempDirectory("prep_pack").toString
    // token counts: 100 each, plus an empty doc and a boundary-straddler
    val rows = (0L until 10L).map { i =>
      val n = if (i == 4L) 0 else if (i == 7L) 300 else 100
      (i, Seq.fill(n)("tok").mkString(" "), "en")
    }
    write(tmp, rows)
    val got = Prep.packSequences(spark, tmp, seqLen = 256L, buckets = 3)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("start_bin"), r.getAs[Long]("end_bin")))
      .toMap
    // sequential oracle
    var cum = 0L
    val want = rows.map { case (id, text, _) =>
      val n = text.split(" ").count(_.nonEmpty).toLong
      val off = cum; cum += n
      id -> ((n, off / 256L, math.max(cum - 1, off) / 256L))
    }.toMap
    assert(got === want)
    // the empty doc spans a single (zero-width) bin
    assert(got(4L)._2 === got(4L)._3)
    // the 300-token doc straddles at least one boundary
    assert(got(7L)._3 > got(7L)._2)
  }

  test("packSequences: empty table yields an empty result, not a crash") {
    val tmp = java.nio.file.Files.createTempDirectory("prep_pack_empty").toString
    write(tmp, Seq.empty)
    assert(Prep.packSequences(spark, tmp).count() === 0L)
  }

  test("repetitionStats: hand-computed bps incl. empty, single-token, periodic docs") {
    val tmp = java.nio.file.Files.createTempDirectory("prep_rep").toString
    write(tmp, Seq(
      (0L, "a a a a", "en"),   // all-dup; bigram "a a"×3; trigram "a a a"×2
      (1L, "a b c d", "en"),   // no dups anywhere
      (2L, "", "en"),          // zero tokens
      (3L, "solo", "en"),      // one token — no grams at all
      (4L, "x y x y x", "en"))) // period-2 repetition
    val got = Prep.repetitionStats(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("dup_token_bp"),
          r.getAs[Long]("top_bigram_bp"), r.getAs[Long]("dup_trigram_bp"))).toMap
    assert(got.size === 5, "every document must appear, gramless ones included")
    assert(got(0L) === ((4L, 7500L, 10000L, 10000L)))
    assert(got(1L) === ((4L, 0L, 3333L, 0L)))      // 1 of 3 bigrams
    assert(got(2L) === ((0L, 0L, 0L, 0L)))
    assert(got(3L) === ((1L, 0L, 0L, 0L)))
    // n=5 nd=2 → 6000; bigrams xy,yx,xy,yx → max 2 of 4 → 5000;
    // trigrams xyx,yxy,xyx → 2 dup occurrences of 3 → 6666
    assert(got(4L) === ((5L, 6000L, 5000L, 6666L)))
  }

  test("decontaminate: planted eval-overlap grams are counted per train doc") {
    val tmp = java.nio.file.Files.createTempDirectory("prep_decon").toString
    write(tmp, Seq(
      (0L, "p q r s", "en"),    // eval split (0 % 13 == 0)
      (1L, "p q r zz", "en"),   // shares trigram "p q r" → 1 of 2
      (2L, "m n o", "en"),      // clean
      (3L, "hi", "en"),         // too short for a trigram → absent
      (4L, "q r s q r s q", "en"))) // shares "q r s" and "r s q"? r s q not in eval
    val got = Prep.decontaminate(spark, tmp).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hits"),
          r.getAs[Long]("contaminated_bp"))).toMap
    assert(!got.contains(0L), "eval docs are not in the train output")
    assert(!got.contains(3L), "gramless docs have no gram rows")
    assert(got(1L) === ((2L, 1L, 5000L)))
    assert(got(2L) === ((1L, 0L, 0L)))
    // doc 4 distinct trigrams: "q r s","r s q","s q r" — eval has "q r s"
    // and "r s q"? eval grams of "p q r s": "p q r","q r s" → only "q r s"
    assert(got(4L) === ((3L, 1L, 3333L)))
  }

  test("domainMixCap: per-source quotas bind, ordering is the md5 shuffle") {
    val tmp = java.nio.file.Files.createTempDirectory("prep_mix").toString
    val rows = (0L until 10L).map(i => (i, s"d $i", "en", "src0")) ++
      (10L until 13L).map(i => (i, s"d $i", "en", "src1")) ++
      (13L until 33L).map(i => (i, s"d $i", "en", "other"))
    rows.toDF("doc_id", "text", "lang", "source")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Prep.domainMixCap(spark, tmp).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"), r.getAs[Long]("rn")))
    val bySrc = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySrc === Map("src0" -> 5, "src1" -> 3, "other" -> 12))
    // the kept set per source is exactly the first-k of the md5(doc_id) order
    val expected = rows.groupBy(_._4).flatMap { case (src, rs) =>
      val quota = Prep.MixQuotas.getOrElse(src, Prep.MixDefaultQuota).toInt
      rs.map(_._1).sortBy(id => (md5hex(id.toString), id)).take(quota)
    }.toSet
    assert(got.map(_._1).toSet === expected)
    got.foreach { case (_, src, rn) =>
      assert(rn <= Prep.MixQuotas.getOrElse(src, Prep.MixDefaultQuota))
    }
  }
}
