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
}
