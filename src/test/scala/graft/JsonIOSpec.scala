package graft

import graft.crawl.{Records, WaveRunner}
import graft.relational.JsonIO
import graft.synth.SyntheticSite
import graft.synth.SyntheticSite.SiteConfig

/** JSON sink/source roundtrip (SURVEY §2.1 S3/S4): records written as JSON
  * and read back with the explicit schema must be value-identical.
  */
class JsonIOSpec extends SparkSpec {

  test("faculty records JSON roundtrip with explicit schema") {
    val site  = SiteConfig(universities = 1, deptsPerU = 1, facultyPerDept = 5,
      errorFraction = 0.2)
    val seeds = SyntheticSite.seeds(site)
    val crawl = WaveRunner.run(spark, seeds, SyntheticSite.fetcher(site), Nil,
      WaveRunner.CrawlConfig(waveSeconds = 5.0))
    val records = Records.facultyRecords(spark, crawl.docs, seeds)
      .drop("seed_rank", "row_rank")
    val dir = java.nio.file.Files.createTempDirectory("faculty_json").toString

    JsonIO.writeFaculty(records, dir)
    val back = JsonIO.readFaculty(spark, dir)
    assert(back.schema === JsonIO.facultySchema)

    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map { r =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3), r.getString(4),
        r.getSeq[String](5).toList, r.getSeq[String](6).toList, r.getString(7))
    }.toSet
    assert(canon(back) === canon(
      records.select(JsonIO.facultySchema.fieldNames.map(
        org.apache.spark.sql.functions.col).toSeq: _*)))
  }
}
