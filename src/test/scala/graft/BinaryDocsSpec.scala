package graft

import graft.sources.BinaryDocs

/** S7 pipeline: binaryFile source → stub text extraction → resume parse. */
class BinaryDocsSpec extends SparkSpec {

  test("binary resume files parse end-to-end through the binaryFile source") {
    val dir = java.nio.file.Files.createTempDirectory("resumes")
    val resume =
      "Jane Roe\n\nEDUCATION\nPhD in Statistics, Yale University, 2019\n\n" +
        "RESEARCH INTERESTS\n* Causal Inference\n* Machine Learning\n"
    java.nio.file.Files.write(dir.resolve("r1.txt"), resume.getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("r2.bin"), Array[Byte](0x01, 0x02, 0x03))

    val got = BinaryDocs.parseResumeFiles(spark, dir.toString)
      .select("path", "name", "research_interests").collect()
      .map(r => r.getString(0).split("/").last ->
        ((r.getString(1), r.getSeq[String](2).toList))).toMap

    val (name, interests) = got("r1.txt")
    assert(name === "Jane Roe")
    assert(interests === List("Causal Inference", "Machine Learning"))
    // non-text payload degrades to the stub marker, still one row
    assert(got.contains("r2.bin"))
  }
}
