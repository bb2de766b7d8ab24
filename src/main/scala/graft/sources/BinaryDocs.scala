package graft.sources

import graft.extract.ResumeParse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Binary-document ingestion (SURVEY.md §2.1 S7): the reference reads PDFs
  * page-by-page with PyMuPDF and concatenates text (`parser.py:42-61`); the
  * engine's equivalent is the `binaryFile` source + a text-extraction stage,
  * then the deterministic resume parse (F9-F15).
  *
  * The codec is STUBBED — this container has no PDF library — behind
  * [[extractTextStub]]: real byte decoding is replaced by interpreting the
  * payload as UTF-8 when it looks like text, else a deterministic marker.
  * Everything Spark-side is real: the source, the partition-batched decode
  * shape, and the downstream parse pipeline.
  */
object BinaryDocs {

  /** Read a directory of documents as (path, modificationTime, length, content). */
  def readBinary(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)

  /** STUB text extraction — replace with a real PDF/codec call; the signature
    * (bytes → page-concatenated text, parser.py:48-58) is the contract.
    */
  def extractTextStub(content: Array[Byte]): String = {
    val s = new String(content, java.nio.charset.StandardCharsets.UTF_8)
    if (s.forall(c => c >= 9)) s // "text-like" payloads pass through
    else s"[unsupported binary: ${content.length} bytes]"
  }

  private val extractUdf = udf((b: Array[Byte]) => extractTextStub(b))

  /** The full S7 pipeline: binary files → text → parsed resumes. */
  def parseResumeFiles(spark: SparkSession, dir: String): DataFrame =
    ResumeParse.parseResumes(
      readBinary(spark, dir)
        .select(col("path"), extractUdf(col("content")).as("text")),
      "text")
}
