package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** JSON sink/source for faculty records (SURVEY.md §2.1 S3/S4).
  *
  * The reference writes the scraped list as a JSON array (`scraper.py:165-178`)
  * and the API/matcher read it back trusting the shape
  * (`faculty_api/main.py:127-131`, `main.py:422-424`). Engine policy
  * (SURVEY §1.3): explicit StructType on every read — never schema inference
  * in production paths.
  */
object JsonIO {

  /** The faculty record JSON shape (`scraper.py:69-78`). */
  val facultySchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("title", StringType),
    StructField("university", StringType),
    StructField("department", StringType),
    StructField("email", StringType),
    StructField("research_interests", ArrayType(StringType)),
    StructField("publications", ArrayType(StringType)),
    StructField("profile_url", StringType)))

  /** S3 — write records as JSON lines (distributed; the reference's single
    * indented array is a single-process artifact — golden-file tests compare
    * canonicalized rows, not bytes, per SURVEY §2.1 S3).
    */
  def writeFaculty(records: DataFrame, path: String): Unit =
    records
      .select(facultySchema.fieldNames.map(org.apache.spark.sql.functions.col).toSeq: _*)
      .write.mode("overwrite").json(path)

  /** S4 — read records with the explicit schema. */
  def readFaculty(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(facultySchema).json(path)
}
