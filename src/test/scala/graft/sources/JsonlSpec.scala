package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Jsonl sink: roundtrip fidelity, escaping, naming, empty partitions,
  * and the speculative-attempt commit race. */
class JsonlSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-jsonl-test")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("jsonl_spec").toFile.getAbsolutePath

  test("roundtrip: written rows read back identical, incl. hard strings") {
    val dir = tmpDir()
    try {
      val docs = Seq(
        (0L, "plain text"),
        (1L, "line\nbreak and \"quotes\" and tab\t"),
        (2L, "unicode é中😀 end"),
        (3L, ""),
        (4L, "back\\slash")).toDF("doc_id", "text")
      val written = Jsonl.write(docs, dir)
      assert(written.map(_._2).sum == 5L)
      assert(written.forall(_._1.matches(".*part-\\d{5}\\.jsonl\\.gz")))
      val back = spark.read.schema("doc_id LONG, text STRING").json(dir)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(back == Map(0L -> "plain text",
        1L -> "line\nbreak and \"quotes\" and tab\t",
        2L -> "unicode é中😀 end",
        3L -> "", 4L -> "back\\slash"))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }

  test("empty partitions write no file; scratch dir is swept") {
    val dir = tmpDir()
    try {
      val docs = Seq((0L, "a"), (1L, "b")).toDF("doc_id", "text")
        .repartition(6)
      val written = Jsonl.write(docs, dir)
      assert(written.nonEmpty && written.size <= 2)
      val files = new java.io.File(dir).listFiles().map(_.getName).toSet
      assert(!files.contains(Jsonl.TmpDir))
      assert(files.forall(f => f.endsWith(".jsonl.gz") || f.endsWith(".crc")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }

  test("speculative duplicate attempts leave exactly one intact file") {
    val dir = tmpDir()
    try {
      val conf = spark.sparkContext.hadoopConfiguration
      val lines = Seq("{\"doc_id\":0,\"text\":\"x\"}",
        "{\"doc_id\":1,\"text\":\"y\"}")
      // two attempts of the same partition racing to commit
      Jsonl.writePartition(lines.iterator, dir, 0, "attempt1", conf)
      Jsonl.writePartition(lines.iterator, dir, 0, "attempt2", conf)
      val back = spark.read.schema("doc_id LONG, text STRING")
        .json(s"$dir/part-00000.jsonl.gz")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(back == Seq(0L, 1L))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir))
    }
  }
}
