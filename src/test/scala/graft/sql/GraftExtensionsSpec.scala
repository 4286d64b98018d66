package graft.sql

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** End-to-end check of the `spark.sql.extensions=graft.sql.GraftExtensions`
  * injection path: a session built with only the extensions hook (no
  * Scala-side `GraftFunctions.register` call) must resolve every graft_*
  * function in plain SQL to the same native expressions the Column API
  * uses.
  *
  * `spark.sql.extensions` is a STATIC conf — Spark reads it from the
  * SparkContext's conf at context creation, so on the suite's shared
  * context a builder-level string conf is silently ignored. The spec
  * instead injects via `builder.withExtensions(new GraftExtensions())`,
  * which is the identical plumbing (for the string conf Spark
  * instantiates the class by reflection and calls the same `apply`).
  * The JVM's default session is swapped and restored afterwards —
  * forked test suites run sequentially, so no other spec observes it.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtensionsSession[A](f: SparkSession => A): A = {
    val prior = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession
      .builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.sql.GraftExtensions")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try f(s)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }

  test("all graft_* functions resolve and evaluate via SQL-only sessions") {
    withExtensionsSession { s =>
      val row = s
        .sql("""SELECT
          graft_luhn_valid('4111111111111111') AS luhn_ok,
          graft_luhn_valid('4111111111111112') AS luhn_bad,
          graft_sanitize('a  b') AS sane,
          graft_confidence('hello world') AS conf,
          graft_simhash('hello world') AS sh,
          graft_fingerprint('hello world') AS fp,
          graft_cosine(CAST(array(1.0, 0.0) AS array<float>),
                       CAST(array(1.0, 0.0) AS array<float>)) AS cos,
          graft_sorted_overlap(array('a', 'b', 'c'),
                               array('b', 'c', 'd')) AS ov
        """)
        .head()
      assert(row.getAs[Boolean]("luhn_ok"))
      assert(!row.getAs[Boolean]("luhn_bad"))
      assert(row.getAs[Double]("cos") === 1.0)
      assert(row.getAs[Int]("ov") === 2)
      // Cross-check the text kernels against the direct Scala calls —
      // the injected builders must be the same expressions, not copies.
      import org.apache.spark.unsafe.types.UTF8String
      assert(row.getAs[String]("sane") ===
        graft.text.Sanitizer.sanitize("a  b"))
      assert(row.getAs[Double]("conf") ===
        graft.text.Confidence.calculate("hello world"))
      assert(row.getAs[Long]("sh") ===
        GraftKernels.simhash(UTF8String.fromString("hello world")))
      assert(row.getAs[Long]("fp") ===
        GraftKernels.rollingFingerprint(UTF8String.fromString("hello world")))
    }
  }

  test("injected functions reach whole-stage codegen (not CodegenFallback)") {
    withExtensionsSession { s =>
      val plan = s
        .sql("SELECT graft_luhn_valid(CAST(id AS string)) FROM range(10)")
        .queryExecution.executedPlan.toString
      // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
      assert(plan.contains("*(1) Project"), plan.take(2000))
    }
  }
}
