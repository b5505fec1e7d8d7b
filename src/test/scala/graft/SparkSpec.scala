package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one per JVM). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession =
    GraftSession.configure(
      SparkSession.builder().master("local[4]").appName("graft-test"), 4)
      .getOrCreate()

  val Sf = "/root/testdata/sf0.001"

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Reference fold of `Hashing.charHash` backing
    * [[refBigramBuckets]] — private so HashExprsFuzzSpec's own
    * deliberately independent mirror does not collide. */
  private def refCharHash(s: String): Long = {
    var h = 0L
    s.codePoints().forEach(cp => h = (h * 31L + cp) % 2147483647L)
    h
  }

  /** Reference hashed-bigram feature buckets — the affinity family's
    * driver-side mirror (DsirSpec, StreamGateSpec). */
  def refBigramBuckets(text: String): Seq[Long] =
    text.split(" ").filter(_.nonEmpty).toSeq.sliding(2)
      .filter(_.length == 2)
      .map(p => refCharHash(p.mkString(" "))
        % graft.operators.TextOps.FeatBuckets).toSeq
}
