package graft.etl

import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Engine invariants under random inputs (SURVEY §5.2):
  * - conformTo yields exactly the declared schema for ANY input column
  *   subset/order (missing → typed null, extras dropped);
  * - union-count invariant: Σ branch counts == merged count;
  * - capitalizeName matches Python str.capitalize semantics and is
  *   idempotent;
  * - Excel serial dates round-trip.
  */
class PropertiesSpec extends SparkSpec {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  private val declared = StructType(Seq(
    StructField("Day", DateType), StructField("Name", StringType),
    StructField("Clicks", LongType), StructField("Spend", DoubleType)))

  test("conform invariant: any column subset/order conforms to the declared schema") {
    // permutation derived from ScalaCheck's own randomness (sort keys), so
    // failing samples reproduce from the reported seed
    val genCols = for {
      subset <- Gen.someOf("Day", "Name", "Clicks", "Spend", "Extra1", "Extra2")
      if subset.nonEmpty
      keys <- Gen.listOfN(subset.size, Gen.choose(0, Int.MaxValue))
    } yield subset.toList.zip(keys).sortBy(_._2).map(_._1)
    check(Prop.forAll(genCols) { cols =>
      import scala.jdk.CollectionConverters._
      val df = spark.createDataFrame(
        Seq(Row.fromSeq(cols.map(_ => null))).asJava,
        StructType(cols.map(StructField(_, StringType, nullable = true))))
      val out = MultiSourceAdEtl.conformTo(df, declared)
      out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
        declared.fields.map(f => (f.name, f.dataType)).toSeq
    })
  }

  test("union-count invariant: merged count equals sum of branch counts") {
    import spark.implicits._
    check(Prop.forAll(Gen.listOfN(3, Gen.choose(0, 20))) { sizes =>
      val dfs = sizes.zipWithIndex.map { case (n, i) =>
        (0 until n).map(j => (s"s$i", j)).toDF("src", "v")
      }
      val engine = new MultiSourceAdEtl(Configs.podl)
      engine.merge(dfs).count() == sizes.sum
    })
  }

  test("capitalizeName: Python str.capitalize semantics, idempotent") {
    assert(MultiSourceAdEtl.capitalizeName("amount Spent (USD)") == "Amount spent (usd)")
    assert(MultiSourceAdEtl.capitalizeName("연령 및 성별") == "연령 및 성별")
    check(Prop.forAll(Gen.alphaNumStr) { s =>
      val once = MultiSourceAdEtl.capitalizeName(s)
      MultiSourceAdEtl.capitalizeName(once) == once
    })
    check(Prop.forAll(Gen.alphaStr.suchThat(_.nonEmpty)) { s =>
      val c = MultiSourceAdEtl.capitalizeName(s)
      c.head == s.head.toUpper && c.tail == s.tail.toLowerCase
    })
  }

  test("Excel serial round-trip: date -> serial -> date") {
    import spark.implicits._
    check(Prop.forAll(Gen.choose(0, 40000)) { epochDay =>
      val d = java.time.LocalDate.ofEpochDay(epochDay.toLong)
      val df = Seq(java.sql.Date.valueOf(d)).toDF("Day")
      val serial = graft.io.Sinks.withExcelSerialDates(df).head().getLong(0)
      // serial = days since 1899-12-30 = epochDay + 25569 (reference E13)
      serial == epochDay + 25569L &&
        java.time.LocalDate.of(1899, 12, 30).plusDays(serial) == d
    })
  }
}
