package graft.etl

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fail-fast config validation V1–V4 (`multi_source_ad_etl.py:35-94`). */
class EtlConfigSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("Day", DateType), StructField("Spend", DoubleType)))

  private def base = EtlConfig(
    sourceCriteria = Seq("Meta" -> Set("Day"), "TikTok" -> Set("Cost")),
    renameMappings = Map("Meta" -> Map("Day" -> "Day"), "TikTok" -> Map("Cost" -> "Spend")),
    standardSchema = schema)

  test("valid config passes") { base.validate() }

  test("V1: criteria source without mapping fails") {
    val e = intercept[IllegalArgumentException] {
      base.copy(renameMappings = base.renameMappings - "TikTok").validate()
    }
    assert(e.getMessage.contains("Missing rename mappings"))
    assert(e.getMessage.contains("TikTok"))
  }

  test("V1: mapping for non-detectable source fails") {
    val e = intercept[IllegalArgumentException] {
      base.copy(renameMappings = base.renameMappings + ("Ghost" -> Map("A" -> "Day"))).validate()
    }
    assert(e.getMessage.contains("non-detectable"))
  }

  test("V2: ambiguous criteria column fails") {
    val e = intercept[IllegalArgumentException] {
      base.copy(sourceCriteria = Seq("Meta" -> Set("Day"), "TikTok" -> Set("Day", "Cost"))).validate()
    }
    assert(e.getMessage.contains("multiple sources"))
    assert(e.getMessage.contains("Day"))
  }

  test("V3: mapping target outside schema fails") {
    val e = intercept[IllegalArgumentException] {
      base.copy(renameMappings = base.renameMappings + ("Meta" -> Map("Day" -> "Nope"))).validate()
    }
    assert(e.getMessage.contains("not present in standardSchema"))
  }

  test("V4: cleaner for unknown source fails") {
    val e = intercept[IllegalArgumentException] {
      base.copy(cleaners = Map("Ghost" -> Seq(identity[org.apache.spark.sql.DataFrame] _))).validate()
    }
    assert(e.getMessage.contains("Unknown source(s) in cleaners"))
  }

  test("all shipped configs are valid") {
    Configs.all.values.foreach { case (cfg, _) => cfg.validate() }
  }

  test("python-capitalize semantics: first upper, rest lower; Korean unchanged") {
    assert(MultiSourceAdEtl.capitalizeName("AMOUNT SPENT (USD)") == "Amount spent (usd)")
    assert(MultiSourceAdEtl.capitalizeName("by Day") == "By day")
    assert(MultiSourceAdEtl.capitalizeName("연령 및 성별") == "연령 및 성별")
    assert(MultiSourceAdEtl.capitalizeName("웹사이트 URL") == "웹사이트 url")
  }
}
