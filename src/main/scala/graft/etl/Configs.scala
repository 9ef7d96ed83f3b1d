package graft.etl

import org.apache.spark.sql.types._

/** The five shipped pipeline configurations, as data — transcribed from the
  * reference's entry-point scripts (values, not code): apsl
  * (`scripts/apsl_internal.py:25-135`), podl (`scripts/podl_daily.py:24-104`),
  * mnb (`scripts/manaboo_daily.py:26-90`), like_eat
  * (`scripts/like_eat.py:25-98`), kcon (`multi_source_ad_etl.py:213-273`).
  * Type mapping per SURVEY §1.2: String→StringType, Int64→LongType,
  * Float64→DoubleType, Date→DateType.
  */
object Configs {

  private def schema(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t, nullable = true) })

  // ---------------------------------------------------------------- apsl
  val apsl: EtlConfig = EtlConfig(
    sourceCriteria = Seq(
      "Meta" -> Set("Day", "Purchases conversion value"),
      "Meta_OLIVE" -> Set("Purchases with shared items", "Purchases conversion value for shared items only"),
      "Meta_Lead" -> Set("Leads", "Leads conversion value"),
      "X (Twitter)" -> Set("Time period", "Cart additions"),
      "TikTok" -> Set("Cost", "Clicks (destination)")
    ),
    renameMappings = Map(
      "Meta" -> Map(
        "Day" -> "Day", "Account name" -> "Account name", "Campaign name" -> "Campaign name",
        "Ad set name" -> "Ad set name", "Ad name" -> "Ad name",
        "Amount spent (usd)" -> "Amount spent (USD)", "Impressions" -> "Impressions",
        "Reach" -> "Reach", "Frequency" -> "Frequency", "Link clicks" -> "Link clicks",
        "Registrations completed" -> "Registrations completed", "Adds to cart" -> "Adds to cart",
        "Checkouts initiated" -> "Checkouts initiated", "Purchases" -> "Purchases",
        "Purchases conversion value" -> "Purchases conversion value"),
      "Meta_OLIVE" -> Map(
        "Day" -> "Day", "Campaign name" -> "Campaign name", "Ad set name" -> "Ad set name",
        "Ad name" -> "Ad name", "Amount spent (usd)" -> "Amount spent (USD)",
        "Impressions" -> "Impressions", "Frequency" -> "Frequency", "Reach" -> "Reach",
        "Link clicks" -> "Link clicks", "Adds to cart with shared items" -> "Adds to cart",
        "Purchases with shared items" -> "Purchases",
        "Purchases conversion value for shared items only" -> "Purchases conversion value"),
      "Meta_Lead" -> Map(
        "Day" -> "Day", "Campaign name" -> "Campaign name", "Ad set name" -> "Ad set name",
        "Ad name" -> "Ad name", "Amount spent (usd)" -> "Amount spent (USD)",
        "Impressions" -> "Impressions", "Frequency" -> "Frequency", "Reach" -> "Reach",
        "Link clicks" -> "Link clicks", "Leads" -> "Leads"),
      "X (Twitter)" -> Map(
        "Time period" -> "Day", "Funding source name" -> "Account name",
        "Ad group name" -> "Ad set name", "Campaign name" -> "Campaign name",
        "Spend" -> "Amount spent (USD)", "Impressions" -> "Impressions",
        "Link clicks" -> "Link clicks", "Leads" -> "Registrations completed",
        "Cart additions" -> "Adds to cart", "Checkouts initiated" -> "Checkouts initiated",
        "Purchases" -> "Purchases", "Purchases - sale amount" -> "Purchases conversion value"),
      "TikTok" -> Map(
        "By day" -> "Day", "Account name" -> "Account name", "Campaign name" -> "Campaign name",
        "Ad group name" -> "Ad set name", "Ad name" -> "Ad name",
        "Cost" -> "Amount spent (USD)", "Impressions" -> "Impressions",
        "Frequency" -> "Frequency", "Reach" -> "Reach",
        "Clicks (destination)" -> "Link clicks", "Adds to cart (website)" -> "Adds to cart",
        "Checkouts initiated (website)" -> "Checkouts initiated",
        "Purchases (website)" -> "Purchases",
        "Purchase value (website)" -> "Purchases conversion value")
    ),
    standardSchema = schema(
      "Day" -> DateType, "Source" -> StringType, "Account name" -> StringType,
      "Campaign name" -> StringType, "Ad set name" -> StringType, "Ad name" -> StringType,
      "Amount spent (USD)" -> DoubleType, "Impressions" -> LongType, "Reach" -> LongType,
      "Frequency" -> DoubleType, "Link clicks" -> LongType,
      "Registrations completed" -> LongType, "Adds to cart" -> LongType,
      "Checkouts initiated" -> LongType, "Purchases" -> LongType,
      "Purchases conversion value" -> DoubleType, "Leads" -> LongType),
    cleaners = Map(
      "TikTok" -> Seq(Cleaners.removeTiktokTotalRow),
      "X (Twitter)" -> Seq(Cleaners.cleanXAvgFrequency))
  )

  // ---------------------------------------------------------------- podl
  val podl: EtlConfig = EtlConfig(
    sourceCriteria = Seq(
      "Meta" -> Set("Day", "Gender"),
      "TikTok" -> Set("Cost", "Clicks (destination)")
    ),
    renameMappings = Map(
      "Meta" -> Map(
        "Day" -> "Day", "Campaign name" -> "Campaign name", "Ad Set Name" -> "Ad Set Name",
        "Ad name" -> "Ad name", "Gender" -> "Gender", "Age" -> "Age",
        "Amount spent (USD)" -> "Amount spent (USD)", "Impressions" -> "Impressions",
        "Frequency" -> "Frequency", "Reach" -> "Reach",
        "Unique outbound clicks" -> "Unique outbound clicks", "Link clicks" -> "Link clicks",
        "Video plays" -> "Video plays", "Video plays at 25%" -> "Video plays at 25%",
        "Video plays at 50%" -> "Video plays at 50%", "Video plays at 75%" -> "Video plays at 75%",
        "Video plays at 100%" -> "Video plays at 100%", "Adds to cart" -> "Adds to cart",
        "Checkouts Initiated" -> "Checkouts Initiated", "Purchases" -> "Purchases",
        "Purchases conversion value" -> "Purchases conversion value"),
      "TikTok" -> Map(
        "By Day" -> "Day", "Campaign name" -> "Campaign name", "Ad group name" -> "Ad Set Name",
        "Ad name" -> "Ad name", "Cost" -> "Amount spent (USD)", "Impressions" -> "Impressions",
        "Frequency" -> "Frequency", "Reach" -> "Reach",
        "Clicks (destination)" -> "Link clicks", "Video views" -> "Video plays",
        "Video views at 25%" -> "Video plays at 25%", "Video views at 50%" -> "Video plays at 50%",
        "Video views at 75%" -> "Video plays at 75%", "Video views at 100%" -> "Video plays at 100%",
        "Adds to cart (website)" -> "Adds to cart",
        "Checkouts initiated (website)" -> "Checkouts Initiated",
        "Purchases (website)" -> "Purchases",
        "Purchase value (website)" -> "Purchases conversion value")
    ),
    standardSchema = schema(
      "Source" -> StringType, "Day" -> DateType, "Campaign name" -> StringType,
      "Ad Set Name" -> StringType, "Ad name" -> StringType, "Gender" -> StringType,
      "Age" -> StringType, "Website URL" -> StringType, "Amount spent (USD)" -> DoubleType,
      "Impressions" -> LongType, "Frequency" -> DoubleType, "Reach" -> LongType,
      "Unique outbound clicks" -> LongType, "Link clicks" -> LongType,
      "Video plays" -> LongType, "Video plays at 25%" -> LongType,
      "Video plays at 50%" -> LongType, "Video plays at 75%" -> LongType,
      "Video plays at 100%" -> LongType, "Adds to cart" -> LongType,
      "Checkouts Initiated" -> LongType, "Purchases" -> LongType,
      "Purchases conversion value" -> DoubleType),
    cleaners = Map("TikTok" -> Seq(Cleaners.removeTiktokTotalRow))
  )

  // ----------------------------------------------------------------- mnb
  val mnb: EtlConfig = EtlConfig(
    sourceCriteria = Seq(
      "Meta" -> Set("Campaign name", "Day"),
      "X (Twitter)" -> Set("Objective", "Time period")
    ),
    renameMappings = Map(
      "Meta" -> Map(
        "Day" -> "Day", "Campaign name" -> "Campaign name", "Ad Set Name" -> "Ad Set Name",
        "Ad name" -> "Ad name", "Gender" -> "Gender", "Age" -> "Age",
        "Link (ad settings)" -> "Link (ad settings)", "Amount spent (USD)" -> "Amount spent (USD)",
        "Impressions" -> "Impressions", "Frequency" -> "Frequency", "Reach" -> "Reach",
        "Clicks (all)" -> "Clicks (all)", "ThruPlays" -> "ThruPlays",
        "3-second video plays" -> "3-second video plays",
        "Registrations Completed" -> "Registrations Completed", "Purchases" -> "Purchases",
        "Purchases conversion value" -> "Purchases conversion value",
        "Video plays" -> "Video plays"),
      "X (Twitter)" -> Map(
        "Time period" -> "Day", "Campaign name" -> "Campaign name",
        "Spend" -> "Amount spent (USD)", "Impressions" -> "Impressions",
        "Average frequency" -> "Frequency", "Total audience reach" -> "Reach",
        "Clicks" -> "Clicks (all)", "Video completions" -> "ThruPlays",
        "3s/100% video views" -> "3-second video plays",
        "Leads" -> "Registrations Completed", "Purchases" -> "Purchases",
        "Purchases - sale amount" -> "Purchases conversion value",
        "Video views" -> "Video plays")
    ),
    standardSchema = schema(
      "Source" -> StringType, "Day" -> DateType, "Campaign name" -> StringType,
      "Ad Set Name" -> StringType, "Ad name" -> StringType, "Gender" -> StringType,
      "Age" -> StringType, "Link (ad settings)" -> StringType,
      "Amount spent (USD)" -> DoubleType, "Impressions" -> LongType,
      "Frequency" -> DoubleType, "Reach" -> LongType, "Clicks (all)" -> LongType,
      "ThruPlays" -> LongType, "3-second video plays" -> LongType,
      "Registrations Completed" -> LongType, "Purchases" -> LongType,
      "Purchases conversion value" -> DoubleType, "Video plays" -> LongType),
    cleaners = Map("X (Twitter)" -> Seq(Cleaners.cleanXAvgFrequency))
  )

  // ------------------------------------------------------------- like_eat
  val likeEat: EtlConfig = EtlConfig(
    sourceCriteria = Seq(
      "Meta_naver" -> Set("공유 항목이 포함된 구매", "공유 항목이 포함된 장바구니에 담기"),
      "Naver_GFA" -> Set("연령 및 성별", "애셋 그룹 이름")
    ),
    renameMappings = Map(
      "Meta_naver" -> Map(
        "일" -> "일", "캠페인 이름" -> "캠페인 이름", "광고 세트 이름" -> "광고 세트 이름",
        "광고 이름" -> "광고 이름", "웹사이트 url" -> "웹사이트 URL",
        "지출 금액 (krw)" -> "지출 금액 (KRW)", "노출" -> "노출", "빈도" -> "빈도",
        "도달" -> "도달", "링크 클릭" -> "링크 클릭",
        "공유 항목이 포함된 장바구니에 담기" -> "장바구니 담기",
        "공유 항목이 포함된 구매" -> "구매",
        "공유 항목의 구매 전환값" -> "구매 전환값",
        "동영상 25% 재생" -> "동영상 25% 재생", "동영상 50% 재생" -> "동영상 50% 재생",
        "동영상 75% 재생" -> "동영상 75% 재생", "동영상 95% 재생" -> "동영상 95% 재생",
        "동영상 100% 재생" -> "동영상 100% 재생", "동영상 재생" -> "동영상 재생",
        "Thruplay" -> "ThruPlay"),
      "Naver_GFA" -> Map(
        "기간" -> "일", "애셋 그룹 이름" -> "광고 세트 이름", "캠페인 이름" -> "캠페인 이름",
        "총 비용" -> "지출 금액 (KRW)", "노출" -> "노출", "클릭" -> "링크 클릭",
        "구매완료수" -> "구매", "장바구니 담기수" -> "장바구니 담기",
        "구매완료 전환 매출액" -> "구매 전환값")
    ),
    standardSchema = schema(
      "Source" -> StringType, "일" -> DateType, "캠페인 이름" -> StringType,
      "광고 세트 이름" -> StringType, "광고 이름" -> StringType, "성" -> StringType,
      "연령" -> StringType, "웹사이트 URL" -> StringType, "지출 금액 (KRW)" -> DoubleType,
      "노출" -> LongType, "빈도" -> DoubleType, "도달" -> LongType, "링크 클릭" -> LongType,
      "장바구니 담기" -> LongType, "구매" -> LongType, "구매 전환값" -> DoubleType,
      "동영상 25% 재생" -> LongType, "동영상 50% 재생" -> LongType,
      "동영상 75% 재생" -> LongType, "동영상 95% 재생" -> LongType,
      "동영상 100% 재생" -> LongType, "동영상 재생" -> LongType, "ThruPlay" -> LongType),
    cleaners = Map(
      "Naver_GFA" -> Seq(Cleaners.cleanNaverGfaAgeGender, Cleaners.cleanNaverGfaDate))
  )

  // ---------------------------------------------------------------- kcon
  val kcon: EtlConfig = EtlConfig(
    sourceCriteria = Seq(
      "Meta" -> Set("Campaign name", "Day"),
      "TikTok" -> Set("By Day", "Cost"),
      "X (Twitter)" -> Set("Time period", "Spend")
    ),
    renameMappings = Map(
      "Meta" -> Map(
        "Day" -> "Day", "Campaign name" -> "Campaign name", "Ad Set Name" -> "Ad Set Name",
        "Ad name" -> "Ad name", "Gender" -> "Gender", "Age" -> "Age",
        "Amount spent (KRW)" -> "Amount spent (Raw)", "Currency" -> "Currency",
        "Impressions" -> "Impressions", "Clicks (all)" -> "Clicks (all)",
        "Link clicks" -> "Link clicks"),
      "TikTok" -> Map(
        "By Day" -> "Day", "Campaign name" -> "Campaign name", "Ad group name" -> "Ad Set Name",
        "Ad name" -> "Ad name", "Gender" -> "Gender", "Age" -> "Age",
        "Cost" -> "Amount spent (Raw)", "Currency" -> "Currency",
        "Impressions" -> "Impressions", "Clicks (all)" -> "Clicks (all)",
        "Clicks (destination)" -> "Link clicks"),
      "X (Twitter)" -> Map(
        "Time period" -> "Day", "Campaign name" -> "Campaign name",
        "Ad Group name" -> "Ad Set Name", "Ad name" -> "Ad name",
        "Spend" -> "Amount spent (Raw)", "Currency" -> "Currency",
        "Impressions" -> "Impressions", "Clicks" -> "Clicks (all)",
        "Link clicks" -> "Link clicks")
    ),
    standardSchema = schema(
      "Source" -> StringType, "Day" -> DateType, "Campaign name" -> StringType,
      "Ad Set Name" -> StringType, "Ad name" -> StringType, "Age" -> StringType,
      "Gender" -> StringType, "Amount spent (Raw)" -> StringType, "Currency" -> StringType,
      "Impressions" -> LongType, "Clicks (all)" -> LongType, "Link clicks" -> LongType)
  )

  /** All shipped pipelines, by name, with whether the reference script runs
    * the capitalize step (`apsl_internal.py:148`, `like_eat.py:110`; podl and
    * mnb skip it).
    */
  val all: Map[String, (EtlConfig, Boolean)] = Map(
    "apsl" -> (apsl, true),
    "podl" -> (podl, false),
    "mnb" -> (mnb, false),
    "like_eat" -> (likeEat, true),
    "kcon" -> (kcon, false)
  )
}
