package graft.marketviz

import graft.functions.ProductAgg.product_agg
import graft.operators.CoreOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference pipeline (SunnyChaturvedi/MarketViz) re-expressed as lazy
  * Spark transforms. The reference computes everything row-at-a-time in
  * Python/SQLite over one month of 120 tickers; here every stage is a
  * declarative DataFrame transform that holds at arbitrary scale: per-ticker
  * framing becomes `Window.partitionBy("ticker")`, per-date loops become a
  * single `groupBy("date")`, and N+1 point lookups become joins.
  */
object Schemas {
  /** `stocks` table (`/root/reference/src/data/database_manager.py:13-22`). */
  val stocks: StructType = StructType(Seq(
    StructField("ticker", StringType, nullable = false),
    StructField("date", DateType, nullable = false),
    StructField("share_price", DoubleType),
    StructField("market_cap", DoubleType),
    StructField("effective_shares_outstanding", DoubleType)))

  /** `index_data` (`database_manager.py:24-31`); composition is a real
    * ordered array, not the reference's CSV-in-TEXT smuggling
    * (`equal_weight_index.py:48`). */
  val indexData: StructType = StructType(Seq(
    StructField("date", DateType, nullable = false),
    StructField("index_value", DoubleType),
    StructField("composition", ArrayType(StringType))))
}

object Ingest {
  /** S2: `'/' -> '-'` ticker normalization (`stock_data_fetcher.py:116`). */
  def normalizeSymbol(c: Column): Column = translate(c, "/", "-")

  /** P1-P6 + A2/W5 + J1: split adjustment. Input `raw` has one row per
    * (ticker, date) with `close` and `stock_splits` (0.0 = no split); `dim`
    * is the tiny `(ticker, shares_outstanding)` table — broadcast, the
    * reference applies it as a per-ticker Python scalar
    * (`stock_data_fetcher.py:59-68`).
    *
    * The reference walks each ticker newest-first and cumprods the split
    * factor (`:52,:64-66`): a row's cumulative factor includes every split
    * on dates AFTER OR ON its own date, so
    * `effective_shares = shares_outstanding / cumFactor` and
    * `market_cap = close * effective_shares`. The newest-first pandas
    * cumprod maps to a window ordered `date DESC` with an
    * unbounded-preceding frame — per-ticker partitions, no global sort (P1's
    * `[::-1]` reversal dissolves into the frame direction).
    *
    * The inner join reproduces S4's raise-on-missing by dropping tickers
    * absent from the dim (`stock_data_fetcher.py:59-62`); use
    * `requireShares` to assert instead.
    */
  def splitAdjust(raw: DataFrame, dim: DataFrame, requireShares: Boolean = false): DataFrame = {
    val w = Window.partitionBy("ticker").orderBy(col("date").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val factor = when(col("stock_splits") === 0d, 1d).otherwise(col("stock_splits"))
    val joined =
      raw.join(broadcast(dim.filter(col("shares_outstanding").isNotNull)),
        Seq("ticker"), if (requireShares) "left" else "inner")
    val checked =
      if (requireShares)
        // assert_true returns null when the condition holds and raises
        // otherwise — reproduces the reference's ValueError (S4).
        joined.withColumn("shares_outstanding",
          when(assert_true(col("shares_outstanding").isNotNull,
            concat(lit("Shares outstanding data not available for "), col("ticker"))).isNull,
            col("shares_outstanding")))
      else joined
    checked
      .withColumn("cum_split_factor", product_agg(factor).over(w))
      .withColumn("effective_shares_outstanding",
        col("shares_outstanding") / col("cum_split_factor"))
      .withColumn("share_price", col("close"))
      .withColumn("market_cap", col("share_price") * col("effective_shares_outstanding"))
      .select("ticker", "date", "share_price", "market_cap", "effective_shares_outstanding")
  }

  /** S6/S7: `INSERT OR REPLACE` last-write-wins upsert. */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
             version: Seq[Column]): DataFrame =
    CoreOps.upsertLastWins(existing, incoming, keys, version)
}

object IndexCalculator {
  /** §3.1's per-day loop (`app.py:22-23` + `equal_weight_index.py:9-54`) as
    * ONE lazy DAG over all dates: per-date top-K by market cap
    * (tiebreak ticker — the reference relies on stable sort), index value
    * Σ(share_price)/K (constant-K divisor even for short days,
    * `equal_weight_index.py:47`), composition as the cap-ordered ticker
    * array. One shuffle on `date`; rank-limit pushdown keeps K rows per
    * partition before the agg.
    */
  def computeIndex(stocks: DataFrame, k: Int): DataFrame =
    CoreOps.topKPerGroup(stocks,
        part = Seq(col("date")),
        order = Seq(col("market_cap").desc, col("ticker")), k = k)
      .groupBy(col("date"))
      .agg(
        (sum(col("share_price")) / k).as("index_value"),
        CoreOps.orderedCollect(col("rn"), col("ticker")).as("composition"))

  /** §3.3 point query (`equal_weight_index.py:56-71`). */
  def indexAtDate(indexData: DataFrame, date: java.sql.Date): DataFrame =
    indexData.filter(col("date") === lit(date))
}

object Analytics {
  /** W3+W4 (`dashboard.py:193-201`): daily and cumulative percent returns.
    * Single ordered window — the index series is one row per date (30 in
    * the reference; at scale, callers partition by instrument first). */
  def summaryMetrics(indexData: DataFrame): DataFrame = {
    val ordered = Seq(col("date"))
    val withDaily = CoreOps.lagReturn(indexData, Nil, ordered, col("index_value"), "daily_return")
    CoreOps.returnFromFirst(withDaily, Nil, ordered, col("index_value"), "cumulative_return")
  }

  /** The headline stat tiles (`dashboard.py:146-156`): latest index value,
    * absolute daily change, percent daily return — last two rows of the
    * ordered series, as one row. */
  def statistics(indexData: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("date"))
    indexData
      .withColumn("prev", lag(col("index_value"), 1).over(w))
      .orderBy(col("date").desc).limit(1)
      .select(
        col("index_value").as("current_value"),
        (col("index_value") - col("prev")).as("daily_change"),
        ((col("index_value") - col("prev")) / col("prev") * 100).as("daily_return"))
  }

  /** W6 (`dashboard.py:158-172`): dates whose constituent SET differs from
    * the previous date's (order changes alone don't count — the reference
    * compares `set(...)`). */
  def compositionChangeDates(indexData: DataFrame): DataFrame =
    CoreOps.lagSetDiff(indexData.select(col("date"), col("composition").as("arr")),
        Nil, Seq(col("date")), col("arr"))
      .filter(col("prev").isNotNull && (size(col("added")) > 0 || size(col("removed")) > 0))
      .select("date")

  /** W7 (`dashboard.py:174-190`): per-date `+(added) , -(removed)` strings,
    * order-preserving, `-` for unchanged and for the first date. */
  def compositionChanges(indexData: DataFrame): DataFrame =
    CoreOps.lagArrayDiff(indexData.select(col("date"), col("composition").as("arr")),
        Nil, Seq(col("date")), col("arr"))
      .select(col("date"),
        CoreOps.changeString(col("added"), col("removed")).as("composition_changes"))

  /** J2+A4+P10 (`dashboard.py:88-144`): market-cap distribution of the
    * latest composition — top-`k` constituents individually (cap in
    * billions, 1dp) plus one OTHERS bucket. The reference's N+1 per-ticker
    * lookups collapse into: latest caps per ticker (W1) joined to the
    * exploded composition (broadcast — K rows), bucketed, one agg. */
  def pieDistribution(stocks: DataFrame, composition: DataFrame, k: Int): DataFrame = {
    val latestCaps = CoreOps.latestPerGroup(stocks.select("ticker", "date", "market_cap"),
      Seq(col("ticker")), Seq(col("date").desc))
    val exploded = composition
      .select(posexplode(col("composition")).as(Seq("pos", "ticker")))
    exploded.join(latestCaps.drop("date"), Seq("ticker"))
      .withColumn("bucket", when(col("pos") < k, col("ticker")).otherwise(lit("OTHERS")))
      .groupBy("bucket")
      .agg(round(sum(col("market_cap")) / 1e9, 1).as("market_cap_billions"),
           min("pos").as("pos"))
      .orderBy("pos")
      .drop("pos")
  }

  /** J4 (`dashboard.py:317-349`): composition at `selected` with holiday
    * fallback — walk back at most 4 days (the reference errors once 5
    * look-backs fail); empty result = the reference's error path. */
  def asOfComposition(indexData: DataFrame, selected: java.sql.Date): DataFrame = {
    val sel = lit(selected)
    CoreOps.latestPerGroup(
      indexData.filter(col("date") <= sel && col("date") >= date_sub(sel, 4)),
      part = Nil, order = Seq(col("date").desc))
  }

  /** O3+O2 (`dashboard.py:364-373`): last `n` dates of the metrics table,
    * newest first. */
  def tailReport(metrics: DataFrame, n: Int): DataFrame =
    metrics.orderBy(col("date").desc).limit(n)
}

/** §5's golden report shapes — the three xlsx sheets the reference commits
  * (`dashboard.py:203-226`), as DataFrames; actual file emission is an
  * export boundary (see [[SheetWriter]]).
  *
  * Row order: the reference reverses its metrics frame to NEWEST-FIRST
  * before exporting (`dashboard.py:372` then `:387`), so all three sheets
  * are `Date` descending. */
object Exports {
  def performanceSheet(indexData: DataFrame): DataFrame =
    Analytics.summaryMetrics(indexData)
      .select(col("date").as("Date"), col("index_value").as("Price"),
        col("daily_return").as("Daily Return (%)"),
        col("cumulative_return").as("Cumulative Return (%)"))
      .orderBy(col("Date").desc)

  def compositionSheet(indexData: DataFrame): DataFrame =
    indexData.select(col("date").as("Date"),
      array_join(col("composition"), ",").as("Composition")).orderBy(col("Date").desc)

  /** The export sheet's alignment is NOT the dashboard's: the reference
    * RE-runs `_get_composition_changes_tickers` inside `_export_to_excel`
    * (`dashboard.py:217`) on the frame that was already reversed to
    * newest-first (`dashboard.py:372`), so on the export sheet each row's
    * "prev" neighbor is the OLDER date and the diff comes out inverted —
    * row at date d is labeled `+(comp(older) \ comp(d)) , -(comp(d) \
    * comp(older))` (chronologically-removed tickers appear under '+'),
    * and the length-pad '-' (`dashboard.py:188-190`) lands on the OLDEST
    * row. Verified cell-for-cell against the committed golden
    * `index_data.xlsx` sheet 3 (e.g. the 11-29→12-02 transition shows
    * `+(TTE) , -(PANW)` on 2024-12-02 though PANW was the one added).
    * That is exactly [[CoreOps.lagArrayDiff]] over date ASC with the
    * added/removed roles SWAPPED in the label; in-paren order follows the
    * source arrays (older comp for '+', current comp for '-'), which the
    * order-preserving filter diff keeps. The chronological/display
    * alignment (W7) lives in [[Analytics.compositionChanges]]. Global
    * window is the sanctioned date-grain single series. */
  def changesSheet(indexData: DataFrame): DataFrame =
    CoreOps.lagArrayDiff(
        indexData.select(col("date"), col("composition").as("arr")),
        part = Nil, order = Seq(col("date")), col("arr"))
      .select(col("date").as("Date"),
        CoreOps.changeString(col("removed"), col("added")).as("Composition Changes"))
      .orderBy(col("Date").desc)
}

/** S9 file emission. The reference writes one xlsx with three sheets via
  * xlsxwriter (`dashboard.py:203-226`); `writeXlsx` reproduces that as a
  * real `index_data.xlsx` — same workbook shape (sheet names, header row,
  * newest-first rows) — via the dependency-free [[XlsxWriter]].
  * `writeAll` keeps the CSV-per-sheet form for pipelines that want
  * re-readable plain text. `coalesce(1)` / driver collect is deliberate:
  * a report sheet is dashboard-sized output (the reference exports 30
  * rows), not data-plane output — the upstream plan still computes
  * distributed. */
object SheetWriter {
  /** The golden workbook's three sheets, by their committed names. */
  def sheets(indexData: DataFrame): Seq[(String, DataFrame)] = Seq(
    "Performance" -> Exports.performanceSheet(indexData),
    "Composition" -> Exports.compositionSheet(indexData),
    "Composition Changes" -> Exports.changesSheet(indexData))

  /** One `.xlsx` workbook, three sheets — the reference's export file. */
  def writeXlsx(indexData: DataFrame, file: String): Unit =
    XlsxWriter.write(indexData.sparkSession, sheets(indexData), file)

  def writeAll(indexData: DataFrame, dir: String): Unit =
    sheets(indexData).foreach { case (name, df) => write(df, s"$dir/$name") }

  private def write(sheet: DataFrame, path: String): Unit =
    sheet.coalesce(1).write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("header", "true").csv(path)
}
