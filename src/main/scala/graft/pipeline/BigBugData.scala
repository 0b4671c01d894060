package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.{CsvSink, ReportReader}
import graft.ops._
import graft.schema.ReportSchema._

/** The reference's `run()` (`bigbugdata.py:225–366`) as one lazy Spark DAG.
  *
  * Reference stage → engine stage:
  *   fused scan (totals + stats + counts)  → one cached report scan,
  *                                           three derived frames
  *   wide dicts, eager between steps       → long-format DataFrames,
  *                                           single lazy plan; pivot only
  *                                           at the CSV sinks
  *   driver-side regex groups              → NcGroups (sample universe is
  *                                           the file list — never data)
  *
  * Shuffle boundaries land exactly where the math demands: groupBy
  * (sample), groupBy (taxID, sample), window over taxID, window over
  * sample, join on (sample, taxID).
  */
object BigBugData {

  final case class Params(
      reportPaths: Seq[String],
      resultsDir: String,
      rank: String = "species",
      nTophits: Int = 15,
      groupPatterns: Seq[(String, String)] = Nil,
      /** plan tophits with the bounded-heap TopKPerKey operator instead of
        * the window — identical output, O(k) memory per sample */
      nativeTopK: Boolean = false)

  final case class Outputs(
      combined: DataFrame,   // long: taxID, taxName, total, sample, reads
      rrpm: DataFrame,       // long: + rpm, rrpm
      tophits: DataFrame,    // sampleName, taxID, taxName, rank, rRPM, stats…
      orderedSamples: Seq[String])

  /** Build the full dataflow; actions happen only in [[write]]. */
  def build(spark: SparkSession, params: Params): Outputs = {
    val samplePaths = ReportReader.sampleIdMap(params.reportPaths)
    val sampleIds = samplePaths.map(_._1)
    val ordered = ReportReader.orderedSampleIds(sampleIds)

    val reports = ReportReader.readReports(spark, samplePaths.map(_._2)).cache()

    val totals = TaxaOps.sampleTotals(reports)
    // fail loudly where the reference would KeyError (§7.4 trap 10)
    val withTotals = totals.select(Sample).collect().map(_.getString(0)).toSet
    val missingTotals = sampleIds.filterNot(withTotals)
    if (missingTotals.nonEmpty)
      throw new IllegalStateException(
        "No taxID 0/1 rows (cannot compute total reads) for sample(s): " +
          missingTotals.mkString(", "))

    val taxa = TaxaOps.taxaRows(reports, params.rank)
    val counts = TaxaOps.longCounts(taxa)
    val meta = TaxaOps.taxaMeta(taxa)
    val grid = TaxaOps.denseGrid(spark, counts, meta, sampleIds)

    val rpmGrid = Normalize.rpm(grid, totals)
    val zGrid = Normalize.zscore(rpmGrid).cache()

    val groups = NcGroups.resolve(sampleIds, params.groupPatterns)
    val sampleToNc = NcGroups.sampleToControl(sampleIds, groups)
    // cached: the rrpm sink and the tophits window both consume this
    val rrpmGrid = Normalize.rrpm(spark, zGrid, sampleToNc).cache()

    val stats = TaxaOps.sampleOrganismStats(taxa)
      .join(zGrid.select(col(Sample), col(TaxId), col("z_score")),
        Seq(Sample, TaxId), "left")
    val tops = TopHits.tophits(rrpmGrid, stats, params.nTophits,
      native = params.nativeTopK)

    Outputs(grid, rrpmGrid, tops, ordered)
  }

  /** Pivot long → wide for the CSV contract: columns
    * [taxID, taxName, Total # of Reads] ++ orderedSamples, rows sorted by
    * taxID (O1/O2). Explicit pivot values skip Spark's distinct-collect
    * job and pin column order. (Kept as the readable twin / parity
    * reference for [[csvLines]] — the sinks use the long path.) */
  def pivotWide(long: DataFrame, valueCol: String,
      orderedSamples: Seq[String]): DataFrame =
    long.groupBy(col(TaxId), col(TaxName),
        col("total_reads_organism").as("Total # of Reads"))
      .pivot(Sample, orderedSamples)
      .agg(first(col(valueCol)))
      .orderBy(col(TaxId))

  /** Long-format CSV assembly: ONE output line per organism built by a
    * sample-ordered collect_list of pre-quoted cells — byte-identical to
    * pivotWide + Spark's CSV writer (PipelineSpec pins it), but the plan
    * stays LONG: one groupBy(taxID) shuffle and string concat instead of
    * materializing an S-thousand-column frame at the sink (the measured
    * ~40% of the 320M-cell wall; wide-row codegen cost grows with S, this
    * path's per-row cost is a list sort + join, independent of the
    * schema). */
  def csvLines(long: DataFrame, valueCol: String,
      orderedSamples: Seq[String]): DataFrame = {
    val idx = coalesce(element_at(
      map(orderedSamples.zipWithIndex.flatMap { case (s, i) =>
        Seq(lit(s), lit(i)) }: _*), col(Sample)), lit(Int.MaxValue))
    val cells = array_join(transform(
      array_sort(collect_list(struct(idx.as("i"),
        CsvSink.csvCellExpr(col(valueCol)).as("c")))),
      x => x.getField("c")), ",")
    long.groupBy(col(TaxId), col(TaxName), col("total_reads_organism"))
      .agg(cells.as("cells"))
      .select(col(TaxId),
        concat_ws(",",
          CsvSink.csvCellExpr(col(TaxId)),
          CsvSink.csvCellExpr(col(TaxName)),
          CsvSink.csvCellExpr(col("total_reads_organism")),
          col("cells")).as("line"))
      .orderBy(col(TaxId))
      .select("line")
  }

  /** Execute and write the three CSVs (K1/K2). */
  def write(spark: SparkSession, params: Params): Outputs = {
    val out = build(spark, params)
    val (combinedPath, rrpmPath, tophitsPath) =
      CsvSink.outputPaths(params.resultsDir, params.rank)
    val header = Seq(TaxId, TaxName, "Total # of Reads") ++ out.orderedSamples

    CsvSink.writeSingleLines(
      csvLines(out.combined, Reads, out.orderedSamples), header, combinedPath)
    CsvSink.writeSingleLines(
      csvLines(out.rrpm, "rrpm", out.orderedSamples), header, rrpmPath)

    // tophits rows emit in ordered-sample order, then rank (reference
    // iterates samples in order, `bigbugdata.py:176`); literal map
    // instead of a UDF keeps the sort key inside codegen
    val idxExpr = coalesce(element_at(
      map(out.orderedSamples.zipWithIndex.flatMap { case (s, i) =>
        Seq(lit(s), lit(i)) }: _*), col("sampleName")), lit(Int.MaxValue))
    CsvSink.writeSingleCsv(
      out.tophits.orderBy(idxExpr, col("rank")),
      Seq("sampleName", TaxId, TaxName, "rank", "rRPM", "kmers", "dup",
        "reads", "cov", "e_val", "z_score"),
      tophitsPath)
    out
  }
}
