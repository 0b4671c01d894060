package graft.schema

import org.apache.spark.sql.types._

/** Classifier-report schema (KrakenUniq/Kraken2 TSV).
  *
  * Field order is fixed by the report format — confirmed by the synthesized
  * fallback header at reference `scripts/modify_reports.py:59–73`
  * (`["%","reads","taxReads","kmers","dup","cov","taxID","rank","taxName"]`).
  * The reference keeps everything as strings and casts at use sites
  * (`bigbugdata.py:261,269,272–274`); we type once at the scan boundary.
  */
object ReportSchema {

  val Pct = "pct"
  val Reads = "reads"
  val TaxReads = "taxReads"
  val Kmers = "kmers"
  val Dup = "dup"
  val Cov = "cov"
  val TaxId = "taxID"
  val Rank = "rank"
  val TaxName = "taxName"
  /** engine-added column: sample ID derived from the source file name */
  val Sample = "sample"

  /** taxID 0 = unclassified, 1 = root: both feed per-sample totals and are
    * excluded from taxa data (`bigbugdata.py:258–262`). */
  val TotalTaxIds: Seq[Long] = Seq(0L, 1L)

  val schema: StructType = StructType(Seq(
    StructField(Pct, DoubleType),
    StructField(Reads, LongType),
    StructField(TaxReads, LongType),
    StructField(Kmers, LongType),
    StructField(Dup, DoubleType),
    StructField(Cov, DoubleType),
    StructField(TaxId, LongType),
    StructField(Rank, StringType),
    StructField(TaxName, StringType)))
}
