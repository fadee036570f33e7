package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, max, min}
import org.apache.spark.sql.types.StructType

/** Source/sink format surface beyond the reference's text blobs (SURVEY
  * §2b "Scans/sources": the reference reads only whole/ranged text blobs,
  * `src/util/blob.cpp:49-70`; everything else was out of reach for its
  * users). All readers take an EXPLICIT schema — schema inference is a
  * scan of the data (cost) and a nondeterminism hazard (correctness), so
  * at 100 TB it is never the right default.
  *
  * Sinks add the two layout features that matter at scale:
  *  - [[writePartitioned]]: hive-style directory partitioning, so readers
  *    with a partition-column predicate prune entire directories
  *    (PartitionFilters in the scan, verified in FormatsSpec).
  *  - [[writeBucketed]]: pre-shuffled table layout, so equi-joins and
  *    aggregations on the bucket key plan with NO exchange (verified in
  *    FormatsSpec — the join plan has zero shuffles). This is the
  *    "co-located join" story for repeated joins on the same key.
  */
object Formats {

  def readCsv(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema).option("header", "true").csv(paths: _*)

  /** Permissive-parse scan: rows that fail the schema are DROPPED, not
    * errors — the reference reducer's contract (it skips lines that don't
    * split into exactly two tokens and values that fail `int()`,
    * `src/app/reducer.py:11,21-24`). `DROPMALFORMED` is that semantics at
    * the source level: at 100 TB, dirty records are a certainty and a
    * fail-the-job parser is not an option. Headerless, caller-set
    * separator (the reference's `k v` lines are `sep = " "`). */
  def readCsvDropMalformed(spark: SparkSession, schema: StructType, sep: String,
      paths: String*): DataFrame =
    spark.read.schema(schema)
      .option("sep", sep)
      .option("mode", "DROPMALFORMED")
      .csv(paths: _*)

  def readJson(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema).json(paths: _*)

  /** Permissive-parse scan that KEEPS the bad rows: well-formed rows parse
    * into `schema`'s columns, malformed lines land whole in
    * `_corrupt_record` with the data columns null. [[readCsvDropMalformed]]
    * is the reference reducer's silent-drop contract; this is the other
    * thing a 100 TB ingest actually wants — route the rejects to a
    * quarantine sink (filter on `_corrupt_record IS NOT NULL`) so data
    * loss is observable and debuggable instead of silent. */
  def readCsvQuarantine(spark: SparkSession, schema: StructType, sep: String,
      paths: String*): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", org.apache.spark.sql.types.StringType))
      .option("sep", sep)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(paths: _*)

  /** ORC scan with explicit schema — same no-inference contract as the
    * other readers. ORC is the other columnar interchange format a 100 TB
    * warehouse encounters (Hive-lineage pipelines); Spark's native
    * vectorized ORC reader gives it the same pushdown/pruning treatment
    * as parquet (FormatsSpec asserts PushedFilters reach the ORC scan). */
  def readOrc(spark: SparkSession, schema: StructType, paths: String*): DataFrame =
    spark.read.schema(schema).orc(paths: _*)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partitionCols`. Low-cardinality columns only — each distinct tuple
    * is a directory of files. */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Compact a parquet dataset's small files: rewrite `inPath` to
    * `outPath` with files sized near `targetFileBytes`. The small-files
    * problem is a first-order cost at 100 TB (every file is a task, a
    * footer read, an object-store request); streaming sinks and
    * fine-grained partitioned writes both produce it, and periodic
    * compaction is the standard maintenance job. File count comes from the
    * dataset's actual on-disk size, and `coalesce` (not `repartition`)
    * merges without a shuffle. Returns the output file count. */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath).coalesce(nFiles)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    nFiles
  }

  /** COUNT/MIN/MAX answered from parquet FOOTER STATISTICS — no row
    * groups are read at all. At 100 TB this is the difference between a
    * metadata pass (one footer per file) and a full scan for the
    * "how many rows / what key range" queries every pipeline runs before
    * sizing a job. Aggregate pushdown is a DataSource-V2-only feature and
    * bucketed tables need V1, so the V2 reader is scoped to an ISOLATED
    * child session (shares the SparkContext and catalog, owns its
    * SQLConf): flipping `useV1SourceList` there cannot race a concurrent
    * query on the caller's session into the V2 reader (ADVICE r7 — the
    * previous set/restore around `load()` left that window open). The
    * returned frame stays bound to the child session, which keeps the V2
    * resolution stable however late the caller executes it.
    * FormatsSpec asserts `PushedAggregation` lands in the scan. */
  def aggregateFromFooters(spark: SparkSession, path: String, keyCol: String): DataFrame = {
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.parquet.aggregatePushdown", "true")
    val key = "spark.sql.sources.useV1SourceList"
    scoped.conf.set(key,
      scoped.conf.get(key).split(",").map(_.trim).filterNot(_ == "parquet").mkString(","))
    scoped.read.parquet(path).agg(
      count(lit(1)).as("n_rows"),
      min(col(keyCol)).as(s"min_$keyCol"),
      max(col(keyCol)).as(s"max_$keyCol"))
  }

  /** Bucketed + sorted managed table (bucketing requires the table
    * catalog). Joins/aggregations keyed on `bucketCol` against another
    * table bucketed the same way run shuffle-free. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    writeBucketed(df, table, Seq(bucketCol), numBuckets)

  /** Overwrite only replaces a table THIS session's catalog knows about; a
    * managed location left by a previous session still blocks the create
    * (LOCATION_ALREADY_EXISTS). Drop both the catalog entry and any stale
    * directory so the write is idempotent across sessions. The recursive
    * delete is safe only because GraftSession scopes the warehouse dir per
    * process (no other live process can have data there); callers with a
    * shared warehouse should not point external tables under it.
    *
    * Public as [[dropManaged]]: an incremental build that APPENDS batches
    * (no initial overwrite to clear prior state) must drop its target
    * first so a retry after a partial failure starts clean instead of
    * re-appending onto surviving rows. */
  def dropManaged(spark: SparkSession, table: String): Unit =
    dropForOverwrite(spark, table)

  private def dropForOverwrite(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** Multi-column variant: the bucket key is the column tuple (hash of all
    * of them), for tables probed on composite keys — e.g. an LSH signature
    * index bucketed on (band_idx, band_val). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String], numBuckets: Int): Unit = {
    dropForOverwrite(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Plain (unbucketed) managed-table overwrite with the same
    * cross-session idempotence as [[writeBucketed]] — for the small
    * side-tables an index keeps next to its bucketed data (e.g. corpus
    * stats rows). */
  def writeManaged(df: DataFrame, table: String): Unit = {
    dropForOverwrite(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
  }

  /** Append a batch into a bucketed table's layout (creating the table on
    * first use) — the incremental-ingest half of the bucketed-table story.
    * Spark bucketing is per-file: each appended batch writes its own
    * bucket-hashed, per-bucket-sorted files, so readers keep the
    * exchange-free join/aggregation plan over the union, and ONLY the new
    * batch is scanned or written (the existing data is never touched).
    * Each append adds up to one file per bucket; [[compactParquet]]-style
    * maintenance applies when the file count grows. The bucket spec must
    * match the existing table's (Spark enforces this). */
  def writeBucketedAppend(df: DataFrame, table: String, bucketCols: Seq[String],
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Compact a bucketed table back to ONE file per bucket, preserving the
    * bucketed + per-bucket-sorted layout — the maintenance half of the
    * append-based index lifecycle (build → append xN → compact → probe).
    * Every [[writeBucketedAppend]] batch adds its own files per bucket, so
    * a daily-ingest index accumulates files linearly in batches; at 100 TB
    * each file is a task, a footer read, and an object-store request on
    * every probe. The rewrite `repartition`s on the bucket columns first —
    * Spark's bucket placement IS `HashPartitioning` on those columns, so
    * each task holds exactly one bucket's rows and the bucketed write
    * emits exactly one file per non-empty bucket (without the repartition,
    * a T-task write can emit up to T x buckets files — the bucketed-write
    * small-file trap). Rewritten via a staging table, with the visibility
    * switch a SINGLE `ALTER TABLE SET LOCATION` on the live table — a
    * concurrent reader resolving the name at any instant sees a complete
    * table (old files before the alter, compacted files after); the
    * previous drop→rename sequence had a window where the name resolved
    * to nothing. The staging entry is then re-pointed at the ORPHANED old
    * location before being dropped, so the managed-table drop deletes
    * exactly the superseded files. (In-flight scans that already resolved
    * old file paths can still race that delete — the standard
    * non-transactional-catalog caveat; a transactional table format is
    * the production upgrade.) Probes answer identically before and after
    * (same rows, same layout contract — the compacted gate shares its
    * uncompacted twin's oracle). Returns the table's parquet file count
    * after compaction. */
  def compactBucketed(spark: SparkSession, table: String, bucketCols: Seq[String],
      numBuckets: Int): Int = {
    val staging = table + "__compacting"
    dropForOverwrite(spark, staging)
    // read the table's FILES as plain parquet, not `spark.table`: the
    // bucketed scan advertises HashPartitioning(numBuckets), so Catalyst
    // would elide the repartition as redundant — and then the
    // auto-bucketed-scan rule (nothing in this plan requires the bucket
    // distribution) silently reads the small files in arbitrary coalesced
    // splits, producing one file per (task x bucket) instead of one per
    // bucket. A raw file scan carries no partitioning claim, so the
    // shuffle survives and every task holds exactly one bucket's rows.
    val oldLoc = tableLocation(spark, table)
    spark.read.parquet(oldLoc)
      .repartition(numBuckets, bucketCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(staging)
    val newLoc = tableLocation(spark, staging)
    spark.sql(s"ALTER TABLE `$table` SET LOCATION '$newLoc'")
    spark.catalog.refreshTable(table)
    spark.sql(s"ALTER TABLE `$staging` SET LOCATION '$oldLoc'")
    spark.sql(s"DROP TABLE `$staging`")
    bucketedFileCount(spark, table)
  }

  private def tableLocation(spark: SparkSession, table: String): String =
    spark.sql(s"DESCRIBE TABLE EXTENDED `$table`")
      .filter(col("col_name") === "Location").select("data_type")
      .collect()(0).getString(0)

  /** Number of parquet data files under a managed table's location — the
    * quantity compaction exists to bound. */
  def bucketedFileCount(spark: SparkSession, table: String): Int = {
    val loc = new org.apache.hadoop.fs.Path(new java.net.URI(tableLocation(spark, table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(loc, true)
    var n = 0
    while (it.hasNext) { if (it.next().getPath.getName.endsWith(".parquet")) n += 1 }
    n
  }
}
