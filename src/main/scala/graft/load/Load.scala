package graft.load

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import scala.util.{Failure, Success, Try}

/** Sink with the reference's truncate-then-load contract (SURVEY.md §2.7
  * K1-K5; reference `src/utils/database_util.py:37-57`).
  *
  * The reference wraps TRUNCATE + bulk append in one transaction and
  * ROLLBACKs on failure. A naive `SaveMode.Overwrite` to a parquet path
  * does NOT give that guarantee — Spark deletes the target before the
  * write job runs, so a mid-job failure loses the previous contents.
  * We stage into a sibling directory and swap via rename: any failure
  * before the swap leaves the destination untouched.
  */
final case class LoadReport(rows: Long, destination: String)

/** A [[Load.withLock]] acquisition refused because another writer holds
  * the lock. A dedicated type (not a bare IllegalStateException) so
  * retry loops can classify the refusal structurally — matching on the
  * message text would turn a harmless rewording into stream death.
  * Extends IllegalStateException so existing handlers keep working.
  */
final class LockHeldException(message: String, cause: Throwable)
  extends IllegalStateException(message, cause)

object Load {

  /** K2/K3: staged atomic-ish replace of a destination path. Format is
    * any Spark DataSource (parquet default; csv/json/orc supported —
    * csv/json write with headers/schema suitable for re-reading).
    * Returns K4's row-count report on success; K5's structured failure
    * otherwise (destination preserved).
    */
  def replaceTable(
      spark: SparkSession, df: DataFrame, destination: String,
      format: String = "parquet",
      decorateStaging: Path => Unit = _ => ()): Try[LoadReport] = {
    val result = Try {
      val dest = new Path(destination)
      val staging = new Path(destination + "__staging")
      val backup = new Path(destination + "__old")
      val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // A backup WITHOUT a destination means a prior swap's restore
      // failed and the backup holds the only copy of the old table —
      // clearing it on retry would destroy that copy right before
      // re-attempting the same swap (same guard as the catalog and
      // partition variants). A backup beside an existing destination is
      // crash debris from after a successful publish — safe to clear.
      if (fs.exists(backup) && !fs.exists(dest))
        throw new IllegalStateException(
          s"destination $destination is missing but backup $backup exists — a prior " +
            "swap failed and was not restored; recover manually before loading")
      val writer = df.write.mode(SaveMode.Overwrite).format(format)
      (if (format == "csv") writer.option("header", "true") else writer)
        .save(staging.toString)
      // decorateStaging: sidecar metadata (underscore-prefixed files,
      // which Spark readers ignore) written INTO the staging dir so it
      // publishes atomically with the table in the same swap — e.g.
      // streaming.SubstringIngest's applied-batch watermark, which must
      // never be observable without the index state it describes.
      decorateStaging(staging)
      // Count-back with the WRITER's schema: inference would fail on an
      // empty json stage (no rows to infer from) and default csv parsing
      // (multiLine=false) miscounts values containing embedded newlines.
      val rows = reader(spark, format, Some(df.schema))
        .load(staging.toString).count()
      // Swap via backup: the previous table is MOVED aside (not deleted)
      // so a failed staging→dest rename can roll it back — deleting
      // first would lose it exactly when rename fails (cross-filesystem
      // staging, concurrent parent removal, ...).
      if (fs.exists(backup)) fs.delete(backup, true)
      val hadPrev = fs.exists(dest)
      if (hadPrev && !fs.rename(dest, backup))
        throw new java.io.IOException(s"backup rename $dest -> $backup failed")
      try {
        if (!fs.rename(staging, dest))
          throw new java.io.IOException(s"rename $staging -> $dest returned false")
      } catch {
        case e: Throwable =>
          // restore on ANY failure mode (thrown or returned-false), and
          // report honestly whether the restore itself succeeded
          val note =
            if (!hadPrev) ""
            else if (scala.util.Try(fs.rename(backup, dest)).getOrElse(false))
              "; previous table restored"
            else s"; RESTORE FAILED — previous table left at $backup"
          throw new java.io.IOException(s"swap to $dest failed$note", e)
      }
      if (hadPrev) fs.delete(backup, true)
      LoadReport(rows, destination)
    }
    report(result, destination)
  }

  /** Partition-level staged replace: only the partitions PRESENT in
    * `df` are rewritten; every other partition of the destination is
    * untouched. This is the nightly-delta shape a 100 TB store needs —
    * [[replaceTable]] rewrites (and re-reads, and re-swaps) the whole
    * table, a non-starter when the delta touches 1 of 3000 date
    * partitions. Same guarantee per partition as the full swap: new
    * contents are fully staged first; the publish is a rename pair with
    * backup; any failure rolls every already-published partition back.
    *
    * (Spark's own `partitionOverwriteMode=dynamic` INSERT OVERWRITE
    * gives the per-partition scoping but not the backup/restore — a
    * mid-publish crash can leave some partitions new, some old, none
    * recoverable. The staged swap here keeps the old bytes until every
    * partition is published.)
    *
    * `dropPartitions`: destination partition DIRECTORY NAMES
    * (`col=value`) to REMOVE even though the staged delta has no rows
    * for them — an empty partition produces no staging directory, so
    * "this partition is now empty" is inexpressible through `df` alone
    * (a deletion pass that empties a whole partition needs this or the
    * old files silently survive). Drops participate in the same
    * backup/rollback: the old bytes move to the backup root and are
    * restored on any failure.
    */
  def replacePartitions(
      spark: SparkSession, df: DataFrame, destination: String,
      partitionCol: String, format: String = "parquet",
      dropPartitions: Seq[String] = Nil): Try[LoadReport] = {
    val result = Try {
      val dest = new Path(destination)
      val staging = new Path(destination + "__staging")
      val backupRoot = new Path(destination + "__old")
      val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // A NON-EMPTY backup root means a prior publish failed with an
      // incomplete rollback — it holds the ONLY copy of those
      // partitions' old bytes. Deleting it here would destroy them on
      // the retry. Refuse and make the operator decide (an empty dir —
      // debris from a crash between mkdirs and swap — is safe to clear).
      // Checked BEFORE the staging write: a retry against a known-bad
      // backup state must not pay the full delta write first.
      if (fs.exists(backupRoot)) {
        if (fs.listStatus(backupRoot).nonEmpty)
          throw new IllegalStateException(
            s"backup dir $backupRoot is non-empty — a prior partition publish " +
              "failed and was not fully rolled back; recover manually before loading")
        fs.delete(backupRoot, true)
      }
      // argument-shape check BEFORE the staging write — a malformed
      // drop list must fail in milliseconds, not after the delta lands
      require(dropPartitions.forall(_.startsWith(partitionCol + "=")),
        s"dropPartitions entries must be '$partitionCol=<value>' directory names, " +
          s"got ${dropPartitions.filterNot(_.startsWith(partitionCol + "=")).mkString(", ")}")
      val writer = df.write.mode(SaveMode.Overwrite).format(format)
        .partitionBy(partitionCol)
      (if (format == "csv") writer.option("header", "true") else writer)
        .save(staging.toString)
      // count back what was STAGED (the writer's schema — the partition
      // column comes back from the directory names)
      val rows = reader(spark, format, Some(df.schema))
        .load(staging.toString).count()
      val staged = fs.listStatus(staging)
        .filter(_.isDirectory).map(_.getPath.getName)
        .filter(_.startsWith(partitionCol + "="))
      // a partition both staged and dropped would be contradictory;
      // staged content wins (the drop list is for EMPTIED partitions)
      val drops = dropPartitions.filterNot(staged.toSet)
      val parts = staged ++ drops
      fs.mkdirs(backupRoot)
      if (!fs.exists(dest)) fs.mkdirs(dest)
      val swapped = scala.collection.mutable.ListBuffer[String]()
      try {
        staged.foreach { p =>
          val d = new Path(dest, p)
          val b = new Path(backupRoot, p)
          val hadPrev = fs.exists(d)
          if (hadPrev && !fs.rename(d, b))
            throw new java.io.IOException(s"backup rename $d -> $b failed")
          if (!fs.rename(new Path(staging, p), d))
            throw new java.io.IOException(s"publish rename of partition $p failed")
          swapped += p
        }
        drops.foreach { p =>
          val d = new Path(dest, p)
          if (fs.exists(d)) {
            if (!fs.rename(d, new Path(backupRoot, p)))
              throw new java.io.IOException(s"drop rename of partition $p failed")
            swapped += p
          }
        }
      } catch {
        case e: Throwable =>
          val restored = rollbackPartitions(fs, dest, backupRoot, parts.toSeq, swapped.toSet)
          // a fully-restored backup root is empty shell — remove it so the
          // retry isn't refused by the non-empty-backup guard above
          if (restored) Try(fs.delete(backupRoot, true))
          val note =
            if (restored) "; all published partitions rolled back"
            else s"; ROLLBACK INCOMPLETE — previous partitions left at $backupRoot"
          throw new java.io.IOException(s"partition publish to $dest failed$note", e)
      }
      fs.delete(backupRoot, true)
      fs.delete(staging, true) // leftover _SUCCESS marker etc.
      LoadReport(rows, destination)
    }
    report(result, destination)
  }

  /** Small-files compaction: rewrite a table directory into
    * ~`targetBytes`-sized files through the same staged swap as
    * [[replaceTable]] (any failure leaves the original layout intact).
    * The 100 TB hygiene operator: streaming sinks and per-partition
    * delta loads accrete thousands of KB-scale files whose per-file
    * open/footer cost eventually dominates scans; compaction restores
    * scan-sized files. File count = ceil(current bytes / targetBytes)
    * — computed from the live listing, so repeated runs converge and a
    * compacted table is a no-op rewrite.
    */
  def compact(
      spark: SparkSession, destination: String,
      format: String = "parquet", targetBytes: Long = 128L * 1024 * 1024): Try[LoadReport] = {
    Try {
      val dest = new Path(destination)
      val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bytes = fs.getContentSummary(dest).getLength
      val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
      val reader = if (format == "csv")
        spark.read.format(format).option("header", "true") else spark.read.format(format)
      // the staged write fully materializes from the CURRENT files
      // before the swap touches them, so reading-while-replacing is safe
      (nFiles, reader.load(destination).repartition(nFiles))
    }.flatMap { case (nFiles, df) => replaceTable(spark, df, destination, format) }
  }

  /** Roll back every partition TOUCHED by a failed publish — not just
    * the fully published ones: the partition that failed mid-swap may
    * have had its backup rename succeed and its publish rename fail,
    * leaving its old bytes in the backup and its destination dir
    * missing. For each affected partition: drop whatever sits at the
    * destination (staged bytes or nothing), then restore the backup if
    * one exists. Package-private so the spec can exercise the
    * mid-swap states directly (fault injection through the FS layer is
    * not portable).
    */
  private[load] def rollbackPartitions(
      fs: org.apache.hadoop.fs.FileSystem, dest: Path, backupRoot: Path,
      parts: Seq[String], swapped: Set[String]): Boolean =
    parts.map { p => // map-then-forall: attempt EVERY partition — a
      // forall would short-circuit on the first failed restore and
      // abandon the rest even where their renames would succeed
      val d = new Path(dest, p)
      val b = new Path(backupRoot, p)
      Try {
        if (fs.exists(b)) {
          fs.delete(d, true)
          fs.rename(b, d)
        } else if (swapped.contains(p)) fs.delete(d, true) else true
      }.getOrElse(false)
    }.forall(identity)

  /** K2/K3 against a CATALOG TABLE — the shape a warehouse deployment
    * uses (the reference's destination is a warehouse table:
    * `database_util.py:39` TRUNCATE + `:42-49` bulk load + `:57`
    * ROLLBACK). Same contract as [[replaceTable]], delivered through
    * the session catalog instead of a path:
    *
    *  - the new contents are FULLY written to a staging table first —
    *    a mid-write failure leaves the destination untouched (the
    *    transactional guarantee the reference gets from ROLLBACK);
    *  - the publish is a rename pair (dest → __old, staging → dest)
    *    with restore-on-failure, mirroring the path sink's swap;
    *  - an orphaned `__old` WITHOUT a destination means a prior swap's
    *    restore failed — refuse to run rather than guess which copy is
    *    authoritative.
    *
    * No JDBC driver ships in this environment; against a real
    * warehouse the same staged-swap sequence runs as CREATE TABLE
    * staging AS … / ALTER TABLE RENAME, or collapses to the native
    * transactional TRUNCATE+COPY where the warehouse provides one.
    */
  def replaceCatalogTable(
      spark: SparkSession, df: DataFrame, table: String): Try[LoadReport] = {
    val staging = table + "__staging"
    val backup = table + "__old"
    val result = Try {
      val cat = spark.catalog
      if (!cat.tableExists(table) && cat.tableExists(backup))
        throw new IllegalStateException(
          s"destination $table is missing but backup $backup exists — a prior " +
            "swap failed and was not restored; recover manually before loading")
      // leftover staging from a prior failed run is abandoned garbage
      spark.sql(s"DROP TABLE IF EXISTS ${quoted(staging)}")
      df.write.mode(SaveMode.Overwrite).saveAsTable(staging)
      val rows = spark.table(staging).count()
      spark.sql(s"DROP TABLE IF EXISTS ${quoted(backup)}")
      val hadPrev = cat.tableExists(table)
      if (hadPrev) spark.sql(s"ALTER TABLE ${quoted(table)} RENAME TO ${quoted(backup)}")
      try spark.sql(s"ALTER TABLE ${quoted(staging)} RENAME TO ${quoted(table)}")
      catch {
        case e: Throwable =>
          val note =
            if (!hadPrev) ""
            else if (Try(spark.sql(
              s"ALTER TABLE ${quoted(backup)} RENAME TO ${quoted(table)}")).isSuccess)
              "; previous table restored"
            else s"; RESTORE FAILED — previous table left at $backup"
          throw new java.io.IOException(s"publish of $table failed$note", e)
      }
      if (hadPrev) spark.sql(s"DROP TABLE IF EXISTS ${quoted(backup)}")
      LoadReport(rows, table)
    }
    report(result, table)
  }

  /** K2/K3 over a LIVE JDBC CONNECTION — the closest shape to the
    * reference's actual sink (`database_util.py:39-57`: one transaction
    * wrapping TRUNCATE + bulk load, ROLLBACK on failure). Sequence:
    *
    *  1. bulk-write `df` to a STAGING table (`<table>__staging`,
    *     overwritten) — the distributed leg: each partition loads over
    *     its own connection, and any failure here leaves the
    *     destination untouched;
    *  2. in ONE driver-side transaction: empty the destination
    *     (`DELETE FROM` — transactional in every dialect, where
    *     TRUNCATE often is not) and `INSERT … SELECT` the staged rows
    *     across inside the database (no data moves through the
    *     driver); commit; ROLLBACK on any failure — the destination
    *     keeps its previous contents, exactly the reference's K5;
    *  3. best-effort drop of the staging table.
    *
    * A destination that doesn't exist yet is created empty from the
    * staging table's shape before the transaction. Returns K4's
    * row-count report (the INSERT's update count). Verified end-to-end
    * against embedded Derby in LoadSpec (commit, failure-rollback,
    * report); the sequence is dialect-portable — Snowflake/Postgres/
    * MySQL all run the same statements.
    */
  def replaceJdbcTable(
      spark: SparkSession, df: DataFrame, url: String, table: String,
      properties: java.util.Properties = new java.util.Properties): Try[LoadReport] = {
    val staging = table + "__staging"
    val result = Try {
      df.write.mode(SaveMode.Overwrite).jdbc(url, qq(staging), properties)
      val conn = java.sql.DriverManager.getConnection(url, properties)
      try {
        val st = conn.createStatement()
        // Existence probe by zero-row SELECT on the exact quoted name —
        // NOT metadata.getTables, whose name argument is a LIKE pattern
        // ('daily_facts' matches 'daily9facts' and would skip the
        // CREATE) and whose escape string some drivers (Derby) return
        // empty, making the pattern impossible to neutralize.
        val destExists =
          try {
            val rs = st.executeQuery(s"SELECT 1 FROM ${qq(table)} WHERE 1=0")
            rs.close(); true
          } catch { case _: java.sql.SQLException => false }
        try {
          if (!destExists) {
            // CTAS dialect gap: MySQL and Snowflake reject the
            // SQL-standard `WITH NO DATA`, Derby REQUIRES it, Postgres
            // takes both. Try the widely-accepted zero-row filter form
            // first and fall back to the standard form — between them
            // every dialect the writer itself reaches is covered.
            try st.executeUpdate(
              s"CREATE TABLE ${qq(table)} AS SELECT * FROM ${qq(staging)} WHERE 1=0")
            catch {
              case first: java.sql.SQLException =>
                // a failed statement ABORTS any open transaction on
                // Postgres-like engines — clear it or the fallback
                // fails spuriously on autoCommit=false connections
                if (!conn.getAutoCommit) Try(conn.rollback())
                try st.executeUpdate(
                  s"CREATE TABLE ${qq(table)} AS SELECT * FROM ${qq(staging)} WITH NO DATA")
                catch {
                  case second: java.sql.SQLException =>
                    // both forms failed: the FIRST failure is usually
                    // the real cause (permissions, dead connection) —
                    // surface it instead of masking it with the
                    // second form's dialect error
                    first.addSuppressed(second)
                    throw first
                }
            }
          }
          conn.setAutoCommit(false)
          val rows =
            try {
              st.executeUpdate(s"DELETE FROM ${qq(table)}")
              val n = st.executeUpdate(
                s"INSERT INTO ${qq(table)} SELECT * FROM ${qq(staging)}")
              conn.commit()
              n.toLong
            } catch {
              case e: Throwable =>
                Try(conn.rollback())
                throw new java.io.IOException(
                  s"JDBC load into $table failed; transaction rolled back, " +
                    "previous contents preserved", e)
            } finally conn.setAutoCommit(true)
          Try(st.executeUpdate(s"DROP TABLE ${qq(staging)}")) // best-effort cleanup
          LoadReport(rows, s"$url/$table")
        } finally st.close()
      } finally conn.close()
    }
    report(result, s"$url/$table")
  }

  /** Double-quote a JDBC identifier (the SQL-standard quoting Spark's
    * JDBC writer applies), so handwritten statements hit the same table
    * the writer created. Embedded quotes are rejected, not escaped.
    */
  private def qq(name: String): String = {
    require(!name.contains("\""), s"table name must not contain double quotes: $name")
    require(name.nonEmpty, "table name must not be empty")
    "\"" + name + "\""
  }

  /** Dot-separated multi-part name with each part backticked, so the
    * handwritten SQL resolves the SAME table as saveAsTable/tableExists
    * (which parse names multi-part). Quoting the whole name as one
    * identifier would aim DROP/ALTER at a single-part table literally
    * named "db.tbl__staging" in the current database — every qualified
    * load would fail at publish. Backticks inside a part are rejected
    * rather than mis-quoted.
    */
  private def quoted(name: String): String = {
    require(!name.contains("`"), s"table name must not contain backticks: $name")
    val parts = name.split('.')
    require(parts.nonEmpty && parts.forall(_.nonEmpty), s"malformed table name: $name")
    parts.map(p => s"`$p`").mkString(".")
  }

  /** Cooperative single-writer lock for a destination. Every sink in
    * this module assumes ONE writer — two concurrent staged swaps (say
    * a forget pass racing a compaction) can interleave their
    * backup/publish renames and break the rollback invariant. Callers
    * that can race wrap the sink call (note the inner `.get` — a
    * Try-returning body would otherwise nest as Success(Failure(...))):
    * `Load.withLock(spark, dir, "nightly-forget") { Load.replaceTable(...).get }`.
    *
    * The lock is an atomically-created `<dir>__lock` file holding owner
    * and acquisition time for diagnostics. The create must be the race
    * arbiter: on HDFS-like filesystems `create(overwrite = false)` is;
    * on the LOCAL filesystem it is NOT (RawLocalFileSystem does a
    * non-atomic exists-then-open), so file:// locks go through NIO's
    * `Files.createFile` (O_EXCL — atomic on POSIX). Held locks fail
    * the acquirer LOUDLY with the holder's identity; no auto-expiry (a
    * writer outliving a wall-clock lease would corrupt exactly what
    * the lock protects — a crashed holder's lock is removed by an
    * operator, informed by the identity inside). Always released on
    * body exit, success or failure.
    */
  def withLock[T](spark: SparkSession, destination: String, owner: String)(
      body: => T): Try[T] = Try {
    val lock = new Path(destination + "__lock")
    val fs = lock.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val note = s"$owner @ ${java.time.Instant.now()}".getBytes("UTF-8")
    def refuse(e: java.io.IOException): Nothing = {
      val holder = Try {
        val in = fs.open(lock)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      }.getOrElse("<unreadable>")
      throw new LockHeldException(
        s"destination $destination is locked by: $holder — concurrent " +
          "writers are not allowed; if the holder crashed, remove " +
          s"$lock manually", e)
    }
    val qualified = fs.makeQualified(lock)
    if ("file" == qualified.toUri.getScheme) {
      val p = java.nio.file.Paths.get(qualified.toUri.getPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      try java.nio.file.Files.write(
        java.nio.file.Files.createFile(p), note)
      catch { case e: java.nio.file.FileAlreadyExistsException => refuse(e) }
    } else {
      val out =
        try fs.create(lock, false)
        catch { case e: java.io.IOException => refuse(e) }
      out.write(note)
      out.close()
    }
    try body
    finally fs.delete(lock, false)
  }

  /** The ONE source of truth for reading back what this module's
    * writers produce. csv needs the writer-matching option set (header
    * row, quoted embedded newlines, `"` escape) — duplicating it at
    * call sites is how a writer-option change silently miscounts a
    * count-back. With no schema, csv additionally infers types (an
    * extra pass — callers that know the schema must pass it).
    */
  private[load] def reader(
      spark: SparkSession, format: String,
      schema: Option[org.apache.spark.sql.types.StructType]): org.apache.spark.sql.DataFrameReader = {
    val base = spark.read.format(format)
    val typed = schema.fold(base)(base.schema)
    if (format == "csv") {
      val r = typed.option("header", "true")
        .option("multiLine", "true").option("escape", "\"")
      if (schema.isEmpty) r.option("inferSchema", "true") else r
    } else typed
  }

  private def report(result: Try[LoadReport], destination: String): Try[LoadReport] = {
    result match {
      case Success(r) =>
        // K4: the reference's "Uploaded X rows to <dest>" signal.
        println(s"Uploaded ${r.rows} rows to ${r.destination}")
      case Failure(e) =>
        System.err.println(s"Load to $destination failed: ${e.getMessage}")
    }
    result
  }
}
