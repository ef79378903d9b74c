package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong, AtomicReference}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

import graft.catalog.TableCatalog

/** Streaming consumption of the versioned catalog's change feed — the
  * `readChangeFeed`-style consumer loop over [[TableCatalog
  * .changesBetween]]: offsets are COMMIT VERSIONS, a checkpoint file
  * remembers the last version a consumer processed, and each sync
  * reads exactly the delta `(checkpoint, current]` at O(delta) cost
  * (the feed scans only files added/removed between the versions —
  * appendAtomic's hard-link overlap makes shared files cancel by
  * name).
  *
  * Delivery is AT-LEAST-ONCE by construction — the offset commits
  * AFTER the handler returns, so a crash between the two replays the
  * same version range — which becomes exactly-once for an idempotent
  * handler. [[mirror]] is the built-in idempotent consumer: it retires
  * every key the feed mentions and re-inserts the insert/update rows,
  * so replaying a range reconverges to the same downstream state.
  *
  * Scale shape: the poll reads two KB-sized pointers (checkpoint +
  * `_version`); a fresh consumer does no work at all. A behind
  * consumer reads O(delta) rows however large the table is. The one
  * O(table) event is HORIZON LOSS — the checkpointed version aged out
  * of snapshot retention (a lapped consumer) or the table changed
  * schema — where the feed is undefined and the consumer either
  * resyncs from the full current snapshot or fails loudly, per
  * `onHorizonLoss`. The offset checkpoint uses the same write-aside +
  * atomic-rename protocol as every catalog pointer.
  *
  * Reference anchor: the reference's cron loop re-extracts full
  * PostgreSQL tables every run (main.cron:1, main.py:60-80); this
  * consumer is the incremental replacement — ship the changeset, not
  * the snapshot. */
object ChangeFeed {

  /** What a [[sync]] did: nothing to do, a delta applied, or a full
    * resync (horizon loss — the O(table) fallback, flagged so callers
    * can alert on it: at 100 TB a resync is an incident, not a tick). */
  sealed trait SyncResult
  case object Fresh extends SyncResult
  final case class Delta(fromVersion: Long, toVersion: Long) extends SyncResult
  final case class Resync(toVersion: Long) extends SyncResult

  sealed trait HorizonPolicy
  /** Reprocess the full current snapshot (feed = every row as insert). */
  case object ResyncOnLoss extends HorizonPolicy
  /** Throw — for consumers that cannot absorb a full snapshot. */
  case object FailOnLoss extends HorizonPolicy

  private def readOffset(checkpoint: Path): Option[Long] =
    if (!Files.exists(checkpoint)) None
    else Some(new String(Files.readAllBytes(checkpoint),
      java.nio.charset.StandardCharsets.UTF_8).trim.toLong)

  private def commitOffset(checkpoint: Path, v: Long): Unit = {
    Option(checkpoint.getParent).foreach(Files.createDirectories(_))
    val tmp = checkpoint.resolveSibling(
      s"${checkpoint.getFileName}.tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, v.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    Files.move(tmp, checkpoint, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** One incremental catch-up of a consumer over `table`'s commits.
    *
    *  - First call (no checkpoint): `process` receives the full current
    *    snapshot as inserts — the initial-snapshot semantics every CDC
    *    stream needs — and the offset pins to the current version.
    *  - Steady state: `process(feed, from, to)` receives the classified
    *    O(delta) feed for `(from, to]`; the offset advances only after
    *    it returns (at-least-once).
    *  - Horizon loss: per `onHorizonLoss`.
    *
    * `process` must treat the feed as at-least-once: a crash between
    * process and offset commit replays the range. */
  def sync(cat: TableCatalog, table: String, keys: Seq[String],
           checkpoint: Path,
           onHorizonLoss: HorizonPolicy = ResyncOnLoss)
          (process: (DataFrame, SyncResult) => Unit): SyncResult = {
    val cur = cat.currentVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"'$table' is not a versioned table — the change feed needs " +
          "commit versions (replaceAtomic/appendAtomic writers)"))
    val from = readOffset(checkpoint)
    def fullAsInserts(result: SyncResult): SyncResult = {
      val snap = cat.readVersion(table, cur)
      val asFeed = snap.select(
        keys.map(col) ++
          Seq(org.apache.spark.sql.functions.lit("insert").as("change_type")) ++
          snap.columns.filterNot(keys.contains).map(col).toSeq: _*)
      process(asFeed, result)
      commitOffset(checkpoint, cur)
      result
    }
    from match {
      case None => fullAsInserts(Resync(cur))
      case Some(v) if v >= cur => Fresh
      case Some(v) =>
        val feed =
          try Some(cat.changesBetween(table, v, cur, keys))
          catch {
            case e: IllegalArgumentException if onHorizonLoss == FailOnLoss =>
              throw new IllegalStateException(
                s"change feed for '$table' lost its horizon at v$v " +
                  s"(current v$cur) and the consumer forbids resync", e)
            case _: IllegalArgumentException => None
          }
        feed match {
          case Some(f) =>
            val r = Delta(v, cur)
            process(f, r)
            commitOffset(checkpoint, cur)
            r
          case None => fullAsInserts(Resync(cur))
        }
    }
  }

  /** Maintain `dst` as a replica of versioned `src`, one catch-up per
    * call — the built-in IDEMPOTENT consumer: every key the feed
    * mentions is retired from the replica (one null-safe anti-join
    * whose build side is the delta's keys — broadcast while small),
    * then insert/update rows come back with their new values, and the
    * result commits as ONE snapshot. Replaying a range reconverges
    * (retire-then-reinsert of already-applied rows is a no-op), so the
    * at-least-once offset protocol yields an exactly-once replica.
    * The apply WRITE is O(replica) — the price of one-directory
    * snapshots; the feed READ side stays O(delta), which is what a
    * lapped 100 TB consumer pays for. */
  def mirror(cat: TableCatalog, src: String, dst: String,
             keys: Seq[String], checkpoint: Path): SyncResult =
    sync(cat, src, keys, checkpoint) { (feed, result) =>
      result match {
        case Resync(_) =>
          cat.replaceAtomic(dst, feed.drop("change_type"))
        case Delta(_, to) if cat.currentVersion(dst).isEmpty =>
          // the replica vanished between syncs (dropped, or never
          // bootstrapped under this checkpoint): a delta can't rebuild
          // it — copy the full source snapshot the offset is about to
          // pin. O(table), same class as a resync; loud in the logs
          // via the commit history's REPLACE on dst.
          cat.replaceAtomic(dst, cat.readVersion(src, to))
        case Delta(_, _) =>
          val existing = cat.read(dst)
          val feedKeys = feed.select(keys.map(col): _*).distinct().alias("fk")
          val cond = keys.map(k =>
            col(s"d.$k") <=> col(s"fk.$k")).reduce(_ && _)
          val survivors = existing.alias("d")
            .join(broadcast(feedKeys), cond, "left_anti")
          val incoming = feed.filter(col("change_type") =!= "delete")
            .drop("change_type")
          cat.replaceAtomic(dst, survivors.unionByName(incoming))
        case Fresh => () // sync never invokes the handler when fresh
      }
    }

  /** [[mirror]] with an O(changed-partitions) WRITE side: the replica
    * is a plain `partCol`-partitioned table (the [[TableCatalog
    * .appendPartitioned]] layout) and each catch-up rewrites ONLY the
    * partitions the feed touches — dynamic partition overwrite, the
    * same mechanism deleteWhere uses — instead of committing a full
    * replica snapshot. At 100 TB with date-partitioned facts this is
    * the difference between a sync that writes one day and a sync that
    * rewrites the warehouse.
    *
    * `partCol` must be one of `keys`: a delete row carries NULL values
    * by the feed contract, so the partition it lands in is only
    * recoverable from the KEY columns — enforced loudly up front.
    * Idempotence (at-least-once → exactly-once) holds per partition:
    * a replayed range recomputes the same affected partitions from the
    * same feed and overwrites them with identical content. A fully
    * emptied partition is dropped explicitly, exactly like deleteWhere.
    * Bootstrap and horizon-loss resyncs write the whole replica — the
    * O(table) events, flagged in the returned [[SyncResult]]. */
  def mirrorPartitioned(cat: TableCatalog, src: String, dst: String,
                        keys: Seq[String], partCol: String,
                        checkpoint: Path): SyncResult = {
    require(keys.contains(partCol),
      s"partCol '$partCol' must be a key column (deletes carry NULL " +
        "values — only the key recovers a delete's partition)")
    sync(cat, src, keys, checkpoint) { (feed, result) =>
      val data = feed.drop("change_type")
      result match {
        case Resync(_) =>
          if (cat.exists(dst)) cat.dropPlain(dst)
          cat.appendPartitioned(dst, data, partCol)
        case Delta(_, _) if !cat.exists(dst) =>
          cat.appendPartitioned(dst,
            cat.read(src).select(data.columns.map(col).toIndexedSeq: _*),
            partCol)
        case Delta(_, _) =>
          // the affected-partition working set is driver-tiny (a feed
          // spans few partitions per sync — the premise of partitioned
          // mirroring); collect() here is the same bounded list
          // deleteWhere holds
          // Option-typed so a NULL partition-key value (which the
          // feed's null-safe <=> key join deliberately supports) routes
          // to the NULL partition instead of vanishing from an isin
          val affected = feed.select(col(partCol).cast("string"))
            .distinct().collect().map(r => Option(r.getString(0))).toSeq
          if (affected.nonEmpty) {
            val pc = col(partCol).cast("string")
            val nonNull = affected.flatten
            val inPart =
              if (nonNull.isEmpty) pc.isNull
              else if (affected.contains(None)) pc.isin(nonNull: _*) || pc.isNull
              else pc.isin(nonNull: _*)
            val feedKeys = feed.select(keys.map(col): _*).distinct().alias("fk")
            val cond = keys.map(k =>
              col(s"d.$k") <=> col(s"fk.$k")).reduce(_ && _)
            val survivors = cat.read(dst).filter(inPart).alias("d")
              .join(broadcast(feedKeys), cond, "left_anti")
            val incoming = feed.filter(col("change_type") =!= "delete")
              .drop("change_type")
            val rebuilt = survivors
              .unionByName(incoming)
              .localCheckpoint(true) // reads the very partitions replaced
            cat.overwritePartitionsOpt(dst, rebuilt, partCol, affected)
          }
        case Fresh => ()
      }
    }
  }

  /** Ship the change feed into an append-only FEED DIRECTORY that stock
    * Structured Streaming consumes — `spark.readStream.parquet(feedDir)`
    * with full watermark/stateful/exactly-once semantics and no custom
    * source code (the Delta `_change_data` materialization, done at
    * catch-up time instead of commit time so untailed tables never pay
    * it). Layout: one Hive partition `commit_version=<v>/` per shipped
    * commit, holding the classified `(keys…, change_type, values…)`
    * feed of exactly that commit; the partition directory is staged and
    * ATOMIC-RENAMED in, so the file source either sees a commit's whole
    * feed or none of it, and the `commit_version` partition column
    * gives consumers commit ordering for free (a source column of that
    * name is refused up front — it would silently shadow).
    *
    * Idempotence is per VERSION, not per range: each catch-up ships
    * commit-by-commit, committing the offset after each, and a replayed
    * version whose directory already exists is skipped — so the
    * at-least-once offset protocol never double-ships a file (shipped
    * files cannot be retracted, which is also why horizon loss is
    * always FATAL here: a resync cannot be expressed to a consumer
    * that already read the shipped history). Layout-only commits
    * (`dataChange=false` OPTIMIZE) ship nothing — detected from the
    * O(metadata) file lists, no read. First call ships the full current
    * snapshot as inserts under its commit version (initial-snapshot
    * semantics). Returns what [[sync]] would. */
  def shipFeed(cat: TableCatalog, table: String, keys: Seq[String],
               feedDir: Path, checkpoint: Path): SyncResult = {
    val cur = cat.currentVersion(table).getOrElse(
      throw new IllegalArgumentException(
        s"'$table' is not a versioned table — the change feed needs " +
          "commit versions (replaceAtomic/appendAtomic writers)"))
    require(!cat.read(table).columns.contains("commit_version"),
      s"'$table' has a 'commit_version' column — the feed's partition " +
        "column would shadow it")
    def ship(v: Long, df: DataFrame): Unit = {
      val dst = feedDir.resolve(s"commit_version=$v")
      if (Files.exists(dst)) return // an already-shipped replay
      Files.createDirectories(feedDir)
      val staging = feedDir.resolve(
        s"_staging_v$v-${java.util.UUID.randomUUID()}")
      // the feed is a DERIVED artifact: strip inherited field-id stamps
      // (a partial id layout in feed files makes any inference-schema
      // read of the directory null-fill the ids it can't find)
      cat.stripDf(df).write.parquet(staging.toString)
      Files.move(staging, dst, StandardCopyOption.ATOMIC_MOVE)
    }
    def ordered(df: DataFrame): DataFrame = df.select(
      keys.map(col) ++ Seq(col("change_type")) ++
        df.columns.filterNot(c => keys.contains(c) || c == "change_type")
          .map(col).toSeq: _*)
    readOffset(checkpoint) match {
      case None =>
        val snap = cat.readVersion(table, cur)
        ship(cur, ordered(snap.withColumn("change_type",
          org.apache.spark.sql.functions.lit("insert"))))
        commitOffset(checkpoint, cur)
        Resync(cur)
      case Some(v) if v >= cur => Fresh
      case Some(v) =>
        ((v + 1) to cur).foreach { w =>
          // ONE changedRowsBetween per version; the classified feed is
          // built from its frames directly (changesBetween would
          // re-run the whole metadata walk — history parse, snapshot
          // listings — a second time per shipped commit, review r10)
          val (inserted, deleted, added, removed) =
            try cat.changedRowsBetween(table, w - 1, w)
            catch {
              case e: IllegalArgumentException =>
                throw new IllegalStateException(
                  s"feed shipping for '$table' lost its horizon at " +
                    s"v${w - 1} (current v$cur): shipped files cannot be " +
                    "retracted, so a resync is not expressible — " +
                    "re-bootstrap a NEW feed directory", e)
            }
          if (added.nonEmpty || removed.nonEmpty) {
            val schema = inserted.schema
            keys.foreach(k => require(schema.fieldNames.contains(k),
              s"key '$k' not in '$table' (${schema.fieldNames.mkString(", ")})"))
            val compareCols = schema.fieldNames.filterNot(keys.contains).toSeq
            ship(w, ordered(graft.etl.SnapshotDiff.changes(
              deleted, inserted, keys, compareCols)))
          }
          commitOffset(checkpoint, w)
        }
        Delta(v, cur)
    }
  }

  /** A stopped/running poll loop over [[sync]]/[[mirror]] catch-ups. */
  final class Handle(thread: Thread, running: AtomicBoolean,
                     err: AtomicReference[Throwable],
                     ticksDone: AtomicLong) {
    def stop(): Unit = { running.set(false); thread.interrupt(); thread.join(30000) }
    def lastError: Option[Throwable] = Option(err.get())
    def ticks: Long = ticksDone.get()
    def isAlive: Boolean = thread.isAlive
  }

  /** Poll `src`'s version pointer every `intervalMs` and run one
    * catch-up when it moved — the daemon form of [[sync]]. A tick that
    * throws records the error and keeps polling (a transient race must
    * not kill a long-lived replica loop); `Handle.lastError` surfaces
    * it. The poll cost at idle is two pointer reads — no Spark job. */
  def start(cat: TableCatalog, src: String, keys: Seq[String],
            checkpoint: Path, intervalMs: Long = 1000L)
           (tick: () => Unit): Handle = {
    require(intervalMs > 0, s"intervalMs must be positive, got $intervalMs")
    val running = new AtomicBoolean(true)
    val err = new AtomicReference[Throwable]()
    val ticks = new AtomicLong(0L)
    val t = new Thread(() => {
      while (running.get()) {
        try {
          val cur = cat.currentVersion(src)
          val off = readOffset(checkpoint)
          if (cur.isDefined && cur != off) { tick(); ticks.incrementAndGet() }
          err.set(null)
        } catch {
          case _: InterruptedException => ()
          case e: Throwable => err.set(e)
        }
        try Thread.sleep(intervalMs)
        catch { case _: InterruptedException => () }
      }
    }, s"graft-changefeed-$src")
    t.setDaemon(true)
    t.start()
    new Handle(t, running, err, ticks)
  }
}
