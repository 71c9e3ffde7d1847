package graft.analytics

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier

/** Atomic generation pointer shared by the persisted stores
  * ([[SignatureStore]], [[VectorIndex]]).
  *
  * Problem this solves: a store refresh ([[SignatureStore.reingest]],
  * a full re-[[SignatureStore.ingest]]) that overwrites the physical
  * tables in place gives a racing reader only
  * fail-cleanly-or-one-generation — mid-overwrite, the reader's lazy
  * plan can hit a dropped table. The production guarantee is
  * ALWAYS-CONSISTENT reads: every physical table name carries a
  * generation suffix (`{store}_{part}_g{N}`), writers build the next
  * generation BESIDE the current one, and publication is one atomic
  * catalog operation — an `ALTER TABLE ... SET TBLPROPERTIES` on the
  * store's tiny `{store}_meta` table, which holds the pointer
  * (`graft.store.gen`) rather than any data.
  *
  * Retention is keep-two: committing generation N retires N-2, so a
  * reader that resolved its generation before a swap keeps complete,
  * undropped tables through ONE concurrent refresh (the racing-reader
  * spec's scenario). A reader that lags TWO refreshes fails cleanly on
  * missing files — the documented bound, same shape as snapshot
  * retention in table formats. Readers must resolve the generation
  * ONCE per logical operation (all parts from the same `gen` value),
  * never per-table — that is what makes an answer one-generation by
  * construction.
  *
  * Crash safety: a writer that dies after writing part tables but
  * before [[commit]] leaves the pointer untouched — readers never see
  * the partial generation, and the next writer targets the same
  * number and [[SignatureStore.dropStale]]s the partials first.
  *
  * The meta table doubles as the store's durable statistics carrier:
  * `graft.store.ndocs` records the RAW corpus document count at
  * ingest, bumped by every admit — the df-threshold basis
  * [[SignatureStore.reingest]] needs (a count derived from stored
  * sizes would silently exclude docs whose shingles were all stopped,
  * compounding toward over-stopping across refresh cycles).
  *
  * Format break & migration: stores written before generations used
  * unsuffixed names (`{store}_stop`, ...) and cannot be refreshed in
  * place by this code. [[migrate]] upgrades them: rename each marked
  * legacy table to its `_g1` name (metadata — bucketing, marker —
  * travels with the rename) and commit generation 1. A pre-marker
  * legacy table must first be verified by its owner and stamped
  * (`ALTER TABLE t SET TBLPROPERTIES ('graft.store' = 'true')`);
  * the error message says exactly that. */
private[analytics] object StoreMeta {

  private val GenKey = "graft.store.gen"
  private val NDocsKey = "graft.store.ndocs"

  def metaTable(store: String): String = s"${store}_meta"

  /** Physical table name of `part` in generation `gen`. */
  def name(store: String, part: String, gen: Long): String =
    s"${store}_${part}_g$gen"

  /** The committed generation, or None before the first commit. */
  def gen(s: SparkSession, store: String): Option[Long] =
    prop(s, store, GenKey).map(_.toLong)

  def genOrFail(s: SparkSession, store: String): Long =
    gen(s, store).getOrElse(throw new IllegalStateException(
      s"store '$store' has no committed generation — run ingest first " +
        "(for a pre-generation store layout, run migrate)"))

  /** Current-generation physical name of `part`; throws before the
    * first commit. Resolve ONCE per logical operation and derive all
    * part names from the same generation — see the class doc. */
  def table(s: SparkSession, store: String, part: String): String =
    name(store, part, genOrFail(s, store))

  /** Raw corpus document count (ingest-recorded, admit-bumped). */
  def docCount(s: SparkSession, store: String): Option[Long] =
    prop(s, store, NDocsKey).map(_.toLong)

  /** The generation number the next ingest/reingest should write.
    * Also front-loads the meta-collision check so a writer fails
    * BEFORE any heavy work when `{store}_meta` is a foreign table. */
  def begin(s: SparkSession, store: String): Long = {
    requireOursOrAbsent(s, metaTable(store))
    gen(s, store).map(_ + 1).getOrElse(1L)
  }

  /** Atomically publish generation `g` (single catalog op on the meta
    * table), record `ndocs` if given (else carry the current value
    * forward), then retire generation g-2's part tables. */
  def commit(s: SparkSession, store: String, g: Long, parts: Seq[String],
      ndocs: Option[Long]): Unit = {
    ensureMeta(s, store)
    val props = Seq(s"'$GenKey' = '$g'") ++
      ndocs.orElse(docCount(s, store)).map(n => s"'$NDocsKey' = '$n'")
    s.sql(s"ALTER TABLE ${metaTable(store)} " +
      s"SET TBLPROPERTIES (${props.mkString(", ")})")
    if (g >= 3)
      parts.foreach(p => SignatureStore.dropStale(s, name(store, p, g - 2)))
  }

  /** Bump the recorded corpus document count (admit path). */
  def addDocs(s: SparkSession, store: String, n: Long): Unit = {
    val cur = docCount(s, store).getOrElse(0L)
    s.sql(s"ALTER TABLE ${metaTable(store)} " +
      s"SET TBLPROPERTIES ('$NDocsKey' = '${cur + n}')")
  }

  /** Upgrade a pre-generation store in place: rename each legacy
    * unsuffixed part table to its generation-1 name and commit. Every
    * legacy table must already carry the `graft.store` marker — the
    * owner stamps a verified pre-marker store first (see class doc). */
  def migrate(s: SparkSession, store: String, parts: Seq[String],
      ndocs: => Option[Long]): Unit = {
    if (gen(s, store).nonEmpty)
      throw new IllegalStateException(
        s"store '$store' already uses the generation layout — nothing to migrate")
    val cat = s.sessionState.catalog
    // validate EVERYTHING the rename loop and the commit will touch
    // before renaming anything: legacy sources present and marked,
    // _g1 targets free, meta name ours-or-absent — a failure after a
    // partial rename would leave the store in neither layout with no
    // re-run path
    requireOursOrAbsent(s, metaTable(store))
    parts.foreach { p =>
      val legacy = s"${store}_$p"
      val id = TableIdentifier(legacy)
      if (!cat.tableExists(id))
        throw new IllegalStateException(
          s"legacy table $legacy not found — nothing to migrate")
      if (!cat.getTableMetadata(id).properties.contains("graft.store"))
        throw new IllegalStateException(
          s"table $legacy lacks the 'graft.store' marker; verify it is " +
            "really a store table, then stamp it with ALTER TABLE " +
            s"$legacy SET TBLPROPERTIES ('graft.store' = 'true') and " +
            "re-run migrate")
      if (cat.tableExists(TableIdentifier(name(store, p, 1))))
        throw new IllegalStateException(
          s"migration target ${name(store, p, 1)} already exists — " +
            "drop or rename it first (a crashed earlier migrate leaves " +
            "these; dropStale applies if it carries the store marker)")
    }
    // ndocs is by-name: callers may derive it from legacy tables that
    // only exist once validation has confirmed the legacy layout
    val nd = ndocs
    parts.foreach(p =>
      s.sql(s"ALTER TABLE ${store}_$p RENAME TO ${name(store, p, 1)}"))
    commit(s, store, 1, parts, nd)
  }

  private def prop(s: SparkSession, store: String,
      key: String): Option[String] = {
    val cat = s.sessionState.catalog
    val id = TableIdentifier(metaTable(store))
    if (!cat.tableExists(id)) None
    else cat.getTableMetadata(id).properties.get(key)
  }

  private def requireOursOrAbsent(s: SparkSession, mt: String): Unit = {
    val cat = s.sessionState.catalog
    val id = TableIdentifier(mt)
    if (cat.tableExists(id) &&
        !cat.getTableMetadata(id).properties.contains("graft.store"))
      throw new IllegalStateException(
        s"table $mt exists but was not written by a graft store " +
          "(missing 'graft.store' table property) — refusing to use it; " +
          "choose a different store name")
  }

  private def ensureMeta(s: SparkSession, store: String): Unit = {
    val mt = metaTable(store)
    requireOursOrAbsent(s, mt)
    if (!s.sessionState.catalog.tableExists(TableIdentifier(mt))) {
      // clear a stale on-disk dir a previous JVM's meta left behind
      SignatureStore.dropStale(s, mt)
      s.range(0).write.format("parquet").saveAsTable(mt)
      s.sql(s"ALTER TABLE $mt SET TBLPROPERTIES ('graft.store' = 'true')")
    }
  }
}
