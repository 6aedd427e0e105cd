package graft.sources.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.sources.GeoParquet

/** Named-table access to manifested layouts: a `TableCatalog` over a
  * warehouse directory, so `spark.sql` addresses layouts as
  * `<catalog>.<namespace>.<table>` with no temp-view plumbing —
  * `SELECT`s get the SQL face's pruning/pushdown, `INSERT INTO` gets
  * its locked append path:
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.lake", classOf[GraftCatalog].getName)
  * spark.conf.set("spark.sql.catalog.lake.warehouse", "/data/lake")
  * spark.sql("SELECT count(*) FROM lake.ice.atl06 WHERE x > 0")
  * spark.sql("INSERT INTO lake.ice.atl06 SELECT ...")
  * }}}
  *
  * The mapping is pure filesystem convention — `warehouse/<ns>/<tbl>`
  * is a layout directory — so the catalog is stateless and shares-
  * nothing: any writer that lands a layout under the warehouse (API
  * or SQL face) is immediately visible to every session, and all
  * commit safety remains the layout's own CommitLock protocol, not a
  * catalog service.  Listing namespaces/tables is one directory
  * listing each (metadata-scale; the LAYOUTS are listed, never their
  * files).
  *
  * DDL surface: CREATE TABLE declares a bin layout's geometry in the
  * statement (`TBLPROPERTIES('delta'='<binSize>')` — [[createTable]]);
  * ALTER TABLE ADD COLUMNS declares add-column evolution ahead of its
  * data ([[alterTable]]); DROP TABLE retires an EMPTY layout and
  * `DROP TABLE … PURGE` deletes data deliberately ([[dropTable]] /
  * [[purgeTable]]).  Deliberately refused: RENAME (manifests are
  * root-relative — moving the directory IS the rename) and any ALTER
  * that would rewrite data files (drops, renames, type changes —
  * API-owned lifecycles).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces
    with ProcedureCatalog with FunctionCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = options.get("warehouse")
    require(warehouse != null && warehouse.nonEmpty,
      s"graft catalog '$name' needs a warehouse root: " +
        s"spark.sql.catalog.$name.warehouse=<dir>")
  }
  override def name(): String = catalogName

  private def fs = {
    val spark = SparkSession.active
    new org.apache.hadoop.fs.Path(warehouse)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
  }
  private def pathOf(parts: String*): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path((warehouse +: parts).mkString("/"))
  private def dirsIn(p: org.apache.hadoop.fs.Path): Array[String] = {
    val f = fs
    if (!f.exists(p)) Array.empty
    else f.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filterNot(n => n.startsWith("_") || n.startsWith("."))
  }

  // ---- namespaces: one directory level under the warehouse ----
  override def listNamespaces(): Array[Array[String]] =
    dirsIn(pathOf()).map(Array(_))
  override def listNamespaces(ns: Array[String]): Array[Array[String]] = {
    if (ns.isEmpty) return listNamespaces()
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns.toSeq)
    Array.empty // single-level namespaces
  }
  override def namespaceExists(ns: Array[String]): Boolean =
    ns.length == 1 && fs.exists(pathOf(ns(0)))
  override def loadNamespaceMetadata(ns: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns.toSeq)
    util.Collections.emptyMap()
  }
  override def createNamespace(ns: Array[String],
                               metadata: util.Map[String, String]): Unit = {
    require(ns.length == 1,
      s"graft catalog namespaces are one level: ${ns.mkString(".")}")
    fs.mkdirs(pathOf(ns(0)))
  }
  override def alterNamespace(ns: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog namespaces carry no metadata to alter")
  override def dropNamespace(ns: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException(
      "dropping a namespace is a filesystem-lifecycle operation — " +
        "remove the directory deliberately, not through SQL")

  // ---- tables: layout directories ----
  private def tablePath(ident: Identifier): String = {
    require(ident.namespace().length == 1,
      s"graft catalog tables are <namespace>.<table>: $ident")
    pathOf(ident.namespace()(0), ident.name()).toString
  }

  override def listTables(ns: Array[String]): Array[Identifier] = {
    if (!namespaceExists(ns)) throw new NoSuchNamespaceException(ns.toSeq)
    dirsIn(pathOf(ns(0))).map(Identifier.of(ns, _))
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().length == 1 &&
      fs.exists(new org.apache.hadoop.fs.Path(tablePath(ident)))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val path = tablePath(ident)
    new GraftTable(path,
      GeoParquet.dataSchemaFor(SparkSession.active, path))
  }

  /** `VERSION AS OF <epoch>` — the commit-epoch axis queryBoxAsOf
    * serves, pinned at table resolution.
    */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val path = tablePath(ident)
    new GraftTable(path,
      GeoParquet.dataSchemaFor(SparkSession.active, path),
      Some(version.toLong))
  }

  /** `TIMESTAMP AS OF <ts>` — the wall-clock axis schedulers actually
    * write.  Spark hands the timestamp in MICROSECONDS; it resolves
    * through the `_epoch_times` commit-stamp sidecar to the largest
    * epoch committed at-or-before it ([[GeoParquet.epochAtTime]]) and
    * pins that epoch exactly as `VERSION AS OF` would — one sidecar
    * listing at resolution, every downstream soundness rule
    * (manifest freshness, history-reset refusal) unchanged.
    */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val path = tablePath(ident)
    val spark = SparkSession.active
    val epoch = GeoParquet.epochAtTime(spark, path, timestamp / 1000L)
    new GraftTable(path,
      GeoParquet.dataSchemaFor(spark, path), Some(epoch))
  }

  /** `CREATE TABLE <cat>.<ns>.<tbl> (cols…) USING graft
    * TBLPROPERTIES('delta'='<binSize>')` — the geometry decision a
    * layout needs is made EXPLICIT in the DDL: an empty bin layout
    * lands (schema + δ sidecars, zero files), the first INSERT bins
    * by the recorded δ, and `CALL system.rebuild_manifest` restores
    * pruned reads — creation to maintenance entirely from SQL.
    * Adding `'curve'='z'` / `'curve'='hilbert'` declares a
    * CURVE-clustered layout instead ([[GeoParquet.createCurveLayout]]):
    * INSERTs dispatch to appendCurve and each batch's [k0,k1] key
    * ranges are manifested from the start.
    */
  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty,
      s"graft layouts own their partitioning (δ-binning / curve / key " +
        "clustering) — declare the clustering decision as " +
        "TBLPROPERTIES('delta'='<binSize>'[, 'curve'='z'|'hilbert'] | " +
        "'key'='col[,col…]'), not PARTITIONED BY")
    require(ident.namespace().length == 1,
      s"graft catalog tables are <namespace>.<table>: $ident")
    val keyCols = Option(properties.get("key"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val path = tablePath(ident)
    // 'filters'='col[,col…]': declare per-file MEMBERSHIP filters
    // (manifest bloom position sets) from the DDL — every later
    // commit's stats pass maintains them, so point probes and
    // runtime join pruning work from the first INSERT without an
    // out-of-band declareFilterCols call
    def declareFilters(): Unit =
      Option(properties.get("filters")).foreach { f =>
        val cols = f.split(",").map(_.trim).filter(_.nonEmpty).toSeq
        cols.foreach(c => require(schema.fieldNames.contains(c),
          s"CREATE TABLE $ident: filter column '$c' is not in the " +
            "declared schema"))
        GeoParquet.declareFilterCols(SparkSession.active, path, cols)
      }
    keyCols match {
      case Some(keys) =>
        // the CDC-table arm: rows cluster on their DATA key, no
        // spatial geometry anywhere — a bin size or a curve with it
        // would be two contradictory clustering decisions
        require(properties.get("curve") == null,
          s"CREATE TABLE $ident: 'key' and 'curve' are exclusive — a " +
            "keyed layout clusters on its data key, not a space curve")
        require(properties.get("delta") == null,
          s"CREATE TABLE $ident: a keyed layout has no spatial bin " +
            "size — omit 'delta' with 'key'")
        fs.mkdirs(pathOf(ident.namespace()(0)))
        // 'buckets'='n' hash-buckets the key (storage-partitioned
        // joins + bucket point-prune); without it the key is
        // range-clustered ([k0,k1] manifest pruning)
        GeoParquet.createKeyedLayout(SparkSession.active, path, schema,
          keys, Option(properties.get("buckets")).map(_.trim.toInt))
        // 'files'='n': per-INSERT file target for the generic append
        // dispatch (a batch range-splits into n key-sorted files
        // instead of serializing through one task)
        Option(properties.get("files")).foreach(n =>
          GeoParquet.recordNFiles(SparkSession.active, path, n.trim.toInt))
        declareFilters()
      case None =>
        require(properties.get("buckets") == null,
          s"CREATE TABLE $ident: 'buckets' hash-buckets a KEYED table " +
            "— declare the key too: TBLPROPERTIES('key'='col', " +
            "'buckets'='n')")
        val delta = Option(properties.get("delta")).map(_.toDouble).getOrElse(
          throw new UnsupportedOperationException(
            s"CREATE TABLE $ident needs the layout's clustering " +
              "decision: TBLPROPERTIES('delta'='<binSize>'" +
              "[, 'curve'='z'|'hilbert']) or TBLPROPERTIES(" +
              "'key'='col[,col…]')"))
        fs.mkdirs(pathOf(ident.namespace()(0)))
        Option(properties.get("curve")) match {
          case Some(c) =>
            GeoParquet.createCurveLayout(SparkSession.active, path, schema,
              delta, c)
            Option(properties.get("files")).foreach(n =>
              GeoParquet.recordNFiles(SparkSession.active, path,
                n.trim.toInt))
            declareFilters()
          case None =>
            require(properties.get("files") == null,
              s"CREATE TABLE $ident: 'files' targets the range split " +
                "of curve/keyed appends — bin layouts take one file " +
                "per touched bin from the write shuffle")
            GeoParquet.createLayout(SparkSession.active, path, schema, delta)
            declareFilters()
        }
    }
    new GraftTable(path, GeoParquet.dataSchemaFor(SparkSession.active, path))
  }

  /** `ALTER TABLE <cat>.<ns>.<tbl> ADD COLUMNS (…)` — the one ALTER a
    * layout supports without touching a data file: add-column
    * evolution, the same sidecar contract the append path records
    * implicitly ([[GeoParquet.addColumns]]).  Declared-but-unpopulated
    * columns read as nulls immediately.  Every other change (drop,
    * rename, type, position) would rewrite data files and refuses —
    * those lifecycles stay API verbs.
    */
  override def alterTable(ident: Identifier, changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val adds = changes.map {
      case a: TableChange.AddColumn =>
        require(a.fieldNames().length == 1,
          s"graft layouts are flat — cannot add nested column " +
            a.fieldNames().mkString("."))
        StructField(a.fieldNames()(0), a.dataType(), nullable = true)
      case other =>
        throw new UnsupportedOperationException(
          s"graft catalog ALTER supports only ADD COLUMNS — $other " +
            "would rewrite data files (drops/renames/type changes are " +
            "API-owned lifecycles)")
    }
    val path = tablePath(ident)
    GeoParquet.addColumns(SparkSession.active, path, adds)
    new GraftTable(path, GeoParquet.dataSchemaFor(SparkSession.active, path))
  }

  /** `DROP TABLE` — the retirement half of the 61z11 SQL lifecycle
    * (a scheduler that created and populated a table from SQL can now
    * retire it from SQL).  A plain DROP removes only an EMPTY layout
    * (sidecars, zero data files — the CREATE TABLE shape); a layout
    * holding data refuses and names `DROP TABLE … PURGE`, which
    * removes the directory and its crash-debris siblings under the
    * commit lock.  The refusal is deliberate friction, not a
    * capability gap: an empty-or-explicit contract in front of a
    * 100 TB `rm -r`.
    */
  override def dropTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    val path = tablePath(ident)
    val spark = SparkSession.active
    if (GeoParquet.hasAnyDataFile(spark, path))
      throw new UnsupportedOperationException(
        s"$ident holds data — DROP TABLE removes only empty layouts; " +
          "use DROP TABLE " + ident.toString + " PURGE to delete the " +
          "data deliberately")
    GeoParquet.dropLayout(spark, path)
    true
  }

  /** `DROP TABLE … PURGE`: delete the layout, data and all, plus its
    * crash-debris siblings — locked, so a mid-commit writer is never
    * pulled out from under its rename loop.
    */
  override def purgeTable(ident: Identifier): Boolean = {
    if (!tableExists(ident)) return false
    GeoParquet.dropLayout(SparkSession.active, tablePath(ident))
    true
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"graft catalog cannot RENAME $oldIdent — manifests are root-" +
        "relative, so moving the directory IS the rename; do it there")

  // ---- maintenance procedures: CALL <cat>.system.<verb>(...) ----
  // The lifecycle verbs the table surface deliberately refuses become
  // EXPLICIT calls (the Iceberg procedure convention): a scheduler can
  // drive compaction/retention/repair from SQL, and every verb still
  // runs the API's locked/journaled protocol — the procedure layer
  // adds addressing, never semantics.

  /** `'ns.tbl'` (warehouse-relative) → layout path. */
  private def layoutPathOf(table: String): String = {
    val parts = table.split("\\.")
    require(parts.length == 2,
      s"procedure table argument must be '<namespace>.<table>': $table")
    val p = pathOf(parts(0), parts(1)).toString
    require(fs.exists(new org.apache.hadoop.fs.Path(p)),
      s"no such layout under the warehouse: $table")
    p
  }

  private def strArg(in: InternalRow, i: Int): String = in.getUTF8String(i).toString

  private def proc(pname: String, desc: String,
                   params: Seq[ProcedureParameter], out: StructType)
                  (body: InternalRow => Seq[InternalRow]): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = pname
      override def description(): String = desc
      override def bind(inputType: StructType): BoundProcedure =
        new BoundProcedure {
          override def name(): String = pname
          override def description(): String = desc
          override def parameters(): Array[ProcedureParameter] = params.toArray
          override def isDeterministic: Boolean = false
          override def call(input: InternalRow): util.Iterator[Scan] = {
            // NB: distinct name — `rows` inside the anon class would
            // resolve to its own method (a scalac self-tail-call loop)
            val produced = body(input).toArray
            util.List.of[Scan](new LocalScan {
              override def rows(): Array[InternalRow] = produced
              override def readSchema(): StructType = out
            }).iterator()
          }
        }
    }

  private def tableParam =
    ProcedureParameter.in("table", StringType)
      .comment("'<namespace>.<table>' under the warehouse").build()
  private val statusSchema = StructType(Seq(
    StructField("table", StringType), StructField("status", StringType),
    StructField("epoch", LongType)))
  private def statusRow(table: String, status: String, path: String)
      : Seq[InternalRow] =
    Seq(InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(table),
      org.apache.spark.unsafe.types.UTF8String.fromString(status),
      GeoParquet.readEpoch(SparkSession.active, path)))

  private def procedures: Map[String, UnboundProcedure] = Map(
    "rebuild_manifest" -> proc("rebuild_manifest",
      "full manifest rebuild — the layout repair verb (also resolves " +
        "crash-stranded merge/compact stages)",
      Seq(tableParam), statusSchema) { in =>
      val t = strArg(in, 0); val p = layoutPathOf(t)
      GeoParquet.writeManifest(SparkSession.active, p)
      statusRow(t, "rebuilt", p)
    },
    "compact" -> proc("compact",
      "compact the layout: scoped overlap-component rewrite for curve " +
        "layouts, full bin-merge rewrite otherwise (locked/journaled)",
      Seq(tableParam), statusSchema) { in =>
      val t = strArg(in, 0); val p = layoutPathOf(t)
      val spark = SparkSession.active
      if (GeoParquet.bucketsOf(spark, p).isDefined) {
        // hash-bucketed layouts re-bucket WHOLESALE: a scoped rewrite
        // would adopt files whose names are not bucket ids and poison
        // the certificate (compactCurveScoped refuses them for the
        // same reason); nFiles is moot — the bucket count governs
        GeoParquet.compactCurve(spark, p, nFiles = 1)
        statusRow(t, "compacted (re-bucketed)", p)
      } else if (GeoParquet.isCurveLayout(spark, p)) {
        val n = GeoParquet.compactCurveScoped(spark, p)
        statusRow(t, s"compacted $n component(s)", p)
      } else {
        GeoParquet.compact(spark, p)
        statusRow(t, "compacted", p)
      }
    },
    "vacuum" -> proc("vacuum",
      "sweep stale staging/compaction siblings older than the commit lease",
      Seq(tableParam), statusSchema) { in =>
      val t = strArg(in, 0); val p = layoutPathOf(t)
      GeoParquet.vacuum(SparkSession.active, p)
      statusRow(t, "vacuumed", p)
    },
    "coalesce_manifest" -> proc("coalesce_manifest",
      "metadata compaction: coalesce the manifest's one-part-per-commit " +
        "accumulation into a single part with identical rows — planning " +
        "stops paying O(commits) footer reads; NOT a history reset " +
        "(epochs, changelog floor, and streaming offsets stay valid)",
      Seq(tableParam), statusSchema) { in =>
      val t = strArg(in, 0); val p = layoutPathOf(t)
      GeoParquet.compactManifest(SparkSession.active, p)
      statusRow(t, "manifest coalesced", p)
    },
    "expire" -> proc("expire",
      "TTL retention: positional-delete rows with t older than cutoff_ms " +
        "(merge-on-read; the next compaction reclaims space)",
      Seq(tableParam,
        ProcedureParameter.in("cutoff_ms", LongType)
          .comment("epoch-ms cutoff; rows with t < cutoff_ms expire").build()),
      statusSchema) { in =>
      val t = strArg(in, 0); val p = layoutPathOf(t)
      GeoParquet.expireOlderThan(SparkSession.active, p, in.getLong(1))
      statusRow(t, "expired", p)
    },
    "rebucket" -> proc("rebucket",
      "evolve a hash-bucketed table's bucket count: locked rewrite " +
        "into n buckets with the certificate swapped atomically with " +
        "the files; ReducibleFunction keeps zero-shuffle joins with " +
        "old-count peers when one count divides the other",
      Seq(tableParam,
        ProcedureParameter.in("buckets", LongType)
          .comment("new bucket count").build()),
      statusSchema) { in =>
      val t = strArg(in, 0); val p = layoutPathOf(t)
      GeoParquet.rebucket(SparkSession.active, p, in.getLong(1).toInt)
      statusRow(t, s"rebucketed to ${in.getLong(1)} buckets", p)
    },
    "rollback_to" -> proc("rollback_to",
      "restore the table's present to the state at a commit epoch: " +
        "manifest truncated, later commits' files and delete parts " +
        "removed, commit counter NOT reset (no epoch reuse); " +
        "checkpointed streams past the target fail loudly and must " +
        "restart; refuses across compaction/rebuild history resets " +
        "exactly like AS-OF",
      Seq(tableParam,
        ProcedureParameter.in("epoch", LongType)
          .comment("target commit epoch (VERSION AS OF axis)").build()),
      statusSchema) { in =>
      val t = strArg(in, 0); val p = layoutPathOf(t)
      GeoParquet.rollbackTo(SparkSession.active, p, in.getLong(1))
      statusRow(t, s"rolled back to epoch ${in.getLong(1)}", p)
    },
    "rollback_to_time" -> proc("rollback_to_time",
      "rollback_to by wall clock: resolves through the _epoch_times " +
        "commit stamps exactly as TIMESTAMP AS OF does",
      Seq(tableParam,
        ProcedureParameter.in("ts_ms", LongType)
          .comment("epoch-ms wall clock; resolves to the largest " +
            "commit stamped at-or-before it").build()),
      statusSchema) { in =>
      val t = strArg(in, 0); val p = layoutPathOf(t)
      GeoParquet.rollbackToTime(SparkSession.active, p, in.getLong(1))
      statusRow(t, "rolled back", p)
    },
    "history" -> proc("history",
      "commit history: one row per stamped commit epoch with its " +
        "wall-clock time (the TIMESTAMP AS OF axis), plus file/row " +
        "counts for epochs still in manifest history",
      Seq(tableParam), StructType(Seq(
        StructField("epoch", LongType),
        StructField("committed_at_ms", LongType),
        StructField("committed_at", StringType),
        StructField("n_files", LongType),
        StructField("n_rows", LongType)))) { in =>
      val t = strArg(in, 0); val p = layoutPathOf(t)
      val spark = SparkSession.active
      // per-epoch inventory where a fresh manifest exists; history is
      // still reportable (epochs + times) over a stale one
      val inv: Map[Long, (Long, Long)] =
        try GeoParquet.snapshots(spark, p).collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        catch { case scala.util.control.NonFatal(_) => Map.empty }
      GeoParquet.epochTimes(spark, p).sortBy(_._1).map { case (e, ms) =>
        InternalRow(e, ms,
          org.apache.spark.unsafe.types.UTF8String.fromString(
            java.time.Instant.ofEpochMilli(ms).toString),
          inv.get(e).map(v => java.lang.Long.valueOf(v._1)).orNull,
          inv.get(e).map(v => java.lang.Long.valueOf(v._2)).orNull)
      }
    },
    "snapshots" -> proc("snapshots",
      "snapshot inventory: one row per commit epoch still in history",
      Seq(tableParam), StructType(Seq(
        StructField("epoch", LongType), StructField("n_files", LongType),
        StructField("n_rows", LongType)))) { in =>
      val p = layoutPathOf(strArg(in, 0))
      GeoParquet.snapshots(SparkSession.active, p).collect().toSeq
        .map(r => InternalRow(r.getLong(0), r.getLong(1), r.getLong(2)))
    },
    "stale_tiles" -> proc("stale_tiles",
      "which tiles need re-running since a commit epoch: changelog-" +
        "pruned new rows rolled up to their tile, dilated to the " +
        "8-neighborhood (the reference's make_queue as metadata; " +
        "n_new = 0 marks dilation-only tiles)",
      Seq(tableParam,
        ProcedureParameter.in("since_epoch", LongType)
          .comment("changelog cursor: tiles of commits > this epoch")
          .build(),
        ProcedureParameter.in("tile_size", DoubleType)
          .comment("tile edge length in x/y units").build()),
      StructType(Seq(
        StructField("tile_e", LongType), StructField("tile_n", LongType),
        StructField("n_new", LongType)))) { in =>
      val p = layoutPathOf(strArg(in, 0))
      GeoParquet.staleTiles(SparkSession.active, p, in.getLong(1),
          in.getDouble(2))
        .collect().toSeq
        .map(r => InternalRow(r.getLong(0), r.getLong(1), r.getLong(2)))
    })

  /** The FunctionCatalog face: exactly one function, `bucket` — what
    * Spark's storage-partitioned-join planning resolves the
    * `bucket(n, key)` transform both bucketed scans report through,
    * proving the two sides co-partitioned (canonicalName equality).
    * Identifier namespace is ignored on purpose: Spark's transform
    * resolution looks the name up with an EMPTY namespace.
    */
  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    if (namespace.isEmpty || namespaceExists(namespace))
      Array(Identifier.of(namespace, "bucket"))
    else throw new NoSuchNamespaceException(namespace)

  override def loadFunction(ident: Identifier)
      : org.apache.spark.sql.connector.catalog.functions.UnboundFunction =
    if (functionExists(ident)) GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis
      .NoSuchFunctionException(ident)

  /** Consistent with [[listFunctions]]: `bucket` lives at the catalog
    * root (the empty namespace Spark's transform resolution uses) and
    * is visible from every EXISTING namespace — a nonexistent
    * namespace holds nothing, rather than phantom functions.
    */
  override def functionExists(ident: Identifier): Boolean =
    ident.name().equalsIgnoreCase("bucket") &&
      (ident.namespace().isEmpty || namespaceExists(ident.namespace()))

  override def loadProcedure(ident: Identifier): UnboundProcedure = {
    require(ident.namespace().sameElements(Array("system")),
      s"graft procedures live in the 'system' namespace: " +
        s"CALL $catalogName.system.${ident.name()}(...)")
    procedures.getOrElse(ident.name(),
      throw new UnsupportedOperationException(
        s"unknown procedure ${ident.name()} — available: " +
          procedures.keys.toSeq.sorted.mkString(", ")))
  }

  override def listProcedures(namespace: Array[String]): Array[Identifier] =
    if (namespace.sameElements(Array("system")))
      procedures.keys.toArray.sorted.map(Identifier.of(Array("system"), _))
    else Array.empty
}
