package graft.sources.v2

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
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
  * Deliberately refused verbs: CREATE TABLE (a layout needs a
  * geometry decision — bin size, curve, clustering — owned by
  * [[GeoParquet.write]]/`writeZOrdered`; an empty CREATE would just
  * defer the error), DROP/RENAME/ALTER (destructive or rewriting —
  * the API's verbs own those lifecycles).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {
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

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      s"graft catalog cannot CREATE TABLE $ident — a layout needs a " +
        "geometry decision (bin size / curve clustering); create it with " +
        "GeoParquet.write/writeZOrdered under the warehouse, then query " +
        "it by name")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      s"graft catalog cannot ALTER $ident — schema evolution rides the " +
        "append paths (recordEvolution) and layout rewrites are API verbs")

  override def dropTable(ident: Identifier): Boolean =
    throw new UnsupportedOperationException(
      s"graft catalog cannot DROP $ident — deleting a layout is a " +
        "filesystem-lifecycle operation, done deliberately outside SQL")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      s"graft catalog cannot RENAME $oldIdent — manifests are root-" +
        "relative, so moving the directory IS the rename; do it there")
}
