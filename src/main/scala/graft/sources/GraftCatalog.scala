package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.format.GraftFileReader

/** DSv2 TableCatalog over a warehouse of graft directories.
  *
  * The reference's chunk is "several named tables written together"
  * (`src/chunk.zig:15-38`); SURVEY.md §1.1 maps that to a catalog
  * exposing N tables per file/directory. This catalog does exactly that:
  *
  * {{{
  *   spark.sql.catalog.graft      = graft.sources.GraftCatalog
  *   spark.sql.catalog.graft.root = /data/graft
  *   SELECT * FROM graft.mydb.lineitem   -- .graft files under /data/graft/mydb, table 'lineitem'
  * }}}
  *
  * Namespaces are single-level subdirectories of `root`; the tables of a
  * namespace are the union of table names across its files' footers.
  * Read-only in v1 — writes go through the path-based API.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _
  private val conf = new Configuration()

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(s"catalog $name requires option 'root'"))
  }
  override def name(): String = catalogName

  private def nsDir(namespace: Array[String]): String =
    (Seq(root) ++ namespace).mkString("/")

  private def footerOf(dir: String): Option[graft.format.Meta.Footer] = {
    val files = GraftDataSource.listFiles(conf, dir)
    files.headOption.map { f =>
      val r = GraftFileReader.open(f.getFileSystem(conf), f)
      try r.footer finally r.close()
    }
  }

  override def listNamespaces(): Array[Array[String]] = {
    val p = new Path(root)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) Array.empty
    else fs.listStatus(p).filter(_.isDirectory).map(s => Array(s.getPath.getName))
  }
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) listNamespaces() else Array.empty

  override def namespaceExists(namespace: Array[String]): Boolean = {
    val p = new Path(nsDir(namespace))
    namespace.length == 1 && p.getFileSystem(conf).exists(p)
  }
  override def loadNamespaceMetadata(namespace: Array[String]): java.util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace.toSeq)
    Map("location" -> nsDir(namespace)).asJava
  }
  override def createNamespace(namespace: Array[String], metadata: java.util.Map[String, String]): Unit = {
    val p = new Path(nsDir(namespace))
    p.getFileSystem(conf).mkdirs(p)
  }
  override def alterNamespace(namespace: Array[String], changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("graft catalog namespaces are immutable")
  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("graft catalog is read-only; delete the directory instead")

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = nsDir(namespace)
    GraftDataSource.listFiles(conf, dir).flatMap { f =>
      val r = GraftFileReader.open(f.getFileSystem(conf), f)
      try r.tableNames finally r.close()
    }.distinct.map(t => Identifier.of(namespace, t)).toArray
  }

  override def tableExists(ident: Identifier): Boolean =
    try { loadTable(ident); true } catch { case _: Exception => false }

  override def loadTable(ident: Identifier): Table = {
    val dir = nsDir(ident.namespace())
    val footer = footerOf(dir).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident))
    val table = footer.chunks.flatMap(_.tables).find(_.name == ident.name()).getOrElse(
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident))
    val opts = Map("path" -> dir, "table" -> ident.name()).asJava
    new GraftTable(dir, table.schema, new CaseInsensitiveStringMap(opts))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog is read-only in v1; write with df.write.format(\"graft\").save(dir)")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only in v1")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only in v1")
}
