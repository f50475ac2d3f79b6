package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{NoSuchFunctionException, NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Catalog plugin: the LAST rung of the connector API after
  * scan/write/stream — a [[TableCatalog]] + [[FunctionCatalog]] that makes
  * the generator SQL-addressable with no registration ceremony:
  *
  * {{{
  *   SET spark.sql.catalog.graft=graft.sources.GraftCatalog  (or conf)
  *   SELECT count(*) FROM graft.gen.docs_1000000   -- closed-form pushdown
  *   SELECT graft.fn.doc_lang(7)                    -- V2 scalar function
  * }}}
  *
  * Tables are VIRTUAL: `gen.docs_<rows>[_p<rowsPerPartition>]` parses the
  * corpus size out of the identifier and serves the same [[DocGenTable]]
  * the `graft-docs` format serves, so every pushdown (filter, limit,
  * closed-form aggregate, runtime filter) and the columnar read path work
  * identically through the SQL/catalog route — asserted in
  * GraftCatalogSpec and hash-gated by q123. The catalog is read-only
  * (create/alter/drop throw): a generator has no state to mutate.
  *
  * Functions live in `fn`: `doc_lang(id)`, `doc_source(id)`,
  * `doc_text(id)` expose the corpus-defining pure functions as V2
  * ScalarFunctions (the `invoke` magic method keeps them codegen-friendly,
  * `produceResult` is the specified fallback).
  */
class GraftCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName = "graft"
  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName
  override def defaultNamespace(): Array[String] = Array("gen")

  private val TableName = raw"docs_(\d+)(?:_p(\d+))?".r

  /** The advertised listing — any docs_<n> loads, these are the examples
    * SHOW TABLES surfaces. */
  private val advertised = Seq(1000L, 100000L, 1000000L)

  override def listTables(namespace: Array[String]): Array[Identifier] =
    namespace match {
      case Array("gen") =>
        advertised.map(n => Identifier.of(Array("gen"), s"docs_$n")).toArray
      case Array("fn") => Array.empty
      case ns => throw new NoSuchNamespaceException(ns)
    }

  override def loadTable(ident: Identifier): Table =
    (ident.namespace(), ident.name()) match {
      case (Array("gen"), TableName(rows, rpp)) =>
        val opts = new java.util.HashMap[String, String]()
        opts.put("rows", rows)
        if (rpp != null) opts.put("rowsPerPartition", rpp)
        new DocGenTable(new CaseInsensitiveStringMap(opts))
      case _ => throw new NoSuchTableException(ident)
    }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().sameElements(Array("gen")) &&
      TableName.pattern.matcher(ident.name()).matches()

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft tables are virtual — address any size as gen.docs_<rows>")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("graft catalog is read-only")
  override def dropTable(ident: Identifier): Boolean = false
  override def renameTable(from: Identifier, to: Identifier): Unit =
    throw new UnsupportedOperationException("graft catalog is read-only")

  // ------------------------------------------------------- functions

  private val fns: Map[String, Long => String] = Map(
    "doc_lang" -> DocGen.langOf,
    "doc_source" -> DocGen.sourceOf,
    "doc_text" -> DocGen.textOf)

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    namespace match {
      case Array("fn") =>
        fns.keys.toSeq.sorted.map(Identifier.of(Array("fn"), _)).toArray
      case Array("gen") => Array.empty
      case ns => throw new NoSuchNamespaceException(ns)
    }

  override def loadFunction(ident: Identifier): UnboundFunction =
    (ident.namespace(), ident.name()) match {
      case (Array("fn"), fname) if fns.contains(fname) =>
        new DocFieldFunction(fname, fns(fname))
      case _ => throw new NoSuchFunctionException(ident)
    }

  override def functionExists(ident: Identifier): Boolean =
    ident.namespace().sameElements(Array("fn")) && fns.contains(ident.name())
}

/** V2 scalar function `string f(bigint)` over the corpus-defining pure
  * functions. `invoke` is the codegen magic method; `produceResult` the
  * interpreted fallback. */
class DocFieldFunction(fname: String, f: Long => String)
  extends UnboundFunction with ScalarFunction[UTF8String] {
  override def name(): String = fname
  override def description(): String =
    s"$fname(doc_id BIGINT): the generated column as a pure function"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 1 &&
      inputType.fields(0).dataType == LongType,
      s"$fname expects a single BIGINT argument")
    this
  }

  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = StringType
  override def isResultNullable: Boolean = false
  override def canonicalName(): String = s"graft.fn.$fname"

  def invoke(id: Long): UTF8String = UTF8String.fromString(f(id))
  override def produceResult(input: InternalRow): UTF8String =
    invoke(input.getLong(0))
}
