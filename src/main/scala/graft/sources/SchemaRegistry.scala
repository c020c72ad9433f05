package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}
import scala.collection.concurrent.TrieMap

/** Minimal schema catalog for evolving parquet tables (SURVEY.md §2b
  * q_schema_evo_cat): writers DECLARE each batch's schema as it lands,
  * the registry folds declarations into a running union, and readers
  * consume the declared union directly.
  *
  * Why this exists: `mergeSchema=true` is a footer-sampling pass over
  * the lake's files — at 100 TB that is potentially millions of S3
  * footer reads before the first row is scanned. Production lakes
  * (Hive metastore, Glue, Delta/Iceberg metadata) keep the union
  * schema in a catalog and declare it at read time; the merge
  * SEMANTICS (field union in first-appearance order, null-fill of
  * absent columns) are identical either way, which is exactly what
  * SchemaRegistrySpec's declare-vs-merge equivalence test pins.
  *
  * Union rules (deliberately strict): same-name fields must carry the
  * SAME data type — a type conflict fails the declare() loudly rather
  * than silently widening, because a silent widen is how a lake ends
  * up with a column whose meaning differs by file vintage. Every
  * unioned field is nullable (a batch that predates the field reads as
  * null — the parquet merge convention).
  */
object SchemaRegistry {

  private val tables = TrieMap.empty[String, StructType]

  /** Declare (or evolve) a table's schema; returns the new running
    * union. New fields append in first-appearance order; a same-name
    * field with a different type fails fast.
    */
  def declare(table: String, schema: StructType): StructType = synchronized {
    val merged = tables.get(table) match {
      case None => StructType(schema.fields.map(_.copy(nullable = true)))
      case Some(prev) =>
        val known = prev.fieldNames.toSet
        schema.fields.foreach { f =>
          prev.fields.find(_.name == f.name).foreach { p =>
            require(p.dataType == f.dataType,
              s"schema conflict on $table.${f.name}: declared ${p.dataType}, got ${f.dataType}")
          }
        }
        StructType(prev.fields ++
          schema.fields.filterNot(f => known(f.name)).map(_.copy(nullable = true)))
    }
    tables.update(table, merged)
    merged
  }

  def schemaOf(table: String): Option[StructType] = tables.get(table)

  def drop(table: String): Unit = tables.remove(table)

  /** Read parquet paths under the catalog-declared union schema —
    * no mergeSchema footer sampling; files missing a declared column
    * null-fill it (parquet's reader does this natively when handed an
    * explicit schema).
    */
  def readDeclared(spark: SparkSession, table: String, paths: String*): DataFrame = {
    val schema = schemaOf(table).getOrElse(
      throw new IllegalArgumentException(s"no declared schema for table $table"))
    spark.read.schema(schema).parquet(paths: _*)
  }
}
