package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Nested JSON path access — the reference's get_nested_field
  * (update_es.py) walks dotted paths through nested ES documents,
  * returning None when any step is missing. Here the same access is a
  * single codegen'd JsonPath evaluation per column (get_json_object),
  * null on missing paths — no per-row Python walk, so it runs at scan
  * speed over a 100 TB JSON column.
  */
object JsonOps {

  /** Extract `path` ("a.b.c" or "a.items[2].id") from a JSON string
    * column; null when any step of the path is absent. */
  def nestedField(doc: Column, path: String): Column =
    get_json_object(doc, "$." + path)

  /** [[nestedField]] with a target type — null on cast failure too
    * (try_cast: Spark 4 runs ANSI mode by default, where a plain cast
    * THROWS on e.g. "n/a" → long instead of the tolerant null read
    * the reference's get_nested_field contract promises). */
  def nestedFieldAs(doc: Column, path: String, castTo: String): Column =
    nestedField(doc, path).try_cast(castTo)

  /** Multi-path extraction with ONE parse: declare a (partial) schema
    * covering every wanted path, `from_json` once, and walk the
    * resulting struct with codegen'd field accesses. Each extra
    * `get_json_object` re-parses the whole document — at 100 TB,
    * k paths must not mean k full JSON parses per row. Missing paths
    * and absent fields come back null, like the reference's tolerant
    * get_nested_field. */
  def parsedDoc(doc: Column, ddlSchema: String): Column =
    from_json(doc, org.apache.spark.sql.types.StructType
      .fromDDL(ddlSchema))
}
