package graft.maintenance

import org.apache.spark.sql.SparkSession

/** Catalog-driven diff deployment — the reference's script-and-redeploy loop
  * (reference: samples/scripts/deployments/GenerateScripts.ps1:40-60
  * enumerates procs/functions/views per schema and exports their
  * definitions; samples/scripts/deployments/AddSPChanges.sql:5-40 wraps one
  * object as guarded-drop + recreate). The loop here is the same three-step
  * shape: export a namespace's object definitions to a script map, diff the
  * live catalog against that baseline, and emit + execute drop/recreate DDL
  * for anything changed or missing.
  */
object Deployment {

  /** `sys.sql_modules` analog for the SQL-text procedural surface: Spark has
    * no procedure catalog, so module definitions (dynamic-SQL templates run
    * through the D9 EXEC path) live in this engine-side catalog, exactly as
    * the reference reads proc text from `sys.sql_modules.definition`
    * (reference: GetCreateStatement_Function_Proc_View.sql:104-108).
    */
  final class ModuleCatalog {
    private val modules = scala.collection.mutable.LinkedHashMap[String, String]()

    def createOrAlter(name: String, definition: String): Unit =
      synchronized { modules(name) = definition }

    def definition(name: String): Option[String] =
      synchronized { modules.get(name) }

    def names: Seq[String] = synchronized { modules.keys.toSeq }

    def drop(name: String): Unit = synchronized { modules.remove(name): Unit }
  }

  private def quote(id: String): String = Ddl.quote(id)

  /** Export every view definition in a namespace (GenerateScripts' view
    * branch): name → runnable CREATE VIEW statement.
    */
  def exportViewScripts(spark: SparkSession, namespace: String): Map[String, String] =
    spark.catalog.listTables(namespace).collect()
      .filter(_.tableType == "VIEW")
      .map(t => t.name -> Ddl.createViewStatement(spark, s"$namespace.${t.name}"))
      .toMap

  /** Diff the live namespace against an exported baseline and redeploy
    * changed/missing views: per object the AddSPChanges autoDeploy shape —
    * existence-guarded drop, then the baseline CREATE — executed in name
    * order. Returns every DDL statement executed (empty when in sync).
    */
  def deployViewChanges(spark: SparkSession, namespace: String,
      baseline: Map[String, String]): Seq[String] =
    baseline.toSeq.sortBy(_._1).flatMap { case (name, createDdl) =>
      val qualified = s"$namespace.$name"
      val live =
        if (spark.catalog.tableExists(qualified))
          Some(Ddl.createViewStatement(spark, qualified))
        else None
      if (live.contains(createDdl)) Nil
      else {
        val stmts = Seq(
          s"DROP VIEW IF EXISTS ${quote(namespace)}.${quote(name)}", createDdl)
        stmts.foreach(s => spark.sql(s): Unit)
        stmts
      }
    }

  /** The same loop over the procedural module catalog: modules whose live
    * definition differs from (or is absent in) the baseline are re-created;
    * returns the redeployed names.
    */
  def deployModuleChanges(target: ModuleCatalog,
      baseline: Map[String, String]): Seq[String] =
    baseline.toSeq.sortBy(_._1).flatMap { case (name, defn) =>
      if (target.definition(name).contains(defn)) Nil
      else { target.createOrAlter(name, defn); Seq(name) }
    }
}
