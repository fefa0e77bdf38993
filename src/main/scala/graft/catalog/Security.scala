package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Minimal database-principal model backing the security member of the
  * monitoring toolkit (reference:
  * solutions/monitoring/scripts/views/microsoft.vw_security_role_members.sql:1-25):
  * principals are (principal_id, name, type_desc) with DATABASE_ROLE and
  * SQL_USER types, membership is (role_principal_id, member_principal_id),
  * and the toolkit view is the double principal join filtered to role-typed
  * principals on the role side. Spark has no database-principal catalog, so
  * this is engine-side metadata exactly like the table-policy properties —
  * driver-resident, never part of a data plan.
  *
  * Roles can nest (a role may be a member of another role), matching
  * `sys.database_role_members`, which relates any two principals.
  */
final class Security(spark: SparkSession) {

  private case class Principal(id: Int, name: String, typeDesc: String)

  private val principals =
    scala.collection.mutable.LinkedHashMap[String, Principal]()
  private val members =
    scala.collection.mutable.LinkedHashSet[(Int, Int)]() // (role_id, member_id)
  private val nextId = new java.util.concurrent.atomic.AtomicInteger(1)

  private def create(name: String, typeDesc: String): Unit = synchronized {
    require(!principals.contains(name), s"principal '$name' already exists")
    principals(name) = Principal(nextId.getAndIncrement(), name, typeDesc)
  }

  /** CREATE ROLE. */
  def createRole(name: String): Unit = create(name, "DATABASE_ROLE")

  /** CREATE USER. */
  def createUser(name: String): Unit = create(name, "SQL_USER")

  private def principal(name: String): Principal =
    principals.getOrElse(name,
      throw new IllegalArgumentException(s"unknown principal '$name'"))

  /** ALTER ROLE role ADD MEMBER member — validated like the reference's
    * THROW-guarded procedures (§2.9 D3): the role side must be a role.
    */
  def addRoleMember(role: String, member: String): Unit = synchronized {
    val r = principal(role)
    require(r.typeDesc == "DATABASE_ROLE", s"'$role' is not a role")
    members += ((r.id, principal(member).id)): Unit
  }

  /** ALTER ROLE role DROP MEMBER member. */
  def dropRoleMember(role: String, member: String): Unit = synchronized {
    members -= ((principal(role).id, principal(member).id)): Unit
  }

  /** sys.database_principals analog. */
  def principalsDf: DataFrame = {
    import spark.implicits._
    principals.values.toSeq.map(p => (p.id, p.name, p.typeDesc))
      .toDF("principal_id", "name", "type_desc")
  }

  /** sys.database_role_members analog. */
  def roleMembersDf: DataFrame = {
    import spark.implicits._
    members.toSeq.toDF("role_principal_id", "member_principal_id")
  }

  /** The toolkit view (reference: microsoft.vw_security_role_members.sql:6-15
    * — double principal join, role side filtered to DATABASE_ROLE).
    */
  def securityRoleMembers: DataFrame =
    roleMembersDf.as("rm")
      .join(principalsDf.as("r"),
        col("rm.role_principal_id") === col("r.principal_id"))
      .join(principalsDf.as("m"),
        col("rm.member_principal_id") === col("m.principal_id"))
      .filter(col("r.type_desc") === "DATABASE_ROLE")
      .select(col("r.name").as("role_principal_name"),
        col("m.name").as("member_principal_name"))

  /** IS_ROLEMEMBER with nesting: true when `member` reaches `role` through
    * any chain of role memberships (roles may be members of roles, as in
    * sys.database_role_members). Driver-side BFS over the metadata sets —
    * principals are catalog-scale, never data-scale.
    */
  def isMemberTransitive(role: String, member: String): Boolean = synchronized {
    val target = principal(role).id
    val start = principal(member).id
    // walk upward: which roles contain X, which roles contain those...
    val containing = members.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val seen = scala.collection.mutable.Set[Int]()
    var frontier = containing.getOrElse(start, Set.empty[Int]).toSet
    while (frontier.nonEmpty) {
      if (frontier.contains(target)) return true
      seen ++= frontier
      frontier = frontier.flatMap(id => containing.getOrElse(id, Set.empty))
        .diff(seen)
    }
    false
  }
}
