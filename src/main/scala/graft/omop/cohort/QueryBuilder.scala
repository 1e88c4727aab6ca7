package graft.omop.cohort

/**
 * Declarative cohort specification: a main templated SQL query plus optional
 * dependency / entry / negative / post-process queries and ancestor-table
 * requests, all resolved against global temp views.
 *
 * Reference: /root/reference/src/cehrbert_data/cohorts/query_builder.py:25-153.
 * Templates use `{param}` placeholders like the reference's str.format.
 */
object QueryBuilder {
  val EntryCohort = "entry_cohort"
  val NegativeCohort = "negative_cohort"
  val CohortTableName = "cohort"

  /** `{key}` substitution over a SQL template (Python str.format parity). */
  def render(template: String, parameters: Map[String, Any]): String =
    parameters.foldLeft(template) { case (sql, (k, v)) => sql.replace(s"{$k}", v.toString) }
}

final case class QuerySpec(
    queryTemplate: String,
    parameters: Map[String, Any] = Map.empty,
    tableName: String = QueryBuilder.CohortTableName) {
  def sql: String = QueryBuilder.render(queryTemplate, parameters)
}

/** Request to materialize a concept-descendant table before the main query:
  * standard concepts go through concept_ancestor; non-standard through the
  * iterative concept_relationship closure. */
final case class AncestorTableSpec(
    ancestorConceptIds: Seq[Long],
    tableName: String,
    isStandard: Boolean)

final case class QueryBuilder(
    cohortName: String,
    dependencyList: Seq[String],
    query: QuerySpec,
    negativeQuery: Option[QuerySpec] = None,
    entryCohortQuery: Option[QuerySpec] = None,
    dependencyQueries: Seq[QuerySpec] = Nil,
    postQueries: Seq[QuerySpec] = Nil,
    ancestorTableSpecs: Seq[AncestorTableSpec] = Nil)
