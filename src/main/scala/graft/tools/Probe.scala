package graft.tools

import org.apache.spark.sql.functions._

import graft.core.GraftSession
import graft.omop.Preprocess
import graft.omop.tools.{ConnectOmopVisits, QualifiedConceptList}

/** Scratch probe main: drives the visit-consolidation and qualified-concept
  * tools end-to-end over the bundled sample OMOP data. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "probe")
    spark.sparkContext.setLogLevel("ERROR")
    val input = "/root/reference/sample_data/omop_sample"

    val visits = Preprocess.domainTable(spark, input, "visit_occurrence")
    println("[probe] visits before: " + visits.count())
    val res = ConnectOmopVisits.run(visits,
      persistence = Some((spark, "/tmp/graft_connect")))
    println("[probe] visits after:  " + res.visitOccurrence.count())
    println("[probe] mappings:      " + res.mapping.count())
    res.mapping.groupBy().agg(countDistinct("master_visit_occurrence_id")).show()

    val qc = QualifiedConceptList.build(spark, input, minNumOfPatients = 10)
    println("[probe] qualified concepts (>=10 patients): " + qc.count())
    qc.orderBy(desc("freq")).show(5)
    spark.stop()
  }
}
