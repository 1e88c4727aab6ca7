package graft.omop.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lit, when}
import org.apache.spark.sql.types._

import graft.core.Checkpoints
import graft.operators.IdAllocator

/**
 * EHRShot long-format CSV → OMOP CDM converter: infer/repair visit ids
 * (interval join to real visits, artificial visits for orphans), disconnect
 * out-of-span records, split each `omop_table` group into its OMOP table with
 * concept mapping ("VOCAB/CODE" → concept_id), numeric/categorical value
 * extraction, unit and answer lookups, visit dedup by type priority, and
 * person assembly from demographic codes.
 *
 * Reference: /root/reference/src/cehrbert_data/tools/ehrshot_to_omop.py:92-915.
 * Determinism barriers are kept wherever ids derive from
 * monotonically_increasing_id (the reference's own comment: "to have
 * deterministic behavior", :486-494).
 */
object EhrShotToOmop {

  /** S7: the EHRShot long-format CSV schema (ehrshot_to_omop.py:92-104). */
  val EhrShotSchema: StructType = StructType(Seq(
    StructField("_c0", StringType),
    StructField("patient_id", IntegerType),
    StructField("start", TimestampType),
    StructField("end", TimestampType),
    StructField("code", StringType),
    StructField("value", StringType),
    StructField("unit", StringType),
    StructField("visit_id", StringType),
    StructField("omop_table", StringType)))

  val TableMapping: Map[String, Map[String, String]] = Map(
    "visit_occurrence" -> Map("patient_id" -> "person_id", "start" -> "visit_start_datetime",
      "end" -> "visit_end_datetime", "code" -> "visit_source_value", "visit_id" -> "visit_occurrence_id"),
    "condition_occurrence" -> Map("patient_id" -> "person_id", "start" -> "condition_start_datetime",
      "end" -> "condition_end_datetime", "code" -> "condition_source_value", "visit_id" -> "visit_occurrence_id"),
    "procedure_occurrence" -> Map("patient_id" -> "person_id", "start" -> "procedure_datetime",
      "end" -> "procedure_end_datetime", "code" -> "procedure_source_value", "visit_id" -> "visit_occurrence_id"),
    "drug_exposure" -> Map("patient_id" -> "person_id", "start" -> "drug_exposure_start_datetime",
      "end" -> "drug_exposure_end_datetime", "code" -> "drug_source_value", "visit_id" -> "visit_occurrence_id"),
    "measurement" -> Map("patient_id" -> "person_id", "start" -> "measurement_datetime",
      "code" -> "measurement_source_value", "visit_id" -> "visit_occurrence_id"),
    "observation" -> Map("patient_id" -> "person_id", "start" -> "observation_datetime",
      "code" -> "observation_source_value", "visit_id" -> "visit_occurrence_id"),
    "death" -> Map("patient_id" -> "person_id", "start" -> "death_datetime",
      "code" -> "death_source_value"))

  val ConceptIdMapping: Map[String, String] = Map(
    "visit_occurrence" -> "visit_concept_id",
    "condition_occurrence" -> "condition_concept_id",
    "procedure_occurrence" -> "procedure_concept_id",
    "drug_exposure" -> "drug_concept_id",
    "measurement" -> "measurement_concept_id",
    "observation" -> "observation_concept_id",
    "death" -> "death_type_concept_id")

  private val InpatientCodes = Seq("Visit/IP", "Visit/ERIP")

  /** "VOCAB/CODE" → concept_id via (vocabulary_id, concept_code) lookup;
    * unmatched codes map to 0 (ehrshot_to_omop.py:380-444). */
  def convertCodeToOmopConcept(data: DataFrame, concept: DataFrame, field: String): DataFrame = {
    val outputColumns = data.schema.fieldNames.map(data(_)).toSeq :+
      F.coalesce(concept("concept_id"), lit(0)).as("concept_id")
    val keyed = data
      .withColumn("vocabulary_id", F.split(col(field), "/").getItem(0))
      .withColumn("concept_code", F.split(col(field), "/").getItem(1))
    keyed.join(concept,
        keyed("vocabulary_id") === concept("vocabulary_id") &&
          keyed("concept_code") === concept("concept_code"),
        "left_outer")
      .select(outputColumns: _*)
  }

  /** Unit string → OMOP Unit concept; ties broken by smallest concept id;
    * unmatched → 0 (ehrshot_to_omop.py:199-240). */
  def mapUnit(data: DataFrame, concept: DataFrame): DataFrame = {
    val unitDf = data.select("unit").distinct()
      .join(concept.where(col("domain_id") === "Unit"),
        data("unit") === concept("concept_code"), "left_outer")
      .select(data("unit"), F.coalesce(concept("concept_id"), lit(0)).as("unit_concept_id"))
      .withColumn("order",
        F.row_number().over(Window.partitionBy(col("unit")).orderBy(col("unit_concept_id"))))
      .where(col("order") === 1).drop("order")
    data.join(unitDf, Seq("unit"), "left_outer")
  }

  /** Categorical answer → OMOP Meas Value concept (ehrshot_to_omop.py:243-287). */
  def mapAnswer(data: DataFrame, concept: DataFrame): DataFrame = {
    val answerDf = data.select("value").distinct()
      .join(concept.where(col("domain_id") === "Meas Value"),
        data("value") === concept("concept_name"), "left_outer")
      .select(data("value"), F.coalesce(concept("concept_id"), lit(0)).as("value_as_concept_id"))
      .withColumn("order",
        F.row_number().over(Window.partitionBy(col("value")).orderBy(col("value_as_concept_id"))))
      .where(col("order") === 1).drop("order")
    data.join(answerDf, Seq("value"), "left_outer")
  }

  /** P11 numeric-string routing: numeric values cast + unit-mapped,
    * categorical answer-mapped, nulls passed through
    * (ehrshot_to_omop.py:290-377). */
  def extractValue(data: DataFrame, concept: DataFrame): DataFrame = {
    val numericPattern = "^[+-]?\\d*\\.?\\d+$"
    val df = data.withColumn("is_numeric",
      F.regexp_extract(col("value"), numericPattern, 0) =!= "")

    val numericDf = mapUnit(
      df.where(col("is_numeric"))
        .withColumn("value_as_number", col("value").cast(FloatType))
        .withColumn("value_as_concept_id", lit(null).cast(IntegerType)),
      concept)

    val categoricalDf = mapAnswer(
      df.where(!col("is_numeric"))
        .withColumn("unit_concept_id", lit(null).cast(IntegerType))
        .withColumn("value_as_number", lit(null).cast(FloatType)),
      concept)

    val otherDf = df.where(col("is_numeric").isNull)
      .withColumn("unit_concept_id", lit(null).cast(IntegerType))
      .withColumn("value_as_number", lit(null).cast(FloatType))
      .withColumn("value_as_concept_id", lit(null).cast(IntegerType))

    numericDf.unionByName(categoricalDf).unionByName(otherDf)
      .withColumnRenamed("value", "value_source_value")
      .withColumnRenamed("unit", "unit_source_value")
      .drop("is_numeric")
  }

  /** Person assembly from demographic codes (birth SNOMED/3950001, Gender*,
    * Ethnicity*, Race*) (ehrshot_to_omop.py:107-196). */
  def createOmopPerson(ehrShotData: DataFrame, concept: DataFrame): DataFrame = {
    val omopPerson = ehrShotData.where(col("omop_table") === "person")
    val birth = omopPerson.where(col("code") === "SNOMED/3950001").select(
      col("patient_id").as("person_id"),
      col("start").as("birth_datetime"),
      F.year(col("start")).as("year_of_birth"),
      F.month(col("start")).as("month_of_birth"),
      F.dayofmonth(col("start")).as("day_of_birth"))

    def demo(prefix: String, idName: String, srcName: String): DataFrame =
      convertCodeToOmopConcept(omopPerson.where(col("code").startsWith(prefix)), concept, "code")
        .select(col("patient_id").as("person_id"),
          col("concept_id").cast(IntegerType).as(idName),
          col("code").as(srcName))

    birth
      .join(demo("Gender", "gender_concept_id", "gender_source_value"), Seq("person_id"), "left_outer")
      .join(demo("Ethnicity", "ethnicity_concept_id", "ethnicity_source_value"), Seq("person_id"), "left_outer")
      .join(demo("Race", "race_concept_id", "race_source_value"), Seq("person_id"), "left_outer")
  }

  /** One visit per visit_id, preferring IP/ERIP > ER > others
    * (ehrshot_to_omop.py:747-783). */
  def dropDuplicateVisits(data: DataFrame): DataFrame =
    data.withColumn("priority",
        when(col("code").isin(InpatientCodes: _*), 1)
          .otherwise(when(col("code") === "Visit/ER", 2).otherwise(3)))
      .withColumn("visit_rank",
        F.row_number().over(Window.partitionBy("visit_id").orderBy(col("priority"))))
      .where(col("visit_rank") === 1)
      .drop("visit_rank", "priority")

  /**
   * Assign visit ids: link events without a visit to an enclosing inpatient
   * visit (nearest start wins), mint artificial visits above max(visit_id)
   * for orphans (one per (patient, date)), and append the artificial visit
   * rows (ehrshot_to_omop.py:447-591).
   */
  def generateVisitId(data: DataFrame, cacheFolder: String): DataFrame = {
    val dataRep = data.repartition(16)
    val realVisits = Checkpoints.persist(
      dataRep.where(col("omop_table") === "visit_occurrence")
        .withColumn("visit_start_date", col("start").cast(DateType))
        .withColumn("visit_end_date",
          F.coalesce(col("end").cast(DateType), col("visit_start_date"))),
      cacheFolder, "visit_reconstruction/real_visits")

    // barrier makes the record ids deterministic before any reuse; ids come
    // from the parallel zipWithIndex allocator, not a single-partition
    // Window.orderBy (record_id is only ever used as a join/partition key,
    // so the order itself is arbitrary — the barrier freezes it)
    var domainRecords = Checkpoints.persist(
      IdAllocator.sequentialId(
        dataRep.where(col("omop_table") =!= "visit_occurrence"),
        Seq(col("patient_id"), col("omop_table"), col("start"), col("code")),
        "record_id"),
      cacheFolder, "visit_reconstruction/temp_domain_records")
    val domainFields = domainRecords.schema.fieldNames

    domainRecords = domainRecords.alias("domain")
      .join(realVisits.where(col("code").isin(InpatientCodes: _*)).alias("visit"),
        col("domain.patient_id") === col("visit.patient_id") &&
          col("domain.start").between(col("visit.start"), col("visit.end")),
        "left_outer")
      .withColumn("ranking",
        F.row_number().over(Window.partitionBy("domain.record_id").orderBy(
          F.abs(F.unix_timestamp(col("visit.start")) - F.unix_timestamp(col("domain.start"))))))
      .where(col("ranking") === 1)
      .select(domainFields.filterNot(_ == "visit_id").map(c => col(s"domain.$c").as(c)).toSeq :+
        F.coalesce(col("visit.visit_id"), col("domain.visit_id")).as("visit_id"): _*)

    val maxVisitIdDf = realVisits.select(F.max("visit_id").as("max_visit_id"))
    // dense_rank over (patient, day) in the reference — same mapping from the
    // scalable dense-key allocator (one id per distinct pair, sort order)
    val orphanRecords = IdAllocator.denseKeyId(
        domainRecords
          .where(col("visit_id").isNull)
          .where(col("omop_table") =!= "person")
          .withColumn("start_date", col("start").cast(DateType)),
        Seq("patient_id", "start_date"), "__day_rank")
      .crossJoin(F.broadcast(maxVisitIdDf))
      .withColumn("new_visit_id", col("__day_rank") + col("max_visit_id").cast(LongType))
      .drop("visit_id", "start_date", "__day_rank")

    // every artificial visit belongs to exactly one patient
    orphanRecords.groupBy("new_visit_id")
      .agg(F.countDistinct("patient_id").as("pat_count"))
      .select(F.assert_true(col("pat_count") === 1)).collect()

    domainRecords = domainRecords.alias("domain")
      .join(orphanRecords.alias("orphan").select(col("orphan.record_id"), col("orphan.new_visit_id")),
        col("domain.record_id") === col("orphan.record_id"), "left_outer")
      .withColumn("update_visit_id",
        F.coalesce(col("orphan.new_visit_id"), col("domain.visit_id")))
      .select(domainFields.filterNot(_.endsWith("visit_id"))
        .map(c => col(s"domain.$c").as(c)).toSeq :+ col("update_visit_id").as("visit_id"): _*)
      .drop("record_id")

    val artificialVisits = Checkpoints.persist(
      orphanRecords.groupBy("new_visit_id", "patient_id")
        .agg(F.min("start").as("start"), F.max("start").as("end"))
        .withColumn("code", lit(0))
        .withColumn("value", lit(null).cast(StringType))
        .withColumn("unit", lit(null).cast(StringType))
        .withColumn("omop_table", lit("visit_occurrence"))
        .withColumnRenamed("new_visit_id", "visit_id")
        .drop("record_id"),
      cacheFolder, "visit_reconstruction/artificial_visits")

    artificialVisits.groupBy("visit_id").count()
      .select(F.assert_true(col("count") === 1)).collect()

    val realOut = realVisits.drop("visit_start_date", "visit_end_date")
    domainRecords
      .unionByName(realOut)
      .unionByName(artificialVisits.withColumn("code", col("code").cast(StringType))
        .select(realOut.columns.map(col).toSeq: _*))
  }

  /**
   * Disconnect records whose timestamps fall outside their visit's span by
   * more than `dayCutoff` days (lab results often carry the result-return
   * time): re-partition each such visit's distinct event dates by 24h gaps,
   * mint one new visit id per partition above max(visit_id), and rewrite both
   * the visit rows (re-spanned; IP visits shrinking to ≤24h demote to
   * Visit/OP) and the member records (ehrshot_to_omop.py:594-745).
   */
  def disconnectVisitId(data: DataFrame, cacheFolder: String, dayCutoff: Int = 1): DataFrame = {
    val domainRecords = data.where(col("omop_table") =!= "visit_occurrence")
    val visitRecords = data.where(col("omop_table") === "visit_occurrence")

    val visitInferredStartEnd = domainRecords.alias("domain")
      .join(visitRecords.alias("visit"), col("domain.visit_id") === col("visit.visit_id"))
      .groupBy(col("domain.visit_id"))
      .agg(F.min(col("domain.start")).as("start"), F.max(col("domain.start")).as("end"))

    val visitToFix = Checkpoints.persist(
      visitInferredStartEnd.alias("d_visit")
        .join(visitRecords.alias("visit"), col("d_visit.visit_id") === col("visit.visit_id"))
        .where(
          ((F.unix_timestamp(col("visit.start")) - F.unix_timestamp(col("d_visit.start"))) / 3600 > dayCutoff * 24) ||
          ((F.unix_timestamp(col("d_visit.end")) - F.unix_timestamp(col("visit.end"))) / 3600 > dayCutoff * 24))
        .select(col("visit.visit_id").as("visit_id"),
          col("visit.start").as("start"), col("visit.end").as("end"),
          col("d_visit.start").as("inferred_start"), col("d_visit.end").as("inferred_end")),
      cacheFolder, "visit_reconstruction/visit_to_fix")

    val wVisit = Window.partitionBy("visit_id").orderBy("visit_order")
    val partitioned = domainRecords.alias("domain")
      .join(visitToFix.alias("visit"), col("domain.visit_id") === col("visit.visit_id"))
      .select(col("domain.visit_id").as("visit_id"), col("domain.start").as("start"),
        col("domain.code").as("code"))
      .distinct()
      .withColumn("visit_order",
        F.row_number().over(Window.partitionBy("visit_id").orderBy("start")))
      .withColumn("prev_start", F.lag("start", 1).over(wVisit))
      .withColumn("hour_diff",
        F.coalesce((F.unix_timestamp(col("start")) - F.unix_timestamp(col("prev_start"))) / 3600, lit(0)))
      .withColumn("visit_partition",
        F.sum((col("hour_diff") > 24).cast("int"))
          .over(wVisit.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // dense_rank over (visit_id, visit_partition) in the reference — scalable
    // dense-key allocation instead of the unpartitioned window
    val distinctVisitDateMapping = Checkpoints.persist(
      IdAllocator.denseKeyId(partitioned, Seq("visit_id", "visit_partition"),
          "visit_partition_rank")
        .crossJoin(F.broadcast(visitRecords.select(F.max("visit_id").as("max_visit_id"))))
        .withColumn("new_visit_id", col("max_visit_id") + col("visit_partition_rank"))
        .drop("max_visit_id"),
      cacheFolder, "visit_reconstruction/distinct_visit_date_mapping")

    val fixVisitRecords = Checkpoints.persist(
      data.alias("ehr")
        .join(distinctVisitDateMapping.alias("visit"), col("ehr.visit_id") === col("visit.visit_id"))
        .where(col("ehr.omop_table") === "visit_occurrence")
        .groupBy(
          col("visit.visit_id").as("original_visit_id"),
          col("visit.new_visit_id").as("visit_id"),
          col("ehr.patient_id").as("patient_id"),
          col("ehr.code").as("code"),
          col("ehr.value").as("value"),
          col("ehr.unit").as("unit"),
          col("ehr.omop_table").as("omop_table"))
        .agg(F.min(col("visit.start")).as("start"), F.max(col("visit.start")).as("end"))
        .withColumn("code",
          when(col("code").isin(InpatientCodes: _*) &&
              (F.unix_timestamp(col("end")) - F.unix_timestamp(col("start"))) / 3600 <= 24,
            lit("Visit/OP")).otherwise(col("code"))),
      cacheFolder, "visit_reconstruction/fix_visit_records")

    val fixDomainRecords = Checkpoints.persist(
      data.alias("ehr")
        .join(distinctVisitDateMapping.alias("visit"),
          col("ehr.visit_id") === col("visit.visit_id") &&
            col("ehr.start") === col("visit.start") &&
            col("ehr.code") === col("visit.code"))
        .where(col("ehr.omop_table") =!= "visit_occurrence")
        .select(
          Seq(F.coalesce(col("visit.new_visit_id"), col("ehr.visit_id")).as("visit_id"),
            F.coalesce(col("visit.visit_id"), col("ehr.visit_id")).as("original_visit_id")) ++
            data.columns.filterNot(_ == "visit_id").map(c => col(s"ehr.$c").as(c)): _*),
      cacheFolder, "visit_reconstruction/fix_domain_records")

    val otherEvents = data
      .join(distinctVisitDateMapping.select("visit_id").distinct(), Seq("visit_id"), "left_anti")
      .withColumn("original_visit_id", col("visit_id"))

    otherEvents.unionByName(fixDomainRecords).unionByName(fixVisitRecords)
  }

  /** Full conversion: CSV → visit inference + out-of-span repair →
    * per-table OMOP projection with concept/value mapping
    * (ehrshot_to_omop.py:786-915). */
  def run(spark: SparkSession, ehrShotFile: String, vocabularyFolder: String,
          outputFolder: String, dayCutoff: Int = 1): Unit = {
    val raw = spark.read.option("header", "true").schema(EhrShotSchema).csv(ehrShotFile)
      .withColumn("visit_id", col("visit_id").cast(LongType))
      .drop("_c0")

    val withVisits = Checkpoints.persist(
      disconnectVisitId(generateVisitId(raw, outputFolder), outputFolder, dayCutoff),
      outputFolder, "ehr_shot")
    val concept = spark.read.parquet(s"$vocabularyFolder/concept")

    createOmopPerson(withVisits, concept)
      .write.mode("overwrite").parquet(s"$outputFolder/person")

    TableMapping.foreach { case (tableName, mapping) =>
      var domainTable = withVisits.where(col("omop_table") === tableName)
      val originalColumns = domainTable.schema.fieldNames
      mapping.foreach { case (column, omopColumn) =>
        if (omopColumn.endsWith("datetime")) {
          domainTable = domainTable
            .withColumn(omopColumn, col(column).cast(TimestampType))
            .withColumn(omopColumn.dropRight(4), col(omopColumn).cast(DateType))
        } else domainTable = domainTable.withColumn(omopColumn, col(column))
      }

      if (Seq("measurement", "observation").contains(tableName))
        domainTable = extractValue(domainTable, concept)

      domainTable = convertCodeToOmopConcept(domainTable, concept, "code")
        .withColumnRenamed("concept_id", ConceptIdMapping(tableName))

      domainTable =
        if (tableName == "visit_occurrence")
          dropDuplicateVisits(domainTable).withColumn("discharged_to_concept_id",
            when(col("visit_concept_id").isin(9201, 262, 8971, 8920),
              lit(0).cast(IntegerType)).otherwise(lit(null).cast(IntegerType)))
        else
          // surrogate primary key; parallel allocator instead of the
          // reference's unpartitioned row_number (ehrshot_to_omop.py:898-900)
          IdAllocator.sequentialId(domainTable,
            Seq(col("patient_id"), col("start"), col("code")), s"${tableName}_id")

      // drop ignores the long-format source columns that were renamed away
      domainTable.drop(originalColumns: _*)
        .write.mode("overwrite").parquet(s"$outputFolder/$tableName")
    }
  }
}
