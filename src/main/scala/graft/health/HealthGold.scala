package graft.health

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's four gold marts
  * (/root/reference/src/pipelines/transforms/gold.sql) over the health
  * silver tables, column-for-column.
  *
  * Scale notes: providers/departments are dim-sized and broadcast; the
  * two "performance" marts reproduce the reference's own join shapes —
  * including their deliberate fan-out (encounters × transactions
  * multiply per provider/department before aggregation, gold.sql:
  * 121-127, 157-160). That shape is faithful but quadratic per key; at
  * real scale the right query pre-aggregates each fact to one row per
  * key before joining — noted here, not silently "fixed", because the
  * mart's numbers (COUNT DISTINCT over the fan-out) are only defined by
  * the reference's shape.
  */
object HealthGold {

  /** Type-preserving zero for a COALESCE default (gold.sql's
    * `IFNULL(x, 0)`): a bare 0.0 literal would widen decimal-mode
    * amounts back to double, silently undoing the exact-cents
    * contract; casting 0 to the column's own type keeps float mode
    * bit-identical and decimal mode exact. */
  private def z(df: DataFrame, c: String) =
    lit(0).cast(df.schema(c).dataType)

  /** provider_charge_summary (gold.sql:5-25): tx ⟕ providers ⟕
    * departments on the split composite key, quarantine + null-name
    * filters, grouped SUM. */
  def providerChargeSummary(tx: DataFrame, prov: DataFrame, dept: DataFrame): DataFrame =
    tx.filter(col("is_quarantined") === false)
      .join(broadcast(prov), prov("ProviderID") === tx("ProviderID"), "left")
      .join(broadcast(dept), split(dept("Dept_Id"), "-").getItem(0) === prov("DeptID"), "left")
      .filter(dept("Name").isNotNull)
      .groupBy(
        concat(coalesce(prov("FirstName"), lit("")), lit(" "),
          coalesce(prov("LastName"), lit(""))).as("Provider_Name"),
        dept("Name").as("Dept_Name"))
      .agg(sum(coalesce(tx("Amount"), z(tx, "Amount"))).as("Amount"))

  /** patient_history (gold.sql:32-82): current patients ⟕ encounters ⟕
    * transactions (both on the SOURCE PatientID, gold.sql:76-79) ⟕
    * claims on SRC_TransactionID — the denormalized fan-out view. */
  def patientHistory(p: DataFrame, e: DataFrame, t: DataFrame, c: DataFrame): DataFrame =
    p.filter(col("is_current"))
      .join(e, p("SRC_PatientID") === e("PatientID"), "left")
      .join(t, p("SRC_PatientID") === t("PatientID"), "left")
      .join(c, t("SRC_TransactionID") === c("TransactionID"), "left")
      .select(
        p("Patient_Key"), p("SRC_PatientID"), p("FirstName"), p("LastName"),
        p("Gender"), p("DOB"), p("Address"),
        e("EncounterDate"), e("EncounterType"),
        t("Transaction_Key"), t("VisitDate"), t("ServiceDate"),
        coalesce(t("Amount"), z(t, "Amount")).as("BilledAmount"),
        coalesce(t("PaidAmount"), z(t, "PaidAmount")).as("PaidAmount"),
        c("ClaimStatus"),
        coalesce(c("ClaimAmount"), z(c, "ClaimAmount")).as("ClaimAmount"),
        coalesce(c("PaidAmount"), z(c, "PaidAmount")).as("ClaimPaidAmount"),
        c("PayorType"))

  /** provider_performance (gold.sql:89-128): 7 KPIs per provider with
    * conditional distinct counts and the ROUND(SAFE_DIVIDE(…,
    * NULLIF(…,0))*100, 2) approval rate (gold.sql:118-120). */
  def providerPerformance(pr: DataFrame, e: DataFrame, t: DataFrame, c: DataFrame): DataFrame = {
    val approved = countDistinct(when(c("ClaimStatus") === "Approved", c("Claim_Key")))
    val total = countDistinct(c("Claim_Key"))
    pr.join(e, pr("ProviderID") === e("ProviderID"), "left")
      .join(t, pr("ProviderID") === t("ProviderID"), "left")
      .join(c, t("SRC_TransactionID") === c("TransactionID"), "left")
      .groupBy(pr("ProviderID"), pr("FirstName"), pr("LastName"), pr("Specialization"))
      .agg(
        countDistinct(e("Encounter_Key")).as("TotalEncounters"),
        countDistinct(t("Transaction_Key")).as("TotalTransactions"),
        sum(coalesce(t("Amount"), z(t, "Amount"))).as("TotalBilledAmount"),
        sum(coalesce(t("PaidAmount"), z(t, "PaidAmount"))).as("TotalPaidAmount"),
        approved.as("ApprovedClaims"),
        total.as("TotalClaims"),
        round(approved.cast("double") /
          when(total === 0, lit(null)).otherwise(total.cast("double")) * 100, 2)
          .as("ClaimApprovalRate"))
  }

  /** department_performance (gold.sql:135-162): split-key joins to both
    * facts, quarantine filter on the dim, AVG KPI (gold.sql:155). */
  def departmentPerformance(dept: DataFrame, e: DataFrame, t: DataFrame): DataFrame =
    dept.filter(col("is_quarantined") === false)
      .join(e, split(dept("Dept_Id"), "-").getItem(0) === e("DepartmentID"), "left")
      .join(t, split(dept("Dept_Id"), "-").getItem(0) === t("DeptID"), "left")
      .groupBy(dept("Dept_Id"), dept("Name").as("DepartmentName"))
      .agg(
        countDistinct(e("Encounter_Key")).as("TotalEncounters"),
        countDistinct(t("Transaction_Key")).as("TotalTransactions"),
        sum(coalesce(t("Amount"), z(t, "Amount"))).as("TotalBilledAmount"),
        sum(coalesce(t("PaidAmount"), z(t, "PaidAmount"))).as("TotalPaidAmount"),
        avg(coalesce(t("PaidAmount"), z(t, "PaidAmount"))).as("AvgPaymentPerTransaction"))
}
