package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic mapping from the driver's generic `events` table
  * (event_id, ts[long ns], user_id, event_type, value, props) into the
  * reference's flattened Keycloak event shapes (FlatEvent.java:9-55,
  * FlatAdminEvent.java:9-86), so the reference API surface is
  * exercised on driver-provided data.
  *
  * Every derivation here has an exactly-equivalent DuckDB SQL fragment
  * (`duckdbEventsCte` / `duckdbAdminCte`) used by the oracle queries —
  * the Spark column and the SQL string are kept side by side; change
  * both or neither.
  *
  * `time` is epoch millis like the reference (FlatEvent.java:38-39):
  * Spark computes `ts DIV 1000000` on the long-ns column; DuckDB
  * computes `epoch_ms(ts)` on the (micros-truncated) timestamp — both
  * floor, and all values are positive, so they agree.
  */
object EventAdapter {

  /** events → KeycloakEvent-shaped DataFrame. Input: raw events table
    * with `ts` as LongType nanos (Tables.events).
    */
  def keycloakEvents(ev: DataFrame): DataFrame = ev.select(
    col("event_id").cast("string").as("id"),
    upper(col("event_type")).as("eventtype"),
    concat(lit("realm-"), (col("user_id") % 3).cast("string")).as("realmid"),
    concat(lit("Realm "), (col("user_id") % 3).cast("string")).as("realmname"),
    concat(lit("client-"), (col("event_id") % 7).cast("string")).as("clientid"),
    concat(lit("user-"), col("user_id").cast("string")).as("userid"),
    concat(lit("sess-"), col("user_id").cast("string"), lit("-"),
      expr("event_id DIV 100").cast("string")).as("sessionid"),
    concat(lit("10.0."), (col("user_id") % 256).cast("string"), lit("."),
      (col("event_id") % 256).cast("string")).as("ipaddress"),
    when(col("event_type") === "error", lit("invalid_user_credentials"))
      .otherwise(lit(null).cast("string")).as("error"),
    expr("ts DIV 1000000").as("time"),
    col("props").as("detailsjson"))

  /** DuckDB CTE body equivalent to [[keycloakEvents]]; embed as
    * `WITH ke AS ($duckdbEventsCte) SELECT ... FROM ke`.
    */
  val duckdbEventsCte: String =
    """SELECT
      |  CAST(event_id AS VARCHAR) AS id,
      |  upper(event_type) AS eventtype,
      |  'realm-' || CAST(user_id % 3 AS VARCHAR) AS realmid,
      |  'Realm ' || CAST(user_id % 3 AS VARCHAR) AS realmname,
      |  'client-' || CAST(event_id % 7 AS VARCHAR) AS clientid,
      |  'user-' || CAST(user_id AS VARCHAR) AS userid,
      |  'sess-' || CAST(user_id AS VARCHAR) || '-' || CAST(event_id // 100 AS VARCHAR) AS sessionid,
      |  '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR) AS ipaddress,
      |  CASE WHEN event_type = 'error' THEN 'invalid_user_credentials' END AS error,
      |  epoch_ms(ts) AS time,
      |  props AS detailsjson
      |FROM events""".stripMargin.replace("\n", " ")

  /** events → KeycloakAdminEvent-shaped DataFrame
    * (FlatAdminEvent.java:56-85: auth* columns from the nested
    * AuthDetails, representation only for mutating ops).
    */
  def keycloakAdminEvents(ev: DataFrame): DataFrame = ev.select(
    col("event_id").cast("string").as("id"),
    expr("ts DIV 1000000").as("time"),
    concat(lit("realm-"), (col("user_id") % 3).cast("string")).as("realmid"),
    concat(lit("Realm "), (col("user_id") % 3).cast("string")).as("realmname"),
    when(col("event_type") === "signup", lit("CREATE"))
      .when(col("event_type") === "purchase", lit("UPDATE"))
      .when(col("event_type") === "error", lit("DELETE"))
      .otherwise(lit("ACTION")).as("operationtype"),
    when(col("user_id") % 2 === 0, lit("USER"))
      .otherwise(lit("CLIENT")).as("resourcetype"),
    concat(lit("users/user-"), col("user_id").cast("string")).as("resourcepath"),
    when(col("event_type").isin("signup", "purchase"), col("props"))
      .otherwise(lit(null).cast("string")).as("representation"),
    when(col("event_type") === "error", lit("resource_not_found"))
      .otherwise(lit(null).cast("string")).as("error"),
    concat(lit("realm-"), (col("user_id") % 3).cast("string")).as("authrealmid"),
    concat(lit("Realm "), (col("user_id") % 3).cast("string")).as("authrealmname"),
    lit("admin-cli").as("authclientid"),
    concat(lit("admin-"), (col("user_id") % 10).cast("string")).as("authuserid"),
    concat(lit("10.0."), (col("user_id") % 256).cast("string"), lit("."),
      (col("event_id") % 256).cast("string")).as("authipaddress"),
    col("props").as("detailsjson"))

  /** DuckDB CTE body equivalent to [[keycloakAdminEvents]]. */
  val duckdbAdminCte: String =
    """SELECT
      |  CAST(event_id AS VARCHAR) AS id,
      |  epoch_ms(ts) AS time,
      |  'realm-' || CAST(user_id % 3 AS VARCHAR) AS realmid,
      |  'Realm ' || CAST(user_id % 3 AS VARCHAR) AS realmname,
      |  CASE event_type WHEN 'signup' THEN 'CREATE' WHEN 'purchase' THEN 'UPDATE' WHEN 'error' THEN 'DELETE' ELSE 'ACTION' END AS operationtype,
      |  CASE WHEN user_id % 2 = 0 THEN 'USER' ELSE 'CLIENT' END AS resourcetype,
      |  'users/user-' || CAST(user_id AS VARCHAR) AS resourcepath,
      |  CASE WHEN event_type IN ('signup','purchase') THEN props END AS representation,
      |  CASE WHEN event_type = 'error' THEN 'resource_not_found' END AS error,
      |  'realm-' || CAST(user_id % 3 AS VARCHAR) AS authrealmid,
      |  'Realm ' || CAST(user_id % 3 AS VARCHAR) AS authrealmname,
      |  'admin-cli' AS authclientid,
      |  'admin-' || CAST(user_id % 10 AS VARCHAR) AS authuserid,
      |  '10.0.' || CAST(user_id % 256 AS VARCHAR) || '.' || CAST(event_id % 256 AS VARCHAR) AS authipaddress,
      |  props AS detailsjson
      |FROM events""".stripMargin.replace("\n", " ")
}
