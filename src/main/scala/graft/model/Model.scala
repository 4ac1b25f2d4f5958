package graft.model

/** Flattened Keycloak user event — the row shape the reference engine
  * lands in parquet and queries through Athena.
  *
  * Mirrors the reference's flattening (FlatEvent.java:9-55): the
  * details map is serialized to a single JSON string column
  * (FlatEvents.java:9-18), `time` is epoch millis.
  */
case class KeycloakEvent(
    id: String,
    eventtype: String,
    realmid: String,
    realmname: String,
    clientid: String,
    userid: String,
    sessionid: String,
    ipaddress: String,
    error: Option[String],
    time: Long,
    detailsjson: String)

/** Flattened Keycloak admin event (FlatAdminEvent.java:9-86): the
  * nested AuthDetails struct is flattened to auth* columns, details
  * map serialized to detailsjson.
  */
case class KeycloakAdminEvent(
    id: String,
    time: Long,
    realmid: String,
    realmname: String,
    operationtype: String,
    resourcetype: String,
    resourcepath: String,
    representation: Option[String],
    error: Option[String],
    authrealmid: String,
    authrealmname: String,
    authclientid: String,
    authuserid: String,
    authipaddress: String,
    detailsjson: String)
