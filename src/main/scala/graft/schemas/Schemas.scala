package graft.schemas

import org.apache.spark.sql.types._

/** Declared StructTypes for the Zoom-shaped entities (FIXTURES.md §A) —
  * replaces the reference's inferred-per-page pandas schemas
  * (/root/reference/main.py:64,112,133,164,236,294) with explicit contracts
  * validated at ingest. All fields nullable: the reference null-fills absent
  * API fields (/root/reference/main.py:65, main.py:326-334).
  */
object Schemas {

  /** Fixed 13-column user projection (/root/reference/config.py:28-42). */
  val users: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("email", StringType),
    StructField("type", IntegerType),
    StructField("status", StringType),
    StructField("pmi", LongType),
    StructField("timezone", StringType),
    StructField("dept", StringType),
    StructField("created_at", StringType),
    StructField("last_login_time", StringType),
    StructField("last_client_version", StringType),
    StructField("verified", IntegerType)))

  /** Key meeting fields (/root/reference/main.py:80,226-236,261,311). */
  val meetings: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("id", LongType),
    StructField("topic", StringType),
    StructField("start_time", StringType),
    StructField("duration", IntegerType)))

  /** Participants + injected parent key (/root/reference/main.py:108-113). */
  val participants: StructType = StructType(Seq(
    StructField("meeting_uuid", StringType),
    StructField("id", StringType),
    StructField("user_id", StringType),
    StructField("user_name", StringType),
    StructField("device", StringType),
    StructField("ip_address", StringType),
    StructField("join_time", StringType),
    StructField("leave_time", StringType)))

  /** Permission groups snapshot (/root/reference/main.py:125-135). */
  val groups: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("total_members", IntegerType)))

  /** Group members + injected parent key (/root/reference/main.py:149-170);
    * `group_id` mirrors the reference's `members["groupId"] = group_id`
    * literal injection (main.py:165).
    */
  val groupMembers: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("email", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("type", IntegerType)))

  /** Fixed 7-column settings flatten (/root/reference/main.py:324-334). */
  val meetingSettings: StructType = StructType(Seq(
    StructField("meeting_id", LongType),
    StructField("enforce_login", BooleanType),
    StructField("enforce_login_domains", StringType),
    StructField("authentication_domains", StringType),
    StructField("authentication_name", StringType),
    StructField("meeting_authentication", BooleanType),
    StructField("waiting_room", BooleanType)))
}
