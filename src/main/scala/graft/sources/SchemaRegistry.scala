package graft.sources

/** Schema-id resolution for the Confluent wire format (reference C2):
  * the producer REGISTERS each schema under its subject and uses the
  * id the registry issues (phone_message_producer.py:327-340 — the
  * register-then-use flow), and consumers resolve the same id before
  * decoding. The wire framing itself is in [[AvroWire]]; this is the
  * id-assignment side, pluggable so tests run against an in-memory
  * registry and a deployment wires the HTTP client.
  */
trait SchemaIdResolver {

  /** Register `schemaJson` under `subject` (idempotent: re-registering
    * an identical schema returns the already-issued id) and return the
    * registry-assigned schema id. */
  def register(subject: String, schemaJson: String): Int

  /** The id of an already-registered (subject, schema) pair; throws if
    * it was never registered — decoding with a guessed id is exactly
    * the bug the registry exists to prevent. */
  def idFor(subject: String, schemaJson: String): Int
}

/** In-memory registry double: globally-sequential ids in registration
  * order (1-based, like a fresh Confluent registry), idempotent per
  * (subject, schema), new id for a changed schema under the same
  * subject (a new version). Thread-safe. */
final class InMemorySchemaRegistry extends SchemaIdResolver {
  private val ids = scala.collection.mutable.LinkedHashMap[(String, String), Int]()

  override def register(subject: String, schemaJson: String): Int =
    synchronized { ids.getOrElseUpdate((subject, schemaJson), ids.size + 1) }

  override def idFor(subject: String, schemaJson: String): Int =
    synchronized {
      ids.getOrElse((subject, schemaJson),
        throw new NoSuchElementException(
          s"schema not registered under subject '$subject'"))
    }
}

/** Confluent Schema Registry REST client (deploy-time; there is no
  * reachable registry in this offline environment, so coverage is the
  * in-memory double exercising the same [[SchemaIdResolver]] contract).
  * Speaks the two calls the reference producer's serializer makes:
  * `POST /subjects/{subject}/versions` to register (returns the id)
  * and `POST /subjects/{subject}` to look up an existing schema's id.
  */
final class HttpSchemaRegistry(baseUrl: String,
    auth: Option[(String, String)] = None) extends SchemaIdResolver {

  private val client = java.net.http.HttpClient.newHttpClient()

  /** Percent-encode a subject for use as one URL path segment (subjects
    * are arbitrary strings under non-TopicName strategies; a raw '/' or
    * space would target the wrong REST resource or fail URI parsing). */
  private def seg(subject: String): String =
    java.net.URLEncoder.encode(subject, java.nio.charset.StandardCharsets.UTF_8)
      .replace("+", "%20")

  private def post(path: String, schemaJson: String): String = {
    val body = s"""{"schema": ${jsonQuote(schemaJson)}}"""
    var b = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"${baseUrl.stripSuffix("/")}$path"))
      .header("Content-Type", "application/vnd.schemaregistry.v1+json")
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(body))
    auth.foreach { case (user, pass) =>
      val cred = java.util.Base64.getEncoder.encodeToString(
        s"$user:$pass".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      b = b.header("Authorization", s"Basic $cred")
    }
    val resp = client.send(b.build(),
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() / 100 == 2,
      s"registry $path returned ${resp.statusCode()}: ${resp.body()}")
    resp.body()
  }

  /** The registry responds with a JSON object whose top-level `id`
    * field is the schema id — but lookup responses also carry `schema`
    * (the schema text, which can itself contain `"id":` as a field
    * name) and `version`, and the API does not guarantee field order,
    * so the id must be read from the parsed top level, not pattern-
    * matched out of the raw body. */
  /** One shared mapper: readTree is thread-safe and construction is the
    * expensive part. */
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def extractId(body: String): Int = {
    val root =
      try mapper.readTree(body)
      catch {
        case e: com.fasterxml.jackson.core.JacksonException =>
          throw new IllegalStateException(s"unparseable registry response: $body", e)
      }
    val id = root.path("id")
    if (!id.canConvertToInt)
      throw new IllegalStateException(s"no integral top-level id in: $body")
    id.intValue()
  }

  override def register(subject: String, schemaJson: String): Int =
    extractId(post(s"/subjects/${seg(subject)}/versions", schemaJson))

  override def idFor(subject: String, schemaJson: String): Int =
    extractId(post(s"/subjects/${seg(subject)}", schemaJson))

  private def jsonQuote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
