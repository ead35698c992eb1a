package graft.pipeline

/** One-time prompt-payload preview logging
  * (`/root/reference/src/churro_ocr/_internal/prompt_logging.py:18-85`):
  * double-checked once-per-backend gate, payload sanitization that
  * truncates base64 data URIs to a 96-char preview ("..." suffix) and
  * replaces raw bytes with `{type, byte_length, data_preview}`. The Spark
  * deployment shape is once per executor JVM (the reference's
  * once-per-backend-instance).
  */
object PromptLog {

  val ImagePreviewChars = 96

  /** `_truncate_text`. */
  def truncateText(value: String, limit: Int = ImagePreviewChars): String =
    if (value.length <= limit) value else value.substring(0, limit) + "..."

  /** `_encode_bytes_preview`. */
  def bytesPreview(payload: Array[Byte], mimeType: String = "application/octet-stream"): String =
    truncateText(s"data:$mimeType;base64," +
      java.util.Base64.getEncoder.encodeToString(payload))

  /** Payload tree for sanitization (the reference's loose `object`). */
  sealed trait Payload
  final case class PText(value: String) extends Payload
  final case class PInt(value: Long) extends Payload
  final case class PBytes(value: Array[Byte]) extends Payload
  final case class PMap(entries: Seq[(String, Payload)]) extends Payload
  final case class PList(items: Seq[Payload]) extends Payload

  /** `_sanitize_prompt_payload`: data URIs truncated, bytes replaced with a
    * typed preview record, containers recursed.
    */
  def sanitize(payload: Payload): Payload = payload match {
    case PText(v) if v.startsWith("data:") && v.contains(";base64,") => PText(truncateText(v))
    case t: PText => t
    case PBytes(b) => PMap(Seq(
      "type" -> PText("bytes"),
      "byte_length" -> PInt(b.length.toLong), // integer like json.dumps
      "data_preview" -> PText(bytesPreview(b))))
    case i: PInt => i
    case PMap(es) => PMap(es.map { case (k, v) => k -> sanitize(v) })
    case PList(is) => PList(is.map(sanitize))
  }

  def render(payload: Payload): String = payload match {
    case PText(v) =>
      val sb = new java.lang.StringBuilder("\"")
      v.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.append("\"").toString
    case PInt(v) => v.toString
    case PBytes(b) => render(sanitize(PBytes(b)))
    case PMap(es) => es.map { case (k, v) => s""""$k": ${render(v)}""" }.mkString("{", ", ", "}")
    case PList(is) => is.map(render).mkString("[", ", ", "]")
  }

  /** `log_prompt_payload_once`: double-checked gate keyed per provider —
    * exactly one preview is logged per (JVM, provider) no matter how many
    * partitions race. Returns true iff this call logged.
    */
  private val logged = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def logPromptPayloadOnce(payload: Payload, providerName: String,
                           log: String => Unit): Boolean = {
    if (logged.contains(providerName)) return false
    // ConcurrentHashMap.add is the atomic double-checked section
    if (!logged.add(providerName)) return false
    log(s"First OCR prompt payload for $providerName:\n${render(sanitize(payload))}")
    true
  }

  /** test hook */
  private[graft] def reset(): Unit = logged.clear()
}
