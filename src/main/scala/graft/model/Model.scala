package graft.model

/** Input span: one interleaved text/media element of a document.
  * Shape fixed by BASELINE.json `input_hint`:
  * `docs(doc_id, spans: array<struct<kind,text,media_ref,offset>>)`.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** Input document row. */
final case class Doc(doc_id: String, spans: Seq[Span])

/** Output span: the per-row invariant tuple `(kind, text, media_ref, order)`. */
final case class OutSpan(kind: String, text: String, media_ref: String, order: Int)

/** Output document row. */
final case class DocOut(doc_id: String, spans: Seq[OutSpan])

/** Per-partition lineage row (north_rule: resumable with lineage + metrics).
  * `partition_id` is a Long: bucket/file/stage indices fit an Int, but
  * CompactJob keys its rows by the PUBLISHED SNAPSHOT ID, and snapshot ids
  * may be clock-derived (WarcIngestJob seeds) — an Int here silently
  * truncated those, breaking the compaction no-op check and colliding
  * lineage group files for ids congruent mod 2^32.
  */
final case class LineageRow(
    snapshot_id: Long,
    partition_id: Long,
    partition_hash: String,
    doc_count: Long,
    span_count: Long,
    divergence: Double,
    committed_at: Long,
    error_count: Long = 0L) // quarantined per-partition inputs (e.g. unparseable crawl pages)
