package graft.streaming

/** Driver-side configuration for the fan-out pipeline.
  *
  * Mirrors the reference's env + Secrets Manager lookup
  * (lambda_function.py:25-41,57-59,105-108): config is resolved once on the
  * driver before the query starts and closed over by the foreachBatch
  * function (tiny, so no broadcast needed). `splunkDisabled` is the
  * reference's feature toggle — its secret stores the string "true"/"false",
  * so the parse accepts the same shape.
  */
final case class PipelineConfig(
    esIndexPrefix: String = "audit-",
    splunkIndex: String = "audit-splunk",
    splunkDisabled: Boolean = false,
    maxBatchSize: Int = 500)

object PipelineConfig {

  /** Resolve config from a secrets map (the stand-in for Secrets Manager —
    * lambda_function.py:25-41; no network in this harness). Unknown keys are
    * ignored, missing keys keep defaults, like the reference's `.get(...)`. */
  def fromSecrets(secrets: Map[String, String]): PipelineConfig =
    PipelineConfig(
      esIndexPrefix = secrets.getOrElse("es_index_prefix", "audit-"),
      splunkIndex = secrets.getOrElse("splunk_index", "audit-splunk"),
      // reference: truthiness of the string "true" (lambda_function.py:106-108)
      splunkDisabled = secrets.get("splunk_disabled").exists(_.equalsIgnoreCase("true")),
      maxBatchSize = secrets.get("max_batch_size").flatMap(_.toIntOption).getOrElse(500))
}
