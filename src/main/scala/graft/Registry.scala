package graft

/** Aggregates every judge-facing query (SURVEY.md §2 inventory +
  * north-star extensions) into the SparkEntry contract maps. */
object Registry {
  def defs: Seq[QueryDef] =
    operators.RelationalQueries.all ++
      operators.TextQueries.all ++
      operators.QualityQueries.all ++
      operators.DedupQueries.all ++
      operators.SimilarityQueries.all ++
      operators.SessionQueries.all ++
      operators.TemporalQueries.all ++
      operators.PipelineQueries.all ++
      operators.SamplingQueries.all ++
      operators.ExportQueries.all ++
      operators.TypedQueries.all ++
      multimodal.Multimodal.all ++
      mr.MRQueries.all

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    defs.map(d => d.name -> d.run).toMap

  def oracleSql: Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap

  def benchNames: Seq[String] = defs.filter(_.bench).map(_.name)
}
