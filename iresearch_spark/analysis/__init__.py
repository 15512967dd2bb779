from iresearch_spark.analysis.analyzers import Analyzer, get_analyzer  # noqa: F401
