from iresearch_spark.index.builder import build_index  # noqa: F401
from iresearch_spark.index.model import InvertedIndex  # noqa: F401
