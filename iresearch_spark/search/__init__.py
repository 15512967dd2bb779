from iresearch_spark.search.ast import (  # noqa: F401
    AllDocs,
    And,
    Empty,
    Exists,
    Fuzzy,
    Nested,
    NgramSimilarity,
    Not,
    Or,
    Phrase,
    Prefix,
    Range,
    SamePosition,
    Term,
    Terms,
    Wildcard,
)
from iresearch_spark.search.executor import SearchEngine  # noqa: F401
