from iresearch_spark.search.ast import (  # noqa: F401
    AllDocs,
    And,
    Cached,
    Empty,
    Exists,
    Field,
    Fuzzy,
    GranularRange,
    Nested,
    NgramSimilarity,
    Not,
    NumericRange,
    Or,
    Phrase,
    Prefix,
    Range,
    SamePosition,
    Should,
    Term,
    Terms,
    Wildcard,
)
from iresearch_spark.search.executor import SearchEngine  # noqa: F401
from iresearch_spark.search.hot import (  # noqa: F401
    HotEngine,
    HotMultiFieldEngine,
)
from iresearch_spark.search.multifield import MultiFieldEngine  # noqa: F401
