from quickwit_spark.query.ast import (  # noqa: F401
    Bool,
    Boost,
    Exists,
    FullText,
    MatchAll,
    MatchNone,
    QueryAst,
    Range,
    Regex,
    Term,
    TermSet,
    Wildcard,
)
from quickwit_spark.query.parser import parse_query  # noqa: F401
