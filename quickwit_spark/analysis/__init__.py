from quickwit_spark.analysis.tokenizer import (  # noqa: F401
    get_tokenizer,
    tokenize_series,
)
