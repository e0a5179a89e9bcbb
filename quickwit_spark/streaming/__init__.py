from quickwit_spark.streaming.indexing import index_stream  # noqa: F401
