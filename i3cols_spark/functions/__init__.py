from i3cols_spark.functions import text, vectors

__all__ = ["text", "vectors"]
