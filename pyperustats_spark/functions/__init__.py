from pyperustats_spark.functions import dates, hashing, text, vectors

__all__ = ["dates", "hashing", "text", "vectors"]
