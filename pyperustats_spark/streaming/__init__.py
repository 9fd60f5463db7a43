from pyperustats_spark.streaming import events  # noqa: F401
