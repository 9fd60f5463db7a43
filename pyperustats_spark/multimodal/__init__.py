from pyperustats_spark.multimodal import binary_ops  # noqa: F401
