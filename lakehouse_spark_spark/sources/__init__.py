from lakehouse_spark_spark.sources.loaders import load_star, load_table  # noqa: F401
