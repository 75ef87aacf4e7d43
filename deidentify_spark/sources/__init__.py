"""deidentify_spark.sources"""
