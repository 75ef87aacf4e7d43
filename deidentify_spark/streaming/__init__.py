"""deidentify_spark.streaming"""
