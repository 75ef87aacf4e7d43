"""deidentify_spark.operators"""
