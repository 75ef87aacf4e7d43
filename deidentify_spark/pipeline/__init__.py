"""deidentify_spark.pipeline"""
