"""deidentify_spark.functions"""
