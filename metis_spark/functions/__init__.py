from metis_spark.functions.extract import extract_imports, module_key_col  # noqa: F401
