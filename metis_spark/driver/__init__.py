"""Driver-contract family modules split out of __spark_entry__.py."""
