"""Relational + data-pipeline operators, each registered in hgn_spark.registry."""
