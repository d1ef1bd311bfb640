"""PySpark-native reimplementation of the StackVista sts-opentelemetry-collector
pipeline: receive -> process (mapping engine) -> route -> export, re-expressed as
batch/incremental DataFrame jobs over a Common-Crawl-style webtext table.

Reference: /root/reference (read-only). This is a from-scratch Spark-first design,
not a port — see SURVEY.md for the operator-by-operator mapping.
"""

__version__ = "0.1.0"
