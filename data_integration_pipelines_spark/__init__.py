"""PySpark-native analytics engine with the query/data-processing
capabilities of BlueBrain/data-integration-pipelines.

Spark-first re-expression of the reference's operator inventory
(see SURVEY.md §2): declarative DataFrame plans optimized by Catalyst,
broadcast joins for small dimensions, pandas UDFs only where built-in
operators cannot express the semantics.
"""

__version__ = "0.1.0"
