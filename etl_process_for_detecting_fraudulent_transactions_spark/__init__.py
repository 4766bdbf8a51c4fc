"""PySpark-native fraud-detection analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference daily-batch banking ETL (see SURVEY.md): star-schema DWH load with
SCD1/SCD2 historization, four fraud-rule queries accumulated into a REP_FRAUD
report mart, plus large-scale data-pipeline extensions (dedup, similarity
search, text analysis, multimodal column plumbing).

Design stance (SURVEY.md §7): pure, lazily-composed DataFrame transforms;
UDF-free for the parity surface; explicit StructType schemas; injectable
run_date/run_ts for determinism; storage behind a thin parquet store.
"""

__version__ = "0.1.0"
