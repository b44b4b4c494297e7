"""Assembled query plans.

``reference_pipeline`` reproduces the reference's end-to-end dataflow
(SURVEY.md §3.1) as one Spark logical plan; ``registry`` is the
driver-facing queries()/oracle_sql() catalog spanning SURVEY.md §2.
"""
