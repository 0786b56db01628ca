"""Spark MLlib mapping of the reference's prediction pipeline
(SURVEY.md §2.11, §3.1 stages 3-5; BASELINE.json spark_approach)."""
