"""Operator library: each module re-expresses one reference descriptor family
(SURVEY.md §2) or one training-pipeline capability as a Spark DataFrame plan."""
