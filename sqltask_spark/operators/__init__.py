"""Engine operators: lookups/joins, dedup, similarity, text, top-k.

Each module documents which reference behavior (SURVEY.md §2) it
delivers and how the Spark plan is shaped for scale.
"""
