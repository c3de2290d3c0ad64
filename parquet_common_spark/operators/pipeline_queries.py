"""Training-data pipeline operators exposed as registry queries.

Filled in by operators/{dedup,similarity,text,multimodal}.py.
"""
