"""Streaming-equivalent operators (SURVEY §2.9): alert rule
evaluation with cooldown, trailing/tumbling window metrics, and a
Structured Streaming pipeline for the continuous-cycle analog."""
