"""Structured Streaming: the CDC materializer and event-time analytics.

This is the engine's reason to exist (BASELINE.json north star): the
reference's REST mutation stream (SURVEY §1.4) as a real stream, folded
into queryable state with micro-batch atomicity (the analog of the
reference's per-request transactions, ``MessageResource.java:19``).
"""
