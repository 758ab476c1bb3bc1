"""Structured Streaming operators (E31-E33).

Batch-checkable analogues exist for every streaming query (Q19/Q20
semantics); the streaming harness replays the events fixture through a
file/memory source and checks the streamed result against the batch
answer — SURVEY.md §5.2 item 5.
"""
