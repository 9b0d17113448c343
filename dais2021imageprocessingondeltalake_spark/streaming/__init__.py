"""Structured Streaming: source-polymorphic pipelines, admission control,
checkpointed sinks, event-time windows (SURVEY.md §2 H1-H4)."""
