"""Stage orchestration: the checkpointed, resumable dedup pipeline."""
